package graft

import graft.operators.Percentiles

import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkTestBase {
  import spark.implicits._

  test("count-then-kth percentiles match the built-in buffering aggregate bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 500).map(i =>
      (s"g${i % 7}", rnd.nextDouble() * 1000)).toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.49, 0.5, 0.75, 1.0)
    val ours = Percentiles.exactPercentiles(df, "g", "v", ps)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(r.fieldIndex(s"p_$i")))).toMap
    val builtin = df.groupBy($"g")
      .agg(expr(s"percentile(v, array(${ps.mkString("D,")}D))").as("p"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1).toIndexedSeq).toMap
    assert(ours.keySet == builtin.keySet)
    for (g <- ours.keySet)
      assert(ours(g) == builtin(g), s"group $g: ${ours(g)} vs ${builtin(g)}")
  }

  test("edge cases: single-value group, nulls excluded, whole positions") {
    val df = Seq(
      ("a", Some(5.0)),
      ("b", Some(1.0)), ("b", Some(2.0)), ("b", Some(3.0)), ("b", None)
    ).toDF("g", "v")
    val r = Percentiles.exactPercentiles(df, "g", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(r.fieldIndex("p_0"))).toMap
    assert(r == Map("a" -> 5.0, "b" -> 2.0)) // null doesn't shift the median
  }

  test("plan has no whole-group buffering aggregate — sort + bounded conditional max") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
    val out = Percentiles.exactPercentiles(df, "g", "v", Seq(0.5))
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("percentile("), s"must not use the buffering aggregate:\n$p")
    assert(p.contains("Window") || p.contains("WindowGroupLimit"), p)
  }
}
