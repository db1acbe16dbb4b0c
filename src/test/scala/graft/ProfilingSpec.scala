package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("keySkewProfile reports exact counts and a tie-insensitive topN sum") {
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(3)("c") ++ Seq("d")
    val df = rows.toDF("k")
    val p = Profiling.keySkewProfile(df, "k", topN = 2).collect()(0)
    assert(p.getLong(0) == 4L)  // n_keys
    assert(p.getLong(1) == 12L) // n_rows
    assert(p.getLong(2) == 5L)  // max_count
    // top2 = 5 + 3; b-vs-c tie at the cutoff contributes the same sum
    assert(p.getLong(3) == 8L)
    assert(p.getDouble(4) == (5.0 * 4.0) / 12.0)
  }

  test("uniform keys profile to skew_ratio 1.0") {
    val df = (1 to 8).map(i => s"k${i % 4}").toDF("k")
    val p = Profiling.keySkewProfile(df, "k", topN = 4).collect()(0)
    assert(p.getLong(2) == 2L && p.getDouble(4) == 1.0)
  }

  test("columnProfile: nulls, exact distincts, string min/max, one row per column") {
    val df = Seq(
      (1L, Some("b"), Some(10)),
      (2L, None, Some(30)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(10))
    ).toDF("id", "s", "v")
    val out = Profiling.columnProfile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(out.map(_._1).toSeq == Seq("id", "s", "v")) // ordered by name
    val byName = out.map(r => r._1 -> r).toMap
    assert(byName("id") == (("id", 4L, 0L, 4L, "1", "4")))
    assert(byName("s") == (("s", 4L, 1L, 2L, "a", "b")))
    assert(byName("v") == (("v", 4L, 1L, 2L, "10", "30")))
  }

  test("columnProfileApprox matches exact on small cardinalities, no Expand") {
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 7}")).toDF("id", "g")
    val exact = Profiling.columnProfile(df, Seq("id", "g"))
      .as[(String, Long, Long, Long, String, String)].collect()
    val approx = Profiling.columnProfileApprox(df, Seq("id", "g"))
      .as[(String, Long, Long, Long, String, String)].collect()
    // everything but the sketched distinct count is exact; the HLL++
    // estimate stays within ~3·rsd of truth at these sizes
    val (em, am) = (exact.map(r => r._1 -> r).toMap,
      approx.map(r => r._1 -> r).toMap)
    for (c <- Seq("id", "g")) {
      val (e, a) = (em(c), am(c))
      assert((a._2, a._3, a._5, a._6) == ((e._2, e._3, e._5, e._6)), c)
      assert(math.abs(a._4 - e._4) <= math.max(1L, (e._4 * 0.15).toLong),
        s"$c: approx ${a._4} vs exact ${e._4}")
    }
    val plan = Profiling.columnProfileApprox(df, Seq("id", "g"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"approx profile must not Expand the scan:\n$plan")
  }
}
