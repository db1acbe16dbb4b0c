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
}
