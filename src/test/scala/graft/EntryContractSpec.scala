package graft

/** Pins the driver contract: entry() yields rows at sf0.001; every query has
  * a runnable implementation; every oracle key refers to a real query.
  */
class EntryContractSpec extends SparkTestBase {

  test("entry() returns rows on sf0.001 (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (hash-checked by the driver)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert((q -- o).isEmpty, s"oracle-less queries: ${q -- o}")
  }

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
      // empty results are legitimate only for the anti-join style queries
      if (!Set("q_anti_join").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }
}
