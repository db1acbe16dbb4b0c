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

  test("suite query keys never collide (Map ++ would silently shadow)") {
    import graft.queries._
    val suites: Seq[(String, Set[String])] = Seq(
      "Relational" -> RelationalQueries.all.keySet,
      "Pipeline" -> PipelineQueries.all.keySet,
      "Extended" -> ExtendedQueries.all.keySet,
      "Subquery" -> SubqueryQueries.all.keySet,
      "Sketch" -> SketchQueries.all.keySet,
      "Analytics" -> AnalyticsQueries.all.keySet,
      "Corpus" -> CorpusQueries.all.keySet,
      "Ingest" -> IngestQueries.all.keySet,
      "Behavior" -> BehaviorQueries.all.keySet,
      "Graph" -> GraphQueries.all.keySet)
    for {
      (Seq((na, a), (nb, b))) <- suites.combinations(2)
      dup = a.intersect(b)
    } assert(dup.isEmpty, s"$na and $nb both define: $dup")
    assert(SparkEntry.queries.size == suites.map(_._2.size).sum,
      "union lost entries to key collisions")
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
