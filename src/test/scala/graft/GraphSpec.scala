package graft

import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRankInt matches the hand-computed integer recurrence") {
    // 1→2, 1→3, 2→3, 3→1; one iteration from rank 1,000,000 everywhere:
    //   c(1) = r(3)/1 = 1,000,000        → 150,000 + 17e6/20   = 1,000,000
    //   c(2) = r(1)/2 =   500,000        → 150,000 + 8.5e6/20  =   575,000
    //   c(3) = r(1)/2 + r(2)/1 = 1,500,000 → 150,000 + 25.5e6/20 = 1,425,000
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r1 = Graph.pageRankInt(edges, 1).as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    // ranks stay positive longs and conserve boundedness on iteration
    val r3 = Graph.pageRankInt(edges, 3).as[(Long, Long)].collect().toMap
    assert(r3.keySet == Set(1L, 2L, 3L) && r3.values.forall(_ >= 150000L))
  }

  test("sink nodes receive rank but contribute none") {
    val edges = Seq((1L, 2L)).toDF("src", "dst") // 2 is a sink
    val r = Graph.pageRankInt(edges, 1).as[(Long, Long)].collect().toMap
    // node 1: no in-edges → 150,000; node 2: 150,000 + (1e6·17) div 20
    assert(r == Map(1L -> 150000L, 2L -> 1000000L))
  }

  test("lineage truncation does not change ranks") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val plain = Graph.pageRankInt(edges, 6).as[(Long, Long)].collect().toMap
    val cut = Graph.pageRankInt(edges, 6, truncateEvery = 2)
      .as[(Long, Long)].collect().toMap
    assert(cut == plain)
  }

  test("triangleCount counts each triangle once on a canonical edge list") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val row = Graph.triangleCount(edges).as[(Long, Long, Long)].head()
    assert(row == ((4L, 4L, 1L)))
  }

  test("coOccurrenceEdges thresholds on repeat co-occurrence") {
    val df = Seq(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g2", "a"),
      ("g2", "b"), ("g2", "b")).toDF("g", "item")
    val e = Graph.coOccurrenceEdges(df, "g", "item", 2)
      .as[(String, String)].collect().toSet
    assert(e == Set(("a", "b"))) // (a,c),(b,c) occur once; duplicates ignored
  }
}
