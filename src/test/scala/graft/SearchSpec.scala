package graft

import graft.operators.Search

class SearchSpec extends SparkTestBase {
  import spark.implicits._

  test("bm25TopK matches the rational-idf formula computed by hand") {
    val docs = Seq(
      (1L, "spark spark merge alpha beta"),
      (2L, "merge window gamma"),
      (3L, "alpha beta gamma delta"),
      (4L, "spark window window merge")
    ).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, "text", "doc_id",
      Seq("spark", "merge", "window"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // doc 3 has no query term and must be excluded
    assert(out.map(_._1).toSet == Set(1L, 2L, 4L))
    // mirror of the operator's expression tree (same IEEE op order)
    val n = 4.0
    val avgdl = (5 + 3 + 4 + 4).toDouble / 4.0
    def score(tf: Int, df: Int, dl: Int): Double =
      if (tf == 0) 0.0
      else ((n - df.toDouble + 0.5) / (df.toDouble + 0.5)) *
        (tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * (1.0 - 0.75 + 0.75 * (dl.toDouble / avgdl)))
    // df: spark→{1,4}=2, merge→{1,2,4}=3, window→{2,4}=2
    val expected = Map(
      1L -> (score(2, 2, 5) + score(1, 3, 5) + score(0, 2, 5)),
      2L -> (score(0, 2, 3) + score(1, 3, 3) + score(1, 2, 3)),
      4L -> (score(1, 2, 4) + score(1, 3, 4) + score(2, 2, 4)))
    out.foreach { case (id, s) => assert(s == expected(id), s"doc $id") }
    // ranked descending, ties impossible here
    assert(out.map(_._2).toSeq ==
      out.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("rrfFuse sums integer reciprocal ranks and ranks by fused score") {
    // ranking A: 1,2,3 ; ranking B: 3,2,4
    val ra = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "r")
    val rb = Seq((3L, 1), (2L, 2), (4L, 3)).toDF("doc_id", "r")
    val out = Search.rrfFuse(Seq(ra, rb), "doc_id", kConst = 60L,
      scale = 1000000L, topK = 10).as[(Long, Long)].collect().toSeq
    def c(r: Long) = 1000000L / (60L + r)
    val expected = Map(1L -> c(1), 2L -> (c(2) + c(2)),
      3L -> (c(3) + c(1)), 4L -> c(3))
    assert(out.toMap == expected)
    // doc 2 (two mid ranks) and doc 3 (a top + a low rank) beat singletons
    assert(out.map(_._1).take(2).toSet == Set(2L, 3L))
    // descending by fused score, id tiebreak
    assert(out == out.sortBy { case (id, s) => (-s, id) })
  }

  test("terms absent from the corpus contribute nothing / empty result") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(Search.bm25TopK(docs, "text", "doc_id", Seq("zzz")).count() == 0)
    val mixed = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = Search.bm25TopK(mixed, "text", "doc_id", Seq("alpha", "zzz"))
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
  }
}
