package graft

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private val E = Bpe.MergeBase
  private def ids(w: String): Seq[Int] = Bpe.encodeWord(w).toSeq

  test("encodeWord applies merges in rank order, left-to-right non-overlapping") {
    assert(ids("the") == Seq(E + 1), "th then the")
    assert(ids("line") == Seq('l'.toInt, E + 4), "in then ine")
    assert(ids("batch") == Seq('b'.toInt, E + 5, 'c'.toInt, 'h'.toInt),
      "at merges; t,c never forms th")
    assert(ids("order") == Seq('o'.toInt, 'r'.toInt, 'd'.toInt, E + 2))
    assert(ids("query") == Seq(E + 9, E + 2, 'y'.toInt), "qu + er")
    assert(ids("window") ==
      Seq('w'.toInt, E + 3, 'd'.toInt, E + 7), "in + ow")
    assert(ids("x") == Seq('x'.toInt) && ids("") == Seq.empty)
  }

  test("greedy left-to-right tie-breaking matches string replace semantics") {
    // t,h,t,h,e: rank 0 rewrites both 'th's (non-overlapping), THEN rank 1
    // merges the second output with 'e' — same as sequential replace()
    assert(ids("ththe") == Seq(E, E + 1))
    // a,a,a,t: the single 'at' match is at the tail; leading 'aa' untouched
    assert(ids("aaat") == Seq('a'.toInt, 'a'.toInt, E + 5))
    // overlapping candidate pairs resolve leftmost-first: "erer" under er
    assert(ids("erer") == Seq(E + 2, E + 2))
  }

  test("tokenStats aggregates counts and exact id sums per document") {
    val df = Seq((1L, "the line scans fast"), (2L, ""), (3L, "the the"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenStats(df, "text", "doc_id")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val d1 = Seq(Seq(E + 1), Seq('l'.toInt, E + 4),
      Seq('s'.toInt, 'c'.toInt, E + 8, 's'.toInt),
      Seq('f'.toInt, 'a'.toInt, E + 6))
    assert(got(0) == ((1L, 4L, d1.map(_.size).sum.toLong,
      d1.flatten.map(_.toLong).sum)))
    // empty text: one empty whitespace token (TextAnalysis.tokens parity),
    // zero symbols
    assert(got(1) == ((2L, 1L, 0L, 0L)))
    assert(got(2) == ((3L, 2L, 2L, 2L * (E + 1))))
  }

  test("merge outputs never collide with base symbols or whitespace") {
    Bpe.DefaultMerges.foreach { case (l, r, o) =>
      assert(o >= 0xE000 && o < 0xF900, "private use area")
      assert(!Character.isWhitespace(l) && !Character.isWhitespace(r))
    }
    // ranks referenced by later pairs must already exist
    Bpe.DefaultMerges.zipWithIndex.foreach { case ((l, r, _), i) =>
      for (s <- Seq(l, r) if s >= Bpe.MergeBase)
        assert(s - Bpe.MergeBase < i, s"rank $i references unmade merge")
    }
  }
}
