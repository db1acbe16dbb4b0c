package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def bits(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)

  /** Local reference of the whole hard-EM pipeline with the SAME state
    * encoding (padded-cost ":" path, lexicographic min) — plain Scala
    * collections, no Spark.
    */
  private def localLearn(texts: Seq[String],
      maxWordLen: Int): Map[String, Long] = {
    val words = texts.flatMap(_.trim.split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cands = scala.collection.mutable.Map[String, Long]()
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(Unigram.MaxPieceLen, w.length - i))
      cands(w.substring(i, i + l)) =
        cands.getOrElse(w.substring(i, i + l), 0L) + c
    val v0 = cands.filter { case (p, f) =>
      p.length == 1 || f >= Unigram.MinFreq }.toMap
    val t0 = v0.values.sum
    var vocab = v0.map { case (p, f) => p -> (bits(t0) - bits(f)) }
    for (_ <- 1 to Unigram.Rounds) {
      val usage = scala.collection.mutable.Map[String, Long]()
      for ((w, c) <- words; p <- localSegment(w, vocab))
        usage(p) = usage.getOrElse(p, 0L) + c
      val survivors = vocab.keys.filter(p =>
        p.length == 1 || usage.getOrElse(p, 0L) >= Unigram.PruneMin)
      val u1 = survivors.map(p => p -> (usage.getOrElse(p, 0L) + 1L)).toMap
      val t = u1.values.sum
      vocab = u1.map { case (p, u) => p -> (bits(t) - bits(u)) }
    }
    vocab
  }

  private def localSegment(w: String,
      vocab: Map[String, Long]): Seq[String] = {
    val dp = new Array[String](w.length + 1)
    dp(0) = "0" * Unigram.PadW + ":"
    for (i <- 1 to w.length) {
      val cands = (1 to math.min(Unigram.MaxPieceLen, i)).flatMap { l =>
        val piece = w.substring(i - l, i)
        vocab.get(piece).map { s =>
          val prev = dp(i - l)
          val cost = prev.substring(0, Unigram.PadW).toLong + s
          ("%0" + Unigram.PadW + "d").format(cost) + ":" +
            prev.substring(Unigram.PadW + 1) + piece + " "
        }
      }
      dp(i) = cands.min
    }
    dp(w.length).substring(Unigram.PadW + 1).split(" ").filter(_.nonEmpty).toSeq
  }

  private val corpus = Seq(
    "banana banana bandana cabana",
    "nana ban can cabana banana",
    "a ban nab banana bandana",
    "cab nab can nana a a")

  test("learn matches the local hard-EM reference round for round") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = Unigram.learn(df, "text", maxWordLen = 8)
    val want = localLearn(corpus, 8)
    assert(m.scores == want,
      s"diff: ${(m.scores.toSet diff want.toSet)} | ${(want.toSet diff m.scores.toSet)}")
    // vocab shrank across rounds and singles always survive
    assert(m.roundSizes.head >= m.roundSizes.last)
    val alphabet = corpus.flatMap(_.split("\\s+")).flatMap(_.toSeq).toSet
    assert(alphabet.forall(c => m.scores.contains(c.toString)),
      "single characters must never be pruned")
  }

  test("the DP segmentation is cost-optimal (brute force) and engine matches reference") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = Unigram.learn(df, "text", maxWordLen = 8)
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(Unigram.MaxPieceLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (m.scores.contains(p)) allSegs(w.substring(l)).map(p +: _)
        else Seq.empty
      }
    for (w <- corpus.flatMap(_.split("\\s+")).distinct) {
      val got = localSegment(w, m.scores)
      val best = allSegs(w).map(seg => seg.map(m.scores).sum).min
      assert(got.map(m.scores).sum == best,
        s"'$w': DP cost ${got.map(m.scores).sum} vs brute-force $best")
      assert(got.mkString("") == w, s"'$w': pieces must concatenate back")
    }
    // engine tokenize agrees with the reference on counts
    val gotDf = Unigram.tokenize(df, "text", "doc_id", m)
      .select(col("doc_id"), col("n_pieces"))
      .as[(Long, Long)].collect().toMap
    val wantN = corpus.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split("\\s+").map(w => localSegment(w, m.scores).size.toLong).sum
    }.toMap
    assert(gotDf == wantN, s"got $gotDf want $wantN")
  }

  test("words past maxWordLen are refused loudly") {
    val df = Seq((1L, "short but misunderstandings happen")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Unigram.learn(df, "text", maxWordLen = 8))
    assert(e.getMessage.contains("maxWordLen"))
  }
}
