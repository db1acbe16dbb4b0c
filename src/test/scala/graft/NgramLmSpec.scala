package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  /** Local reference: the same stupid-backoff bits-proxy computed with
    * plain Scala collections — the rule-reproduction gate (the
    * q_quality_learn discipline: the distributed train/score must equal
    * an independent driver-side implementation on a hand corpus).
    */
  private def localScores(docs: Seq[(Long, String, String)],
      trainPred: Long => Boolean): Map[Long, (Long, Long)] = {
    def toks(t: String): Seq[String] = t.trim.split("\\s+").toSeq
    val trainToks = docs.filter(d => trainPred(d._1)).flatMap(d => toks(d._3))
    val trainBis = docs.filter(d => trainPred(d._1))
      .flatMap(d => toks(d._3).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val cu = trainToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = trainBis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = trainToks.size.toLong
    def bits(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    docs.map { case (id, _, t) =>
      val ws = toks(t)
      val ss = ws.zipWithIndex.map { case (w, i) =>
        val prev = if (i == 0) None else Some(ws(i - 1))
        prev.flatMap(p => cb.get((p, w)).map(c => bits(cu(p)) - bits(c)))
          .getOrElse {
            val base = cu.get(w).map(c => bits(n) - bits(c))
              .getOrElse(bits(n) + NgramLm.UnseenPenalty)
            base + (if (prev.isDefined) NgramLm.BackoffPenalty else 0L)
          }
      }
      id -> (ss.sum, ws.size.toLong)
    }.toMap
  }

  test("stupid-backoff bits scoring matches the local reference; OOV and backoff paths hit") {
    val docs = Seq(
      (1L, "a", "the cat sat on the mat"),
      (2L, "a", "the cat sat on the hat"),
      (3L, "a", "the dog ran past the cat"),
      (4L, "a", "zorp glarb the cat"), // OOV words (trained slice lacks them)
      (5L, "b", "the cat sat"),
      (6L, "b", "mat cat the"), // seen unigrams, unseen bigrams → backoff
      (7L, "b", "on on on on"),
      (8L, "b", "the the the"))
    val df = docs.toDF("doc_id", "source", "text")
    val got = NgramLm.lmPerplexityBuckets(df, "text", "doc_id", "source",
        col("doc_id") % 4 =!= 0)
      .select(col("doc_id"), col("s_total"), col("n_terms"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = localScores(docs, _ % 4 != 0)
    assert(got == want, s"got $got\nwant $want")
    // the OOV doc must score strictly worse per token than its twin-like
    // in-vocabulary docs
    val rate = (id: Long) => got(id)._1.toDouble / got(id)._2
    assert(rate(4L) > rate(1L), "OOV text must carry higher surprisal")
  }

  test("terciles split per source by exact integer rank, lowest surprisal = head") {
    val docs = (1L to 9L).map(i =>
      (i, "s", ("the cat sat " * i.toInt).trim)) :+
      (10L, "t", "the cat")
    val df = docs.toDF("doc_id", "source", "text")
    val got = NgramLm.lmPerplexityBuckets(df, "text", "doc_id", "source",
        lit(true))
      .select(col("doc_id"), col("source"), col("bucket"))
      .as[(Long, String, String)].collect()
    val bySrc = got.groupBy(_._2)
    // 9 docs in source s → exactly 3 per bucket
    val s = bySrc("s").groupBy(_._3).view.mapValues(_.size).toMap
    assert(s == Map("head" -> 3, "middle" -> 3, "tail" -> 3), s.toString)
    // a single-doc source: rank 1 of 1 → 3·1 > 1 and 3·1 > 2 → tail
    assert(bySrc("t").head._3 == "tail")
  }
}
