package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style LM quality bucketing (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * score every document under a language model trained on a held-in
  * slice, then split each source's documents into head/middle/tail
  * perplexity terciles — the curation signal CCNet filters Common Crawl
  * with. The LM here is a bigram model with STUPID BACKOFF (Brants et
  * al. 2007 — the count-ratio backoff used at web scale precisely
  * because it needs no discounting math), and every score is an exact
  * INTEGER so the DuckDB oracle replays training and scoring
  * bit-for-bit.
  *
  * Log-free surprisal proxy (the DSIR/quantized discipline): a count
  * ratio a/b has true surprisal log2(b/a); this operator uses the
  * INTEGER proxy `bits(b) − bits(a)` where `bits(x) = ⌊log2 x⌋` is
  * computed exactly in both engines as `length(bin(x)) − 1`. Per term:
  *
  *   - bigram hit (i > 1, c(prev,w) in the table):
  *     s = bits(c(prev)) − bits(c(prev,w));
  *   - unigram backoff (w in vocab): s = bits(N) − bits(c(w)), plus
  *     `backoffPenalty` when it IS a backoff (i > 1) — the integer
  *     stand-in for stupid backoff's fixed 0.4 multiplier;
  *   - out-of-vocabulary: s = bits(N) + `unseenPenalty`
  *     (+ backoffPenalty when i > 1).
  *
  * Document score S = Σ s_i over its terms; the per-token rate S/n is
  * ONE IEEE division used only for ordering, and buckets are decided by
  * exact integer rank comparisons (3·rank ≤ count ⇒ head, ≤ 2·count ⇒
  * middle, else tail — lowest surprisal first, CCNet's head = most
  * LM-like text).
  *
  * Scale shape: training is one explode → two partial-agg groupBys
  * (unigram + bigram count tables — data-plane tables joined back, not
  * driver state; only the single total-token count reaches the driver).
  * Scoring is two narrow left joins on the gram keys — Spark broadcasts
  * them while they fit and shuffle-joins when a web-scale vocabulary
  * outgrows that, with no code change. The tercile split is one window
  * per source (the per-domain percentile CCNet prescribes — same shape
  * as the quality-percentile filter; a pathologically hot source would
  * use the bucketed-prefix-sum sibling, SCALE.md §9).
  */
object NgramLm {

  val BackoffPenalty = 2L
  val UnseenPenalty = 4L

  private def bits(c: Column): Column =
    (length(bin(c)) - 1).cast("long")

  private def bitsOf(n: Long): Long = {
    require(n >= 1, "bits of non-positive count")
    63L - java.lang.Long.numberOfLeadingZeros(n)
  }

  /** (id, src, pos, w, prev) terms of every document — pos is 1-based,
    * prev is null at pos 1. One narrow explode, no window/lag.
    */
  private def termsOf(df: DataFrame, textCol: String, idCol: String,
      srcCol: String): DataFrame =
    df.select(col(idCol).as("_id"), col(srcCol).as("_src"),
        TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col("_id"), col("_src"), col("_t"),
        posexplode(col("_t")).as(Seq("_p0", "_w")))
      .select(col("_id"), col("_src"), (col("_p0") + 1).as("_pos"),
        col("_w"),
        when(col("_p0") >= 1, element_at(col("_t"), col("_p0")))
          .otherwise(lit(null)).as("_prev"))

  /** Train on `df.filter(trainPred)`, score ALL of `df`, bucket per
    * source. Returns (doc_id, source, s_total, n_terms, bucket).
    */
  def lmPerplexityBuckets(df: DataFrame, textCol: String, idCol: String,
      srcCol: String, trainPred: Column): DataFrame = {
    val all = termsOf(df, textCol, idCol, srcCol)
    val train = termsOf(df.filter(trainPred), textCol, idCol, srcCol)
    val cu = train.groupBy(col("_w")).agg(count(lit(1)).as("_cu"))
    val cb = train.filter(col("_prev").isNotNull)
      .groupBy(col("_prev"), col("_w")).agg(count(lit(1)).as("_cb"))
    val nTotal = train.count()
    require(nTotal >= 1, "empty training slice")
    val bitsN = bitsOf(nTotal)
    val scored = all
      .join(cu.select(col("_w").as("_wk"), col("_cu").as("_cuw")),
        col("_w") === col("_wk"), "left")
      .join(cu.select(col("_w").as("_pk"), col("_cu").as("_cup")),
        col("_prev") === col("_pk"), "left")
      .join(cb.select(col("_prev").as("_bp"), col("_w").as("_bw"),
          col("_cb")),
        col("_prev") === col("_bp") && col("_w") === col("_bw"), "left")
      .withColumn("_s",
        when(col("_prev").isNotNull && col("_cb").isNotNull,
          bits(col("_cup")) - bits(col("_cb")))
          .otherwise(
            when(col("_cuw").isNotNull, lit(bitsN) - bits(col("_cuw")))
              .otherwise(lit(bitsN + UnseenPenalty)) +
              when(col("_prev").isNotNull, lit(BackoffPenalty))
                .otherwise(lit(0L))))
    val perDoc = scored.groupBy(col("_id"), col("_src"))
      .agg(sum(col("_s")).as("s_total"), count(lit(1)).as("n_terms"))
    // tercile by exact integer rank within source; the one IEEE division
    // is the ORDERING key only (single division — engine-identical)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_src"))
    val ord = w.orderBy(
      (col("s_total").cast("double") / col("n_terms").cast("double")).asc,
      col("_id").asc)
    perDoc
      .withColumn("_r", row_number().over(ord))
      .withColumn("_n", count(lit(1)).over(w))
      .select(col("_id").as("doc_id"), col("_src").as("source"),
        col("s_total"), col("n_terms"),
        when(lit(3L) * col("_r") <= col("_n"), lit("head"))
          .when(lit(3L) * col("_r") <= lit(2L) * col("_n"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
