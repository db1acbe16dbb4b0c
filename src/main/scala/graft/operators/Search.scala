package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval over a tokenized corpus: BM25 top-k scoring
  * (Robertson & Zaragoza, "The Probabilistic Relevance Framework: BM25 and
  * Beyond", 2009) with a log-free rational idf so scores reproduce
  * bit-identically across engines (the repo's libm exclusion rule —
  * NOTES.md determinism contract).
  *
  * Distributed shape at 100 TB: document length is a NARROW per-row
  * `size(split(...))` (no explode, no shuffle); only tokens matching the
  * query terms are exploded and shuffled (the `isin` filter sits under the
  * exchange), so the shuffled volume is O(matching tokens), not O(corpus
  * tokens). Document frequencies pivot to a single broadcast row. The
  * final top-k is a global sort of only the scored (matching) docs.
  */
object Search {

  /** BM25 with rational idf: `idf(t) = (N - df + 0.5) / (df + 0.5)`
    * (the standard formula minus the log — monotone-equivalent ranking,
    * engine-reproducible arithmetic). Score of doc d:
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`,
    * summed in the fixed order of `terms` (left-to-right IEEE doubles).
    * Docs containing none of the terms are excluded. Ties break on id.
    */
  def bm25TopK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 20
  ): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.distinct == terms, "duplicate query terms")
    val base = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
    val dl = base.select(col(idCol), size(col("_toks")).as("dl"))
    // 1-row global stats: corpus size and average doc length
    val stats = dl.agg(
      count(lit(1)).cast("double").as("_nd"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("_avgdl"))
    // only query-term tokens survive to the shuffle
    val tf = base.select(col(idCol), explode(col("_toks")).as("_term"))
      .filter(col("_term").isin(terms: _*))
      .groupBy(col(idCol), col("_term"))
      .agg(count(lit(1)).as("_tf"))
    val tfP = tf.groupBy(col(idCol))
      .pivot("_term", terms).agg(first(col("_tf")))
      .toDF(idCol +: terms.indices.map(i => s"_tf$i"): _*)
    // per-term document frequencies as ONE broadcast-able row
    val dfP = tf.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
      .groupBy().pivot("_term", terms).agg(first(col("_df")))
      .toDF(terms.indices.map(i => s"_df$i"): _*)
    val scored = dl
      .join(tfP, Seq(idCol)) // inner: only docs with ≥1 query term score
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfP))
    val ratio = col("dl").cast("double") / col("_avgdl")
    val termScore = terms.indices.map { i =>
      val tfD = col(s"_tf$i").cast("double")
      val idf = (col("_nd") - col(s"_df$i").cast("double") + lit(0.5)) /
        (col(s"_df$i").cast("double") + lit(0.5))
      when(col(s"_tf$i").isNotNull,
        idf * (tfD * (lit(k1) + lit(1.0))) /
          (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * ratio)))
        .otherwise(lit(0.0))
    }
    scored
      .select(col(idCol), termScore.reduce(_ + _).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of N
    * candidate rankings — the standard way to combine keyword (BM25) and
    * vector (ANN) retrieval without score calibration. Each input carries
    * (`idCol`, `r`) with r a 1-based rank; a document's fused score is
    * Σ_rankings scale div (kConst + r), in INTEGER division so the fusion
    * is bit-stable across engines and partitionings (double 1/(k+r) sums
    * are addition-order-dependent; integer sums are associative).
    *
    * Scale shape: the inputs are already top-k pools (bounded), so the
    * union + groupBy touches O(N·k) rows regardless of corpus size, and
    * the final top-k is a TakeOrdered, never a global sort.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, kConst: Long = 60L,
      scale: Long = 1000000L, topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    rankings
      .map(_.select(col(idCol),
        expr(s"$scale div ($kConst + r)").as("_c")))
      .reduce(_ union _)
      .groupBy(col(idCol)).agg(sum(col("_c")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }
}
