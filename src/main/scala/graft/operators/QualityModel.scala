package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashed-n-gram LINEAR text classifier apply — the fastText architecture
  * (Joulin et al., "Bag of Tricks for Efficient Text Classification", 2017):
  * features are word unigrams + bigrams, each feature hashes into one of
  * [[HashBuckets]] buckets, and the document score is the integer sum of
  * the buckets' weights. Model-based quality gating at scan speed.
  *
  * Exactness/scale contract (same discipline as the rest of the repo):
  *
  *   - the feature hash is the shared md5-prefix [[Shingles.hash60]], so
  *     DuckDB reproduces bucket ids bit for bit;
  *   - weights are INTEGERS fixed in-repo ([[Weights]] — a deterministic
  *     stand-in for learned parameters; swap the literal for a trained
  *     vector without touching the plan), so scores are exact integer sums
  *     with no float summation order to disagree on;
  *   - the whole scorer is one narrow per-row pass over the token array
  *     (transform/zip_with/aggregate on an aliased array column — no
  *     shuffle, no UDF, fuses with the scan); the weight table rides into
  *     every task as a plan literal, the broadcast shape of a model apply.
  */
object QualityModel {

  val HashBuckets = 64

  /** Fixed integer weight per hash bucket, range [-10, 10]. Deterministic
    * arithmetic of the bucket id so impl and oracle share one source of
    * truth; a production model would substitute its learned, quantized
    * weights here.
    */
  val Weights: IndexedSeq[Long] =
    (0 until HashBuckets).map(b => ((b * 37 + 11) % 21 - 10).toLong)

  /** DuckDB literal for the weight table (1-indexed list). */
  def weightsSqlList: String = Weights.mkString("[", ", ", "]")

  private def bucket(term: Column): Column =
    pmod(Shingles.hash60(term), lit(HashBuckets.toLong))

  private def weightOf(term: Column): Column =
    element_at(typedLit(Weights), (bucket(term) + 1L).cast("int"))

  /** (n_features, score) over an ALIASED token-array column (alias first —
    * inlining the tokenizer into the lambda would re-split per element
    * access under interpreted HOF evaluation).
    */
  def scoreOfTokens(toks: Column): (Column, Column) = {
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    val sumW = (terms: Column) => aggregate(
      terms, lit(0L), (acc, t) => acc + weightOf(t))
    val n = size(toks).cast("long") +
      greatest(size(toks) - 1, lit(0)).cast("long")
    (n, sumW(toks) + sumW(bigrams))
  }
}
