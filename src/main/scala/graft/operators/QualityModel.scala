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
  def scoreOfTokens(toks: Column): (Column, Column) =
    scoreOfTokensWith(toks, Weights)

  /** The word-bigram array of a token array — SHARED by the scorer and
    * the trainer (train/score feature extraction must stay bit-identical
    * for a learned model to be valid). Slice lengths clamp at 0 so an
    * EMPTY token array (a whitespace-only doc after caller-side
    * filtering) yields an empty bigram array instead of a runtime error.
    */
  private def bigramsOf(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))

  /** [[scoreOfTokens]] against an arbitrary (e.g. [[train]]ed) integer
    * weight vector of length [[HashBuckets]].
    */
  def scoreOfTokensWith(toks: Column,
      weights: IndexedSeq[Long]): (Column, Column) = {
    require(weights.length == HashBuckets,
      s"weight vector must have $HashBuckets entries, got ${weights.length}")
    def wOf(term: Column): Column =
      element_at(typedLit(weights), (bucket(term) + 1L).cast("int"))
    val sumW = (terms: Column) => aggregate(
      terms, lit(0L), (acc, t) => acc + wOf(t))
    val n = size(toks).cast("long") +
      greatest(size(toks) - 1, lit(0)).cast("long")
    (n, sumW(toks) + sumW(bigramsOf(toks)))
  }

  /** A trained model: bucket weights + the integer decision THRESHOLD —
    * classify +1 iff `score ≥ threshold`, where
    * `threshold = ⌈bias / (2·N⁺·N⁻)⌉` (exact rational ceiling, driver
    * BigInt arithmetic) is equivalent to the cleared-denominator
    * inequality `2·score·N⁺·N⁻ ≥ bias` for integer scores — and keeps
    * the per-row comparison a plain Long `>=` with nothing to overflow.
    */
  final case class Trained(weights: IndexedSeq[Long], threshold: Long,
      nPos: Long, nNeg: Long)

  /** Distributed NEAREST-CENTROID training of the hashed linear
    * classifier (Rocchio's method over hashed unigram+bigram counts) —
    * the learn half of the apply above, closing the same gap
    * [[Bpe.learn]] closed for the tokenizer: an engine that scores with
    * "a trained vector" must be able to train one on its own corpus.
    *
    * Closest-centroid classification `‖x−μ⁺‖² ≤ ‖x−μ⁻‖²` rearranges to
    * `2·x·(μ⁺−μ⁻) ≥ ‖μ⁺‖²−‖μ⁻‖²`; multiplying through by `N⁺²N⁻²`
    * clears every denominator, so the model is EXACT INTEGERS:
    * `w[b] = c⁺[b]·N⁻ − c⁻[b]·N⁺` (per-class bucket count totals × the
    * other class's doc count) and
    * `bias = ‖c⁺‖²·N⁻² − ‖c⁻‖²·N⁺²` — order-free sums, bit-identical at
    * any parallelism, replayable by an external engine (the
    * [[graft.operators.Similarity.kmeansQuantized]] discipline; a batch
    * perceptron was rejected here — its bulk updates oscillate without
    * converging on dense shared-vocabulary corpora).
    *
    * Scale shape: ONE narrow explode + one partial-agg groupBy over
    * (class, bucket) — a single pass at any corpus size; only
    * 2×[[HashBuckets]] longs reach the driver. `labelCol` must be ±1;
    * both classes must be non-empty.
    */
  def train(df: org.apache.spark.sql.DataFrame, toksCol: Column,
      labelCol: Column): Trained = {
    val base = df.select(labelCol.cast("long").as("_y"), toksCol.as("_t"))
    val counts = base
      .select(col("_y"),
        explode(concat(col("_t"), bigramsOf(col("_t")))).as("_term"))
      .select(col("_y"), bucket(col("_term")).as("_b"))
      .groupBy(col("_y"), col("_b")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap // ≤ 2×HashBuckets entries
    val docs = base.groupBy(col("_y")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (nPos, nNeg) = (docs.getOrElse(1L, 0L), docs.getOrElse(-1L, 0L))
    require(nPos > 0L && nNeg > 0L,
      s"both classes must be present: +1 → $nPos docs, -1 → $nNeg docs")
    require(docs.keySet.subsetOf(Set(1L, -1L)),
      s"labels must be ±1, got ${docs.keySet}")
    def c(y: Long, b: Int): Long = counts.getOrElse((y, b.toLong), 0L)
    // weights in exact BigInt, then a LOUD fit check: the per-row scorer
    // sums Longs, so a model whose worst-case document score could wrap
    // must be refused at training time, never mispredict silently.
    // Bound: |score_d| ≤ (corpus total term count) · max|w|.
    val wBig = (0 until HashBuckets).map(b =>
      BigInt(c(1L, b)) * nNeg - BigInt(c(-1L, b)) * nPos)
    val totalTerms = counts.valuesIterator.map(BigInt(_)).sum
    val worstScore = wBig.map(_.abs).maxOption.getOrElse(BigInt(0)) * totalTerms
    require(worstScore < BigInt(Long.MaxValue) / 2,
      s"corpus too large for Long scoring: worst-case |score| $worstScore " +
        "would wrap — shrink the corpus or widen the scorer")
    val w = wBig.map(_.bigInteger.longValueExact())
    // bias in BigInt (‖c‖²·N² exceeds Long at extreme corpus sizes),
    // collapsed to the integer threshold ⌈bias / (2·N⁺·N⁻)⌉: for integer
    // scores, score ≥ ⌈bias/(2N⁺N⁻)⌉ ⟺ 2·score·N⁺·N⁻ ≥ bias. The
    // threshold is bounded by the (just-checked) score range whenever the
    // model can decide at all; an out-of-range threshold means one class
    // is unreachable — clamp, which encodes exactly that constant vote.
    val bias = (0 until HashBuckets).map { b =>
      val (p, n) = (BigInt(c(1L, b)), BigInt(c(-1L, b)))
      p * p * nNeg * nNeg - n * n * nPos * nPos
    }.sum
    val twoN = BigInt(2L) * nPos * nNeg
    val (q, r) = bias /% twoN
    val thr = if (r.signum > 0) q + 1 else q
    val thrClamped =
      if (thr > BigInt(Long.MaxValue)) Long.MaxValue
      else if (thr < BigInt(Long.MinValue)) Long.MinValue
      else thr.bigInteger.longValueExact()
    Trained(w, thrClamped, nPos, nNeg)
  }

  /** A trained MULTICLASS nearest-centroid model: per-class bucket-count
    * vectors and doc counts, classes ascending. Classification is
    * argmin_c ‖x − μ_c‖² with μ_c = counts_c / nDocs_c; the
    * class-independent ‖x‖² cancels, so the per-class quantity is
    * `B_c = ‖counts_c‖² − 2·nDocs_c·(x·counts_c)` and classes compare by
    * the CROSS-MULTIPLIED exact integers `B_c·nDocs_c'² ⋛ B_c'·nDocs_c²`
    * — no rationals, no floats, bit-identical at any parallelism and
    * replayable by an external engine (int128 products there; the
    * train-time fit check keeps every product inside Long here). Ties
    * break to the LOWER class id.
    *
    * `safeTerms` is the per-document unigram+bigram bound under which
    * every product provably fits the scoring regime — [[predictMultiWith]]
    * refuses larger documents loudly (same contract as the binary guard).
    *
    * `wide = false`: every product fits a Long — comparisons run as
    * codegen'd Long arithmetic. `wide = true` (the 100 TB regime): the
    * corpus outgrew Long, so comparisons run in exact DECIMAL(38,0) —
    * the engine-side twin of the oracle's int128 HUGEINT algebra, worth
    * ~10^19 more headroom at the cost of decimal ops in the fold. The
    * regime is chosen at TRAIN time from the exact BigInt bound, so the
    * Long path never wraps and the wide path is taken only when needed.
    * In the wide regime `safeTerms` is additionally capped so the raw
    * Long score fold inside [[scoreOfTokensWith]] provably fits before
    * its DECIMAL cast — see [[fitRegime]].
    */
  final case class TrainedMulti(classes: IndexedSeq[Long],
      counts: IndexedSeq[IndexedSeq[Long]], nDocs: IndexedSeq[Long],
      safeTerms: Long, wide: Boolean = false)

  /** Distributed multiclass training — the same ONE narrow
    * explode + partial-agg pass as the binary [[train]], grouped by the
    * arbitrary Long class label instead of ±1; only
    * |classes|×[[HashBuckets]] longs reach the driver. Refusals: fewer
    * than 2 classes; more than 64 classes (the per-row argmin fold is a
    * when-chain — a cardinality that size means the label is not a
    * class); any cross-multiplied product that could leave Long for a
    * document within `safeTerms` (checked exactly in BigInt).
    */
  def trainMulticlass(df: org.apache.spark.sql.DataFrame, toksCol: Column,
      labelCol: Column): TrainedMulti = {
    val base = df.select(labelCol.cast("long").as("_y"), toksCol.as("_t"))
    val counts = base
      .select(col("_y"),
        explode(concat(col("_t"), bigramsOf(col("_t")))).as("_term"))
      .select(col("_y"), bucket(col("_term")).as("_b"))
      .groupBy(col("_y"), col("_b")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val docs = base.groupBy(col("_y")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val classes = docs.keys.toIndexedSeq.sorted
    require(classes.size >= 2,
      s"need at least 2 classes to train, got ${classes.size}")
    require(classes.size <= 64,
      s"${classes.size} distinct labels — that is not a class column")
    val cnt = classes.map(y => (0 until HashBuckets)
      .map(b => counts.getOrElse((y, b.toLong), 0L)))
    val n = classes.map(docs)
    val (safeTerms, wide) = fitRegime(cnt, n)
    TrainedMulti(classes, cnt, n, safeTerms, wide)
  }

  /** The exact multiclass fit check, factored out of [[trainMulticlass]]
    * so the wide-regime bounds are unit-testable on synthetic counts
    * (genuinely wide corpora are too large to materialize in a spec).
    *
    * For every class pair the comparison multiplies
    * B_c (bounded by ‖cnt_c‖² + 2·N_c·terms·max_b cnt_c[b]) by N_c'².
    * Solve for the largest per-document term count that keeps every
    * product under the regime's half-range; refuse models that cannot
    * even score a 1-term document. Two regimes: Long (codegen'd integer
    * arithmetic) and, when the corpus outgrows it, exact DECIMAL(38,0)
    * — the int128-class algebra the DuckDB oracle already runs.
    *
    * WIDE-REGIME ACCUMULATOR CAP: [[predictMultiWith]] only casts the
    * per-class score to DECIMAL AFTER [[scoreOfTokensWith]] has folded it
    * as a plain Long (`acc + wOf(t)` seeded from 0L). The DECIMAL headroom
    * bound above says nothing about that inner fold, so the wide regime
    * ADDITIONALLY caps safeTerms at min_c ⌊Long.MaxValue / maxC_c⌋: the
    * per-class weights are the non-negative bucket COUNTS, the partial
    * sums are monotone, and terms·maxC_c then provably fits a Long — the
    * accumulator can never wrap silently (a document past the cap hits
    * the loud scan-time refusal instead). The Long regime needs no extra
    * cap: its bound already keeps 2·N_c·terms·maxC_c under
    * Long.MaxValue/2, which is strictly tighter.
    */
  private[graft] def fitRegime(cnt: IndexedSeq[IndexedSeq[Long]],
      n: IndexedSeq[Long]): (Long, Boolean) = {
    val maxN2 = n.map(x => BigInt(x) * x).max
    def safeUnder(half: BigInt): BigInt = cnt.indices.map { i =>
      val norm2 = cnt(i).map(c => BigInt(c) * c).sum
      val maxC = cnt(i).max
      val headroom = half / maxN2 - norm2
      if (headroom <= 0) BigInt(0)
      else if (maxC == 0L) BigInt(Long.MaxValue)
      else headroom / (BigInt(2) * n(i) * maxC)
    }.min
    val safeLong = safeUnder(BigInt(Long.MaxValue) / 2)
    val safeDec = safeUnder((BigInt(10).pow(38) - 1) / 2)
    require(safeDec >= 1,
      "corpus too large even for DECIMAL(38) multiclass scoring: " +
        "cross-multiplied products would exceed 38 digits — shard the " +
        "corpus or reduce classes")
    val wide = safeLong < 1
    val accCap = cnt.indices.map { i =>
      val maxC = cnt(i).max
      if (maxC == 0L) BigInt(Long.MaxValue) else BigInt(Long.MaxValue) / maxC
    }.min
    val safe = if (wide) safeDec.min(accCap) else safeLong
    require(safe >= 1,
      "corpus too large for the Long score accumulator: a single term's " +
        "bucket count alone approaches Long range — shard the corpus")
    val safeTerms =
      if (safe > BigInt(Long.MaxValue)) Long.MaxValue
      else safe.bigInteger.longValueExact()
    (safeTerms, wide)
  }

  /** Per-row class prediction of a [[TrainedMulti]] model over an
    * aliased token-array column: |classes| integer feature dot products
    * (one scorer pass per class), then a linear fold keeping the
    * arg-min-distance class under the cross-multiplied comparison.
    * Documents past `safeTerms` raise at scan time rather than wrap.
    */
  def predictMultiWith(toks: Column, m: TrainedMulti): Column = {
    val k = m.classes.size
    // regime cast: Long comparisons when the train-time bound proved they
    // fit; exact DECIMAL(38,0) — the oracle's int128 algebra — when the
    // corpus outgrew Long (m.wide). Decimal values here stay within 38
    // digits by the same train-time bound, so every op is exact.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def rg(c: Column): Column = if (m.wide) c.cast(dec) else c
    val bs = m.classes.indices.map { i =>
      val (_, s) = scoreOfTokensWith(toks, m.counts(i))
      val norm2 = m.counts(i).map(c => BigInt(c) * c).sum
      if (m.wide)
        lit(norm2.toString).cast(dec) -
          lit((BigInt(2) * m.nDocs(i)).toString).cast(dec) * rg(s)
      else
        lit(norm2.bigInteger.longValueExact()) - lit(2L * m.nDocs(i)) * s
    }
    // evaluate every per-class score exactly ONCE: the scores ride in a
    // single zipped array and the argmin folds over its ELEMENTS (lambda
    // variables — free to re-reference). A when-chain over the raw score
    // expressions would re-embed (and re-evaluate) each interpreted
    // scorer O(k²) times per row.
    val n2Arr =
      if (m.wide) array(m.nDocs.map(x =>
        lit((BigInt(x) * x).toString).cast(dec)): _*)
      else typedLit(m.nDocs.map(x => x * x))
    val clsArr = typedLit(m.classes)
    val zipped = zip_with(array(bs: _*), n2Arr,
      (b, n) => struct(b.as("b"), n.as("n")))
    // accumulator: current best (b, n), its index i, and the running
    // element counter c; i = -1 seeds "first element wins"
    val folded = aggregate(zipped,
      struct(rg(lit(0L)).as("b"), rg(lit(0L)).as("n"), lit(-1).as("i"),
        lit(0).as("c")),
      (acc, e) => {
        val better = acc.getField("i") === -1 ||
          e.getField("b") * acc.getField("n") <
            acc.getField("b") * e.getField("n")
        when(better, struct(e.getField("b").as("b"),
            e.getField("n").as("n"), acc.getField("c").as("i"),
            (acc.getField("c") + 1).as("c")))
          .otherwise(struct(acc.getField("b").as("b"),
            acc.getField("n").as("n"), acc.getField("i").as("i"),
            (acc.getField("c") + 1).as("c")))
      })
    val bestIdx = folded.getField("i")
    require(k >= 1, s"model has no classes") // k bound by train's checks
    val nTerms = size(toks).cast("long") +
      greatest(size(toks) - 1, lit(0)).cast("long")
    when(nTerms > m.safeTerms,
      raise_error(concat(
        lit("document too large for Long multiclass scoring: "),
        nTerms.cast("string"),
        lit(s" terms exceeds the safe bound ${m.safeTerms} for this model"))))
      .otherwise(element_at(clsArr, bestIdx + 1))
  }

  /** Per-row +1/−1 prediction of a [[Trained]] model over an aliased
    * token-array column — one Long comparison against the precomputed
    * integer threshold (nothing multiplies in the comparison itself).
    *
    * [[train]]'s fit check bounds the worst-case score by the TRAINING
    * corpus's total term count, so it says nothing about a scored corpus
    * the model never saw: a single document with more terms than the
    * entire training corpus could wrap the Long feature sum and
    * mispredict silently. The guard below refuses LOUDLY instead — any
    * document whose unigram+bigram count exceeds the per-document safe
    * bound `(Long.MaxValue/2) / max|w|` raises at scan time. Documents
    * inside the bound score bit-identically to the unguarded expression.
    */
  def predictWith(toks: Column, m: Trained): Column = {
    val (n, score) = scoreOfTokensWith(toks, m.weights)
    val maxW = math.max(m.weights.map(math.abs).max, 1L)
    val safeTerms = (Long.MaxValue / 2) / maxW
    when(n > safeTerms,
      raise_error(concat(
        lit("document too large for Long scoring: "), n.cast("string"),
        lit(s" terms exceeds the safe bound $safeTerms for this model"))))
      .when(score >= m.threshold, lit(1L)).otherwise(lit(-1L))
  }
}
