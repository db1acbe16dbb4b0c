package graft.queries

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality queries for the training-data pipeline: Gopher-style
  * repetition signals, tf·idf-proxy salient terms, and the cross-source
  * contamination matrix. Oracles follow the PipelineQueries determinism
  * contract: exact integer counts, single IEEE divisions, total ORDER BY,
  * md5-derived shingle hashing shared with the Spark constants.
  */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame

  val TfidfTopK = 3

  /** Repetition signals per doc — ONE codegen'd pass (zero shuffles), vs
    * the oracle's explode/groupBy formulation: hash equality proves the
    * fused expression matches the relational semantics.
    */
  val qRepetitionSignals: Q = (spark, dir) =>
    TextAnalysis.repetitionSignals(Tables(spark, dir, "documents"),
      "text", "doc_id")
      .orderBy(col("doc_id"))

  private val repetitionOracle: String = {
    import PipelineQueries.WS
    s"""WITH t AS (SELECT doc_id, $WS ws FROM documents),
       |tok AS (SELECT doc_id, unnest(ws) AS tok FROM t),
       |wf AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
       |wstats AS (SELECT doc_id, max(c) AS top_c, count(*) AS n_distinct,
       |             sum(c) AS n FROM wf GROUP BY 1),
       |bg AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN concat_ws(' ', ws[1])
       |                          ELSE concat_ws(' ', ws[i], ws[i+1]) END AS b
       |       FROM t, UNNEST(range(1, greatest(len(ws)-1, 1)+1)) AS u(i)),
       |bf AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
       |bstats AS (SELECT doc_id, max(c) AS top_bc, sum(c) AS nb
       |           FROM bf GROUP BY 1)
       |SELECT w.doc_id, CAST(w.n AS INT) AS n_tokens,
       |  CAST(w.n_distinct AS DOUBLE) / CAST(w.n AS DOUBLE) AS distinct_ratio,
       |  CAST(w.top_c AS DOUBLE) / CAST(w.n AS DOUBLE) AS top_word_frac,
       |  CAST(b.top_bc AS DOUBLE) / CAST(b.nb AS DOUBLE) AS top_bigram_frac
       |FROM wstats w JOIN bstats b ON w.doc_id = b.doc_id
       |ORDER BY w.doc_id""".stripMargin
  }

  /** DSIR-style data selection (hashed-bigram importance resampling,
    * Xie et al. 2023): target = the English slice, raw = the whole
    * corpus; output = the 100 most target-like documents by the
    * integer importance score (Laplace-smoothed target/raw bucket
    * ratios, scaled-integer DIV — see
    * [[graft.operators.TextAnalysis.importanceWeights]]), ties broken
    * by doc_id. The oracle replays the identical hash/ratio/score
    * arithmetic relationally in DuckDB.
    */
  val qDsirImportance: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    TextAnalysis.importanceWeights(docs,
      docs.filter(col("lang") === "en"), "text", "doc_id",
      buckets = 4096)
      .select(col("doc_id"), col("importance"))
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(100)
  }

  private val dsirImportanceOracle: String = {
    import PipelineQueries.{WS, h60}
    s"""WITH t AS (SELECT doc_id, lang, $WS ws FROM documents),
       |bg AS (SELECT doc_id, lang, concat_ws(' ', ws[i], ws[i+1]) AS bg
       |       FROM t, UNNEST(range(1, greatest(len(ws)-1, 1)+1)) AS u(i)),
       |hb AS (SELECT doc_id, lang, ${h60("bg")} % 4096 AS b FROM bg),
       |tc AS (SELECT b, count(*) AS t_b FROM hb WHERE lang = 'en'
       |       GROUP BY b),
       |qc AS (SELECT b, count(*) AS q_b FROM hb GROUP BY b),
       |r AS (SELECT qc.b,
       |        ((coalesce(t_b, 0) + 1) * 1000000) // (q_b + 1) AS r_b
       |      FROM qc LEFT JOIN tc ON qc.b = tc.b),
       |cb AS (SELECT doc_id, b, count(*) AS c_b FROM hb GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(c_b * r_b) AS BIGINT) AS importance
       |FROM cb JOIN r USING (b) GROUP BY doc_id
       |ORDER BY importance DESC, doc_id LIMIT 100""".stripMargin
  }

  /** Top-3 salient terms per doc by the tf·(N/df) rational score. */
  val qTfidfTopTerms: Q = (spark, dir) =>
    TextAnalysis.tfidfTopTerms(Tables(spark, dir, "documents"),
      "text", "doc_id", TfidfTopK)
      .orderBy(col("doc_id"), col("rank"))

  private val tfidfOracle: String = {
    import PipelineQueries.WS
    s"""WITH t AS (SELECT doc_id, $WS ws FROM documents),
       |tok AS (SELECT doc_id, unnest(ws) AS term FROM t),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |scored AS (SELECT doc_id, term,
       |    CAST(tf * n AS DOUBLE) / CAST(df AS DOUBLE) AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM scored)
       |SELECT doc_id, term, CAST(rank AS INT) AS rank, score FROM ranked
       |WHERE rank <= $TfidfTopK ORDER BY doc_id, rank""".stripMargin
  }

  /** Shared distinct shingle-hash counts per source pair (contamination
    * matrix across corpus slices).
    */
  val qSourceOverlap: Q = (spark, dir) =>
    TextAnalysis.sourceOverlap(Tables(spark, dir, "documents"),
      "text", "source")
      .orderBy(col("src_a"), col("src_b"))

  private val sourceOverlapOracle: String = {
    import PipelineQueries.WS
    val h60 = PipelineQueries.h60("s")
    s"""WITH t AS (SELECT source, $WS ws FROM documents),
       |sh AS (SELECT source, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) s
       |       FROM t, UNNEST(range(1, greatest(len(ws)-2, 1)+1)) AS u(i)),
       |post AS (SELECT DISTINCT source AS src, $h60 % 2147483647 AS h FROM sh)
       |SELECT a.src AS src_a, b.src AS src_b, count(*) AS shared_shingles
       |FROM post a JOIN post b ON a.h = b.h AND a.src < b.src
       |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin
  }

  /** Per-source corpus-diversity signal: Gini impurity of the language
    * distribution, 1 − Σ(n_lang/N)², in EXACT integer basis points —
    * (N² − Σ n_lang²)·10000 div N². The rational form sidesteps the libm
    * exclusion (entropy's log is last-bit engine-dependent; Gini ranks
    * diversity identically). Two partial+final aggregates: per-(source,
    * lang) counts, then per-source combine — shuffles bounded by
    * |sources|·|langs|, never the corpus.
    */
  val qLangGini: Q = (spark, dir) =>
    Tables(spark, dir, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("nl"))
      .groupBy(col("source"))
      .agg(sum(col("nl")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        sum(col("nl") * col("nl")).as("_ss"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        expr("((n_docs * n_docs - _ss) * 10000) div (n_docs * n_docs)")
          .as("gini_bps"))
      .orderBy(col("source"))

  private val langGiniOracle: String =
    """WITH c AS (SELECT source, lang, count(*) AS nl FROM documents
      |           GROUP BY 1, 2),
      |a AS (SELECT source, SUM(nl) AS n_docs, count(*) AS n_langs,
      |        SUM(nl * nl) AS ss FROM c GROUP BY 1)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_langs AS BIGINT) AS n_langs,
      |  CAST(((n_docs * n_docs - ss) * 10000) // (n_docs * n_docs)
      |       AS BIGINT) AS gini_bps
      |FROM a ORDER BY source""".stripMargin

  val SharedWindowK = 10

  /** Exact shared k-token windows per doc pair (Lee et al.-style substring
    * duplication mass).
    */
  val qSharedWindows: Q = (spark, dir) =>
    Dedup.sharedWindowPairs(Tables(spark, dir, "documents"),
      "text", "doc_id", SharedWindowK)
      .orderBy(col("id_a"), col("id_b"))

  private val sharedWindowsOracle: String = {
    import PipelineQueries.WS
    val h60 = PipelineQueries.h60("s")
    val parts = (0 until SharedWindowK).map(j => s"ws[i+$j]").mkString(", ")
    s"""WITH t AS (SELECT doc_id, $WS ws FROM documents),
       |sh AS (SELECT doc_id, concat_ws(' ', $parts) s
       |       FROM t, UNNEST(range(1, greatest(len(ws)-${SharedWindowK - 1}, 1)+1)) AS u(i)),
       |post AS (SELECT DISTINCT doc_id, $h60 % 2147483647 AS h FROM sh)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_windows
       |FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin
  }

  /** N-gram-level decontamination under the oracle: the held-out set is
    * the doc_id % 10 slice; a training doc survives iff none of its
    * k-token windows appears verbatim in that slice. Same window-hash CTE
    * machinery as `q_shared_windows`, so the SQL reformulation shares one
    * source of truth with the Scala shingle pass.
    */
  val qNgramDecontaminate: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    Dedup.decontaminateNgram(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "text", "doc_id", SharedWindowK)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  private val ngramDecontaminateOracle: String = {
    import PipelineQueries.WS
    val h60 = PipelineQueries.h60("s")
    val parts = (0 until SharedWindowK).map(j => s"ws[i+$j]").mkString(", ")
    s"""WITH t AS (SELECT doc_id, $WS ws FROM documents),
       |sh AS (SELECT doc_id, concat_ws(' ', $parts) s
       |       FROM t, UNNEST(range(1, greatest(len(ws)-${SharedWindowK - 1}, 1)+1)) AS u(i)),
       |post AS (SELECT DISTINCT doc_id, $h60 % 2147483647 AS h FROM sh),
       |testh AS (SELECT DISTINCT h FROM post WHERE doc_id % 10 = 0),
       |flagged AS (SELECT DISTINCT doc_id FROM post
       |  WHERE doc_id % 10 <> 0 AND h IN (SELECT h FROM testh))
       |SELECT doc_id FROM documents
       |WHERE doc_id % 10 <> 0
       |  AND doc_id NOT IN (SELECT doc_id FROM flagged)
       |ORDER BY doc_id""".stripMargin
  }

  /** Token commonality — the "how ordinary is this document's vocabulary"
    * quality signal (rare-token-heavy docs are OCR noise/gibberish; all-
    * common-token docs are boilerplate): per doc, the mean GLOBAL corpus
    * frequency of its tokens, duplicates counted. Distributed shape: the
    * frequency table is vocabulary-bounded (AQE broadcasts it back), the
    * per-doc aggregate is one shuffle on doc_id; exact integer sums, one
    * IEEE division.
    */
  val qTokenCommonality: Q = (spark, dir) => {
    val tok = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
    val gf = tok.groupBy(col("term")).agg(count(lit(1)).as("gc"))
    tok.join(gf, "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("gc")).cast("double") / count(lit(1)))
          .as("mean_token_freq"))
      .orderBy(col("doc_id"))
  }

  private val tokenCommonalityOracle: String = {
    import PipelineQueries.WS
    s"""WITH t AS (SELECT doc_id, unnest($WS) AS term FROM documents),
       |gf AS (SELECT term, count(*) AS gc FROM t GROUP BY 1)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(gc) AS DOUBLE) / count(*) AS mean_token_freq
       |FROM t JOIN gf USING (term)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val Bm25Terms = Seq("spark", "merge", "window")
  val Bm25K1 = "1.2"
  val Bm25B = "0.75"
  val Bm25TopK = 20

  /** BM25 retrieval top-k over the corpus for a fixed 3-term query. The
    * oracle rebuilds the identical rational-idf arithmetic (libm rule: no
    * log) with the same IEEE expression tree, so the double scores hash
    * bit-equal. Scale shape: dl is a narrow per-row size() (no shuffle),
    * only query-term tokens are exploded/shuffled, df pivots to one
    * broadcast row.
    */
  val qBm25Search: Q = (spark, dir) =>
    graft.operators.Search.bm25TopK(Tables(spark, dir, "documents"),
      "text", "doc_id", Bm25Terms,
      k1 = Bm25K1.toDouble, b = Bm25B.toDouble, k = Bm25TopK)

  private def bm25OracleWithK(k: Int): String = {
    import PipelineQueries.WS
    val in = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val tfCases = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"max(CASE WHEN term = '$t' THEN tf END) AS tf$i"
    }.mkString(",\n       |        ")
    val dfSubs = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"(SELECT df FROM df WHERE term = '$t') AS df$i"
    }.mkString(",\n       |        ")
    val (k1, b) = (Bm25K1, Bm25B)
    val scoreTerms = Bm25Terms.indices.map { i =>
      s"""(CASE WHEN tf$i IS NOT NULL THEN
         |    ((nd - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
         |    * (CAST(tf$i AS DOUBLE) * ($k1 + 1.0))
         |    / (CAST(tf$i AS DOUBLE) + $k1 * (1.0 - $b + $b * (CAST(dl AS DOUBLE) / avgdl)))
         |  ELSE 0.0 END)""".stripMargin
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $WS ws FROM documents),
       |d AS (SELECT doc_id, len(ws) AS dl FROM t),
       |s AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
       |        CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM d),
       |tok AS (SELECT doc_id, unnest(ws) AS term FROM t),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |       WHERE term IN ($in) GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |p AS (SELECT doc_id,
       |        $tfCases
       |      FROM tf GROUP BY 1),
       |f AS (SELECT p.doc_id, d.dl, p.* EXCLUDE (doc_id),
       |        $dfSubs,
       |        s.nd, s.avgdl
       |      FROM p JOIN d USING (doc_id) CROSS JOIN s)
       |SELECT doc_id, $scoreTerms AS score
       |FROM f
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  private val bm25Oracle: String = bm25OracleWithK(Bm25TopK)

  val RrfPoolK = 50
  val RrfK = "60"
  val RrfScale = "1000000"

  /** Hybrid-retrieval fusion: the BM25 keyword top-50 pool fused with a
    * document-length prior top-50 (stand-in for the vector ANN leg — same
    * (id, rank) contract [[graft.operators.Search.rrfFuse]] takes from any
    * ranking) by integer reciprocal-rank fusion. Both pools are TakeOrdered
    * (bounded) before any window touches them, so the rank assignment
    * windows run over ≤50 rows, and the fusion itself is O(pools).
    */
  val qRrfFusion: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val keyword = graft.operators.Search
      .bm25TopK(docs, "text", "doc_id", Bm25Terms,
        k1 = Bm25K1.toDouble, b = Bm25B.toDouble, k = RrfPoolK)
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).as("r"))
    val length = docs
      .orderBy(col("n_chars").desc, col("doc_id")).limit(RrfPoolK)
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(col("n_chars").desc, col("doc_id"))).as("r"))
    graft.operators.Search.rrfFuse(Seq(keyword, length), "doc_id",
      kConst = RrfK.toLong, scale = RrfScale.toLong, topK = 20)
  }

  private val rrfFusionOracle: String =
    s"""WITH ra AS (SELECT doc_id,
       |        row_number() OVER (ORDER BY score DESC, doc_id) AS r
       |      FROM (${bm25OracleWithK(RrfPoolK)})),
       |rb AS (SELECT doc_id,
       |        row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
       |      FROM (SELECT doc_id, n_chars FROM documents
       |            ORDER BY n_chars DESC, doc_id LIMIT $RrfPoolK)),
       |u AS (SELECT doc_id, $RrfScale // ($RrfK + r) AS c FROM ra
       |      UNION ALL
       |      SELECT doc_id, $RrfScale // ($RrfK + r) AS c FROM rb)
       |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS rrf_score
       |FROM u GROUP BY 1
       |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin

  val OovVocabSize = 16

  /** Vocabulary construction + out-of-vocabulary rate: the tokenizer-prep
    * signal (docs with high OOV against the top-V corpus vocabulary are
    * noise or wrong-domain). Vocabulary = top-$OovVocabSize terms by
    * global count, total tie-break (count desc, term asc). Scale shape:
    * the frequency table is vocabulary-bounded and broadcast back; one
    * shuffle on doc_id.
    */
  val qVocabOov: Q = (spark, dir) => {
    val tok = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
    val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("gc"))
      .orderBy(col("gc").desc, col("term"))
      .limit(OovVocabSize)
      .select(col("term"), lit(1).as("_inv"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_frac"))
      .orderBy(col("doc_id"))
  }

  private val vocabOovOracle: String = {
    import PipelineQueries.WS
    s"""WITH tok AS (SELECT doc_id, unnest($WS) AS term FROM documents),
       |gf AS (SELECT term, count(*) AS gc FROM tok GROUP BY 1),
       |vocab AS (SELECT term FROM gf ORDER BY gc DESC, term LIMIT $OovVocabSize)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) AS oov_frac
       |FROM tok LEFT JOIN vocab v ON tok.term = v.term
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Target size of the temperature-mixed sample (docs across all
    * sources); τ is fixed at 0.5 so the weight is an exact `floor(sqrt(n))`
    * — IEEE sqrt is correctly rounded on every engine, making the quota
    * arithmetic (integer multiply + integer div) bit-identical between
    * Spark and the oracle with no libm exposure.
    */
  val TempMixTarget = 200L

  /** Temperature-based source mixing — the standard rebalancing step of
    * multilingual/multi-source pretraining (sample source s with
    * probability ∝ n_s^τ, τ < 1, so small sources are up-weighted relative
    * to their share): each source gets quota = TempMixTarget·√n_s / Σ√n_t
    * docs, and WHICH docs fill the quota is decided by the shared md5
    * doc_id hash — a deterministic "random" that is stable across runs,
    * engines, and partitionings.
    *
    * Scale shape: per-source counts are one partial+final aggregate; the
    * quota table is |sources| rows, broadcast back; per-source selection is
    * one hash-partitioned window (rank by hash within source). At 100 TB
    * with quota ≪ n_s, replace the full per-source sort with a two-pass
    * threshold probe (sample the hash distribution, keep rows below the
    * estimated quota-th hash, exact-rank only the survivors) — same
    * result, no global sort; the window form is exact and fine while
    * per-source rows fit a partition sort.
    */
  val qTemperatureMix: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val weights = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("f", expr("cast(floor(sqrt(cast(n_docs as double))) as bigint)"))
    // Σf via a 1-row aggregate cross-joined back (|sources| rows on both
    // sides — no single-partition window, no warning at any source count)
    val quotas = weights.crossJoin(weights.agg(sum(col("f")).as("tot_f")))
      .withColumn("quota",
        least(expr(s"($TempMixTarget * f) div tot_f"), col("n_docs")))
      .select(col("source"), col("quota"))
    val ranked = docs.select(col("source"), col("doc_id"),
        graft.operators.Shingles.hash60(col("doc_id").cast("string")).as("hk"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))))
    ranked.join(broadcast(quotas), Seq("source"))
      .filter(col("rk") <= col("quota"))
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** The 100 TB sibling of [[qTemperatureMix]] — threshold selection
    * instead of a full per-source sort (the scale path the window form's
    * scaladoc promises). The selection key hk = md5-hash60(doc_id) is
    * uniform on [0, 2^60), so the quota-th smallest hash of a source with
    * n docs concentrates at quota/n · 2^60: keep only rows with
    * hk ≤ (quota + m)/n · 2^60 — a broadcast-filtered SCAN, no shuffle of
    * the corpus — then exact-rank just the ~quota survivors per source.
    * The margin m = 50 + 6·⌈√quota⌉ puts the miss probability below
    * exp(−m²/2(quota+m)) ≈ 1e−8 per source (Chernoff lower tail), and a
    * miss is LOUD, not a silent undercount: `assert_true` fails the job if
    * any source's survivor count lands under its quota (rerun with a wider
    * margin; the window form is the exact fallback). Result is
    * bit-identical to the window form whenever the guard passes: the
    * survivor set is a prefix of the same (hk, doc_id) order the window
    * form ranks by, and the final row_number re-ranks it exactly.
    *
    * Work: one partial+final count per source (quota table, broadcast
    * back), one scan with a scan-local filter keeping ~Σ(quota+m) rows,
    * one window over those survivors only. The full-corpus sort the window
    * form pays — the dominant cost when quota ≪ n_s — never happens.
    */
  def temperatureMixThresholdSelect(docs: DataFrame, target: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weights = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("f", expr("cast(floor(sqrt(cast(n_docs as double))) as bigint)"))
    val quotas = weights.crossJoin(weights.agg(sum(col("f")).as("tot_f")))
      .withColumn("quota",
        least(expr(s"($target * f) div tot_f"), col("n_docs")))
      .withColumn("m",
        expr("50L + 6L * cast(ceil(sqrt(cast(quota as double))) as bigint)"))
      .withColumn("thr", expr(
        // 2^60 − 1 (keep everything) when the padded quota reaches n;
        // double arithmetic is safe: the margin swamps the ulp error
        """case when quota + m >= n_docs then 1152921504606846975L
          |else cast((cast(quota + m as double) / cast(n_docs as double))
          |          * 1152921504606846976.0 as bigint) end""".stripMargin))
      .select(col("source"), col("quota"), col("thr"))
    val surv = docs.select(col("source"), col("doc_id"),
        graft.operators.Shingles.hash60(col("doc_id").cast("string")).as("hk"))
      .join(broadcast(quotas), Seq("source"))
      .filter(col("hk") <= col("thr"))
    surv
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("hk"), col("doc_id"))))
      .withColumn("n_surv",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      // evaluated via the filter so the optimizer cannot prune the guard
      .filter(assert_true(col("n_surv") >= col("quota"),
        lit("temperature-mix threshold missed a quota — widen the margin " +
          "or use the exact window form")).isNull)
      .filter(col("rk") <= col("quota"))
      .select(col("source"), col("doc_id"))
  }

  private val temperatureMixOracle: String = {
    val h = PipelineQueries.h60("CAST(doc_id AS VARCHAR)")
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |w AS (SELECT source, n_docs,
       |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS f
       |      FROM c),
       |t AS (SELECT SUM(f) AS tot_f FROM w),
       |q AS (SELECT source, least(($TempMixTarget * f) // tot_f, n_docs)
       |        AS quota FROM w, t),
       |r AS (SELECT source, doc_id, row_number() OVER (
       |        PARTITION BY source ORDER BY $h, doc_id) AS rk
       |      FROM documents)
       |SELECT r.source, r.doc_id FROM r JOIN q USING (source)
       |WHERE rk <= quota ORDER BY source, doc_id""".stripMargin
  }

  /** Per-doc novelty: the fraction of a doc's distinct shingles it is the
    * FIRST (lowest doc_id) to contribute to the corpus — the
    * redundancy/novelty curation signal: boilerplate-heavy docs score near
    * 0, genuinely new content near 1. One shingle-postings pass, a min
    * aggregate per shingle hash, a co-partitioned join back (both sides
    * hash-partitioned on h by the preceding aggregate), and a per-doc
    * count — every shuffle is bounded by the postings, never all-pairs.
    * At 100 TB the first-seen table IS the incremental novelty index:
    * min(doc_id) merges associatively across corpus deltas.
    */
  val qNoveltyScores: Q = (spark, dir) => {
    val postings = Dedup.shingleHashes(Tables(spark, dir, "documents"),
      "text", "doc_id")
    val firstSeen = postings.groupBy(col("h"))
      .agg(min(col("doc_id")).as("first_id"))
    postings.join(firstSeen, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty_frac"))
      .orderBy(col("doc_id"))
  }

  private val noveltyScoresOracle: String = {
    import PipelineQueries.WS
    val h60 = PipelineQueries.h60("s")
    s"""WITH t AS (SELECT doc_id, $WS ws FROM documents),
       |sh AS (SELECT doc_id, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) s
       |       FROM t, UNNEST(range(1, greatest(len(ws)-2, 1)+1)) AS u(i)),
       |post AS (SELECT DISTINCT doc_id, $h60 % 2147483647 AS h FROM sh),
       |fs AS (SELECT h, min(doc_id) AS first_id FROM post GROUP BY 1)
       |SELECT p.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN fs.first_id = p.doc_id THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_novel,
       |  CAST(sum(CASE WHEN fs.first_id = p.doc_id THEN 1 ELSE 0 END)
       |       AS DOUBLE) / count(*) AS novelty_frac
       |FROM post p JOIN fs USING (h)
       |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q_novelty_scores" -> qNoveltyScores,
    "q_temperature_mix" -> qTemperatureMix,
    "q_bm25_search" -> qBm25Search,
    "q_rrf_fusion" -> qRrfFusion,
    "q_lang_gini" -> qLangGini,
    "q_vocab_oov" -> qVocabOov,
    "q_token_commonality" -> qTokenCommonality,
    "q_repetition_signals" -> qRepetitionSignals,
    "q_dsir_importance" -> qDsirImportance,
    "q_tfidf_top_terms" -> qTfidfTopTerms,
    "q_source_overlap" -> qSourceOverlap,
    "q_shared_windows" -> qSharedWindows,
    "q_ngram_decontaminate" -> qNgramDecontaminate
  )

  val oracles: Map[String, String] = Map(
    "q_novelty_scores" -> noveltyScoresOracle,
    "q_temperature_mix" -> temperatureMixOracle,
    "q_bm25_search" -> bm25Oracle,
    "q_rrf_fusion" -> rrfFusionOracle,
    "q_lang_gini" -> langGiniOracle,
    "q_vocab_oov" -> vocabOovOracle,
    "q_token_commonality" -> tokenCommonalityOracle,
    "q_repetition_signals" -> repetitionOracle,
    "q_dsir_importance" -> dsirImportanceOracle,
    "q_tfidf_top_terms" -> tfidfOracle,
    "q_source_overlap" -> sourceOverlapOracle,
    "q_shared_windows" -> sharedWindowsOracle,
    "q_ngram_decontaminate" -> ngramDecontaminateOracle
  )
}
