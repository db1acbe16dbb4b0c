package graft.queries

import graft.operators.{AsofJoin, RangeJoin, Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 operator extensions: time-ordered joins (as-of, range),
  * deterministic sampling, token chunking, PII scrubbing, heavy hitters,
  * exact percentiles. Same determinism contract as the other suites
  * (md5-derived hashing, decimal money sums, total ordering, shared
  * constants between impl and generated oracle SQL).
  */
object ExtendedQueries {

  type Q = (SparkSession, String) => DataFrame

  /** md5-prefix 60-bit hash (DuckDB side) — the ONE shared definition. */
  private def h60(s: String): String = PipelineQueries.h60(s)

  // ---------- as-of join ----------

  /** For each purchase event: the user's most recent click at or before the
    * purchase (inclusive as-of), with the purchase-click gap. Clicks are
    * pre-deduped to one row per (user, ts) so exact-tie resolution is
    * well-defined on both engines.
    */
  val qAsofJoin: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("value")).as("click_value"))
      .select(col("user_id"), col("click_ts"), col("click_value"))
    // wide variant: this left schema is 3 narrow columns, so the single
    // window pass beats asofJoinSlim's extra distinct + join-back (A/B'd
    // 0.70 vs 0.84 s at sf0.1); slim is for wide left payloads
    AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", "click_ts",
      Seq("click_ts", "click_value"))
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("purchase_s"),
        expr("unix_micros(click_ts) div 1000000").as("click_s"),
        expr("(unix_micros(ts) - unix_micros(click_ts)) div 1000000").as("gap_s"),
        col("click_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val asofJoinOracle: String =
    """WITH p AS (SELECT user_id, event_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts AS click_ts, max(value) AS click_value
      |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT p.user_id, p.event_id,
      |  (epoch_ns(p.ts) // 1000) // 1000000 AS purchase_s,
      |  (epoch_ns(c.click_ts) // 1000) // 1000000 AS click_s,
      |  ((epoch_ns(p.ts) // 1000) - (epoch_ns(c.click_ts) // 1000)) // 1000000
      |    AS gap_s,
      |  c.click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
      |ORDER BY p.user_id, p.event_id""".stripMargin

  // ---------- range join ----------

  val RangeBandWidth = 50.0
  val RangeNBands = 10
  val RangeBucketSize = 25.0

  /** Events bucketed into static value bands [band*50, (band+1)*50) via the
    * equi-join range-join rewrite, then aggregated per band.
    */
  val qRangeJoin: Q = (spark, dir) => {
    val bands = spark.range(RangeNBands.toLong).toDF("band")
      .select(col("band").cast("int").as("band"),
        (col("band") * RangeBandWidth).as("lo"),
        ((col("band") + 1) * RangeBandWidth).as("hi"))
    RangeJoin.bucketedRangeJoin(
      Tables(spark, dir, "events"), bands, "value", "lo", "hi", RangeBucketSize)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("band"))
  }

  private val rangeJoinOracle: String =
    s"""WITH bands AS (
       |  SELECT CAST(band AS INT) AS band,
       |    band * $RangeBandWidth AS lo, (band + 1) * $RangeBandWidth AS hi
       |  FROM range(0, $RangeNBands) t(band))
       |SELECT band, count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events JOIN bands ON value >= lo AND value < hi
       |GROUP BY band ORDER BY band""".stripMargin

  // ---------- PII scrubbing ----------

  /** Redaction over synthesized PII (the test corpus carries none): each
    * customer row becomes "<name> <user{key}@example.com> visit
    * https://ex.io/u/{key} call +1 555 {key%10000:04d}", then emails, URLs
    * and phone runs are scrubbed. Both engines build and scrub the identical
    * string, so the output hash-matches iff the scrubbing semantics do.
    */
  val qPiiScrub: Q = (spark, dir) => {
    val key = col("c_custkey")
    val text = concat(col("c_name"),
      lit(" <user"), key, lit("@example.com> visit https://ex.io/u/"), key,
      lit(" call +1 555 "), lpad(pmod(key, lit(10000)).cast("string"), 4, "0"))
    val (urls, emails, phones) = TextAnalysis.piiCounts(text)
    Tables(spark, dir, "customer")
      .select(key.as("c_custkey"),
        TextAnalysis.scrubPii(text).as("scrubbed"),
        urls.as("n_urls"), emails.as("n_emails"), phones.as("n_phones"))
      .orderBy(col("c_custkey"))
  }

  private val piiScrubOracle: String = {
    val text = "c_name || ' <user' || c_custkey || '@example.com> visit " +
      "https://ex.io/u/' || c_custkey || ' call +1 555 ' || " +
      "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
    // the shared patterns contain no single quotes; backslashes pass through
    // DuckDB single-quoted literals verbatim
    val url = TextAnalysis.UrlRe
    val email = TextAnalysis.EmailRe
    val phone = TextAnalysis.PhoneRe
    s"""WITH t AS (SELECT c_custkey, $text AS txt FROM customer),
       |s1 AS (SELECT c_custkey, txt,
       |         regexp_replace(txt, '$url', '<URL>', 'g') AS nu FROM t),
       |s2 AS (SELECT c_custkey, txt, nu,
       |         regexp_replace(nu, '$email', '<EMAIL>', 'g') AS ne FROM s1)
       |SELECT c_custkey,
       |  regexp_replace(ne, '$phone', '<PHONE>', 'g') AS scrubbed,
       |  CAST(len(regexp_extract_all(txt, '$url')) AS INT) AS n_urls,
       |  CAST(len(regexp_extract_all(nu, '$email')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(ne, '$phone')) AS INT) AS n_phones
       |FROM s2 ORDER BY c_custkey""".stripMargin
  }

  // ---------- token-window chunking ----------

  val ChunkSize = 32
  val ChunkStride = 24

  val qDocChunks: Q = (spark, dir) =>
    TextAnalysis.chunk(Tables(spark, dir, "documents"), "text", "doc_id",
      ChunkSize, ChunkStride)
      .orderBy(col("doc_id"), col("chunk_id"))

  private val docChunksOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') ws
       |           FROM documents),
       |c AS (SELECT doc_id, CAST(i AS INT) AS chunk_id,
       |        array_to_string(ws[i*$ChunkStride+1 : i*$ChunkStride+$ChunkSize], ' ') AS ct
       |      FROM t, UNNEST(range(0, ((len(ws)-1)//$ChunkStride)+1)) u(i))
       |SELECT doc_id, chunk_id,
       |  CAST(len(string_split(ct, ' ')) AS INT) AS chunk_tokens,
       |  md5(ct) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ---------- heavy hitters ----------

  val HeavyHittersK = 5

  val qHeavyHitters: Q = (spark, dir) =>
    Sampling.heavyHitters(Tables(spark, dir, "documents"), "text", "lang",
      HeavyHittersK)
      .select(col("lang"), col("token"), col("n"), col("rank"))
      .orderBy(col("lang"), col("rank"))

  private val heavyHittersOracle: String =
    s"""SELECT lang, token, n, CAST(rank AS INT) AS rank FROM (
       |  SELECT lang, token, count(*) AS n,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY count(*) DESC, token) AS rank
       |  FROM (SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |        FROM documents) t
       |  GROUP BY lang, token) r
       |WHERE rank <= $HeavyHittersK ORDER BY lang, rank""".stripMargin

  // ---------- exact percentiles ----------

  /** Exact continuous percentiles (p25/p50/p75) of order totalprice per
    * status. Spark `percentile` and DuckDB `quantile_cont` share the
    * pos = p·(n−1) linear-interpolation definition; results are rounded to
    * 4 decimals on both sides to absorb last-ulp double differences.
    */
  val qPercentiles: Q = (spark, dir) =>
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"))
      .orderBy(col("o_orderstatus"))

  private val percentilesOracle: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------- char-shingle near-dup (unsegmented scripts) ----------

  val CharNgramN = 5
  val CharJaccardThreshold = 0.7

  /** Tokenizer-free near-dup pairs over char 5-grams — the dedup path for
    * scripts with no word boundaries (the word-shingle pipeline sees a
    * spaceless CJK document as ONE token).
    *
    * Scoped to a deterministic 10% document slice: the synthetic corpus
    * draws from a ~30-word vocabulary, so its char 5-grams are shared by
    * nearly every document and the full postings self-join degenerates to
    * all-pairs (Σdf² ≈ |D|²·|doc|) — a pathology of the test data, not of
    * real unsegmented text, whose char-gram df distribution behaves like
    * word shingles. The slice keeps the operator oracle-checked at honest
    * cost; real corpora run unscoped (or via the prefix-filter variant).
    */
  val qCharJaccard: Q = (spark, dir) =>
    graft.operators.Dedup.charNgramJaccardPairs(
      Tables(spark, dir, "documents").filter(col("doc_id") % 10 === 0),
      "text", "doc_id", CharJaccardThreshold, CharNgramN)
      .orderBy(col("id_a"), col("id_b"))

  private val charJaccardOracle: String = {
    val norm = PipelineQueries.NORM
    s"""WITH t AS (SELECT doc_id, $norm AS nt FROM documents
       |           WHERE doc_id % 10 = 0),
       |sh AS (SELECT doc_id, substring(nt, i, $CharNgramN) AS s
       |       FROM t, UNNEST(range(1, greatest(length(nt) - ${CharNgramN - 1}, 1) + 1)) u(i)),
       |post AS (SELECT DISTINCT doc_id, ${h60("s")} % 2147483647 AS h FROM sh),
       |${PipelineQueries.jaccardSelect}
       |SELECT id_a, id_b, jaccard FROM jacc
       |WHERE jaccard >= $CharJaccardThreshold ORDER BY id_a, id_b""".stripMargin
  }

  // ---------- decontamination ----------

  /** Benchmark-leakage removal: hold out every 10th doc (deterministic) as
    * the "eval set", decontaminate the rest against it by content
    * fingerprint, and summarize what survives per language. The planted
    * near-identical docs in the corpus make the removal non-trivial.
    */
  val qDecontaminate: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val test = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    graft.operators.Dedup.crossDedup(train, test, "text")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_train_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy(col("lang"))
  }

  private val decontaminateOracle: String = {
    val norm = PipelineQueries.NORM
    s"""WITH f AS (SELECT doc_id, lang, n_chars, md5($norm) AS fp FROM documents),
       |test AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 = 0)
       |SELECT lang, count(*) AS n_train_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM f WHERE doc_id % 10 <> 0 AND fp NOT IN (SELECT fp FROM test)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------- grouping sets (SQL entry path) ----------

  /** GROUPING SETS via the SQL front end (the DSL only exposes cube/rollup):
    * per-(lang), per-(source), and grand-total document counts in ONE scan —
    * Catalyst expands to a single Expand + aggregate, not three scans.
    */
  val qGroupingSets: Q = (spark, dir) => {
    Tables(spark, dir, "documents").createOrReplaceTempView("gs_documents")
    spark.sql(
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM gs_documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin)
  }

  private val groupingSetsOracle: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY GROUPING SETS ((lang), (source), ())
      |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin

  // ---------- recursive CTE (SQL entry path, Spark 4's WITH RECURSIVE) ----------

  /** Hierarchy traversal via WITH RECURSIVE (new SQL surface in Spark 4):
    * walk the synthetic parent = ⌊id/2⌋ binary hierarchy from every
    * document to the root and histogram the depths — the org-chart /
    * BOM-explosion / category-tree verb in ONE declarative statement.
    * Catalyst plans the fixpoint loop itself (UnionLoop), no driver-side
    * iteration; both engines execute the IDENTICAL SQL text, so the hash
    * match proves the recursion semantics agree (termination row sets,
    * truncating integer division, depth arithmetic).
    */
  private def recursiveDepthSql(table: String): String =
    s"""WITH RECURSIVE anc(doc_id, anc_id, depth) AS (
       |  SELECT doc_id, doc_id, 0 FROM $table
       |  UNION ALL
       |  -- floor() then cast: DuckDB's double->BIGINT cast ROUNDS while
       |  -- Spark's truncates, so a bare CAST(x/2) walks different parents
       |  SELECT doc_id, CAST(floor(anc_id / 2) AS BIGINT), depth + 1
       |  FROM anc WHERE anc_id > 0),
       |d AS (SELECT doc_id, max(depth) AS depth FROM anc GROUP BY doc_id)
       |SELECT CAST(depth AS BIGINT) AS depth,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM d GROUP BY depth ORDER BY depth""".stripMargin

  val qRecursiveDepth: Q = (spark, dir) => {
    Tables(spark, dir, "documents").createOrReplaceTempView("rc_documents")
    spark.sql(recursiveDepthSql("rc_documents"))
  }

  private val recursiveDepthOracle: String = recursiveDepthSql("documents")

  // ---------- LATERAL join (SQL entry path) ----------

  /** Correlated LATERAL derived table with ORDER BY + LIMIT — the
    * per-group top-k expressed as a lateral join instead of a window
    * (Catalyst decorrelates the inner query; DuckDB executes the same
    * text). Ties break on doc_id so both engines pick identical rows.
    */
  private def lateralTopkSql(table: String): String =
    s"""SELECT s.source, l.doc_id, l.n_chars
       |FROM (SELECT DISTINCT source FROM $table) s,
       |LATERAL (SELECT doc_id, n_chars FROM $table d
       |         WHERE d.source = s.source
       |         ORDER BY n_chars DESC, doc_id LIMIT 2) l
       |ORDER BY s.source, l.n_chars DESC, l.doc_id""".stripMargin

  val qLateralTopk: Q = (spark, dir) => {
    Tables(spark, dir, "documents").createOrReplaceTempView("lt_documents")
    spark.sql(lateralTopkSql("lt_documents"))
  }

  private val lateralTopkOracle: String = lateralTopkSql("documents")

  // ---------- SQL pipe syntax (Spark 4 |> operator chain) ----------

  /** The same filter→aggregate→having→sort pipeline written in Spark 4's
    * SQL PIPE syntax (`|>` — each operator applies to the preceding
    * table). The oracle states the equivalent classic SQL: a hash match
    * proves the pipe chain desugars to identical semantics.
    */
  val PipeMinClicks = 5L

  val qPipeSyntax: Q = (spark, dir) => {
    Tables(spark, dir, "events").createOrReplaceTempView("pipe_events")
    spark.sql(
      s"""FROM pipe_events
         ||> WHERE event_type = 'click'
         ||> AGGREGATE count(*) AS n_clicks,
         |     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |   GROUP BY user_id
         ||> WHERE n_clicks >= $PipeMinClicks
         ||> ORDER BY user_id""".stripMargin)
  }

  private val pipeSyntaxOracle: String =
    s"""SELECT user_id, count(*) AS n_clicks,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events WHERE event_type = 'click'
       |GROUP BY user_id HAVING count(*) >= $PipeMinClicks
       |ORDER BY user_id""".stripMargin

  // ---------- GROUP BY ALL / ORDER BY ALL ----------

  /** The DuckDB-originated GROUP BY ALL / ORDER BY ALL shorthand, adopted
    * by Spark 4 — identical SQL text on both engines; the hash match pins
    * the "every non-aggregate select item groups / every select item
    * orders" inference.
    */
  private def groupByAllSql(table: String): String =
    s"""SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM $table GROUP BY ALL ORDER BY ALL""".stripMargin

  val qGroupByAll: Q = (spark, dir) => {
    Tables(spark, dir, "documents").createOrReplaceTempView("gba_documents")
    spark.sql(groupByAllSql("gba_documents"))
  }

  private val groupByAllOracle: String = groupByAllSql("documents")

  // ---------- UNPIVOT (wide → long melt) ----------

  /** SQL UNPIVOT: melt a per-lang metrics row back into (lang, metric,
    * value) long form — the inverse of the pivot surface. The oracle
    * states the engine-agnostic UNION ALL melt, so the hash match proves
    * Spark's UNPIVOT (including column-name-as-label semantics) against
    * first principles rather than another engine's unpivot dialect.
    */
  val qUnpivot: Q = (spark, dir) => {
    Tables(spark, dir, "documents").createOrReplaceTempView("up_documents")
    spark.sql(
      """SELECT lang, metric, v FROM (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM up_documents GROUP BY lang)
        |UNPIVOT (v FOR metric IN (n_docs, sum_chars))
        |ORDER BY lang, metric""".stripMargin)
  }

  private val unpivotOracle: String =
    """WITH w AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |           FROM documents GROUP BY lang)
      |SELECT lang, 'n_docs' AS metric, n_docs AS v FROM w
      |UNION ALL
      |SELECT lang, 'sum_chars', sum_chars FROM w
      |ORDER BY lang, metric""".stripMargin

  // ---------- multiset set operations (INTERSECT ALL / EXCEPT ALL) ----------

  /** Bag-semantics set ops — INTERSECT ALL keeps min(m₁,m₂) copies per
    * value, EXCEPT ALL keeps m₁−m₂ — summarized as per-lang multiplicity
    * counts. Identical SQL text on both engines.
    */
  private def setOpsAllSql(table: String): String =
    s"""SELECT 'except_all' AS op, lang, CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT lang FROM $table WHERE doc_id % 2 = 0
       |      EXCEPT ALL
       |      SELECT lang FROM $table WHERE doc_id % 3 = 0)
       |GROUP BY lang
       |UNION ALL
       |SELECT 'intersect_all', lang, CAST(count(*) AS BIGINT)
       |FROM (SELECT lang FROM $table WHERE doc_id % 2 = 0
       |      INTERSECT ALL
       |      SELECT lang FROM $table WHERE doc_id % 3 = 0)
       |GROUP BY lang
       |ORDER BY op, lang""".stripMargin

  val qSetOpsAll: Q = (spark, dir) => {
    Tables(spark, dir, "documents").createOrReplaceTempView("soa_documents")
    spark.sql(setOpsAllSql("soa_documents"))
  }

  private val setOpsAllOracle: String = setOpsAllSql("documents")

  // ---------- VARIANT semi-structured type (Spark 4) ----------

  /** Semi-structured access through the VARIANT type (Spark 4's
    * open-schema column): `parse_json` once, typed `variant_get`
    * extraction, then a relational aggregate over the extracted field.
    * The oracle reads the same JSON with DuckDB's json functions — the
    * hash match pins the extraction semantics (typed cast, missing-field
    * null behavior via try_variant_get).
    */
  val qVariantExtract: Q = (spark, dir) => {
    Tables(spark, dir, "events").createOrReplaceTempView("var_events")
    // parse_json ONCE into a variant column, then typed gets — the
    // multi-use alias survives CollapseProject (non-cheap, >1 reference),
    // so each row parses once instead of once per aggregate
    spark.sql(
      """WITH v AS (SELECT event_type, parse_json(props) AS pv
        |           FROM var_events)
        |SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(variant_get(pv, '$.k', 'bigint')) AS BIGINT) AS sum_k,
        |  CAST(max(variant_get(pv, '$.k', 'bigint')) AS BIGINT) AS max_k,
        |  CAST(count(try_variant_get(pv, '$.missing', 'bigint'))
        |    AS BIGINT) AS n_missing_field
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  // ---------- string collations (Spark 4 COLLATE) ----------

  /** Case-insensitive semantics through Spark 4's collation system: a
    * mixed-case derivation of `source` is compared, distinct-counted, and
    * grouped under `COLLATE UTF8_LCASE`. Only collation-DETERMINISTIC
    * outputs are emitted (counts — never a group's representative string,
    * which is an arbitrary casing under CI equality). The oracle lowers
    * explicitly; a hash match proves the collated equality/distinct
    * semantics match byte-wise lowercasing on this ASCII domain.
    */
  val qCollation: Q = (spark, dir) => {
    Tables(spark, dir, "documents").createOrReplaceTempView("coll_documents")
    spark.sql(
      """WITH t AS (SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source)
        |                       ELSE source END AS src
        |           FROM coll_documents)
        |SELECT
        |  CAST(count(CASE WHEN src COLLATE UTF8_LCASE = 'SrC1' THEN 1 END)
        |    AS BIGINT) AS n_src1_ci,
        |  CAST(count(DISTINCT src COLLATE UTF8_LCASE) AS BIGINT)
        |    AS n_sources_ci,
        |  CAST(count(DISTINCT src) AS BIGINT) AS n_variants_cs
        |FROM t""".stripMargin)
  }

  private val collationOracle: String =
    """WITH t AS (SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source)
      |                       ELSE source END AS src
      |           FROM documents)
      |SELECT
      |  CAST(count(CASE WHEN lower(src) = lower('SrC1') THEN 1 END)
      |    AS BIGINT) AS n_src1_ci,
      |  CAST(count(DISTINCT lower(src)) AS BIGINT) AS n_sources_ci,
      |  CAST(count(DISTINCT src) AS BIGINT) AS n_variants_cs
      |FROM t""".stripMargin

  private val variantExtractOracle: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS sum_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS max_k,
      |  CAST(count(CAST(json_extract_string(props, '$.missing') AS BIGINT))
      |    AS BIGINT) AS n_missing_field
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  private val PivotLangs = Seq("de", "en", "es", "fr", "zh")

  /** PIVOT surface: doc counts per source spread across one column per
    * language (fixed value list → deterministic schema; absent combos
    * coalesce to 0 to match SQL conditional-count semantics).
    */
  val qPivotLangs: Q = (spark, dir) =>
    Tables(spark, dir, "documents")
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      .select(col("source") +:
        PivotLangs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
      .orderBy(col("source"))

  private val pivotLangsOracle: String = {
    val cols = PivotLangs.map(l =>
      s"CAST(count(CASE WHEN lang = '$l' THEN 1 END) AS BIGINT) AS $l")
      .mkString(",\n      |  ")
    s"""SELECT source,
      |  $cols
      |FROM documents GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------- statistical moments (exact-decimal formulation) ----------

  /** Pearson correlation + sample stddev per group WITHOUT the built-in
    * corr/stddev (whose streaming co-moment accumulation is order-dependent
    * in double): exact decimal sums combined once per group in double —
    * bit-reproducible on both engines at any parallelism, and the right
    * 100 TB formulation (five map-side-combinable sums in one pass).
    *
    * Determinism detail: the sums run over INTEGER-VALUED scale-0 decimals
    * X = 100*quantity, Y = 100*price. corr is affine-invariant so
    * corr(X,Y) = corr(x,y) exactly, and stddev just rescales by /100.
    * Scale-0 matters: casting a scaled decimal to double divides the
    * backing integer by 10^scale in DuckDB (a SECOND rounding once the
    * integer exceeds 2^53) while Spark converts exactly — at scale 0 both
    * engines round once, identically, at every SF.
    */
  val qStatsMoments: Q = (spark, dir) => {
    val x = round(col("l_quantity") * 100).cast("decimal(38,0)")
    val y = round(col("l_extendedprice") * 100).cast("decimal(38,0)")
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / col("n")) /
          (sqrt(col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n")) *
            sqrt(col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / col("n"))))
          .as("corr_qty_price"),
        (sqrt((col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n")) /
          (col("n") - 1)) / 100.0).as("stddev_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val statsMomentsOracle: String =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS sy,
      |    sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0)) * CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS sxy,
      |    sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0)) * CAST(round(l_quantity * 100) AS DECIMAL(38,0))) AS sxx,
      |    sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) * CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
      |    (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
      |      sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)))
      |    AS corr_qty_price,
      |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
      |    / (n - 1)) / 100.0 AS stddev_qty
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** Per-type z-score outlier counts over the event stream — the
    * data-quality "flag anomalous measurements" op. Mean and σ are derived
    * from EXACT decimal sums (the qStatsMoments technique: X = round(100·v)
    * at decimal scale 0), so the per-row |X−μ| > 2σ comparison uses doubles
    * every engine computes identically — a boundary row can never flip on
    * accumulation order.
    *
    * Scale shape: one grouped-aggregate pass for the moments (bounded by
    * |event_type|, broadcast back), one scan pass for the flag counts.
    */
  val qOutliers: Q = (spark, dir) => {
    val x = round(col("value") * 100).cast("decimal(38,0)")
    val events = Tables(spark, dir, "events")
    val stats = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(x * x).as("sxx"))
      .select(col("event_type"), col("n"),
        (col("sx").cast("double") / col("n")).as("mean_x"),
        sqrt((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n")) /
          (col("n") - 1)).as("sd_x"))
    events.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs(x.cast("double") - col("mean_x")) >
          lit(2.0) * col("sd_x"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  private val outliersOracle: String =
    """WITH s AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(round(value * 100) AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(round(value * 100) AS DECIMAL(38,0)) *
      |        CAST(round(value * 100) AS DECIMAL(38,0))) AS sxx
      |  FROM events GROUP BY event_type),
      |m AS (
      |  SELECT event_type, n, CAST(sx AS DOUBLE) / n AS mean_x,
      |    sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
      |      / (n - 1)) AS sd_x
      |  FROM s)
      |SELECT e.event_type, count(*) AS n_events,
      |  CAST(sum(CASE WHEN abs(CAST(CAST(round(e.value * 100) AS DECIMAL(38,0)) AS DOUBLE)
      |                    - m.mean_x) > 2.0 * m.sd_x
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN m ON e.event_type = m.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  // ---------- stratified deterministic sampling ----------

  /** Per-status sampling permille: downsample the common 'F'/'O' strata,
    * keep half of the rare 'P' stratum — the class-rebalancing shape of a
    * training-mix build.
    */
  val SampleRates: Map[String, Int] = Map("F" -> 50, "O" -> 100, "P" -> 500)

  val qStratifiedSample: Q = (spark, dir) =>
    Sampling.stratifiedHashSample(Tables(spark, dir, "orders"),
      col("o_orderkey"), col("o_orderstatus"), SampleRates)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_totalprice"))
      .orderBy(col("o_orderstatus"))

  private val stratifiedSampleOracle: String = {
    val rate = SampleRates.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN o_orderstatus = '$k' THEN $v"
    }.mkString(" ")
    s"""SELECT o_orderstatus, count(*) AS n_sampled,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
       |FROM orders
       |WHERE ${h60("CAST(o_orderkey AS VARCHAR)")} % 1000 <
       |  (CASE $rate ELSE 0 END)
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  }

  // ---------- sequence packing ----------

  val PackMaxTokens = 200

  /** Documents packed into 200-token context windows per language shard;
    * summarized per (lang, pack).
    */
  val qDocPacking: Q = (spark, dir) =>
    TextAnalysis.packDocuments(Tables(spark, dir, "documents"),
      "text", "doc_id", "lang", PackMaxTokens)
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens"))
      .orderBy(col("lang"), col("pack_id"))

  private val docPackingOracle: String =
    s"""WITH t AS (SELECT lang, doc_id, len(${PipelineQueries.WS}) AS n
       |           FROM documents),
       |p AS (SELECT lang, doc_id, n,
       |        COALESCE(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          // $PackMaxTokens AS pack_id
       |      FROM t)
       |SELECT lang, CAST(pack_id AS BIGINT) AS pack_id, count(*) AS n_docs,
       |  CAST(sum(n) AS BIGINT) AS pack_tokens
       |FROM p GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin

  /** [[qDocPacking]] budgeted in REAL tokenizer tokens: per-doc BPE counts
    * from [[graft.operators.Bpe.tokenStats]] drive the pack boundaries
    * (`tokenCountCol`), the way production context packing budgets in
    * tokenizer tokens rather than whitespace words. Same shard-parallel
    * window; the tokenize pass is narrow and fuses with the scan.
    */
  val qPackBpe: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val counts = graft.operators.Bpe.tokenStats(docs, "text", "doc_id")
      .select(col("doc_id"), col("n_tokens_bpe"))
    TextAnalysis.packDocuments(docs.join(counts, Seq("doc_id")),
        "text", "doc_id", "lang", PackMaxTokens,
        tokenCountCol = Some("n_tokens_bpe"))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens"))
      .orderBy(col("lang"), col("pack_id"))
  }

  private val packBpeOracle: String = {
    val enc = graft.operators.Bpe.replaceChainSql("text")
    s"""WITH t AS (SELECT lang, doc_id,
       |             length(regexp_replace($enc, '\\s', '', 'g')) AS n FROM documents),
       |p AS (SELECT lang, doc_id, n,
       |        COALESCE(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          // $PackMaxTokens AS pack_id
       |      FROM t)
       |SELECT lang, CAST(pack_id AS BIGINT) AS pack_id, count(*) AS n_docs,
       |  CAST(sum(n) AS BIGINT) AS pack_tokens
       |FROM p GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin
  }

  // ---------- flagship composite: training-mix build ----------

  val MixQualityThreshold = 0.35
  val MixRates: Map[String, Int] =
    Map("en" -> 250, "es" -> 600, "fr" -> 600, "de" -> 600, "zh" -> 900)

  /** End-to-end training-data curation in one plan: exact dedup → quality
    * gate → per-language stratified downsampling (rebalance the en-heavy
    * corpus) → per-language summary. Every stage is a narrow projection or
    * a single hash shuffle; the whole pipeline is 2 shuffles (dedup window,
    * final groupBy) regardless of corpus size.
    */
  val qTrainingMix: Q = (spark, dir) => {
    val deduped = graft.operators.Dedup.exact(
      Tables(spark, dir, "documents"), "text", "doc_id")
    val scored = deduped
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .filter(col("quality") >= MixQualityThreshold)
    Sampling.stratifiedHashSample(scored, col("doc_id"), col("lang"), MixRates)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
      .orderBy(col("lang"))
  }

  private val trainingMixOracle: String = {
    import PipelineQueries.{NORM, WS, hits}
    val n = s"len($WS)"
    val stopRatio = s"(CAST(${hits(TextAnalysis.stopwordsEn)} AS DOUBLE) / CAST($n AS DOUBLE))"
    val avgLen = s"(CAST(length(trim(text)) - $n + 1 AS DOUBLE) / CAST($n AS DOUBLE))"
    val quality = s"least(CAST($n AS DOUBLE) / 100.0, 1.0) * 0.4 + " +
      s"$stopRatio * 0.3 + least($avgLen / 8.0, 1.0) * 0.3"
    val rate = MixRates.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN lang = '$k' THEN $v"
    }.mkString(" ")
    s"""WITH d AS (
       |  SELECT doc_id, lang, text FROM (
       |    SELECT doc_id, lang, text,
       |      row_number() OVER (PARTITION BY md5($NORM) ORDER BY doc_id) AS rn
       |    FROM documents) t
       |  WHERE rn = 1),
       |s AS (
       |  SELECT lang, $quality AS quality, $n AS n_tokens FROM d
       |  WHERE ($quality) >= $MixQualityThreshold
       |    AND ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < (CASE $rate ELSE 0 END))
       |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  min(quality) AS min_quality, max(quality) AS max_quality
       |FROM s GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------- registry ----------

  val all: Map[String, Q] = Map(
    "q_pivot_langs" -> qPivotLangs,
    "q_asof_join" -> qAsofJoin,
    "q_range_join" -> qRangeJoin,
    "q_pii_scrub" -> qPiiScrub,
    "q_doc_chunks" -> qDocChunks,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_percentiles" -> qPercentiles,
    "q_stratified_sample" -> qStratifiedSample,
    "q_doc_packing" -> qDocPacking,
    "q_pack_bpe" -> qPackBpe,
    "q_training_mix" -> qTrainingMix,
    "q_grouping_sets" -> qGroupingSets,
    "q_recursive_depth" -> qRecursiveDepth,
    "q_lateral_topk" -> qLateralTopk,
    "q_pipe_syntax" -> qPipeSyntax,
    "q_variant_extract" -> qVariantExtract,
    "q_collation" -> qCollation,
    "q_group_by_all" -> qGroupByAll,
    "q_unpivot" -> qUnpivot,
    "q_set_ops_all" -> qSetOpsAll,
    "q_stats_moments" -> qStatsMoments,
    "q_decontaminate" -> qDecontaminate,
    "q_char_jaccard" -> qCharJaccard,
    "q_outliers" -> qOutliers
  )

  val oracles: Map[String, String] = Map(
    "q_pivot_langs" -> pivotLangsOracle,
    "q_outliers" -> outliersOracle,
    "q_doc_packing" -> docPackingOracle,
    "q_pack_bpe" -> packBpeOracle,
    "q_training_mix" -> trainingMixOracle,
    "q_grouping_sets" -> groupingSetsOracle,
    "q_recursive_depth" -> recursiveDepthOracle,
    "q_lateral_topk" -> lateralTopkOracle,
    "q_pipe_syntax" -> pipeSyntaxOracle,
    "q_variant_extract" -> variantExtractOracle,
    "q_collation" -> collationOracle,
    "q_group_by_all" -> groupByAllOracle,
    "q_unpivot" -> unpivotOracle,
    "q_set_ops_all" -> setOpsAllOracle,
    "q_stats_moments" -> statsMomentsOracle,
    "q_decontaminate" -> decontaminateOracle,
    "q_char_jaccard" -> charJaccardOracle,
    "q_asof_join" -> asofJoinOracle,
    "q_range_join" -> rangeJoinOracle,
    "q_pii_scrub" -> piiScrubOracle,
    "q_doc_chunks" -> docChunksOracle,
    "q_heavy_hitters" -> heavyHittersOracle,
    "q_percentiles" -> percentilesOracle,
    "q_stratified_sample" -> stratifiedSampleOracle
  )
}
