package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CmsSketch
import graft.operators.Dedup

/** Round-3 sketch + corpus-statistics batch: bloom-accelerated
  * decontamination (exact results), Count-Min frequency sketches
  * (contract-checked like the HLL/KMV distincts), global n-gram counts,
  * and int8 embedding quantization — each a first-class 100 TB pipeline
  * operation with a DuckDB oracle.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Bloom-filter decontamination: same OUTPUT contract as q_decontaminate
    * (exact removal of holdout-leaked documents) but the scale plan — bloom
    * scan-filter + tiny verify join — instead of a full-corpus shuffle join.
    * The oracle is the plain NOT IN formulation: hash-equality proves the
    * bloom fast path is semantics-preserving.
    */
  val qBloomDecontaminate: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val test = docs.filter(col("doc_id") % 7 === 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    Dedup.bloomDecontaminate(train, test, "text", expectedTestItems = 100000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy(col("source"))
  }

  private val bloomDecontaminateOracle: String = {
    val norm = PipelineQueries.NORM
    s"""WITH f AS (SELECT doc_id, source, n_chars, md5($norm) AS fp FROM documents),
       |test AS (SELECT DISTINCT fp FROM f WHERE doc_id % 7 = 0)
       |SELECT source, count(*) AS n_train_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM f WHERE doc_id % 7 <> 0 AND fp NOT IN (SELECT fp FROM test)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** CMS depth/width for the frequency query: slack = e·N/width per probe,
    * failure prob (1/e)^depth per (group, probe) — deterministic for fixed
    * data, so a local pass reproduces exactly in the gate.
    */
  val CmsDepth = 5
  val CmsWidth = 2048
  private val CmsProbeKeys = Seq(1L, 2L, 3L, 4L, 5L, 6L)

  /** Count-Min frequency estimates next to exact counts, reduced to the
    * sketch CONTRACT (est ≥ exact, est ≤ exact + e·N/width) as booleans the
    * oracle emits as literal TRUE — the same within-tolerance pattern as
    * q_approx_distinct. The sketch column itself is the deliverable at
    * scale: constant-size per group, mergeable across partitions/days.
    */
  val qCmsFreq: Q = (spark, dir) => {
    val exacts = CmsProbeKeys.map(k =>
      sum(when(col("l_partkey") === k, 1L).otherwise(0L)).as(s"exact_$k"))
    val aggs = CmsSketch.cmsSketch(col("l_partkey"), CmsDepth, CmsWidth)
      .as("sk") +: count(lit(1)).as("n_items") +: exacts
    val slack = lit(math.E / CmsWidth) * col("n_items")
    val checks = CmsProbeKeys.map { k =>
      val est = CmsSketch.cmsEstimate(col("sk"), lit(k))
      (est >= col(s"exact_$k") &&
        est <= col(s"exact_$k") + slack).as(s"ok_$k")
    }
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("l_returnflag") +: col("n_items") +:
        (CmsProbeKeys.map(k => col(s"exact_$k")) ++ checks): _*)
      .orderBy(col("l_returnflag"))
  }

  private val cmsFreqOracle: String = {
    val exacts = CmsProbeKeys.map(k =>
      s"CAST(sum(CASE WHEN l_partkey = $k THEN 1 ELSE 0 END) AS BIGINT) AS exact_$k")
    val oks = CmsProbeKeys.map(k => s"TRUE AS ok_$k")
    s"""SELECT l_returnflag, count(*) AS n_items,
       |  ${(exacts ++ oks).mkString(",\n  ")}
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** Global corpus bigram frequencies, top-20 with a total-order tie-break —
    * the building block of n-gram LM stats and stop-phrase mining. One
    * codegen'd shingle pass + one count shuffle; the top-k is a bounded
    * sort. At 100 TB the groupBy count is partial-aggregated map-side, so
    * the shuffle carries one row per DISTINCT bigram per partition.
    */
  val qBigramCounts: Q = (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(explode(graft.functions.WordShingles.wordShingles(col("text"), 2))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  private val bigramCountsOracle: String =
    s"""WITH t AS (SELECT ${PipelineQueries.WS} ws FROM documents),
       |bg AS (SELECT concat_ws(' ', ws[i], ws[i+1]) AS bigram
       |       FROM t, UNNEST(range(1, greatest(len(ws)-1, 1)+1)) AS u(i))
       |SELECT bigram, count(*) AS n FROM bg
       |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  /** Int8 scalar quantization of embeddings (the 4× storage cut every
    * 100 TB vector corpus takes before ANN): per-vector [min, max] range
    * mapped to 0..255 via exact floor arithmetic. Quantized codes are
    * integers — bit-exact across engines; reconstruction error is bounded
    * by (max−min)/255 BY CONSTRUCTION. Output flattened to scalar columns
    * (driver compare cannot hash arrays).
    */
  val qEmbeddingQuantize: Q = (spark, dir) => {
    val v = col("embedding").cast("array<double>")
    val mn = array_min(v)
    val mx = array_max(v)
    def qd(i: Int): Column =
      when(mx === mn, 0L)
        .otherwise(floor(((element_at(v, i + 1) - mn) * lit(255.0)) / (mx - mn)))
        .as(s"q$i")
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), size(v).as("dim"),
        mn.as("v_min"), mx.as("v_max"),
        qd(0), qd(1), qd(2), qd(3))
      .orderBy(col("vec_id"))
  }

  private val embeddingQuantizeOracle: String = {
    def qd(i: Int) =
      s"""CASE WHEN mx = mn THEN 0 ELSE
         |    CAST(floor((CAST(embedding[${i + 1}] AS DOUBLE) - mn) * 255.0 /
         |               (mx - mn)) AS BIGINT) END AS q$i""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding,
       |  CAST(list_min(embedding) AS DOUBLE) AS mn,
       |  CAST(list_max(embedding) AS DOUBLE) AS mx FROM embeddings)
       |SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
       |  mn AS v_min, mx AS v_max,
       |  ${(0 until 4).map(qd).mkString(",\n  ")}
       |FROM e ORDER BY vec_id""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q_bloom_decontaminate" -> qBloomDecontaminate,
    "q_cms_freq" -> qCmsFreq,
    "q_bigram_counts" -> qBigramCounts,
    "q_embedding_quantize" -> qEmbeddingQuantize
  )

  val oracles: Map[String, String] = Map(
    "q_bloom_decontaminate" -> bloomDecontaminateOracle,
    "q_cms_freq" -> cmsFreqOracle,
    "q_bigram_counts" -> bigramCountsOracle,
    "q_embedding_quantize" -> embeddingQuantizeOracle
  )
}
