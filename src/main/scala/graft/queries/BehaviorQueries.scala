package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral / entity-resolution analytics: edit-distance fuzzy join,
  * event funnel, cohort retention. All three are exact (no sampling, no
  * transcendentals) so the DuckDB oracles hash-match bit-for-bit:
  * levenshtein is the classic DP on both engines, and the funnel/cohort
  * logic is min-timestamp joins + counts.
  */
object BehaviorQueries {

  type Q = (SparkSession, String) => DataFrame

  val FuzzyMaxDist = 2

  /** Edit-distance fuzzy self-join over distinct part names — the
    * entity-resolution verb (near-duplicate product/author/source names).
    *
    * Shape for scale: collapse to DISTINCT names first (the candidate
    * universe is the vocabulary, not the row count), then block on a
    * LOSSLESS necessary condition — |len(a) − len(b)| ≤ maxDist — realized
    * as an EQUI-join (probe side explodes its ±maxDist length band, index
    * side keys by exact length), then verify with exact levenshtein. No
    * cartesian anywhere; at web scale add a first-token block the same way.
    */
  val qFuzzyNames: Q = (spark, dir) => {
    val names = Tables(spark, dir, "part")
      .select(col("p_name").as("name")).distinct()
    val probe = names
      .withColumn("_band", explode(array(
        (-FuzzyMaxDist to FuzzyMaxDist).map(o => length(col("name")) + o): _*)))
      .select(col("name").as("name_a"), col("_band").as("_len"))
    val index = names
      .select(col("name").as("name_b"), length(col("name")).as("_len"))
    probe.join(index, Seq("_len"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= FuzzyMaxDist)
      .select(col("name_a"), col("name_b"), col("dist")).distinct()
      .orderBy(col("name_a"), col("name_b"))
  }

  private val fuzzyNamesOracle: String =
    s"""WITH n AS (SELECT DISTINCT p_name AS name FROM part)
       |SELECT a.name AS name_a, b.name AS name_b,
       |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
       |FROM n a JOIN n b ON a.name < b.name
       |WHERE levenshtein(a.name, b.name) <= $FuzzyMaxDist
       |ORDER BY name_a, name_b""".stripMargin

  /** Ordered three-stage event funnel (view → click → purchase): a user
    * advances a stage only with a strictly-later event. Three grouped
    * min-timestamp frames chained by equi-joins on user_id — each stage's
    * input shrinks, every join co-partitions on the same key (one shuffle
    * partitioning reused end-to-end).
    */
  val qFunnel: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    def stage(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"), col("ts"))
    val v = stage("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = stage("click").join(v, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = stage("purchase").join(c, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def cnt(df: DataFrame, as: String) =
      df.agg(count(lit(1)).cast("long").as(as))
    cnt(v, "n_view")
      .crossJoin(cnt(c, "n_view_click"))
      .crossJoin(cnt(p, "n_view_click_purchase"))
  }

  private val funnelOracle: String =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      |      WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      |      WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
      |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
      |  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase""".stripMargin

  /** Cohort retention matrix: users bucketed by first-event DAY, counted
    * once per (cohort day, activity day) — the test events span one month,
    * so day grain gives a real 30×30 matrix (swap "day" for "month" on a
    * longer horizon). The cohort frame is user-bounded (one row per user)
    * and joins the distinct activity frame on user_id — both sides
    * hash-partition on the same key; the output is bounded by days², not
    * events.
    */
  val qCohortRetention: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events")
    val cohort = ev.groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
    val activity = ev
      .select(col("user_id"), date_trunc("day", col("ts")).as("activity_day"))
      .distinct()
    cohort.join(activity, Seq("user_id"))
      .groupBy(col("cohort_day"), col("activity_day"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("activity_day"))
  }

  private val cohortRetentionOracle: String =
    """WITH f AS (SELECT user_id,
      |             CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
      |           FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id,
      |        CAST(date_trunc('day', ts) AS TIMESTAMP) AS activity_day
      |      FROM events)
      |SELECT cohort_day, activity_day, count(*) AS n_users
      |FROM f JOIN a ON f.user_id = a.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** SCD-2 (slowly-changing-dimension type 2) interval reconstruction from
    * an event log: collapse each user's event stream into validity
    * intervals [valid_from, valid_to) of their CURRENT event_type — the
    * state a temporal dimension table materializes. Consecutive equal
    * states merge (only CHANGES open an interval); the last interval per
    * user is open (null valid_to).
    *
    * Two window passes over one user-partitioned shuffle: lag() finds the
    * change points, lead() over the surviving rows closes each interval.
    * Ordering ties break on event_id (unique), so the reconstruction is
    * deterministic on both engines. Timestamps stay exact BIGINT micros
    * (epoch µs ≈ 1.7e15, comfortably inside the ±2^53 hash contract).
    * At 100 TB this is the shape that works: one shuffle by the dimension
    * key, per-key streams processed independently, no self-join.
    */
  val qScd2Intervals: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
      .withColumn("_prev", lag(col("event_type"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_type"))
  }

  private val scd2IntervalsOracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
      |             event_type FROM events),
      |c AS (SELECT *, lag(event_type) OVER (
      |        PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
      |ch AS (SELECT user_id, event_id, ts_us, event_type FROM c
      |       WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type, ts_us AS valid_from_us,
      |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
      |    AS valid_to_us
      |FROM ch ORDER BY user_id, valid_from_us, event_type""".stripMargin

  /** STREAMING SCD-2 equivalence, driver-visible: a real AvailableNow
    * micro-batch run of [[graft.streaming.StreamingIngest.scd2Stream]] over
    * the same event log must emit exactly the batch reconstruction's
    * CLOSED intervals (the per-user open tail lives in the state store,
    * not the output). The oracle is the batch SQL with `valid_to IS NOT
    * NULL` — so a hash match proves the stateful fold, its cross-batch
    * state carry, and the window formulation agree row for row.
    */
  val qStreamScd2Equiv: Q = (spark, dir) => {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingIngest
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_scd2")
      .toFile.getAbsolutePath
    val src = s"$tmp/src"
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
    // parallel write; AvailableNow with no per-trigger file cap still
    // delivers all files as one micro-batch (cross-batch state carry is
    // proven by StreamingSpec's multi-batch cases)
    ev.write.parquet(src)
    import spark.implicits._
    val stream = StreamingIngest.parquetStream(spark, src, ev)
      .as[StreamingIngest.Scd2Event]
    val q = StreamingIngest.scd2Stream(stream)
      .writeStream
      .format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$tmp/out")
      .select(col("user_id"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_type"))
  }

  private val streamScd2EquivOracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
      |             event_type FROM events),
      |c AS (SELECT *, lag(event_type) OVER (
      |        PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
      |ch AS (SELECT user_id, event_id, ts_us, event_type FROM c
      |       WHERE prev IS NULL OR prev <> event_type),
      |iv AS (SELECT user_id, event_type, ts_us AS valid_from_us,
      |         lead(ts_us) OVER (PARTITION BY user_id
      |           ORDER BY ts_us, event_id) AS valid_to_us
      |       FROM ch)
      |SELECT user_id, event_type, valid_from_us, valid_to_us FROM iv
      |WHERE valid_to_us IS NOT NULL
      |ORDER BY user_id, valid_from_us, event_type""".stripMargin

  val all: Map[String, Q] = Map(
    "q_fuzzy_names" -> qFuzzyNames,
    "q_funnel" -> qFunnel,
    "q_cohort_retention" -> qCohortRetention,
    "q_scd2_intervals" -> qScd2Intervals,
    "q_stream_scd2_equiv" -> qStreamScd2Equiv
  )

  val oracles: Map[String, String] = Map(
    "q_fuzzy_names" -> fuzzyNamesOracle,
    "q_funnel" -> funnelOracle,
    "q_cohort_retention" -> cohortRetentionOracle,
    "q_scd2_intervals" -> scd2IntervalsOracle,
    "q_stream_scd2_equiv" -> streamScd2EquivOracle
  )
}
