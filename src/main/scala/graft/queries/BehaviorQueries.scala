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

  val all: Map[String, Q] = Map(
    "q_fuzzy_names" -> qFuzzyNames,
    "q_funnel" -> qFunnel,
    "q_cohort_retention" -> qCohortRetention
  )

  val oracles: Map[String, String] = Map(
    "q_fuzzy_names" -> fuzzyNamesOracle,
    "q_funnel" -> funnelOracle,
    "q_cohort_retention" -> cohortRetentionOracle
  )
}
