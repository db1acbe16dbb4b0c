package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed grid and forward-fill observation gaps — the standard prep step
  * before windowed feature extraction on telemetry.
  *
  * Distributed shape at 100 TB: the per-bucket "latest observation" is a
  * partial-aggregable `max(struct(ts, tie, value))` (map-side combine; no
  * window over raw events), the grid explodes from one tiny per-key span
  * row, and the forward fill is a window over the GRID (rows = keys ×
  * buckets, orders of magnitude smaller than the raw stream).
  */
object TimeSeries {

  /** Resample to one row per (key, bucket) between each key's first and
    * last observed bucket, carrying the latest observation in the bucket
    * (ties on ts broken by `tieCol` — deterministic for unique tie ids)
    * and forward-filling buckets with no observation. `bucket` is a
    * date_trunc unit (e.g. "hour", "day").
    */
  def gapFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tieCol: String,
      bucket: String = "hour"
  ): DataFrame = {
    val bucketed = events.withColumn("_bucket",
      date_trunc(bucket, col(tsCol)))
    // latest observation per bucket: lexicographic struct max is a full
    // ordinary aggregate → partial+final, unlike a row_number window
    val obs = bucketed.groupBy(col(keyCol), col("_bucket"))
      .agg(max(struct(col(tsCol), col(tieCol), col(valueCol)))
        .getField(valueCol).as("_obs"))
    val span = obs.groupBy(col(keyCol))
      .agg(min(col("_bucket")).as("_b0"), max(col("_bucket")).as("_b1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("_b0"), col("_b1"),
        expr(s"interval 1 $bucket"))).as("_bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "_bucket"), "left")
      .select(col(keyCol), col("_bucket").as("bucket"),
        last(col("_obs"), ignoreNulls = true).over(w).as("filled_value"),
        col("_obs").isNull.as("is_gap"))
  }

  /** Rate-anomaly detection: flag buckets whose event count deviates more
    * than `sigma` standard deviations from the trailing `lookback`-bucket
    * mean (the monitoring primitive for ingest-volume regressions). The
    * test is the SQUARED comparison `(x − μ)² > σ²·var` — algebraically
    * the 3σ rule with no sqrt, so every value is rational arithmetic over
    * exact integer window sums (Σn, Σn², count) and reproduces
    * bit-identically across engines. Buckets with fewer than `minHistory`
    * trailing observations yield NULL (insufficient evidence), not false.
    *
    * Scale shape: one shuffle to the per-bucket counts, then a window over
    * the BUCKETED series (keys × buckets rows) — never over raw events.
    */
  def rateAnomalies(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      bucket: String = "hour",
      lookback: Int = 24,
      minHistory: Int = 8,
      sigma: Double = 3.0
  ): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"))
    val f = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    val s1 = sum(col("n_events")).over(f)
    val s2 = sum(col("n_events") * col("n_events")).over(f)
    val c = count(col("n_events")).over(f)
    val cD = c.cast("double")
    val mean = s1.cast("double") / cD
    val variance =
      (s2.cast("double") - s1.cast("double") * s1.cast("double") / cD) /
        (c - lit(1)).cast("double")
    val dev = col("n_events").cast("double") - mean
    hourly.select(col(keyCol), col("bucket"), col("n_events"),
      when(c >= minHistory,
        dev * dev > lit(sigma) * lit(sigma) * variance).as("is_anomaly"))
  }
}
