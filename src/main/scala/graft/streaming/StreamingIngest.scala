package graft.streaming

import graft.writers.HubWriter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming extension of the ingestion engine.
  *
  * The reference plumbs `checkpoint_base` through every layer but never uses
  * it (SURVEY.md §2.9: sources.yaml:5 → config.py:10 → writer.py:18, then
  * dropped) — this module is the streaming engine that plumbing points at:
  *
  *   - [[hubUpsertStream]]: `readStream` → `foreachBatch(HubWriter.write)` —
  *     continuous keyed merge-upsert into the HUB zone with exactly-once
  *     progress tracked at `checkpointBase`;
  *   - [[windowedEventCounts]]: watermarked sliding-window aggregation over
  *     an event stream (the streaming twin of the batch `q_events_hourly`
  *     query — same groupBy shape, late data bounded by the watermark).
  *
  * Scale: state size is bounded by (watermark horizon × key cardinality);
  * the foreachBatch merge costs the same as the batch HubWriter per
  * micro-batch and inherits its partitioning.
  */
object StreamingIngest {

  /** Continuous HUB upsert: each micro-batch is merged with the same
    * last-writer-wins semantics as the batch writer.
    */
  def hubUpsertStream(
      stream: DataFrame,
      hubPath: String,
      keys: Seq[String],
      checkpointPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        HubWriter.write(batch.sparkSession, batch, hubPath, keys)
      }
      .start()

  /** Watermarked sliding-window count/sum per event type.
    * `ts` must be a TimestampType column.
    */
  def windowedEventCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      slideDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** File-source stream over a directory of parquet (schema required by
    * Structured Streaming file sources).
    */
  def parquetStream(spark: SparkSession, dir: String,
      schemaOf: DataFrame): DataFrame =
    spark.readStream.schema(schemaOf.schema).parquet(dir)
}
