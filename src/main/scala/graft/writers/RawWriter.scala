package graft.writers

import org.apache.spark.sql.{DataFrame, SaveMode}

/** RAW-zone sink: append-only partitioned Parquet.
  *
  * Mirrors the reference's `write_raw`
  * (metadata_ingestion/src/ingestion_framework/writer.py:9-16):
  * `mode("append").partitionBy(partitions).parquet(path)` with the default
  * partition column `ingest_date` supplied by the catalog. Append-only is
  * intentional (RAW is the audit log; re-runs duplicate, README.md:161).
  *
  * Scale note: the partition column is a single per-run date literal, so one
  * run lands in exactly one partition directory; downstream readers get
  * directory-level partition pruning on `ingest_date` for free.
  */
object RawWriter {
  def write(df: DataFrame, path: String, partitions: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Append)
    val partitioned = if (partitions.nonEmpty) w.partitionBy(partitions: _*) else w
    partitioned.parquet(path)
  }
}
