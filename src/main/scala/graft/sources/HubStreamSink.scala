package graft.sources

import graft.writers.VersionedHub

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink

/** Streaming SINK onto the versioned hub — the write-side parity piece of
  * [[HubStreamSource]]:
  *
  * {{{
  *   df.writeStream.format("graft-hub")
  *     .option("path", hub).option("keys", "k")
  *     .option("checkpointLocation", cp).start()
  * }}}
  *
  * Every micro-batch lands as ONE ACID merge-upsert version carrying the
  * engine's batchId, so an at-least-once replayed batch short-circuits on
  * its recorded id — exactly-once end to end without the foreachBatch
  * boilerplate the library paths use. `keys` (comma-separated) selects the
  * keyed merge; omitted, the batch appends (the keyless hub contract). A
  * bucketed hub routes through its recorded layout automatically
  * ([[VersionedHub.write]] dispatch).
  *
  * Append and Update output modes are accepted (both are the hub's upsert
  * semantics); Complete is refused — a hub version is a merge, not a
  * whole-table overwrite.
  */
class HubStreamSink(sqlContext: SQLContext, path: String,
    keys: Seq[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine's incremental frame cannot back multiple actions — pin it
    // to its computed RDD first (the ForeachBatchSink recipe), because the
    // merge runs several jobs over it
    val batch = org.apache.spark.sql.graftbridge.StreamingDF.toBatch(data)
    VersionedHub.write(batch.sparkSession, batch, path, keys,
      batchId = Some(batchId))
    ()
  }

  override def toString: String =
    s"HubStreamSink[$path${if (keys.nonEmpty) keys.mkString(" keys=", ",", "") else ""}]"
}
