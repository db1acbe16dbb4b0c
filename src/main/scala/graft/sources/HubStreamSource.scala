package graft.sources

import graft.writers.VersionedHub

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.types.StructType

/** Version offset of the hub streaming source — one offset per committed
  * manifest version, serialized into the streaming checkpoint.
  */
case class HubSourceOffset(version: Int) extends OffsetV1 {
  override def json: String = s"""{"version":$version}"""
}

object HubSourceOffset {
  private val JsonRe = """\{\s*"version"\s*:\s*(\d+)\s*\}""".r
  /** After a restart the engine hands back a SerializedOffset holding our
    * json — accept both forms.
    */
  def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Int =
    o match {
      case HubSourceOffset(v) => v
      case other => other.json match {
        case JsonRe(v) => v.toInt
        case j => throw new IllegalArgumentException(
          s"not a graft-hub offset: $j")
      }
    }
}

/** Streaming SOURCE over the versioned hub — the Delta streaming-source
  * parity piece: a downstream pipeline tails commits with
  *
  * {{{
  *   spark.readStream.format("graft-hub").option("path", hub).load()
  * }}}
  *
  * Offsets are manifest VERSIONS (checkpointed by the engine), and the
  * micro-batch for the version step (start, end] is the content AS OF
  * `end` of every data dir `end`'s manifest references that `start`'s did
  * not — O(changed buckets) per step thanks to the bucketed layout's
  * structural sharing, never O(hub). Replay of a committed range re-reads
  * the same manifests (time travel), so a crash-restarted query reproduces
  * its batch byte-for-byte: exactly-once end to end when the sink is
  * idempotent (e.g. the versioned hub's batchId commits).
  *
  * Delivery contract (Delta's `ignoreChanges` shape): a rewritten bucket
  * re-delivers ALL its current rows, not a row-level diff — consumers
  * upsert by the hub key (or dedupe) rather than blind-append; the
  * accumulated upsert over every batch equals the final snapshot exactly
  * (oracle-checked). A `fromVersion` whose manifest housekeeping has
  * vacuumed falls back to the full snapshot at `end` — a superset
  * re-delivery, safe under the same upsert contract.
  *
  * The declared schema is the hub's recorded snapshot schema at stream
  * start; later schema evolution is projected onto it (new columns ignored
  * until restart — Delta's contract too).
  *
  * CHANGE-FEED mode (`option("readChangeFeed", "true")` +
  * `option("keys", ...)` — Delta's `readChangeFeed` parity): micro-batches
  * carry row-level NET changes for the version step with a `_change_type`
  * column (insert | delete | update_preimage | update_postimage, from
  * [[VersionedHub.changesCDF]]); the catch-up batch is the start snapshot
  * as inserts. A delta-applying consumer reconstructs the exact snapshot
  * (oracle-checked).
  */
class HubStreamSource(sqlContext: SQLContext, path: String,
    cdfKeys: Option[Seq[String]] = None,
    maxVersionsPerTrigger: Option[Int] = None,
    /** Delta's `maxBytesPerTrigger`: one trigger admits versions past the
      * start only while their summed manifest byte counts (each commit's
      * `statsNew` bytes — recorded at write time, no file I/O) stay
      * within the cap, always admitting AT LEAST one version so a single
      * oversized commit (a compaction can be 100× a normal one) throttles
      * the stream without wedging it — Delta's soft-cap contract. Like
      * the version cap, it does not split the initial-snapshot catch-up
      * batch (one version's content, not a backlog). COMPOSES with
      * `maxVersionsPerTrigger` exactly like Delta's source: when both are
      * set, a trigger stops at whichever limit is reached first, so
      * drop-in configs that bound both clocks work unchanged.
      */
    maxBytesPerTrigger: Option[Long] = None,
    /** Delta's streaming `startingVersion`/`startingTimestamp` (the latter
      * pre-resolved by the provider): a FRESH stream starts at this
      * commit's CHANGES instead of the initial-snapshot catch-up batch —
      * the seed offset is `v - 1`, so the first micro-batch delivers the
      * v..latest step. Checkpoint offsets always win on resume.
      */
    startingVersion: Option[Int] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  private def spark = sqlContext.sparkSession

  /** Trigger.AvailableNow latches the target at start so the run drains
    * exactly the commits that existed then, in maxVersionsPerTrigger-sized
    * steps, and stops — the engine drives this through
    * [[SupportsTriggerAvailableNow]]/[[latestOffset]].
    */
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = VersionedHub.latest(spark, path).map(_.version)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): OffsetV2 =
    VersionedHub.latest(spark, path)
      .map(v => HubSourceOffset(v.version)).orNull

  /** Admission control: one trigger advances at most
    * `maxVersionsPerTrigger` versions past the engine-provided start — a
    * commit backlog drains in bounded steps instead of one unbounded
    * micro-batch. The FIRST batch of a fresh stream (start = null) still
    * delivers the whole catch-up snapshot: the snapshot is one version's
    * content, not a backlog.
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latest = VersionedHub.latest(spark, path).map(_.version).getOrElse(0)
    val bounded = availableNowTarget.fold(latest)(math.min(latest, _))
    val start = Option(startOffset).map(HubSourceOffset.versionOf)
      .getOrElse(seedStart)
    // both caps compose (Delta parity): the version cap bounds the walk,
    // the byte budget stops it early — whichever limit is reached first
    val vCapped = maxVersionsPerTrigger
      .fold(bounded)(m => math.min(bounded, start + m))
    val end = maxBytesPerTrigger match {
      case Some(cap) if start > 0 =>
        // admit versions while their summed commit bytes fit the cap;
        // the first one is unconditional (soft cap — progress guarantee)
        var v = start + 1
        var budget = cap - VersionedHub.commitBytes(spark, path, v)
        while (v < vCapped && {
          val next = VersionedHub.commitBytes(spark, path, v + 1)
          if (next <= budget) { budget -= next; true } else false
        }) v += 1
        math.min(vCapped, v)
      case _ if start > 0 => vCapped
      case _ => bounded
    }
    if (end <= start) startOffset else HubSourceOffset(end)
  }

  private val snapshotSchema: StructType =
    VersionedHub.snapshotSchema(spark, path,
      VersionedHub.versionAt(spark, path, None))

  private val declaredSchema: StructType =
    if (cdfKeys.isEmpty) snapshotSchema
    else StructType(snapshotSchema.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false))

  override def schema: StructType = declaredSchema

  // legacy V1 entry point; the engine prefers the admission-control
  // latestOffset above when SupportsAdmissionControl is present
  override def getOffset: Option[OffsetV1] =
    VersionedHub.latest(spark, path).map(v => HubSourceOffset(v.version))

  /** The implicit start of a FRESH stream (no checkpointed offset yet):
    * 0 = initial-snapshot catch-up; with `startingVersion` = v it is v-1,
    * so the first batch is the v..latest change step.
    */
  private def seedStart: Int = startingVersion.map(_ - 1).getOrElse(0)

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val endV = HubSourceOffset.versionOf(end)
    val startV = start.map(HubSourceOffset.versionOf).getOrElse(seedStart)
    val batch = cdfKeys match {
      case None => VersionedHub.changedDirsRead(spark, path, startV, endV)
      case Some(keys) =>
        // CHANGE-FEED mode: row-level net changes for the version step.
        // The catch-up step (no prior offset) delivers the start snapshot
        // as inserts; a vacuumed start version cannot be reconstructed and
        // fails loudly — re-delivering a snapshot as "inserts" would
        // corrupt a delta-applying consumer.
        if (startV <= 0)
          VersionedHub.read(spark, path, Some(endV))
            .withColumn("_change_type", lit("insert"))
        else {
          require(VersionedHub.history(spark, path)
            .exists(_.version == startV),
            s"hub at $path no longer has version $startV (vacuumed?) — " +
              "the change feed cannot be reconstructed; raise the vacuum " +
              "retention above the stream's max downtime")
          VersionedHub.changesCDF(spark, path, keys, startV, endV)
        }
    }
    // project onto the stream's declared schema (drop later-evolved
    // columns, pad vanished ones) so every micro-batch is schema-stable
    val have = batch.columns.toSet
    val aligned = batch.select(declaredSchema.fields.toIndexedSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    // the engine requires isStreaming=true on the returned frame
    org.apache.spark.sql.graftbridge.StreamingDF.toStreaming(aligned)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"HubStreamSource[$path${cdfKeys.fold("")(k => s" cdf=${k.mkString(",")}")}]"
}
