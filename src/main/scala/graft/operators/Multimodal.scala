package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise.
  *
  * The Spark-side contract is real and tested — schema, partition-parallel
  * batch processing (`mapPartitions`, the JVM analogue of `mapInPandas`
  * batches), deterministic output shape. The codec itself is STUBBED: this
  * container has no image/audio libraries, so `stubDecode` derives a
  * deterministic fake feature vector from the bytes. Swapping in a real
  * decoder changes only the marked function body — the distributed plumbing
  * (per-partition batching, no driver collect, binary+metadata schema) is
  * the part that has to survive 100 TB, and it is exercised end-to-end.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      checksum: String,
      n_frames: Int,
      features: Array[Double])

  /** STUB decoder ??? — replace with a real codec (JPEG/PNG/ffmpeg) when the
    * libraries exist. Deterministic fake: 8 features derived from byte
    * statistics so tests and oracles are stable.
    */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += payload(i) & 0xff; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    Array(
      n.toDouble,
      mean,
      if (n == 0) 0.0 else (payload(0) & 0xff).toDouble,
      if (n == 0) 0.0 else (payload(n - 1) & 0xff).toDouble,
      (sum % 256L).toDouble,
      (n % 97).toDouble,
      math.min(n, 4096).toDouble,
      1.0)
  }

  /** Frame sampling: byte offsets every `stride` bytes — the shape of video
    * frame extraction (seek table), computed without decoding.
    */
  def frameOffsets(byteLen: Long, stride: Long): Seq[Long] =
    0L.until(math.max(byteLen, 1L)).by(math.max(stride, 1L))

  /** Batch feature extraction: per-partition loop (no driver involvement,
    * no per-row task overhead) — the `mapInPandas` analogue.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(
          media_id = r.media_id,
          byte_len = r.payload.length.toLong,
          checksum = digest,
          n_frames = frameOffsets(r.payload.length.toLong, 1000L).size,
          features = stubDecode(r.payload))
      }
    }
  }

  /** STUB resize ??? — a real implementation decodes, scales by `factor`,
    * and re-encodes. The deterministic stand-in keeps every k-th byte, so
    * the binary-in/binary-out plumbing (schema preserved, metadata scaled,
    * per-partition batches) is exercised for real while the codec is fake.
    */
  def stubResize(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Batched media resize: binary → binary per-partition transform with the
    * metadata (width/height) scaled alongside the payload — the
    * image-pipeline stage between ingestion and feature extraction.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(
        payload = stubResize(r.payload, factor),
        width = r.width / factor,
        height = r.height / factor))
    }
  }

  /** Bridge from the `binaryFile` reader: (path, content, length) rows become
    * MediaRows with the format inferred from the file extension and ids from
    * a hash of the path (stable across reruns; dimensions unknown until
    * decode → 0).
    */
  def fromBinaryFiles(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
      xxhash64(col("path")).as("media_id"),
      col("content").as("payload"),
      lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("format"),
      lit(0).as("width"),
      lit(0).as("height"))
      .as[MediaRow]
  }

  /** Synthesize a media table from any text table (UTF-8 bytes as payload) —
    * lets the plumbing run against the driver test data with no binary
    * fixtures.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("format"),
      lit(0).as("width"),
      lit(0).as("height"))
      .as[MediaRow]
  }
}
