package graft

import graft.operators.Multimodal
import graft.queries.Tables

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("feature extraction runs per-partition with deterministic output") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .repartition(7) // prove partition-parallel shape
    val media = Multimodal.fromText(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    val r = rows.minBy(_.media_id)
    assert(r.features.length == 8)
    assert(r.features(0) == r.byte_len.toDouble)
    assert(r.checksum.matches("[0-9a-f]{32}"))
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.checksum).toMap
    rows.foreach(f => assert(again(f.media_id) == f.checksum))
  }

  test("frame offsets: ceil(len/stride) samples starting at 0") {
    assert(Multimodal.frameOffsets(500, 1000) == Seq(0L))
    assert(Multimodal.frameOffsets(1500, 1000) == Seq(0L, 1000L))
    assert(Multimodal.frameOffsets(0, 1000) == Seq(0L))
  }

  test("stub decode is pure and length-sensitive") {
    val a = Multimodal.stubDecode("hello".getBytes("UTF-8"))
    val b = Multimodal.stubDecode("hello".getBytes("UTF-8"))
    val c = Multimodal.stubDecode("hello!".getBytes("UTF-8"))
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a(0) == 5.0)
  }

  test("resize shrinks payload and metadata by the factor, binary-to-binary") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(20)
    val media = Multimodal.fromText(docs, "doc_id", "text")
    val resized = Multimodal.resize(media, 4).collect()
    val orig = media.collect().map(r => r.media_id -> r).toMap
    resized.foreach { r =>
      val o = orig(r.media_id)
      assert(r.payload.length == (o.payload.length + 3) / 4)
      assert(r.payload.headOption == o.payload.headOption)
    }
  }

  test("binaryFile reader rows bridge into the media schema") {
    val dir = tmpDir("media")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "clip.mp4"), Array[Byte](7, 8, 9))
    val bin = graft.readers.Readers.binaryFile(spark, Map("path" -> dir))
    val media = Multimodal.fromBinaryFiles(bin).collect()
    assert(media.length == 1)
    assert(media.head.format == "mp4")
    assert(media.head.payload.toSeq == Seq[Byte](7, 8, 9))
  }
}
