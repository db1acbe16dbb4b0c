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

  test("byte-stats fallback computes exact histogram moments, entropy and deflate length") {
    val a = Multimodal.byteStats("hello".getBytes("UTF-8"))
    val b = Multimodal.byteStats("hello".getBytes("UTF-8"))
    assert(a.toSeq == b.toSeq, "pure")
    // "hello": n=5, bytes h(104) e(101) l(108)x2 o(111)
    assert(a(0) == 5.0)
    assert(a(1) == (104 + 101 + 108 + 108 + 111).toDouble / 5)
    assert(a(2) == 4.0, "distinct byte values")
    assert(a(3) == 2.0, "modal frequency (l)")
    assert(a(4) == 2.0, "coincidence numerator: only l contributes 2*1")
    assert(a(5) == 25.0 / 7.0, "Renyi-2 effective alphabet n^2/sum c^2")
    // Shannon entropy: 3 singletons + one pair over 5 bytes
    val h = -(3 * (1.0 / 5) * (math.log(1.0 / 5) / math.log(2.0)) +
      (2.0 / 5) * (math.log(2.0 / 5) / math.log(2.0)))
    assert(math.abs(a(6) - h) < 1e-12, s"entropy ${a(6)} vs $h")
    assert(a(7) > 0 && a(7) <= 5 + 16, "deflate length inside envelope")
    // uniform input: H == log2(distinct) == log2(Renyi-2 perplexity)
    val u = Multimodal.byteStats(Array[Byte](1, 2, 3, 4))
    assert(u(2) == 4.0 && u(5) == 4.0 && math.abs(u(6) - 2.0) < 1e-12)
    // constant input: zero entropy, perplexity 1, deflate still positive
    val k = Multimodal.byteStats(Array.fill[Byte](100)(7))
    assert(k(2) == 1.0 && k(5) == 1.0 && k(6) == 0.0 && k(7) > 0 && k(7) < 100)
    // empty payload: all-zero row (degraded, not thrown)
    assert(Multimodal.byteStats(Array.empty[Byte]).forall(_ == 0.0))
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

  test("real ImageIO decode: synthesized PNG features match the predicted arithmetic") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(25)
    val media = Multimodal.syntheticImages(docs, "doc_id", "n_chars")
    val feats = Multimodal.extractFeatures(media).collect()
    val src = docs.select($"doc_id".cast("long"), $"n_chars".cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val a = f.media_id
      val b = src(a)
      assert(f.n_frames == 1) // decoded path, not the stub
      val fs = f.features
      assert(fs(0) == (8 + (a % 5) * 2).toDouble)
      assert(fs(1) == 6.0)
      assert(fs(2) == (a % 256).toDouble)
      assert(fs(3) == (b % 256).toDouble)
      assert(fs(4) == ((a * 7 + 13) % 256).toDouble)
      assert(fs(5) == ((b * 3 + 5) % 256).toDouble)
      assert(fs(6) == (fs(2) + fs(4)) / 2.0)
      assert(fs(7) == (fs(3) + fs(5)) / 2.0)
    }
  }

  test("image resize decodes, nearest-neighbor scales, and re-encodes losslessly") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(10)
    val media = Multimodal.syntheticImages(docs, "doc_id", "n_chars")
    val resized = Multimodal.resize(media, 2)
    val feats = Multimodal.extractFeatures(resized).collect()
    val orig = media.collect().map(r => r.media_id -> r).toMap
    feats.foreach { f =>
      val o = orig(f.media_id)
      val fs = f.features
      assert(fs(0) == (o.width / 2).toDouble)
      assert(fs(1) == (o.height / 2).toDouble)
      // nearest-neighbor keeps both tones: corner pixels survive the scale
      assert(fs(2) == (f.media_id % 256).toDouble)
      assert(fs(4) == ((f.media_id * 7 + 13) % 256).toDouble)
    }
  }

  test("real WAV decode: square-wave features match the predicted arithmetic") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(25)
    val feats = Multimodal.extractAudioFeatures(
      Multimodal.syntheticWavs(docs, "doc_id")).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val a = f.media_id
      val amp = (1000 + (a % 20) * 500).toInt
      val half = (2 + (a % 4)).toInt
      val n = (800 + (a % 10) * 80).toInt
      assert(f.sample_rate == 8000) // decoded from the RIFF header, not assumed
      assert(f.n_samples == n)
      assert(f.max_amp == amp && f.min_amp == -amp)
      assert(f.mean_abs == amp.toDouble)
      assert(f.n_sign_changes == (n - 1) / half)
    }
  }

  test("non-audio payload degrades to the failure row instead of throwing") {
    val junk = Seq(Multimodal.MediaRow(7L, Array[Byte](1, 2, 3), "wav", 0, 0)).toDS()
    val f = Multimodal.extractAudioFeatures(junk).collect().head
    assert(f.sample_rate == -1 && f.n_samples == 0)
  }

  test("real GIF multi-frame decode: frame count and per-frame colors round-trip") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(25)
    val feats = Multimodal.extractVideoFeatures(
      Multimodal.syntheticVideos(docs, "doc_id")).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val a = f.media_id
      val n = (2 + (a % 3)).toInt
      assert(f.n_frames == n) // true count from the codec, not metadata
      assert(f.width == 8 && f.height == 6)
      assert(f.first_r == ((a * 13) % 256).toDouble)
      assert(f.first_b == ((a * 3) % 256).toDouble)
      assert(f.last_r == ((a * 13 + (n - 1) * 7) % 256).toDouble)
      assert(f.last_b == ((a * 3 + (n - 1) * 17) % 256).toDouble)
    }
  }

  test("corrupt video payload degrades to the failure row instead of throwing") {
    val junk = Seq(Multimodal.MediaRow(3L, Array[Byte](9, 9), "gif", 0, 0)).toDS()
    val f = Multimodal.extractVideoFeatures(junk).collect().head
    assert(f.n_frames == -1)
  }

  test("corrupt image payload degrades to the byte-stats path instead of failing") {
    val junk = Seq(Multimodal.MediaRow(1L, Array[Byte](1, 2, 3), "png", 0, 0))
      .toDS()
    val f = Multimodal.extractFeatures(junk).collect().head
    assert(f.features.toSeq == Multimodal.byteStats(Array[Byte](1, 2, 3)).toSeq)
  }

  test("mp4 demux: synthesized BMFF box tree round-trips every field") {
    val ids = spark.range(0, 40).toDF("doc_id")
    val metas = Multimodal.extractMp4Metadata(
      Multimodal.syntheticMp4s(ids, "doc_id")).collect()
    assert(metas.length == 40)
    metas.foreach { m =>
      val a = m.media_id
      val audio = a % 2 == 1
      assert(m.brand == "isom")
      assert(m.timescale == 1000L)
      assert(m.duration_ms == 1000L + (a % 997) * 10L)
      assert(m.n_tracks == (if (audio) 2 else 1))
      assert(m.handlers == (if (audio) "vide,soun" else "vide"))
      assert(m.codecs == (if (audio) "avc1,mp4a" else "avc1"))
      assert(m.n_samples ==
        10 + a % 7 + (if (audio) 20 + a % 5 else 0))
    }
  }

  test("mp4 demux: 64-bit largesize and size-0 to-end boxes parse") {
    // hand-build: ftyp with largesize header, then an mvhd wrapped in a
    // size-0 moov (extends to end of stream)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftypBody = "mp42".getBytes(ascii) ++ be32(0)
    val ftyp = be32(1) ++ "ftyp".getBytes(ascii) ++
      be32(0) ++ be32(16L + ftypBody.length) ++ ftypBody
    val mvhd = be32(8 + 24) ++ "mvhd".getBytes(ascii) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(1200) ++ be32(0)
    val moov = be32(0) ++ "moov".getBytes(ascii) ++ mvhd
    val m = Multimodal.parseMp4(ftyp ++ moov)
    assert(m.isDefined)
    assert(m.get.brand == "mp42")
    assert(m.get.timescale == 600L)
    assert(m.get.duration_ms == 2000L)
  }

  test("property: mp4 demux never throws on random, mutated or truncated payloads") {
    val rnd = new scala.util.Random(42)
    // pure random bytes
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(512))(rnd.nextInt(256).toByte)
      Multimodal.parseMp4(junk) // Option either way — must not throw
    }
    // valid streams with a single random byte flipped (corrupts sizes,
    // fourccs, version fields) and random truncations
    val valid = Multimodal.buildMp4("isom", 1000L, 5000L,
      Seq(("vide", "avc1", 10), ("soun", "mp4a", 20)))
    (1 to 300).foreach { _ =>
      val mutated = valid.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      Multimodal.parseMp4(mutated)
      Multimodal.parseMp4(valid.take(rnd.nextInt(valid.length)))
    }
    // and the pristine stream still parses fully after all that
    val m = Multimodal.parseMp4(valid).get
    assert(m.n_tracks == 2 && m.n_samples == 30)
  }

  test("non-BMFF payload degrades to the failure row instead of throwing") {
    val junk = Seq(
      Multimodal.MediaRow(5L, Array[Byte](1, 2, 3, 4, 5), "mp4", 0, 0),
      Multimodal.MediaRow(6L, Array.fill(64)(0x7f.toByte), "mp4", 0, 0)).toDS()
    val ms = Multimodal.extractMp4Metadata(junk).collect()
      .sortBy(_.media_id)
    assert(ms.forall(_.n_tracks == -1))
  }
}
