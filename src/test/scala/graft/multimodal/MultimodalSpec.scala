package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("synthetic media corpus has the documented schema and stable kinds") {
    val media = syntheticMedia(spark, sfDir)
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "payload", "meta"))
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    assert(kinds.values.sum === 500)
    // payload round-trips the source text deterministically
    val row = media.filter(col("media_id") === 0).head
    val text = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).head.getAs[String]("text")
    assert(new String(row.payload, "UTF-8") === text)
  }

  test("feature extraction is deterministic, fixed-width, and complete") {
    val media = syntheticMedia(spark, sfDir)
    val a = extractFeatures(media).collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = extractFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(a.size === 500)
    assert(a.values.forall(_.size === 64))
    assert(a === b, "features must not depend on partitioning")
  }

  test("decode parallelism tracks the requested width, not the 3 media kinds") {
    // Pin the partition count: the balance bound below shrinks with the
    // host's core count, so asserting against defaultParallelism made a
    // correct build fail on high-core hosts. 8 partitions × ~62 rows each
    // keeps the hash-balance assertion meaningful on any machine.
    val parts = 8
    val feats = extractFeatures(syntheticMedia(spark, sfDir),
      numPartitions = Some(parts))
    val counts = feats.rdd
      .mapPartitionsWithIndex((i, it) => Iterator.single(i -> it.size))
      .collect().toMap
    assert(counts.size === parts,
      s"expected $parts decode partitions, got ${counts.size}")
    // media_id-hash spreading: roughly balanced, no empty decode tasks
    // (repartition(kind) left every task but 3 empty)
    val expected = 500.0 / parts
    assert(counts.values.forall(c => c > 0 && c < expected * 1.5),
      s"skewed decode partitions: $counts")
  }

  test("resize updates metadata and payload size consistently") {
    val resized = resizeImages(syntheticMedia(spark, sfDir), 32, 32).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.meta.width === 32 && r.meta.height === 32))
    assert(resized.forall(_.payload.nonEmpty))
  }

  test("frame sampling fans out one row per interval tick") {
    val media = syntheticMedia(spark, sfDir)
    val vid = media.filter(col("kind") === "video").head
    val frames = sampleFrames(media, everyMs = 1000L)
    val forOne = frames.filter(col("media_id") === vid.media_id).collect()
    val expectedN = (vid.meta.durationMs - 1) / 1000 + 1
    assert(forOne.length.toLong === expectedN)
    assert(forOne.map(_.frame_idx).sorted.toSeq === (0 until forOne.length))
    assert(forOne.forall(_.payload.nonEmpty))
  }

  // ---- real JDK-codec kernels (ImageIoDecoder) ----

  /** A real w×h PNG: left half black, right half white. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A real 16-bit PCM WAV: silence then a full-scale square wave. */
  private def wavBytes(nSamples: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until nSamples)
      bb.putShort(i * 2,
        if (i < nSamples / 2) 0
        else if (i % 2 == 0) 30000 else -30000)
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A seeded block image: 9×8 blocks (exactly the dHash thumbnail grid)
    * of scrambled-but-deterministic brightness — low-frequency content
    * that survives JPEG re-encoding, distinct across seeds. */
  private def blockPng(seed: Int, w: Int = 72, h: Int = 64,
      fmt: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // splitmix64 finalizer per (seed, block): block brightnesses must be
    // INDEPENDENT across seeds or unlucky seed pairs collide within the
    // near-dup radius (a weak multiply-shift mixer measured hamming 6)
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    for (x <- 0 until w; y <- 0 until h) {
      val bx = x * 9 / w; val by = y * 8 / h
      val v = ((mix(seed.toLong * 72L + by * 9L + bx) >>> 56) & 0xFF).toInt
      img.setRGB(x, y, v << 16 | v << 8 | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("dHash: a JPEG re-encode of the same image lands within a few " +
      "bits; distinct images sit near the random 31-bit expectation") {
    val meta = MediaMeta(72, 64, 0, 0L, "image/png")
    def fp(bytes: Array[Byte]): Long =
      Multimodal.dhashOf(ImageIoDecoder.grayscale(bytes, meta, 9, 8))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val seeds = 0 until 12
    val pngs = seeds.map(s => fp(blockPng(s)))
    val jpgs = seeds.map(s => fp(blockPng(s, fmt = "jpg")))
    pngs.foreach(f => assert(f >= 0L, "63-bit convention: non-negative"))
    val copyDists = seeds.map(s => ham(pngs(s), jpgs(s)))
    info(s"png-vs-jpeg hamming per seed: ${copyDists.mkString(", ")}")
    assert(copyDists.forall(_ <= 8),
      s"recompression moved the hash too far: $copyDists")
    val crossDists = for (a <- seeds; b <- seeds if a < b)
      yield ham(pngs(a), pngs(b))
    info(f"cross-seed hamming: min ${crossDists.min}, " +
      f"mean ${crossDists.sum.toDouble / crossDists.size}%.1f")
    assert(crossDists.min > 8, "distinct images must not collide")
  }

  test("imageNearDups: re-encoded copies pair up through the banded " +
      "Hamming join — exactly the planted pairs, nothing else") {
    import spark.implicits._
    val meta = MediaMeta(72, 64, 0, 0L, "image/png")
    val rows = (0 until 20).flatMap { s =>
      Seq(MediaRow(s.toLong, "image", blockPng(s), meta),
        MediaRow(s.toLong + 1000L, "image", blockPng(s, fmt = "jpg"), meta))
    } :+ MediaRow(5000L, "audio", wavBytes(256),
      MediaMeta(0, 0, 16000, 16L, "audio/wav")) // non-image rows ignored
    val pairs = Multimodal.imageNearDups(rows.toDS(),
        decoder = ImageIoDecoder, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0 until 20).map(s => (s.toLong, s + 1000L)).toSet)
  }

  /** A real seeded WAV: 64 segments of splitmix-random amplitude square
    * waves — the envelope structure the audio hash fingerprints. */
  private def seededWav(seed: Int, gain: Double = 1.0): Array[Byte] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val nSamples = 64 * 32
    val data = new Array[Byte](nSamples * 2)
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until nSamples) {
      val seg = i / 32
      val amp = (((mix(seed.toLong * 64L + seg) >>> 40) & 0x3FFF) + 1000) *
        gain
      bb.putShort(i * 2, (if (i % 2 == 0) amp else -amp).toInt.toShort)
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio envelope hash: a half-volume copy of the same recording " +
      "hashes identically (gain invariance); distinct recordings are " +
      "far; the banded join recovers exactly the planted copy pairs") {
    import spark.implicits._
    val meta = MediaMeta(0, 0, 16000, 128L, "audio/wav")
    def fp(bytes: Array[Byte]): Long =
      Multimodal.envHashOf(ImageIoDecoder.audioFeatures(bytes, meta))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val seeds = 0 until 10
    val full = seeds.map(s => fp(seededWav(s)))
    val half = seeds.map(s => fp(seededWav(s, gain = 0.5)))
    val copyDists = seeds.map(s => ham(full(s), half(s)))
    info(s"full-vs-half-volume hamming per seed: ${copyDists.mkString(", ")}")
    assert(copyDists.forall(_ <= 2),
      s"gain invariance broken: $copyDists")
    val crossDists = for (a <- seeds; b <- seeds if a < b)
      yield ham(full(a), full(b))
    info(f"cross-seed hamming: min ${crossDists.min}, " +
      f"mean ${crossDists.sum.toDouble / crossDists.size}%.1f")
    assert(crossDists.min > 8, "distinct recordings must not collide")
    val rows = seeds.flatMap { s =>
      Seq(MediaRow(s.toLong, "audio", seededWav(s), meta),
        MediaRow(s.toLong + 1000L, "audio", seededWav(s, 0.5), meta))
    }
    val pairs = Multimodal.audioNearDups(rows.toDS(),
        decoder = ImageIoDecoder, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === seeds.map(s => (s.toLong, s + 1000L)).toSet)
  }

  test("dHash on the fake-decoder path: equal payloads hash equal and " +
      "pair up; the synthetic corpus flows end to end without javax") {
    import spark.implicits._
    val meta = MediaMeta(8, 8, 0, 0L, "fake/v1")
    val rows = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3), meta),
      MediaRow(2L, "image", Array[Byte](1, 2, 3), meta), // same payload
      MediaRow(3L, "image", Array[Byte](9, 9, 9), meta)).toDS()
    val pairs = Multimodal.imageNearDups(rows, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
    // and the repo's synthetic corpus runs through the same path
    val syn = Multimodal.imageDHash(
      Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001"))
    assert(syn.count() > 0)
    assert(syn.select("fp").distinct().count() > 1)
  }

  test("ImageIoDecoder decodes real PNGs through the Spark pipeline") {
    import spark.implicits._
    val meta = MediaMeta(64, 64, 0, 0L, "image/png")
    val rows = (1L to 40L).map(i =>
      MediaRow(i, "image", pngBytes(64, 64), meta))
    val feats = extractFeatures(rows.toDS(), decoder = ImageIoDecoder,
        numPartitions = Some(4))
      .collect().map(f => f.media_id -> f.features).toMap
    assert(feats.size === 40)
    // the 8x8 grayscale thumbnail must SEE the half-black/half-white
    // structure: left columns dark, right columns bright, on every row
    for (f <- feats.values; r <- 0 until 8) {
      assert(f(r * 8) < -0.3f, "leftmost thumbnail column must be dark")
      assert(f(r * 8 + 7) > 0.3f, "rightmost thumbnail column must be bright")
    }
    // real resize: output is a decodable 16x16 PNG with the same structure
    val small = ImageIoDecoder.resize(pngBytes(64, 64), meta, 16, 16)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(small))
    assert(back.getWidth === 16 && back.getHeight === 16)
    assert((back.getRGB(1, 8) & 0xFF) < 64, "left stays dark after resize")
    assert((back.getRGB(14, 8) & 0xFF) > 192, "right stays bright after resize")
  }

  test("ImageIoDecoder decodes real WAV audio: RMS envelope sees structure") {
    val f = ImageIoDecoder.audioFeatures(wavBytes(12800),
      MediaMeta(0, 0, 16000, 800L, "audio/wav"))
    assert(f.length === 64)
    // first half silence → ~0 energy; second half full-scale square → ~0.9
    assert(f.take(30).forall(_ < 0.01f), "silent half must be near-zero RMS")
    assert(f.drop(34).forall(_ > 0.8f), "square-wave half must be high RMS")
  }

  test("decoded features flow into the ANN index unchanged") {
    val feats = featureTable(syntheticMedia(spark, sfDir))
    assert(feats.columns.toSeq === Seq("vec_id", "embedding"))
    val probe = feats.filter(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toSeq
    val top = graft.sim.Ann.bruteTopK(feats, probe, 5).collect()
    assert(top.head.getLong(0) === 1L, "probe must be its own nearest neighbor")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-12)
  }
}
