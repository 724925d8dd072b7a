package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "tiny"),
    (2L, "a somewhat longer document body for the fake decoder"),
    (3L, "x" * 500)).toDF("doc_id", "text")

  test("fromText produces the multimodal schema with metadata") {
    val mm = Multimodal.fromText(docs, "doc_id", "text", "image")
    assert(mm.schema.fieldNames.toSeq === Seq("id", "modality", "content", "meta"))
    val r = mm.where(col("id") === 3).select("meta.width").head()
    assert(r.getInt(0) === 500 % 1024)
  }

  test("stubbed feature extraction is deterministic and fixed-width") {
    val mm = Multimodal.fromText(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(mm).select("id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(mm).select("id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length === 8))
    assert(f1(2L).exists(_ != 0.0f))
  }

  test("real PPM decode: pixels, dimensions, channel means") {
    // 2x2 binary PPM: red, green, blue, white
    val header = "P6\n# comment\n2 2\n255\n".getBytes("US-ASCII")
    val px = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val ppm = header ++ px
    val im = Multimodal.Codecs.decodePpm(ppm)
    assert(im.width === 2 && im.height === 2)
    assert(im.rgb.toSeq === px.toSeq)
    val f = Multimodal.decodeFeatures(ppm)
    assert(f.length === 8)
    assert(math.abs(f(0) - 2 / 4096.0f) < 1e-7) // width
    // mean R = (255 + 0 + 0 + 255)/4/255 = 0.5; same for G and B
    assert(math.abs(f(2) - 0.5f) < 1e-6)
    assert(math.abs(f(3) - 0.5f) < 1e-6)
    assert(math.abs(f(4) - 0.5f) < 1e-6)
    assert(f(6) === 1.0f) // image modality tag
    // through the Spark column path
    val mm = Seq((1L, "image", ppm)).toDF("id", "modality", "content")
    val got = Multimodal.extractFeatures(mm).select("features")
      .head().getSeq[Float](0)
    assert(got === f.toSeq)
  }

  test("real WAV decode: PCM samples, rate, duration and RMS") {
    // mono 16-bit PCM, 4 samples at 8000 Hz: 0, +max, 0, -max
    val samples = Seq[Short](0, 32767, 0, -32768)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + samples.length * 2)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val wav = bb.array()
    val au = Multimodal.Codecs.decodeWav(wav)
    assert(au.sampleRate === 8000 && au.channels === 1)
    assert(au.samples.length === 4)
    assert(math.abs(au.samples(1) - 32767 / 32768.0f) < 1e-7)
    assert(au.samples(3) === -1.0f)
    val f = Multimodal.decodeFeatures(wav)
    assert(math.abs(f(0) - 4 / 8000.0f) < 1e-9)  // duration
    assert(f(7) === 1.0f)                        // audio modality tag
    assert(math.abs(f(5) - 1.0f) < 1e-7)         // peak
  }

  // deterministic 8x4 test image: full-channel gradient patterns
  private def testImage(): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, ((x * 32) << 16) | ((y * 64) << 8) | (x * y * 8))
    img
  }

  private def encode(fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(testImage(), fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("compressed-image decode via JDK ImageIO: PNG round-trips pixels exactly") {
    val png = encode("png")
    assert(Multimodal.Codecs.isImageIoFormat(png))
    val im = Multimodal.Codecs.decodeImageIO(png).get
    assert(im.width === 8 && im.height === 4)
    // PNG is lossless: decoded RGB matches the source image byte-for-byte
    val src = testImage()
    for (y <- 0 until 4; x <- 0 until 8) {
      val i = (y * 8 + x) * 3
      val p = src.getRGB(x, y)
      assert((im.rgb(i) & 0xff) === ((p >> 16) & 0xff))
      assert((im.rgb(i + 1) & 0xff) === ((p >> 8) & 0xff))
      assert((im.rgb(i + 2) & 0xff) === (p & 0xff))
    }
    // features flow through the real image kernel (modality tag = image),
    // NOT the byte-fold stub
    val f = Multimodal.decodeFeatures(png)
    assert(f(6) === 1.0f && f(7) === 0.0f)
    assert(math.abs(f(0) - 8 / 4096.0f) < 1e-7)
    assert(f.toSeq !== Multimodal.fakeDecodeFeatures(png).toSeq)
    // and through the Spark column path
    val mm = Seq((1L, "image", png)).toDF("id", "modality", "content")
    val got = Multimodal.extractFeatures(mm).select("features")
      .head().getSeq[Float](0)
    assert(got === f.toSeq)
  }

  test("compressed-image decode via JDK ImageIO: JPEG decodes near the source pixels") {
    val jpg = encode("jpg")
    assert(Multimodal.Codecs.isImageIoFormat(jpg))
    val im = Multimodal.Codecs.decodeImageIO(jpg).get
    assert(im.width === 8 && im.height === 4)
    // JPEG is lossy: channel means land near the lossless PNG's
    val fJpg = Multimodal.decodeFeatures(jpg)
    val fPng = Multimodal.decodeFeatures(encode("png"))
    assert(fJpg(6) === 1.0f)
    for (i <- 2 to 4)
      assert(math.abs(fJpg(i) - fPng(i)) < 0.05,
        s"channel-mean feature $i drifted: jpeg=${fJpg(i)} png=${fPng(i)}")
  }

  test("non-media bytes and torn headers fall back to the stub kernel") {
    val text = "P6 but not really a ppm".getBytes
    assert(Multimodal.decodeFeatures(text).toSeq ===
      Multimodal.fakeDecodeFeatures(text).toSeq)
    val torn = "RIFFxxxxWAVE".getBytes // no chunks
    assert(Multimodal.decodeFeatures(torn).toSeq ===
      Multimodal.fakeDecodeFeatures(torn).toSeq)
    // PNG magic + garbage: ImageIO yields no image, stub takes over
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G') ++
      "garbage body that is not a png".getBytes
    assert(Multimodal.decodeFeatures(corrupt).toSeq ===
      Multimodal.fakeDecodeFeatures(corrupt).toSeq)
  }

  test("feature extraction stays columnar (no RDD scan in the plan)") {
    val mm = Multimodal.fromText(docs, "doc_id", "text")
    val plan = Multimodal.extractFeatures(mm)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), plan)
    // content is dropped before any downstream exchange
    assert(!Multimodal.extractFeatures(mm).columns.contains("content"))
  }

  test("frame sampling yields ceil(len/stride) frames") {
    val mm = Multimodal.fromText(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(mm, stride = 100, frameBytes = 32)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames(1L) === 1) // 4 bytes -> 1 frame
    assert(frames(3L) === 5) // 500 bytes -> 5 frames
  }

  test("partitionBySize spreads blobs across partitions") {
    val mm = Multimodal.fromText(docs, "doc_id", "text")
    val parted = Multimodal.partitionBySize(mm, 2)
    assert(parted.rdd.getNumPartitions === 2)
    assert(parted.count() === 3)
  }

  test("dHash is format-invariant: PNG and BMP of the same pixels hash equal") {
    // lossless formats decode to identical RGB -> identical dHash; the
    // hash depends on pixel content, not the container
    val hPng = Multimodal.dHash(Multimodal.Codecs.decodeImageIO(encode("png")).get)
    val hBmp = Multimodal.dHash(Multimodal.Codecs.decodeImageIO(encode("bmp")).get)
    assert(hPng === hBmp)
    assert(hPng >= 0L && hPng < (1L << 56)) // 56-bit sketch, positive int64
  }

  test("imageNearDup pairs a 1-pixel edit with its original, not with others") {
    val imgs = Seq(
      (1L, 10L, false), (2L, 10L, true),      // near-dup pair (1 px edit)
      (3L, 77L, false), (4L, 123L, false))    // unrelated seeds
      .toDF("img_id", "seed", "tweak")
    val mm = Multimodal.syntheticPpm(imgs, "img_id", "seed", "tweak")
    val pairs = Multimodal.imageNearDup(mm, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 <= 1) // a pixel-0 edit flips at most bit 0
    // phash null for non-image bytes: no crash, row excluded
    val mixed = mm.unionByName(Seq((9L, "audio",
        "not an image".getBytes, null))
      .toDF("id", "modality", "content", "meta")
      .select(col("id"), col("modality"), col("content"),
        lit(null).cast(Multimodal.metaSchema).as("meta")))
    assert(Multimodal.perceptualHash(mixed).where(col("phash").isNull).count() === 1)
  }

  test("audioNearDup pairs a 1-sample edit with its original through real WAV decode") {
    val auds = Seq(
      (1L, 10L, false), (2L, 10L, true),      // near-dup pair (1-sample edit)
      (3L, 77L, false), (4L, 123L, false))    // unrelated seeds
      .toDF("aud_id", "seed", "tweak")
    val mm = Multimodal.syntheticWav(auds, "aud_id", "seed", "tweak")
    // the synthetic blob decodes through the REAL PCM path: 1024 samples
    // at 8 kHz mono, sample values matching the closed formula
    val au = graft.operators.Multimodal.Codecs.decodeWav(
      mm.where(col("id") === 1L).head().getAs[Array[Byte]]("content"))
    assert(au.sampleRate === 8000 && au.channels === 1 && au.samples.length === 1024)
    val k0 = ((10L * 73 + 0) % 4001 - 2000).toInt
    assert(math.abs(au.samples(0) - k0 / 32768.0f) < 1e-9)
    val pairs = Multimodal.audioNearDup(mm, maxHamming = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 <= 1) // a sample-0 edit flips at most bit 0
    // banded join == all-pairs scan (pigeonhole losslessness at 31 bits)
    val sk = Multimodal.audioPerceptualHash(mm)
      .select(col("id"), col("ahash").as("simhash"))
    val banded = graft.operators.Dedup.simhashPairs(sk, "id", 2, bits = 31)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.operators.Dedup.simhashPairsExact(sk, "id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === exact)
    // ahash null for non-WAV bytes
    val mixed = mm.unionByName(Seq((9L, "image", "not audio".getBytes, null))
      .toDF("id", "modality", "content", "meta")
      .select(col("id"), col("modality"), col("content"),
        lit(null).cast(Multimodal.metaSchema).as("meta")))
    assert(Multimodal.audioPerceptualHash(mixed).where(col("ahash").isNull).count() === 1)
  }
}
