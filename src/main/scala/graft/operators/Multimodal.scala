package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Multimodal column handling for training-data pipelines: images/audio/
  * video ride along as opaque BINARY columns with typed metadata, and the
  * decode / feature-extract / resize / frame-sample stages are
  * partition-local map passes.
  *
  * Decode is REAL for every format the JVM can read without native
  * libraries: binary PPM images and 16-bit PCM WAV audio via the pure-JVM
  * parsers below, and compressed JPEG/PNG/BMP/GIF via `javax.imageio`
  * (those readers ship inside every standard JDK). Only video and
  * compressed-audio codecs (H.264, MP3, ...) genuinely require native
  * libraries absent from this environment — that kernel is STUBBED with a
  * deterministic fake (clearly marked below). Everything Spark-side is
  * real and tested: the schema, the binary plumbing, the batch shape,
  * size-aware partitioning. Swapping the stub for a native decoder
  * changes one function.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = true)))

  /** Wrap a text table into the multimodal schema with deterministic fake
    * blobs (the utf-8 bytes) — stands in for real media bytes in tests. */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
               modality: String = "image"): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      lit(modality).as("modality"),
      col(textCol).cast("binary").as("content"),
      struct(
        (octet_length(col(textCol).cast("binary")) % 1024).cast("int").as("width"),
        lit(256).cast("int").as("height"),
        lit(null).cast("int").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  /** Pure-JVM decoders for UNCOMPRESSED container formats — real decode,
    * no native libraries: binary PPM (P6) images and 16-bit PCM WAV
    * audio. Compressed codecs (JPEG, H.264, MP3, ...) require native libs
    * absent from this environment and fall back to the marked stub
    * kernel below. */
  private[graft] object Codecs {
    final case class Image(width: Int, height: Int, rgb: Array[Byte])
    final case class Audio(sampleRate: Int, channels: Int, samples: Array[Float])

    def isPpm(b: Array[Byte]): Boolean =
      b.length > 2 && b(0) == 'P' && b(1) == '6' && Character.isWhitespace(b(2))

    def isWav(b: Array[Byte]): Boolean =
      b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** Magic sniff for the compressed image formats the JDK's bundled
      * `javax.imageio` readers decode (JPEG/PNG/BMP/GIF) — checked BEFORE
      * handing bytes to ImageIO so non-image blobs never pay reader
      * discovery. */
    def isImageIoFormat(b: Array[Byte]): Boolean =
      b.length > 8 && (
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) || // JPEG
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||  // PNG
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||          // GIF
        (b(0) == 'B' && b(1) == 'M'))                                          // BMP

    /** JPEG/PNG/BMP/GIF via the JDK's own ImageIO readers — real decode,
      * zero native dependencies. Returns None when no reader accepts the
      * bytes (corrupt payload). The in-memory cache flag avoids ImageIO's
      * default temp-file spill on every executor-side decode. */
    def decodeImageIO(b: Array[Byte]): Option[Image] = {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))).map { img =>
        val w = img.getWidth; val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          rgb(3 * i) = ((px(i) >> 16) & 0xff).toByte
          rgb(3 * i + 1) = ((px(i) >> 8) & 0xff).toByte
          rgb(3 * i + 2) = (px(i) & 0xff).toByte
          i += 1
        }
        Image(w, h, rgb)
      }
    }

    /** Binary PPM (P6): "P6" <w> <h> <maxval> then w*h RGB byte triples;
      * '#' comments allowed in the header. */
    def decodePpm(b: Array[Byte]): Image = {
      var p = 2
      def skipWs(): Unit = {
        var go = true
        while (go && p < b.length) {
          if (Character.isWhitespace(b(p))) p += 1
          else if (b(p) == '#') { while (p < b.length && b(p) != '\n') p += 1 }
          else go = false
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0
        require(p < b.length && b(p) >= '0' && b(p) <= '9', "bad PPM header")
        while (p < b.length && b(p) >= '0' && b(p) <= '9') { v = v * 10 + (b(p) - '0'); p += 1 }
        v
      }
      val w = int(); val h = int(); val maxv = int()
      require(maxv == 255, s"only 8-bit PPM supported, maxval=$maxv")
      p += 1 // single whitespace after maxval
      require(b.length - p >= w * h * 3, "truncated PPM payload")
      Image(w, h, java.util.Arrays.copyOfRange(b, p, p + w * h * 3))
    }

    /** RIFF/WAVE with a PCM "fmt " chunk and 16-bit little-endian
      * samples in the "data" chunk. */
    def decodeWav(b: Array[Byte]): Audio = {
      def u16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      def u32(i: Int) = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      var p = 12
      var rate = 0; var channels = 0; var bits = 0
      var samples: Array[Float] = null
      while (p + 8 <= b.length) {
        val id = new String(b, p, 4, "US-ASCII")
        val sz = u32(p + 4).toInt
        id match {
          case "fmt " =>
            require(u16(p + 8) == 1, "only PCM WAV supported")
            channels = u16(p + 10); rate = u32(p + 12).toInt; bits = u16(p + 22)
            require(bits == 16, s"only 16-bit PCM supported, got $bits")
          case "data" =>
            val n = math.min(sz, b.length - p - 8) / 2
            samples = new Array[Float](n)
            var i = 0
            while (i < n) {
              samples(i) = (u16(p + 8 + 2 * i).toShort) / 32768.0f
              i += 1
            }
          case _ => ()
        }
        p += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(rate > 0 && samples != null, "missing fmt/data chunk")
      Audio(rate, channels, samples)
    }
  }

  /** 8-dim feature signature from real decoded pixels: normalized dims,
    * per-channel means, luma variance. */
  private def imageFeatures(im: Codecs.Image): Array[Float] = {
    var r = 0.0; var g = 0.0; var bl = 0.0; var luma2 = 0.0; var luma1 = 0.0
    val n = im.width * im.height
    var i = 0
    while (i < n) {
      val R = im.rgb(3 * i) & 0xff; val G = im.rgb(3 * i + 1) & 0xff
      val B = im.rgb(3 * i + 2) & 0xff
      r += R; g += G; bl += B
      val y = 0.299 * R + 0.587 * G + 0.114 * B
      luma1 += y; luma2 += y * y
      i += 1
    }
    val mean = luma1 / n
    Array(im.width / 4096.0f, im.height / 4096.0f,
      (r / n / 255.0).toFloat, (g / n / 255.0).toFloat, (bl / n / 255.0).toFloat,
      (math.sqrt(math.max(0.0, luma2 / n - mean * mean)) / 255.0).toFloat,
      1.0f, 0.0f) // modality tag: image
  }

  /** 8-dim feature signature from real decoded PCM: duration, rate, RMS,
    * zero-crossing rate, mean |amplitude|, peak. */
  private def audioFeatures(au: Codecs.Audio): Array[Float] = {
    var sum2 = 0.0; var sumAbs = 0.0; var peak = 0.0f; var zc = 0
    val n = au.samples.length
    var i = 0
    while (i < n) {
      val s = au.samples(i)
      sum2 += s * s; sumAbs += math.abs(s)
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (s >= 0) != (au.samples(i - 1) >= 0)) zc += 1
      i += 1
    }
    val dur = n.toFloat / math.max(au.sampleRate * math.max(au.channels, 1), 1)
    Array(dur, au.sampleRate / 48000.0f,
      math.sqrt(sum2 / math.max(n, 1)).toFloat,
      if (n > 1) zc.toFloat / (n - 1) else 0.0f,
      (sumAbs / math.max(n, 1)).toFloat, peak,
      0.0f, 1.0f) // modality tag: audio
  }

  /** STUB kernel for codec formats that need native libraries (video and
    * compressed audio: H.264, MP3, ...): a deterministic byte-fold keeps
    * the pipeline shape (binary in, fixed-width float vector out) real
    * and testable. */
  private[graft] def fakeDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    // ??? <- native codec goes here; deterministic byte-fold fake below
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(bytes.length / 8, 1)
    out.map(_ / n)
  }

  /** Decode dispatch: REAL decoders for PPM/WAV (pure-JVM parsers) and
    * JPEG/PNG/BMP/GIF (JDK ImageIO) — magic-number sniffed, parse-failure
    * falls through to the stub — stub only for native-codec formats. */
  private[graft] def decodeFeatures(bytes: Array[Byte]): Array[Float] =
    try {
      if (Codecs.isPpm(bytes)) imageFeatures(Codecs.decodePpm(bytes))
      else if (Codecs.isWav(bytes)) audioFeatures(Codecs.decodeWav(bytes))
      else if (Codecs.isImageIoFormat(bytes))
        Codecs.decodeImageIO(bytes).map(imageFeatures)
          .getOrElse(fakeDecodeFeatures(bytes))
      else fakeDecodeFeatures(bytes)
    } catch { case _: IllegalArgumentException => fakeDecodeFeatures(bytes) }

  private val decodeFeaturesUdf =
    udf((bytes: Array[Byte]) => decodeFeatures(bytes))

  /** Feature extraction as a columnar per-row map (binary -> array<float>):
    * a Scala UDF keeps the plan inside Tungsten (no RDD hop, no Row
    * re-encoding) and lets Catalyst prune/push around it; no shuffle. */
  def extractFeatures(mm: DataFrame): DataFrame =
    mm.withColumn("features", decodeFeaturesUdf(col("content")))
      .drop("content")

  /** Frame sampling for video-like blobs: every `stride` bytes becomes a
    * "frame" fingerprint (md5 of the window) — pure column algebra, the
    * real variant swaps the fingerprint for a decoded frame. */
  def frameSample(mm: DataFrame, stride: Int, frameBytes: Int): DataFrame =
    mm.select(col("id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(floor((octet_length(col("content")) - 1) / stride).cast("int"), lit(0))),
          i => md5(col("content").substr(i * stride + 1, lit(frameBytes)))))
          .as(Seq("frame_idx", "frame_md5")))

  /** Size-aware repartitioning: media blobs skew wildly; range-partition
    * by byte size so no partition carries all the 4K videos. */
  def partitionBySize(mm: DataFrame, numPartitions: Int): DataFrame =
    mm.withColumn("_sz", octet_length(col("content")))
      .repartitionByRange(numPartitions, col("_sz"), col("id"))
      .drop("_sz")

  // --------------------------------------------------- perceptual hashing

  /** 56-bit difference hash (dHash — the public perceptual-hash
    * technique) of a decoded image: box-average luma onto an 8x8 grid,
    * set bit `gy*7 + gx` iff grid(gx,gy) > grid(gx+1,gy). Near-duplicate
    * images (recompression, format conversion, mild edits) land within a
    * few Hamming bits; 56 bits (not the classic 64) keeps the sketch in a
    * signed int64's positive range for SQL-engine parity, same reasoning
    * as the 60-bit SimHash. */
  private[graft] def dHash(im: Codecs.Image): Long = {
    val gridW = 8; val gridH = 8 // 7 comparisons per row x 8 rows = 56 bits
    val acc = new Array[Double](gridW * gridH)
    val cnt = new Array[Int](gridW * gridH)
    var y = 0
    while (y < im.height) {
      val gy = y * gridH / im.height
      var x = 0
      while (x < im.width) {
        val gx = x * gridW / im.width
        val i = y * im.width + x
        val r = im.rgb(3 * i) & 0xff
        val g = im.rgb(3 * i + 1) & 0xff
        val b = im.rgb(3 * i + 2) & 0xff
        acc(gy * gridW + gx) += 0.299 * r + 0.587 * g + 0.114 * b
        cnt(gy * gridW + gx) += 1
        x += 1
      }
      y += 1
    }
    var h = 0L
    var gy = 0
    while (gy < gridH) {
      var gx = 0
      while (gx < gridW - 1) {
        val l = acc(gy * gridW + gx) / math.max(cnt(gy * gridW + gx), 1)
        val r = acc(gy * gridW + gx + 1) / math.max(cnt(gy * gridW + gx + 1), 1)
        if (l > r) h |= 1L << (gy * (gridW - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    h
  }

  private val perceptualHashUdf = udf((bytes: Array[Byte]) =>
    try {
      if (Codecs.isPpm(bytes)) Some(dHash(Codecs.decodePpm(bytes)))
      else if (Codecs.isImageIoFormat(bytes)) Codecs.decodeImageIO(bytes).map(dHash)
      else None
    } catch { case _: IllegalArgumentException => None })

  /** (id, phash) for every decodable image blob; null phash otherwise.
    * Per-row decode+hash, shuffle-free — the hash is 8 bytes however big
    * the image, so downstream dedup never moves pixels. */
  def perceptualHash(mm: DataFrame): DataFrame =
    mm.select(col("id"), perceptualHashUdf(col("content")).as("phash"))

  /** Perceptual near-duplicate image pairs: banded Hamming self-join on
    * the dHash (Manku pigeonhole banding — lossless for distances up to
    * `maxHamming` — then exact bit_count verification), delegated to
    * [[Dedup.simhashPairs]] over the 56-bit sketches. The LAION-style
    * image-dedup primitive: candidate generation touches only (id, int64)
    * rows, never pixel data. */
  def imageNearDup(mm: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = 8192,
                   hotBucketMode: String = "star"): DataFrame =
    Dedup.simhashPairs(
      perceptualHash(mm).where(col("phash").isNotNull)
        .select(col("id"), col("phash").as("simhash")),
      "id", maxHamming, bits = 56,
      maxBucket = maxBucket, hotBucketMode = hotBucketMode)

  /** 31-bit energy-contour hash over decoded PCM: the audio analog of
    * [[dHash]] — 32 equal-ish windows of mean |sample|, bit w set when
    * window w is louder than window w+1. Like dHash it captures SHAPE
    * (the loudness contour) and shrugs off small edits, so banded
    * Hamming dedup works on 8-byte sketches without ever moving PCM.
    * Comparisons are cross-multiplied (sumL·cntR > sumR·cntL): 16-bit
    * samples are exact in float/double, the sums and products stay far
    * inside the 53-bit mantissa, so every bit is integer-exact and a SQL
    * oracle can re-derive the hash from a closed sample formula. */
  private[graft] def audioHash(au: Codecs.Audio): Long = {
    val w = 32
    val n = au.samples.length
    require(n >= w, s"audioHash needs >= $w samples, got $n")
    val acc = new Array[Double](w)
    val cnt = new Array[Int](w)
    var i = 0
    while (i < n) {
      val g = (i.toLong * w / n).toInt
      acc(g) += math.abs(au.samples(i)); cnt(g) += 1
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < w - 1) {
      if (acc(j) * cnt(j + 1) > acc(j + 1) * cnt(j)) h |= 1L << j
      j += 1
    }
    h
  }

  private val audioHashUdf = udf((bytes: Array[Byte]) =>
    try {
      if (Codecs.isWav(bytes)) Some(audioHash(Codecs.decodeWav(bytes))) else None
    } catch { case _: IllegalArgumentException => None })

  /** (id, ahash) for every decodable PCM-WAV blob; null otherwise. */
  def audioPerceptualHash(mm: DataFrame): DataFrame =
    mm.select(col("id"), audioHashUdf(col("content")).as("ahash"))

  /** Perceptual near-duplicate audio pairs: the [[imageNearDup]] shape
    * over the 31-bit energy-contour sketches — banded Hamming candidate
    * join (lossless pigeonhole), exact bit_count verify; candidate
    * generation touches (id, int64) rows only, never samples. */
  def audioNearDup(mm: DataFrame, maxHamming: Int = 2,
                   maxBucket: Int = 8192,
                   hotBucketMode: String = "star"): DataFrame =
    Dedup.simhashPairs(
      audioPerceptualHash(mm).where(col("ahash").isNotNull)
        .select(col("id"), col("ahash").as("simhash")),
      "id", maxHamming, bits = 31,
      maxBucket = maxBucket, hotBucketMode = hotBucketMode)

  /** Deterministic 1024-sample 16-bit mono PCM WAV generator for
    * tests/oracles (the [[syntheticPpm]] stance): sample i is
    * ((seed*73 + i*i*13 + i*seed) mod 4001) − 2000, and `tweakCol` rows
    * get sample 0 bumped by +17 — a one-sample edit that moves one
    * window's energy by ≤ 17/32768, a near-duplicate within 1 Hamming
    * bit by construction. The closed formula lets a SQL oracle
    * recompute the expected contour hash from integer window sums
    * without parsing WAV. */
  def syntheticWav(ids: DataFrame, idCol: String, seedCol: String,
                   tweakCol: String): DataFrame =
    ids.select(col(idCol).cast("long").as("id"),
      lit("audio").as("modality"),
      syntheticWavUdf(col(seedCol).cast("long"), col(tweakCol)).as("content"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(128).cast("int").as("duration_ms"),
        lit(8000).cast("int").as("sample_rate")).as("meta"))

  private val syntheticWavUdf = udf((seed: Long, tweak: Boolean) => {
    val n = 1024
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      var k = (((seed * 73 + i.toLong * i * 13 + i * seed) % 4001) - 2000).toInt
      if (tweak && i == 0) k += 17
      data(2 * i) = (k & 0xff).toByte
      data(2 * i + 1) = ((k >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    bos.write("RIFF".getBytes("US-ASCII")); le32(36 + data.length)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    bos.write("data".getBytes("US-ASCII")); le32(data.length)
    bos.write(data)
    bos.toByteArray
  })

  /** Deterministic 8x8 grayscale P6 PPM generator for tests/oracles:
    * pixel i (row-major) has R=G=B = (seed*37 + i*i*11 + i*seed) mod 251
    * (nonlinear in i with a seed interaction, so distinct seeds hash
    * near-randomly — no accidental near-dup pairs), and
    * `tweakCol` rows get pixel 0 bumped by one (a 1-pixel edit — a
    * near-duplicate within 1 Hamming bit of its original). The closed
    * pixel formula lets a SQL oracle recompute the expected dHash without
    * parsing PPM. */
  def syntheticPpm(ids: DataFrame, idCol: String, seedCol: String,
                   tweakCol: String): DataFrame =
    ids.select(col(idCol).cast("long").as("id"),
      lit("image").as("modality"),
      syntheticPpmUdf(col(seedCol).cast("long"), col(tweakCol)).as("content"),
      struct(lit(8).cast("int").as("width"), lit(8).cast("int").as("height"),
        lit(null).cast("int").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  private val syntheticPpmUdf = udf((seed: Long, tweak: Boolean) => {
    val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](8 * 8 * 3)
    var i = 0
    while (i < 8 * 8) {
      var v = ((seed * 37 + i.toLong * i * 11 + i * seed) % 251).toInt
      if (tweak && i == 0) v = (v + 1) % 251
      px(3 * i) = v.toByte; px(3 * i + 1) = v.toByte; px(3 * i + 2) = v.toByte
      i += 1
    }
    header ++ px
  })
}
