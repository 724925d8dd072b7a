package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Multimodal column handling for training-data pipelines: images/audio/
  * video ride along as opaque BINARY columns with typed metadata, and the
  * decode / feature-extract / resize / frame-sample stages are
  * partition-local map passes.
  *
  * The actual codec work (JPEG decode, resampling, ...) requires native
  * libraries that are NOT in this environment — those kernels are STUBBED
  * with a deterministic fake (clearly marked below). Everything Spark-side
  * is real and tested: the schema, the binary plumbing, the mapPartitions
  * batch shape, size-aware partitioning. Swapping the stub for a real
  * decoder changes one function.
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

  /** STUB decode kernel: a real implementation would decode the codec and
    * return pixel/sample arrays. The deterministic fake derives an
    * 8-float feature vector from the bytes so the pipeline shape (binary
    * in, fixed-width float vector out, batched per partition) is real. */
  private[graft] def fakeDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    // ??? <- real codec goes here; deterministic byte-fold fake below
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(bytes.length / 8, 1)
    out.map(_ / n)
  }

  private val decodeFeaturesUdf =
    udf((bytes: Array[Byte]) => fakeDecodeFeatures(bytes))

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
}
