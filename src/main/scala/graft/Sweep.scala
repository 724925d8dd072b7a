package graft

import graft.operators.{Knn, PackedKnn}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Apples-to-apples baseline sweep: the reference's benchmark preset shapes
  * (BASELINE.md rows from notes_benchmark.txt:51-53 — 10K/100K/1M x 128d,
  * 20-query batch, k=10) on local[32].
  *
  * Prints one JSON line:
  *   {"metric":"sweep","dim":128,"batch":20,"k":10,
  *    "shapes":{"10000":{"ms_per_query":..,"runs_s":[..],
  *              "rowscan_ms_per_query":..,"floor_ms":..,"pack_s":..},...}}
  *
  * Headline `ms_per_query` is the packed-matrix BLAS path
  * (operators.PackedKnn): the corpus persisted as per-partition float32
  * matrices and scored with sgemm — the same resident-matrix contract as
  * the reference's NumPy batch GEMM (parallel_search.py:246-311), so the
  * two numbers measure the same thing. `rowscan_ms_per_query` is the
  * fused KnnTopK physical operator over the cached DataFrame (the
  * general-purpose path used by the oracle-checked queries), and
  * `floor_ms` is an empty job over the same partitions — the scheduling
  * floor any Spark job pays regardless of kernel.
  *
  * Method: deterministic synthetic corpus (hash-derived floats, the
  * PerfSpec generator); one warm-up run, then the median of 5 measured
  * runs per shape.
  */
object Sweep {
  private val Dim = 128
  private val BatchQ = 20
  private val K = 10
  private val MeasuredRuns = 5

  private def medianMs(runs: Seq[Double]): Double = runs.sorted.apply(runs.size / 2) * 1000.0

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shapes = sys.env.get("SPARK_GRAFT_SWEEP_SHAPES")
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(10000L, 100000L, 1000000L))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // raw (uncompressed) cached batches: the comparison target keeps a
      // plain float32 matrix in RAM, so don't pay per-run decompression
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val entries = shapes.map { n =>
      // size the task count to the corpus: ~25k vectors per task keeps every
      // core busy at 1M while not paying 32 task launches for a 10K corpus
      val parts = math.min(cpus.toInt, math.max(1, (n / 25000L).toInt))
      // cast to float32 explicitly (the / promotes to double) — matches the
      // reference's float32 matrix and halves the cached footprint
      val corpus = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(Dim - 1)),
          i => (pmod(xxhash64(col("id") * 131 + i), lit(2000)).cast("float") / 1000.0f - 1.0f))
          .cast("array<float>").as("embedding"))
        .repartition(parts).persist()
      corpus.count()
      val qArr = corpus.where(col("vec_id") < BatchQ)
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)

      // --- packed-matrix BLAS path (headline) ---
      val tPack0 = System.nanoTime()
      val pc = PackedKnn.pack(corpus, idCol = "vec_id", vecCol = "embedding")
      val packS = (System.nanoTime() - tPack0) / 1e9
      def runPacked(): Double = {
        val t0 = System.nanoTime()
        val res = PackedKnn.search(pc, qArr, K, "cosine")
        require(res.iterator.map(_._2.length).sum == BatchQ * K,
          s"packed search returned ${res.iterator.map(_._2.length).sum} rows")
        (System.nanoTime() - t0) / 1e9
      }
      // warm-up until C2 has compiled the sgemm/scoring path: the kernel
      // reaches steady state only after a few full passes (measured: task
      // medians 1345 -> 234 -> 151 -> ~45 ms at 1M), so a single warm-up
      // run would leave the measured median inside the JIT ramp
      (1 to 4).foreach(_ => runPacked())
      val packedRuns = (1 to MeasuredRuns).map(_ => runPacked())

      // --- scheduling floor: an empty job over the same partitions ---
      def runFloor(): Double = {
        val t0 = System.nanoTime()
        spark.sparkContext.runJob(pc.blocks, (it: Iterator[PackedKnn.Block[Long]]) => 0)
        (System.nanoTime() - t0) / 1e9
      }
      runFloor()
      val floorMs = medianMs((1 to MeasuredRuns).map(_ => runFloor()))
      // release the packed slabs BEFORE timing the rowscan so the two
      // paths are measured under the same residency (at 1M the extra
      // ~512 MB would bias the rowscan runs)
      pc.unpersist(blocking = true)

      // --- fused row-scan path over the cached DataFrame ---
      val rdd = Knn.knnTopKPartial(qArr, corpus, K, "cosine",
        corpusId = "vec_id", corpusVec = "embedding")
        .queryExecution.toRdd
      def runRowScan(): Double = {
        val t0 = System.nanoTime()
        val partials = spark.sparkContext.runJob(rdd,
          (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
            val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            while (it.hasNext) {
              val r = it.next()
              buf += ((r.getLong(0), r.getLong(1), r.getDouble(2)))
            }
            buf.toArray
          })
        val merged = partials.iterator.flatten.toArray
          .groupBy(_._1).values
          .map(_.sortBy(t => (t._3, t._2)).take(K).length).sum
        require(merged == BatchQ * K, s"got $merged rows")
        (System.nanoTime() - t0) / 1e9
      }
      runRowScan()
      val rowScanRuns = (1 to MeasuredRuns).map(_ => runRowScan())

      corpus.unpersist(blocking = true)
      // median: single-run GC pauses otherwise dominate the small shapes
      val msPerQ = medianMs(packedRuns) / BatchQ
      val rowScanMsPerQ = medianMs(rowScanRuns) / BatchQ
      val runsJson = packedRuns.sorted.map(r => f"$r%.4f").mkString("[", ",", "]")
      s""""$n":{"ms_per_query":${f"$msPerQ%.3f"},"runs_s":$runsJson,""" +
        s""""rowscan_ms_per_query":${f"$rowScanMsPerQ%.3f"},""" +
        s""""floor_ms":${f"$floorMs%.2f"},"pack_s":${f"$packS%.3f"}}"""
    }
    println(s"""{"metric":"sweep","dim":$Dim,"batch":$BatchQ,"k":$K,"cpus":$cpus,"shapes":${entries.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
