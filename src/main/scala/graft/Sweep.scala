package graft

import graft.operators.{Ann, Dedup, Knn, PackedGraph, PackedKnn, PackedPq, PackedPq4, PackedSq, Pipeline, PipelineSpec, PropertyGraph, Quantization}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Apples-to-apples baseline sweep: the reference's benchmark preset shapes
  * (BASELINE.md rows from notes_benchmark.txt:51-53 — 10K/100K/1M x 128d,
  * 20-query batch, k=10) on local[32].
  *
  * Prints one JSON line:
  *   {"metric":"sweep","dim":128,"batch":20,"k":10,
  *    "shapes":{"10000":{"ms_per_query":..,"runs_s":[..],
  *              "rowscan_ms_per_query":..,"floor_ms":..,"pack_s":..},...},
  *    "text_shapes":{"100000":{"minhash_s":..,"pipeline_s":..,...},...}}
  *
  * `floor_ms` (an empty job over the same partitions) doubles as the
  * window's ambient-noise gauge: cross-round comparisons should be read
  * against it — this box's background load swings run-to-run by more
  * than most cross-round deltas.
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
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq)
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

      // --- resident PQ-code (ADC) tier: m bytes/row instead of 4*dim ---
      // The memory tier below the float slabs (PackedPq): at 100 TB the
      // float matrix doesn't fit executor RAM and the codes do. Models
      // train on a bounded sample (the ingest-time artifact lifecycle);
      // the timed number is the resident ADC scan at k=10. The corpus is
      // a SIBLING-GROUP mixture (11 near-duplicates per latent item:
      // group base + 0.12-scaled per-row noise, both hash-derived), NOT
      // the uniform hash corpus above: on uniform-random 128d data
      // distances concentrate and no neighbor margin exists — recall@10
      // is ~0.1 for ANY index (the curse-of-dimensionality floor), so
      // its recall numbers measure nothing. Here every query's true
      // top-10 IS its sibling set, ~8x closer than the bulk — recall
      // measures exactly what the tier serves at 100 TB (surface the
      // genuinely-near rows). ADC cost per row is data-independent, so
      // the timing transfers. Queries are STRIDED across groups (one
      // per n/20th of the id space): a batch from one latent cluster
      // would route every probe to the same few cells and serialize the
      // scan onto one hot task — real query traffic is diverse.
      val pqCorpus = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(Dim - 1)), i =>
          ((pmod(xxhash64(expr("id div 11") * 7919L + i), lit(2000))
              .cast("float") / lit(1000.0f) - lit(1.0f))
            + (pmod(xxhash64(col("id") * 131 + i), lit(2000))
              .cast("float") / lit(1000.0f) - lit(1.0f)) * lit(0.12f)))
          .cast("array<float>").as("embedding"))
        .repartition(parts).persist()
      pqCorpus.count()
      val qStride = math.max(1L, n / BatchQ)
      val qArrC = pqCorpus
        .where(col("vec_id") % qStride === 0 && col("vec_id") < qStride * BatchQ)
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      val pcC = PackedKnn.pack(pqCorpus, idCol = "vec_id", vecCol = "embedding")
      val exactL2: Map[Long, Set[Long]] =
        PackedKnn.search(pcC, qArrC, K, "l2")
          .map { case (qid, nbrs) => qid -> nbrs.map(_._1).toSet }.toMap
      pcC.unpersist(blocking = true)
      val numCells0 = math.max(8, math.min(64, (n / 15625L).toInt))
      val tTrain0 = System.nanoTime()
      val ivfM0 = Ann.trainIvf(pqCorpus, "embedding", numCells = numCells0,
        maxIter = 5, sampleFraction = math.min(1.0, 100000.0 / n))
      // bound cell skew the way production ingest does (splitHotCells):
      // k-means on clustered data regularly hands one cell several times
      // the mean — and MLlib centroids are not bit-stable run to run, so
      // WHICH run gets the monster cell is luck. Unbounded, that cell
      // nondeterministically dominates every per-cell cost (the graph
      // build's bulk-vs-insertion arbitration most visibly: 21 s vs
      // 295 s on identical code). Splitting to <= 32768 rows/cell makes
      // the ladder measure the BOUNDED-cell discipline the operators
      // document.
      val ivfM = {
        val p0 = PackedKnn.packIvf(pqCorpus, ivfM0,
          idCol = "vec_id", vecCol = "embedding")
        val (split, nSplits) = PackedKnn.splitHotCells(p0, maxRows = 32768)
        if (nSplits > 0) System.err.println(
          s"[sweep] n=$n: split $nSplits hot cell(s) to <= 32768 rows")
        val m = split.model
        split.unpersist(blocking = true)
        if (nSplits > 0) p0.unpersist(blocking = true)
        m
      }
      val numCells = ivfM.numCells
      val nProbe = math.max(4, numCells / 8)
      val pqM = Quantization.trainPq(pqCorpus, "embedding", numSubspaces = 8,
        numCentroids = 64, maxIter = 5, sampleFraction = math.min(1.0, 50000.0 / n))
      val pqTrainS = (System.nanoTime() - tTrain0) / 1e9
      val tPqPack0 = System.nanoTime()
      val pi = PackedPq.packIvfPq(pqCorpus, ivfM, pqM,
        idCol = "vec_id", vecCol = "embedding")
      val pqPackS = (System.nanoTime() - tPqPack0) / 1e9
      val pqCodeBytes = PackedPq.codeBytes(pi)
      def runAdc(): Double = {
        val t0 = System.nanoTime()
        val res = PackedPq.searchAdc[Long](pi, qArrC, K, nProbe)
        require(res.iterator.map(_._2.length).sum == BatchQ * K,
          s"ADC search returned ${res.iterator.map(_._2.length).sum} rows")
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach(_ => runAdc())
      val adcRuns = (1 to MeasuredRuns).map(_ => runAdc())
      def recallOf(got: Array[(Long, Array[(Long, Double)])]): Double =
        got.map { case (qid, nbrs) =>
          nbrs.iterator.map(_._1).count(exactL2(qid)) / K.toDouble
        }.sum / got.length
      val rawRecall = recallOf(PackedPq.searchAdc[Long](pi, qArrC, K, nProbe))
      // funnel recall: fetchK ADC candidates exactly reranked (the
      // production composition — rerank touches only candidates)
      val cand = PackedPq.searchAdc[Long](pi, qArrC, 100, nProbe)
      import spark.implicits._
      val candDF = cand.toSeq
        .flatMap { case (qid, nbrs) => nbrs.map { case (nid, _) => (qid, nid) } }
        .toDF("query_id", "neighbor_id")
      val qdf = pqCorpus
        .where(col("vec_id") % qStride === 0 && col("vec_id") < qStride * BatchQ)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val funnelRecall = Quantization.rerankExact(candDF, qdf, pqCorpus, K, "l2",
          corpusId = "vec_id", vecCol = "embedding")
        .collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (qid, rows) =>
          rows.iterator.map(_.getAs[Long]("neighbor_id")).count(exactL2(qid)) / K.toDouble }
        .sum / qArrC.length
      pi.unpersist(blocking = true)

      // --- 4-bit nibble codes (fastscan layout): HALF the bytes again ---
      // 16-centroid subspaces, two codes per byte, L1-dense 16-entry
      // LUTs; ADC bit-identical to an 8-bit pack of the same model, so
      // the delta vs pq_* is pure byte-budget-vs-recall at the ladder's
      // bottom rung.
      val tPq4Train0 = System.nanoTime()
      val pq4M = Quantization.trainPq(pqCorpus, "embedding", numSubspaces = 8,
        numCentroids = 16, maxIter = 5, sampleFraction = math.min(1.0, 50000.0 / n))
      val pq4TrainS = (System.nanoTime() - tPq4Train0) / 1e9
      val pi4 = PackedPq4.packIvfPq4(pqCorpus, ivfM, pq4M,
        idCol = "vec_id", vecCol = "embedding")
      def runAdc4(): Double = {
        val t0 = System.nanoTime()
        val res = PackedPq4.searchAdc4[Long](pi4, qArrC, K, nProbe)
        require(res.iterator.map(_._2.length).sum == BatchQ * K,
          s"4-bit ADC search returned ${res.iterator.map(_._2.length).sum} rows")
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach(_ => runAdc4())
      val adc4Runs = (1 to MeasuredRuns).map(_ => runAdc4())
      val pq4Recall = recallOf(PackedPq4.searchAdc4[Long](pi4, qArrC, K, nProbe))
      val pq4CodeBytes = PackedPq4.codeBytes(pi4)
      pi4.unpersist(blocking = true)

      // --- residual codes (FAISS IVFADC): same bytes, finer quantization ---
      // Same coarse model, PQ trained on vec − cellCentroid; the ADC scan
      // cost is identical (the LUT build is per (query, cell) instead of
      // per query — driver-side noise), so the delta this measures is
      // pure recall at the same byte budget.
      val tResTrain0 = System.nanoTime()
      val pqResM = Quantization.trainPqResidual(pqCorpus, "embedding", ivfM,
        numSubspaces = 8, numCentroids = 64, maxIter = 5,
        sampleFraction = math.min(1.0, 50000.0 / n))
      val pqResTrainS = (System.nanoTime() - tResTrain0) / 1e9
      val piRes = PackedPq.packIvfPq(pqCorpus, ivfM, pqResM,
        idCol = "vec_id", vecCol = "embedding", residual = true)
      def runAdcRes(): Double = {
        val t0 = System.nanoTime()
        val res = PackedPq.searchAdc[Long](piRes, qArrC, K, nProbe)
        require(res.iterator.map(_._2.length).sum == BatchQ * K,
          s"residual ADC search returned ${res.iterator.map(_._2.length).sum} rows")
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach(_ => runAdcRes())
      val adcResRuns = (1 to MeasuredRuns).map(_ => runAdcRes())
      val resRecall = recallOf(PackedPq.searchAdc[Long](piRes, qArrC, K, nProbe))
      piRes.unpersist(blocking = true)

      // --- OPQ codes (Ge'13): learned rotation, same bytes, same scan ---
      // Coarse routing stays raw-space; the rotation only re-balances
      // what the codebooks see, so like the residual tier the delta is
      // pure recall at the same byte budget (the per-query rotate is a
      // d×d driver-side matvec — noise).
      val tOpqTrain0 = System.nanoTime()
      val opqM = Quantization.trainOpq(pqCorpus, "embedding",
        numSubspaces = 8, numCentroids = 64, maxIter = 5, opqIter = 1,
        sampleFraction = math.min(1.0, 50000.0 / n))
      val opqTrainS = (System.nanoTime() - tOpqTrain0) / 1e9
      val piOpq = PackedPq.packIvfPq(pqCorpus, ivfM, opqM.pq,
        idCol = "vec_id", vecCol = "embedding", rotation = Some(opqM.rotation))
      def runAdcOpq(): Double = {
        val t0 = System.nanoTime()
        val res = PackedPq.searchAdc[Long](piOpq, qArrC, K, nProbe)
        require(res.iterator.map(_._2.length).sum == BatchQ * K,
          s"OPQ ADC search returned ${res.iterator.map(_._2.length).sum} rows")
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach(_ => runAdcOpq())
      val adcOpqRuns = (1 to MeasuredRuns).map(_ => runAdcOpq())
      val opqRecall = recallOf(PackedPq.searchAdc[Long](piOpq, qArrC, K, nProbe))
      piOpq.unpersist(blocking = true)

      // --- SQ8 tier: dim bytes/row, near-exact, served unreranked ---
      // The middle memory rung: 4× under the float slabs, 16× over the
      // PQ codes at dim=128/m=8 — measures what the byte budget buys.
      val tSqTrain0 = System.nanoTime()
      val sqM = Quantization.trainSq(pqCorpus, "embedding",
        sampleFraction = math.min(1.0, 100000.0 / n))
      val sqTrainS = (System.nanoTime() - tSqTrain0) / 1e9
      val piSq = PackedSq.packIvfSq(pqCorpus, ivfM, sqM,
        idCol = "vec_id", vecCol = "embedding")
      def runSq(): Double = {
        val t0 = System.nanoTime()
        val res = PackedSq.searchSq[Long](piSq, qArrC, K, nProbe, "l2")
        require(res.iterator.map(_._2.length).sum == BatchQ * K,
          s"SQ search returned ${res.iterator.map(_._2.length).sum} rows")
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach(_ => runSq())
      val sqRuns = (1 to MeasuredRuns).map(_ => runSq())
      val sqRecall = recallOf(PackedSq.searchSq[Long](piSq, qArrC, K, nProbe, "l2"))
      val sqBytes = PackedSq.codeBytes(piSq)
      // integer-domain ADC twin: same codes, same probes — the hot loop
      // is the vectorizable uint8×int dot instead of the double-LUT
      // gather; recall must hold while ms/q drops (the tier earning
      // latency, not just footprint)
      def runSqInt(): Double = {
        val t0 = System.nanoTime()
        val res = PackedSq.searchSqInt[Long](piSq, qArrC, K, nProbe, "l2")
        require(res.iterator.map(_._2.length).sum == BatchQ * K,
          s"SQ int search returned ${res.iterator.map(_._2.length).sum} rows")
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach(_ => runSqInt())
      val sqIntRuns = (1 to MeasuredRuns).map(_ => runSqInt())
      val sqIntRecall = recallOf(PackedSq.searchSqInt[Long](piSq, qArrC, K, nProbe, "l2"))
      piSq.unpersist(blocking = true)

      // --- graph tier: NSW-per-cell over the float slabs (PackedGraph) ---
      // The fifth rung of the resident ladder — full float footprint plus
      // ~degree int slots/row of adjacency, bought back as walk-bounded
      // distance evaluations: recall competitive with MORE probed cells
      // than the flat scan can afford at the same ms/q. Operating point
      // deg=24/efC=128/ef=160 from the GraphTune sweep; probes 2x the PQ
      // tiers' budget because each probe is ef-bounded, not cell-sized.
      val pcG = PackedKnn.packIvf(pqCorpus, ivfM,
        idCol = "vec_id", vecCol = "embedding")
      val tGBuild0 = System.nanoTime()
      // metric must match the searches below (l2): edge diversification
      // under a mismatched metric skews the published operating points
      val pg = PackedGraph.build(pcG, degree = 24, efConstruction = 128,
        metric = "l2")
      val graphBuildS = (System.nanoTime() - tGBuild0) / 1e9
      pcG.unpersist(blocking = true) // the graph tier holds its own slabs
      val gProbe = math.min(ivfM.numCells, nProbe * 2)
      def runGraph(): Double = {
        val t0 = System.nanoTime()
        val res = PackedGraph.searchGraph(pg, qArrC, K, nProbe = gProbe,
          ef = 160, metric = "l2")
        require(res.iterator.map(_._2.length).sum == BatchQ * K,
          s"graph search returned ${res.iterator.map(_._2.length).sum} rows")
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach(_ => runGraph())
      val graphRuns = (1 to MeasuredRuns).map(_ => runGraph())
      val graphRecall = recallOf(
        PackedGraph.searchGraph(pg, qArrC, K, nProbe = gProbe, ef = 160, metric = "l2"))
      val graphEdges = PackedGraph.edgeSlots(pg)
      pg.unpersist(blocking = true)
      pqCorpus.unpersist(blocking = true)
      // median: single-run GC pauses otherwise dominate the small shapes
      val msPerQ = medianMs(packedRuns) / BatchQ
      val rowScanMsPerQ = medianMs(rowScanRuns) / BatchQ
      val runsJson = packedRuns.sorted.map(r => f"$r%.4f").mkString("[", ",", "]")
      val pqMsPerQ = medianMs(adcRuns) / BatchQ
      val pqResMsPerQ = medianMs(adcResRuns) / BatchQ
      s""""$n":{"ms_per_query":${f"$msPerQ%.3f"},"runs_s":$runsJson,""" +
        s""""rowscan_ms_per_query":${f"$rowScanMsPerQ%.3f"},""" +
        s""""floor_ms":${f"$floorMs%.2f"},"pack_s":${f"$packS%.3f"},""" +
        s""""pq_ms_per_query":${f"$pqMsPerQ%.3f"},""" +
        s""""pq_recall10":${f"$rawRecall%.3f"},"pq_funnel_recall10":${f"$funnelRecall%.3f"},""" +
        s""""pq4_ms_per_query":${f"${medianMs(adc4Runs) / BatchQ}%.3f"},""" +
        s""""pq4_recall10":${f"$pq4Recall%.3f"},""" +
        s""""pq4_train_s":${f"$pq4TrainS%.3f"},"pq4_code_bytes":$pq4CodeBytes,""" +
        s""""pq_res_ms_per_query":${f"$pqResMsPerQ%.3f"},""" +
        s""""pq_res_recall10":${f"$resRecall%.3f"},""" +
        s""""pq_res_train_s":${f"$pqResTrainS%.3f"},""" +
        s""""pq_opq_ms_per_query":${f"${medianMs(adcOpqRuns) / BatchQ}%.3f"},""" +
        s""""pq_opq_recall10":${f"$opqRecall%.3f"},""" +
        s""""pq_opq_train_s":${f"$opqTrainS%.3f"},""" +
        s""""sq_ms_per_query":${f"${medianMs(sqRuns) / BatchQ}%.3f"},""" +
        s""""sq_recall10":${f"$sqRecall%.3f"},""" +
        s""""sq_int_ms_per_query":${f"${medianMs(sqIntRuns) / BatchQ}%.3f"},""" +
        s""""sq_int_recall10":${f"$sqIntRecall%.3f"},""" +
        s""""sq_train_s":${f"$sqTrainS%.3f"},"sq_code_bytes":$sqBytes,""" +
        s""""graph_ms_per_query":${f"${medianMs(graphRuns) / BatchQ}%.3f"},""" +
        s""""graph_recall10":${f"$graphRecall%.3f"},""" +
        s""""graph_build_s":${f"$graphBuildS%.3f"},""" +
        s""""graph_nprobe":$gProbe,"graph_edge_slots":$graphEdges,""" +
        s""""pq_code_bytes":$pqCodeBytes,"pq_cells":$numCells,"pq_nprobe":$nProbe,""" +
        s""""pq_train_s":${f"$pqTrainS%.3f"},"pq_pack_s":${f"$pqPackS%.3f"}}"""
    }
    // ---------------- text / dedup ladder ----------------
    // The dedup/curation pillar proven at the same rungs as the vector
    // pillar: a synthetic corpus shaped like the driver's documents
    // table (~40 words/doc, small vocabulary, newline-separated lines)
    // with PLANTED structure — every doc_id % 10 == 9 is a near-dup of
    // its predecessor (one appended token, 3-shingle Jaccard ~0.9), and
    // every doc_id % 3 == 0 carries a shared boilerplate line. Measured:
    // banded MinHash LSH (pairs must recover the planted rate),
    // duplicate-span detection, boilerplate strip, and the full composed
    // curation pipeline, each as wall seconds + rows/s. Hot-bucket
    // degradation is asserted ZERO through the per-run scope — at these
    // rungs every banded pass must be exact all-pairs.
    val textShapes = sys.env.get("SPARK_GRAFT_SWEEP_TEXT_SHAPES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq)
      .getOrElse(Seq(100000L, 1000000L))
    val textEntries = textShapes.map { n =>
      val parts = math.min(cpus.toInt, math.max(1, (n / 25000L).toInt))
      val vocab = array((0 until 64).map(i => lit(s"w${i}x")): _*)
      val docs = spark.range(n).select(col("id").as("doc_id"),
        concat(
          when(pmod(col("id"), lit(3)) === 0,
            lit("please accept our cookie notice to continue\n")).otherwise(lit("")),
          concat_ws(" ", transform(sequence(lit(0), lit(39)), j =>
            element_at(vocab, pmod(xxhash64(
              // dups derive their words from the PREDECESSOR id
              when(pmod(col("id"), lit(10)) === 9, col("id") - 1).otherwise(col("id"))
                * 1009L + j), lit(64)).cast("int") + 1))),
          when(pmod(col("id"), lit(10)) === 9, lit(" zzdup")).otherwise(lit(""))
        ).as("text"))
        .repartition(parts).persist()
      docs.count()
      def timed(body: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = body
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val ((minhashS, pairRows), hb1) = Dedup.withHotBucketScope(timed {
        Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5).count()
      })
      require(pairRows >= n / 10 * 9 / 10,
        s"minhashLsh recovered $pairRows of ~${n / 10} planted near-dup pairs")
      val (spansS, spanRows) = timed {
        Dedup.dupNgramSpans(docs, "doc_id", "text", n = 8).count()
      }
      val (boilerS, boilerRows) = timed {
        Dedup.stripBoilerplate(docs, "doc_id", "text", minDocs = 100).count()
      }
      // No outer withHotBucketScope here: Pipeline.prepare installs its
      // own inner scope and nested scopes do NOT propagate counts to the
      // parent (documented semantics), so an outer bracket would always
      // read empty — prepared.hotBucketDegradation IS the pipeline's
      // hot-bucket gauge and the require below is the real gate.
      val (pipelineS, pipeRows) = timed {
        val prepared = Pipeline.prepare(docs, "doc_id", "text",
          PipelineSpec(
            minQuality = 0.0,
            stripBoilerplateMinDocs = Some(100),
            exactDedup = true,
            nearDupThreshold = Some(0.5),
            numShards = 32))
        val c = prepared.data.count()
        require(prepared.hotBucketDegradation.isEmpty,
          s"pipeline degraded: ${prepared.hotBucketDegradation}")
        c
      }
      require(hb1.isEmpty,
        s"hot-bucket degradation at text rung $n: $hb1")
      docs.unpersist(blocking = true)
      s""""$n":{"minhash_s":${f"$minhashS%.3f"},"minhash_rows_per_s":${(n / minhashS).toLong},""" +
        s""""minhash_pairs":$pairRows,""" +
        s""""spans_s":${f"$spansS%.3f"},"span_rows":$spanRows,""" +
        s""""boilerplate_s":${f"$boilerS%.3f"},"boilerplate_rows":$boilerRows,""" +
        s""""pipeline_s":${f"$pipelineS%.3f"},"pipeline_rows_per_s":${(n / pipelineS).toLong},""" +
        s""""pipeline_survivors":$pipeRows,"hot_buckets":0}"""
    }

    // ---------------- graph analytics ladder ----------------
    // The third pillar's scale rung (r12 verdict #1 — the bench's
    // 16,630-node graph proves correctness, not the 100 TB stance, and
    // PageRank/LP/CC are the top-5 bench costs). Deterministic synthetic
    // power-law graph with PLANTED component structure:
    //  - nodes partitioned into 16 contiguous blocks; every edge stays
    //    inside its block, so CC must return EXACTLY 16 components
    //    (asserted) — correctness at scale, not just throughput;
    //  - a (v, v+1) backbone inside each block guarantees connectivity;
    //  - random edges pick src by a cubed-uniform (power-law-ish: block
    //    head nodes become hubs with ~100x mean degree) and dst uniform
    //    in-block — realistic skew for the groupBy-heavy rounds.
    // Measured per rung: pagerank (5 rounds), connected components
    // (fixpoint), label propagation (5 rounds) wall seconds + edges/s,
    // floor_ms as the window's noise gauge. The NODE-SIZED-SHUFFLE claim
    // is measured directly (SparkListener shuffle-write bytes): PageRank's
    // marginal per-round shuffle at 10x the edges over the SAME node set
    // must stay within 3x — per-round traffic scales with the rank
    // vector, not the cached edge relation.
    case class GraphShape(edges: Long, nodes: Long)
    val GraphComps = 16L
    val graphShapes = sys.env.get("SPARK_GRAFT_SWEEP_GRAPH_SHAPES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).map { s =>
        val Array(e, v) = s.split(":"); val shape = GraphShape(e.toLong, v.toLong)
        // the planted-component construction needs nNodes to split into
        // 16 equal blocks; a non-divisible count would truncate blockSize
        // and produce a 17th backbone segment, failing the CC assertion
        // with a misleading "correctness" message (and nNodes < 16 would
        // divide by zero in the generator)
        require(shape.nodes >= GraphComps && shape.nodes % GraphComps == 0,
          s"graph shape $s: node count must be a positive multiple of " +
            s"$GraphComps (planted-component construction)")
        shape
      }.toSeq)
      .getOrElse(Seq(GraphShape(1000000L, 100000L), GraphShape(10000000L, 1000000L)))

    def shuffleBytesDuring[T](body: => T): (T, Long) = {
      val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val r = body
        // listener events are async: settle until the byte count is
        // stable for 500 ms (the PackedKnnSpec pattern)
        var last = -1L
        val deadline = System.nanoTime() + 10_000_000_000L
        while (bytes.get != last && System.nanoTime() < deadline) {
          last = bytes.get; Thread.sleep(500)
        }
        (r, bytes.get)
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    def syntheticGraph(m: Long, nNodes: Long): org.apache.spark.sql.DataFrame = {
      val blockSize = nNodes / GraphComps
      val parts = math.min(cpus.toInt, math.max(1, (m / 250000L).toInt))
      val backbone = spark.range(nNodes)
        .where(pmod(col("id") + 1, lit(blockSize)) =!= 0)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val nRand = m - (nNodes - GraphComps)
      val rand = spark.range(nRand).select(
        (pmod(xxhash64(col("id") * 37L + 3L), lit(GraphComps)) * blockSize +
          floor(pow(
            pmod(xxhash64(col("id") * 131L + 7L), lit(1000000L)).cast("double") / 1e6,
            lit(3.0)) * blockSize).cast("long")).as("src"),
        (pmod(xxhash64(col("id") * 37L + 3L), lit(GraphComps)) * blockSize +
          pmod(xxhash64(col("id") * 271L + 11L), lit(blockSize))).as("dst"))
      backbone.unionByName(rand)
        .where(col("src") =!= col("dst"))
        .repartition(parts).persist()
    }

    // per-round marginal shuffle bytes of an iterative graph op:
    // (bytes at 5 rounds - bytes at 1 round) / 4 cancels the one-time
    // adjacency build + node-relation shuffles that dominate round 1
    def marginalRoundShuffle(edges: org.apache.spark.sql.DataFrame,
        algo: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Long = {
      val (_, b1) = shuffleBytesDuring { algo(edges, 1).count() }
      val (_, b5) = shuffleBytesDuring { algo(edges, 5).count() }
      math.max(0L, (b5 - b1) / 4)
    }

    val graphEntries = graphShapes.map { case GraphShape(m, nNodes) =>
      val edges = syntheticGraph(m, nNodes)
      val mActual = edges.count()
      // best-of-2 (the Bench protocol): a COLD first run pays the round's
      // whole-stage-codegen JIT — measured 8.9 s cold vs 3.2-4.1 s warm on
      // identical 1M-edge runs in one JVM, the exact bimodality the first
      // three r13 windows showed — and the published number should be the
      // steady state, like the vector rungs' explicit warm-up achieves
      def timed(body: => Long): (Double, Long) = {
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val rows = body
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val a = once(); val b = once()
        (math.min(a._1, b._1), b._2)
      }
      // scheduling floor over the edge relation's partitions
      val floorT0 = System.nanoTime()
      spark.sparkContext.runJob(edges.rdd, (_: Iterator[org.apache.spark.sql.Row]) => 0)
      val floorMs = (System.nanoTime() - floorT0) / 1e6
      val (prS, prRows) = timed { PropertyGraph.pageRank(edges, iterations = 5).count() }
      require(prRows == nNodes, s"pagerank emitted $prRows of $nNodes nodes")
      val (ccS, ccComps) = timed {
        PropertyGraph.connectedComponents(edges)
          .select("component_id").distinct().count()
      }
      require(ccComps == GraphComps,
        s"planted $GraphComps components, CC found $ccComps")
      val (lpS, lpRows) = timed {
        PropertyGraph.labelPropagation(edges, iterations = 5).count()
      }
      require(lpRows == nNodes, s"LP emitted $lpRows of $nNodes nodes")
      // triangles: the degree-oriented wedge join is O(m^1.5) regardless
      // of skew — this rung puts that claim on the hub-heavy power-law
      // shape (block heads carry ~100x mean degree)
      val (triS, triRows) = timed {
        PropertyGraph.triangleCounts(edges).count()
      }
      require(triRows == nNodes, s"triangles emitted $triRows of $nNodes nodes")
      // HITS: the single most expensive bench query and the only iterative
      // graph op whose fused half-round plan had no scale rung (r13
      // verdict #6) — hub+auth vectors shuffle per half-round, so its
      // marginal round traffic should read ~2x PageRank's, never
      // edge-sized
      val (hitsS, hitsRows) = timed {
        PropertyGraph.hits(edges, iterations = 5).count()
      }
      require(hitsRows == nNodes, s"HITS emitted $hitsRows of $nNodes nodes")
      val roundMb = marginalRoundShuffle(edges,
        (e, it) => PropertyGraph.pageRank(e, iterations = it)) / 1e6
      val hitsRoundMb = marginalRoundShuffle(edges,
        (e, it) => PropertyGraph.hits(e, iterations = it)) / 1e6
      edges.unpersist(blocking = true)
      s""""$m":{"nodes":$nNodes,"edges":$mActual,""" +
        s""""pagerank_s":${f"$prS%.3f"},"pagerank_edges_per_s":${(mActual / prS).toLong},""" +
        s""""cc_s":${f"$ccS%.3f"},"cc_edges_per_s":${(mActual / ccS).toLong},"cc_components":$ccComps,""" +
        s""""lp_s":${f"$lpS%.3f"},"lp_edges_per_s":${(mActual / lpS).toLong},""" +
        s""""tri_s":${f"$triS%.3f"},"tri_edges_per_s":${(mActual / triS).toLong},""" +
        s""""hits_s":${f"$hitsS%.3f"},"hits_edges_per_s":${(mActual / hitsS).toLong},""" +
        s""""pr_round_shuffle_mb":${f"$roundMb%.2f"},""" +
        s""""hits_round_shuffle_mb":${f"$hitsRoundMb%.2f"},"floor_ms":${f"$floorMs%.2f"}}"""
    }
    // node-sized-shuffle proof, two halves:
    //  (1) growth: 10x the edges over the SAME node set must NOT 10x the
    //      per-round shuffle. Tolerance is 5x, not 10/3: the round's
    //      partial-agg output is min(rows-per-partition, n) per partition
    //      (map-side combine), which grows sublinearly until it SATURATES
    //      at the node count — at 1M edges/100k nodes it has not yet
    //      saturated, so up to ~4x growth is legitimate node-bounded
    //      behavior, while edge-sized traffic would show ~10x;
    //  (2) absolute: the per-round bytes stay within parts x nodes x a
    //      generous 128 B/row — the bound that holds at ANY edge count.
    val (smallE, bigE) = (syntheticGraph(1000000L, 100000L),
      syntheticGraph(10000000L, 100000L))
    smallE.count(); bigE.count()
    // checked per ALGO: PageRank shuffles one rank vector per round
    // (bound: parts x nodes x 128 B); HITS shuffles hub AND auth vectors
    // per round (two half-rounds — bound doubled accordingly)
    def nodeSizedProof(name: String, bytesPerRow: Long,
        algo: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): (Long, Long, Boolean) = {
      val (roundSmall, roundBig) =
        (marginalRoundShuffle(smallE, algo), marginalRoundShuffle(bigE, algo))
      val absBound = cpus.toLong * 100000L * bytesPerRow
      // if the small-graph measurement degenerated to 0 (listener events
      // lost inside the settle deadline, or b5 <= b1 under noise — both
      // clamped by max(0,_)), the growth ratio is meaningless: fall back
      // to the absolute bound alone (the bound that holds at ANY edge
      // count) rather than aborting the sweep with an edge-sized verdict
      val nodeSized =
        if (roundSmall == 0L) roundBig <= absBound
        else roundBig <= roundSmall * 5 && roundBig <= absBound
      require(nodeSized,
        if (roundSmall == 0L)
          s"$name per-round shuffle probe: 1M-edge measurement read 0 B " +
            s"(listener measurement failed) and the 10M-edge run $roundBig B " +
            s"exceeds the absolute node-sized bound $absBound B"
        else
          s"$name per-round shuffle $roundBig B " +
            s"(${roundBig.toDouble / roundSmall}x the 1M-edge run, " +
            s"abs bound $absBound B) — edge-sized, not node-sized")
      (roundSmall, roundBig, nodeSized)
    }
    val (prSmall, prBig, prNodeSized) = nodeSizedProof("PageRank", 128L,
      (e, it) => PropertyGraph.pageRank(e, iterations = it))
    val (hSmall, hBig, hNodeSized) = nodeSizedProof("HITS", 256L,
      (e, it) => PropertyGraph.hits(e, iterations = it))
    smallE.unpersist(blocking = true); bigE.unpersist(blocking = true)

    println(s"""{"metric":"sweep","dim":$Dim,"batch":$BatchQ,"k":$K,"cpus":$cpus,"shapes":${entries.mkString("{", ",", "}")},"text_shapes":${textEntries.mkString("{", ",", "}")},"graph_shapes":${graphEntries.mkString("{", ",", "}")},"graph_shuffle_node_sized":${prNodeSized && hNodeSized},"pr_round_shuffle_bytes_1m_edges":$prSmall,"pr_round_shuffle_bytes_10m_edges_same_nodes":$prBig,"hits_round_shuffle_bytes_1m_edges":$hSmall,"hits_round_shuffle_bytes_10m_edges_same_nodes":$hBig}""")
    spark.stop()
  }
}
