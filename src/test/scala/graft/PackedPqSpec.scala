package graft

import graft.operators.{Ann, Knn, PackedPq, Quantization}
import org.apache.spark.sql.functions._

/** The resident PQ-code (ADC) tier must be ROW-IDENTICAL to the
  * oracle-checked Ann.ivfPqSearch on the same models — same codes, same
  * probe routing, same LUT arithmetic, same (dist, id) candidate cut,
  * same exact rerank. Plus the packed-tier contracts: append keeps cell
  * routing, slabs round-trip, footprint is m bytes/row. */
class PackedPqSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queryDF = embs.where(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
  private lazy val ivf = Ann.trainIvf(embs, "embedding", numCells = 8)
  private lazy val pq =
    Quantization.trainPq(embs, "embedding", numSubspaces = 8, numCentroids = 64)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

  test("packed ADC + rerank is row-identical to Ann.ivfPqSearch") {
    val pi = PackedPq.packIvfPq(embs, ivf, pq, idCol = "vec_id", vecCol = "embedding")
    try {
      for (nProbe <- Seq(2, 8)) {
        val want = rows(Ann.ivfPqSearch(queryDF, embs, ivf, pq,
          k = 10, nProbe = nProbe, fetchK = 50, metric = "l2",
          corpusId = "vec_id", vecCol = "embedding"))
        val got = rows(PackedPq.search(pi, queryDF, embs,
          k = 10, nProbe = nProbe, fetchK = 50, metric = "l2",
          corpusId = "vec_id", vecCol = "embedding"))
        assert(got === want, s"nProbe=$nProbe")
      }
    } finally pi.unpersist()
  }

  test("ADC stage: distances equal the adcDistance column on the returned ids") {
    val pi = PackedPq.packIvfPq(embs, ivf, pq, idCol = "vec_id", vecCol = "embedding")
    try {
      val qArr = queryDF.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val got = PackedPq.searchAdc[Long](pi, qArr, fetchK = 20, nProbe = 8)
      // column-path ADC distances for every (query, corpus) pair
      val coded = embs.select(col("vec_id").as("_cid"),
        Quantization.pqEncode(pq)(col("embedding")).as("_code"))
      val q = queryDF.select(col("query_id").as("_qid"),
        Quantization.pqLut(pq)(col("query_vec")).as("_lut"))
      val colDist = coded.crossJoin(q)
        .select(col("_qid"), col("_cid"),
          Quantization.adcDistance(col("_lut"), col("_code")).as("_d"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // nProbe=8 == all cells, so the packed cut must equal the global
      // (dist, id) top-fetchK of the column path, distances bit-equal
      val byQid = colDist.groupBy(_._1._1)
      for ((qid, nbrs) <- got) {
        val want = byQid(qid).toSeq
          .map { case ((_, cid), d) => (cid, d) }
          .sortBy { case (id, d) => (d, id) }.take(20)
        assert(nbrs.toSeq === want, s"query $qid")
      }
    } finally pi.unpersist()
  }

  test("append routes through the same models; search equals a fresh pack") {
    val a = embs.where(col("vec_id") % 2 === 0)
    val b = embs.where(col("vec_id") % 2 === 1)
    val whole = PackedPq.packIvfPq(embs, ivf, pq, idCol = "vec_id", vecCol = "embedding")
    val grown = PackedPq.appendIvfPq(
      PackedPq.packIvfPq(a, ivf, pq, idCol = "vec_id", vecCol = "embedding"),
      b, idCol = "vec_id", vecCol = "embedding")
    try {
      val want = rows(PackedPq.search(whole, queryDF, embs, k = 10, nProbe = 4,
        metric = "l2", corpusId = "vec_id", vecCol = "embedding"))
      val got = rows(PackedPq.search(grown, queryDF, embs, k = 10, nProbe = 4,
        metric = "l2", corpusId = "vec_id", vecCol = "embedding"))
      assert(got === want)
      assert(grown.blocks.getNumPartitions === ivf.numCells)
    } finally { whole.unpersist(); grown.unpersist() }
  }

  test("slab sidecar round-trips blocks, models, and cell routing") {
    val dir = java.nio.file.Files.createTempDirectory("pq-slabs").toString + "/idx"
    val pi = PackedPq.packIvfPq(embs, ivf, pq, idCol = "vec_id", vecCol = "embedding")
    try {
      val want = rows(PackedPq.search(pi, queryDF, embs, k = 10, nProbe = 4,
        metric = "l2", corpusId = "vec_id", vecCol = "embedding"))
      PackedPq.saveSlabs(pi, dir)
      assert(PackedPq.slabsExist(spark, dir))
      val re = PackedPq.loadSlabs[Long](spark, dir)
      try {
        assert(re.blocks.getNumPartitions === ivf.numCells)
        val got = rows(PackedPq.search(re, queryDF, embs, k = 10, nProbe = 4,
          metric = "l2", corpusId = "vec_id", vecCol = "embedding"))
        assert(got === want)
      } finally re.unpersist()
    } finally pi.unpersist()
  }

  test("residual codes: packed ADC + rerank is row-identical to Ann.ivfPqSearchResidual") {
    val pqRes = Quantization.trainPqResidual(embs, "embedding", ivf,
      numSubspaces = 8, numCentroids = 64)
    val pi = PackedPq.packIvfPq(embs, ivf, pqRes, idCol = "vec_id",
      vecCol = "embedding", residual = true)
    try {
      assert(pi.residual)
      for (nProbe <- Seq(2, 8)) {
        val want = rows(Ann.ivfPqSearchResidual(queryDF, embs, ivf, pqRes,
          k = 10, nProbe = nProbe, fetchK = 50, metric = "l2",
          corpusId = "vec_id", vecCol = "embedding"))
        val got = rows(PackedPq.search(pi, queryDF, embs,
          k = 10, nProbe = nProbe, fetchK = 50, metric = "l2",
          corpusId = "vec_id", vecCol = "embedding"))
        assert(got === want, s"nProbe=$nProbe")
      }
    } finally pi.unpersist()
  }

  test("residual flag survives slab sidecar, append, remove, and compact") {
    val dir = java.nio.file.Files.createTempDirectory("pq-res-slabs").toString + "/idx"
    val pqRes = Quantization.trainPqResidual(embs, "embedding", ivf,
      numSubspaces = 8, numCentroids = 64)
    val head = embs.where(col("vec_id") < 1500)
    val tail = embs.where(col("vec_id") >= 1500)
    val pi = PackedPq.packIvfPq(head, ivf, pqRes, idCol = "vec_id",
      vecCol = "embedding", residual = true)
    try {
      val grown = PackedPq.appendIvfPq(pi, tail, idCol = "vec_id", vecCol = "embedding")
      assert(grown.residual)
      val want = rows(PackedPq.search(grown, queryDF, embs, k = 10, nProbe = 4,
        metric = "l2", corpusId = "vec_id", vecCol = "embedding"))
      // a fresh full pack must agree — append encoded the tail residually
      val full = PackedPq.packIvfPq(embs, ivf, pqRes, idCol = "vec_id",
        vecCol = "embedding", residual = true)
      try assert(rows(PackedPq.search(full, queryDF, embs, k = 10, nProbe = 4,
        metric = "l2", corpusId = "vec_id", vecCol = "embedding")) === want)
      finally full.unpersist()
      val compacted = PackedPq.compactIvfPq(grown)
      assert(compacted.residual)
      PackedPq.saveSlabs(compacted, dir)
      val re = PackedPq.loadSlabs[Long](spark, dir)
      try {
        assert(re.residual, "slab sidecar lost the residual flag")
        assert(rows(PackedPq.search(re, queryDF, embs, k = 10, nProbe = 4,
          metric = "l2", corpusId = "vec_id", vecCol = "embedding")) === want)
        val pruned = PackedPq.remove(re, Set(7L, 8L))
        assert(pruned.residual)
        pruned.unpersist()
      } finally re.unpersist()
      compacted.unpersist()
      grown.unpersist()
    } finally pi.unpersist()
  }

  test("OPQ codes: packed ADC + rerank is row-identical to Ann.ivfPqSearchOpq") {
    val opq = Quantization.trainOpq(embs, "embedding",
      numSubspaces = 8, numCentroids = 64, opqIter = 1, sampleFraction = 0.25)
    val pi = PackedPq.packIvfPq(embs, ivf, opq.pq, idCol = "vec_id",
      vecCol = "embedding", rotation = Some(opq.rotation))
    try {
      assert(pi.rotation.isDefined)
      for (nProbe <- Seq(2, 8)) {
        val want = rows(Ann.ivfPqSearchOpq(queryDF, embs, ivf, opq,
          k = 10, nProbe = nProbe, fetchK = 50, metric = "l2",
          corpusId = "vec_id", vecCol = "embedding"))
        val got = rows(PackedPq.search(pi, queryDF, embs,
          k = 10, nProbe = nProbe, fetchK = 50, metric = "l2",
          corpusId = "vec_id", vecCol = "embedding"))
        assert(got === want, s"nProbe=$nProbe")
      }
    } finally pi.unpersist()
  }

  test("rotation survives slab sidecar, append, remove, compact; residual+rotation refused") {
    val dir = java.nio.file.Files.createTempDirectory("pq-opq-slabs").toString + "/idx"
    val opq = Quantization.trainOpq(embs, "embedding",
      numSubspaces = 8, numCentroids = 64, opqIter = 1, sampleFraction = 0.25)
    val head = embs.where(col("vec_id") < 1500)
    val tail = embs.where(col("vec_id") >= 1500)
    val pi = PackedPq.packIvfPq(head, ivf, opq.pq, idCol = "vec_id",
      vecCol = "embedding", rotation = Some(opq.rotation))
    try {
      val grown = PackedPq.appendIvfPq(pi, tail, idCol = "vec_id", vecCol = "embedding")
      assert(grown.rotation.isDefined)
      val want = rows(PackedPq.search(grown, queryDF, embs, k = 10, nProbe = 4,
        metric = "l2", corpusId = "vec_id", vecCol = "embedding"))
      // a fresh full pack must agree — append rotated the tail's encode
      val full = PackedPq.packIvfPq(embs, ivf, opq.pq, idCol = "vec_id",
        vecCol = "embedding", rotation = Some(opq.rotation))
      try assert(rows(PackedPq.search(full, queryDF, embs, k = 10, nProbe = 4,
        metric = "l2", corpusId = "vec_id", vecCol = "embedding")) === want)
      finally full.unpersist()
      val compacted = PackedPq.compactIvfPq(grown)
      assert(compacted.rotation.isDefined)
      PackedPq.saveSlabs(compacted, dir)
      val re = PackedPq.loadSlabs[Long](spark, dir)
      try {
        assert(re.rotation.isDefined, "slab sidecar lost the rotation")
        assert(re.rotation.get.map(_.toSeq).toSeq ===
          opq.rotation.map(_.toSeq).toSeq, "rotation did not round-trip exactly")
        assert(rows(PackedPq.search(re, queryDF, embs, k = 10, nProbe = 4,
          metric = "l2", corpusId = "vec_id", vecCol = "embedding")) === want)
        val pruned = PackedPq.remove(re, Set(7L, 8L))
        assert(pruned.rotation.isDefined)
        pruned.unpersist()
      } finally re.unpersist()
      // re-saving an UNROTATED pack into the same dir must clear the
      // rotation sidecar — a stale one would rotate queries against
      // unrotated codes on the next warm start
      val plain = PackedPq.packIvfPq(embs, ivf, pq, idCol = "vec_id",
        vecCol = "embedding")
      try {
        PackedPq.saveSlabs(plain, dir)
        val re2 = PackedPq.loadSlabs[Long](spark, dir)
        try assert(re2.rotation.isEmpty, "stale rotation sidecar survived")
        finally re2.unpersist()
      } finally plain.unpersist()
      compacted.unpersist()
      grown.unpersist()
      val ex = intercept[IllegalArgumentException] {
        PackedPq.packIvfPq(embs, ivf, opq.pq, idCol = "vec_id",
          vecCol = "embedding", residual = true, rotation = Some(opq.rotation))
      }
      assert(ex.getMessage.contains("rotation"))
    } finally pi.unpersist()
  }

  test("resident footprint is m bytes per row — the 64x cut vs the float tier") {
    val pi = PackedPq.packIvfPq(embs, ivf, pq, idCol = "vec_id", vecCol = "embedding")
    try {
      val n = embs.count()
      assert(PackedPq.codeBytes(pi) === n * pq.numSubspaces)
      val dim = embs.select(size(col("embedding"))).head().getInt(0)
      // 128d float32 = 512 B/row vs 8 code bytes
      assert(dim * 4L / pq.numSubspaces >= 32)
    } finally pi.unpersist()
  }

  test("fail loud: ragged vector, oversized codebook, oversized query batch") {
    val ragged = embs.limit(10).select(col("vec_id"),
      when(col("vec_id") === 3, slice(col("embedding"), 1, 5))
        .otherwise(col("embedding")).as("embedding"))
    val e1 = intercept[Exception] {
      PackedPq.packIvfPq(ragged, ivf, pq, idCol = "vec_id", vecCol = "embedding")
    }
    assert(e1.getMessage != null)

    val bigBook = Quantization.PqModel(2, 64,
      Array.fill(2)(Array.fill(300)(Array.fill(64)(0.0))))
    val e2 = intercept[IllegalArgumentException] {
      PackedPq.packIvfPq(embs, ivf, bigBook, idCol = "vec_id", vecCol = "embedding")
    }
    assert(e2.getMessage.contains("numCentroids <= 256"))

    val pi = PackedPq.packIvfPq(embs, ivf, pq, idCol = "vec_id", vecCol = "embedding")
    try {
      val e3 = intercept[IllegalArgumentException] {
        PackedPq.search(pi, embs.select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec")), embs,
          k = 10, metric = "l2", corpusId = "vec_id", vecCol = "embedding",
          maxQueryRows = 100)
      }
      assert(e3.getMessage.contains("maxQueryRows"))
    } finally pi.unpersist()
  }
}
