package graft

import graft.operators.{Ann, Knn, PackedGraph, PackedKnn}
import org.apache.spark.sql.functions._

/** The resident graph-ANN tier: unbounded-ef search must be EXACT (the
  * protected spanning tree makes the walk exhaustive per cell), bounded-ef
  * search must reach a usable recall, and the mega-cluster pathology must
  * stay connected instead of quietly losing rows. */
class PackedGraphSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queryDF = embs.where(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
  private lazy val qArr = queryDF.collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    .sortBy(_._1)

  private lazy val ivf = Ann.trainIvf(embs, "embedding", numCells = 8, seed = 42L)
  private lazy val pi = PackedKnn.packIvf(embs, ivf,
    idCol = "vec_id", vecCol = "embedding")

  test("full-probe unbounded-ef graph search equals the exact packed scan") {
    val pg = PackedGraph.build(pi, degree = 8, efConstruction = 32)
    try {
      val exact = Knn.knnJoin(queryDF, embs, 10, "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .collect()
        .map(r => (r.getAs[Long]("query_id"),
          (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).map(_._2)).toMap
      val got = PackedGraph.searchGraph(pg, qArr, 10,
        nProbe = ivf.numCells, ef = 0) // ef <= 0 = unbounded = exhaustive
      got.foreach { case (qid, nbrs) =>
        assert(nbrs.map(_._1).toSeq === exact(qid).toSeq, s"query $qid")
        // walk distances are exact double-accum distances, not decodes
        // self-match cosine can land at -eps in floating point
        nbrs.foreach { case (_, d) => assert(!d.isNaN && d >= -1e-9 && d <= 2.0) }
      }
    } finally pg.unpersist()
  }

  test("bounded-ef pruned-probe search keeps high recall at a fraction of visits") {
    val pg = PackedGraph.build(pi, degree = 8, efConstruction = 32)
    try {
      val exact = PackedKnn.search(
        PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding"),
        qArr, 10, "cosine").toMap
      val got = PackedGraph.searchGraph(pg, qArr, 10, nProbe = 4, ef = 48).toMap
      val recalls = qArr.map { case (qid, _) =>
        val want = exact(qid).map(_._1).toSet
        got(qid).map(_._1).count(want) / 10.0
      }
      val mean = recalls.sum / recalls.length
      info(s"graph tier recall@10 (nProbe=4/8, ef=48): $mean")
      assert(mean >= 0.8, s"mean recall $mean")
    } finally pg.unpersist()
  }

  test("a planted identical-vector mega-cluster stays exhaustively reachable") {
    import spark.implicits._
    // 500 identical vectors + 8 distinct rows in one collection: every
    // insertion's nearest predecessor is the entry row, the pathological
    // star case — the protected tree must keep the cell connected, so
    // unbounded-ef search still sees every row
    val vec = Array.fill(8)(0.5f)
    val rows = (0L until 500L).map(i => (i, vec)) ++
      (500L until 508L).map(i => (i, Array.tabulate(8)(j => if (j == i % 8) 1f else 0.1f)))
    val df = rows.toDF("vec_id", "embedding")
    val m = Ann.trainIvf(df, "embedding", numCells = 2, seed = 1L)
    val p = PackedKnn.packIvf(df, m, idCol = "vec_id", vecCol = "embedding")
    val pg = PackedGraph.build(p, degree = 4, efConstruction = 8)
    try {
      val q = Array((999L, Array.tabulate(8)(j => if (j == 3) 1f else 0.1f)))
      val got = PackedGraph.searchGraph(pg, q, 508, nProbe = 2, ef = 0)
      // exhaustive: every row of the collection is returned exactly once
      assert(got.head._2.map(_._1).toSet === (0L until 508L).toSet)
    } finally { pg.unpersist(); p.unpersist() }
  }

  test("graph slabs round-trip: the reopened tier answers identically") {
    val pg = PackedGraph.build(pi, degree = 8, efConstruction = 32)
    val dir = java.nio.file.Files.createTempDirectory("graft-gslab").toString + "/g"
    try {
      assert(!PackedGraph.slabsExist(spark, dir))
      PackedGraph.saveSlabs(pg, dir)
      assert(PackedGraph.slabsExist(spark, dir))
      val re = PackedGraph.loadSlabs[Long](spark, dir)
      try {
        assert(re.degree === pg.degree && re.dim === pg.dim)
        assert(re.blocks.getNumPartitions === pg.blocks.getNumPartitions)
        val want = PackedGraph.searchGraph(pg, qArr, 10, nProbe = 4, ef = 48)
          .map { case (q, n) => (q, n.toSeq) }.toSeq
        val got = PackedGraph.searchGraph(re, qArr, 10, nProbe = 4, ef = 48)
          .map { case (q, n) => (q, n.toSeq) }.toSeq
        assert(got === want) // identical adjacency -> identical walk
      } finally re.unpersist()
    } finally pg.unpersist()
  }

  test("serving facade emits the knnJoin result shape and caps the batch") {
    val pg = PackedGraph.build(pi, degree = 8, efConstruction = 32)
    try {
      val out = PackedGraph.search(pg, queryDF, k = 5,
        nProbe = ivf.numCells, ef = 0)
      assert(out.columns.toSeq === Seq("query_id", "rank", "neighbor_id", "dist"))
      assert(out.count() === 5L * qArr.length)
      val e = intercept[IllegalArgumentException] {
        PackedGraph.search(pg, queryDF, k = 5, nProbe = 2, maxQueryRows = 2)
      }
      assert(e.getMessage.contains("maxQueryRows"))
    } finally pg.unpersist()
  }
}
