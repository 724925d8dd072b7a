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

  test("append: inserted rows join the standing graphs; unbounded-ef stays exhaustive") {
    val a = embs.where(col("vec_id") % 2 === 0)
    val b = embs.where(col("vec_id") % 2 === 1)
    val pa = PackedKnn.packIvf(a, ivf, idCol = "vec_id", vecCol = "embedding")
    val pg0 = PackedGraph.build[Long](pa, degree = 8, efConstruction = 32)
    pa.unpersist()
    val addPack = PackedKnn.packIvf(b, ivf, idCol = "vec_id", vecCol = "embedding")
    val pg = PackedGraph.append[Long](pg0, addPack)
    try {
      assert(pg.blocks.getNumPartitions === ivf.numCells)
      // full probe + unbounded ef over the UNION == the exact scan: the
      // protected spanning tree extends through appended insertions
      val exact = Knn.knnJoin(queryDF, embs, 10, "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .collect()
        .map(r => (r.getAs[Long]("query_id"),
          (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).map(_._2)).toMap
      val got = PackedGraph.searchGraph[Long](pg, qArr, 10,
        nProbe = ivf.numCells, ef = 0)
      got.foreach { case (qid, nbrs) =>
        assert(nbrs.map(_._1).toSeq === exact(qid).toSeq, s"query $qid")
      }
      // bounded-ef search still reaches usable recall on the grown graph
      val bounded = PackedGraph.searchGraph[Long](pg, qArr, 10,
        nProbe = 4, ef = 48).toMap
      val recalls = qArr.map { case (qid, _) =>
        bounded(qid).map(_._1).count(exact(qid).toSet) / 10.0 }
      assert(recalls.sum / recalls.length >= 0.8)
      // appended generations re-finalize through result(), so their walk
      // entry is the RECOMPUTED medoid of the grown block (live row
      // nearest the live-row mean, ties to the smaller row) — never a
      // stale pre-append entry or a default row 0
      pg.blocks.collect().filter(_.rows > 1).foreach { b =>
        val sums = new Array[Double](b.dim)
        val liveRows = (0 until b.rows).filter(r => b.dead == null || !b.dead(r))
        liveRows.foreach { r =>
          var j = 0; while (j < b.dim) { sums(j) += b.mat(r * b.dim + j); j += 1 } }
        val m = Array.tabulate(b.dim)(j => (sums(j) / liveRows.length).toFloat)
        val mNorm = math.sqrt(m.map(x => x.toDouble * x).sum)
        def d(r: Int): Double = {
          var dot = 0.0; var j = 0
          while (j < b.dim) { dot += b.mat(r * b.dim + j).toDouble * m(j); j += 1 }
          val denom = b.sqrtNorms(r) * mNorm
          if (denom == 0.0) 1.0 else 1.0 - dot / denom
        }
        val medoid = liveRows.minBy(r => (d(r), r))
        assert(b.entry === medoid,
          s"appended block must carry the recomputed medoid entry " +
            s"(got ${b.entry}, medoid $medoid of ${b.rows} rows)")
      }
    } finally pg.unpersist() // chain: releases pg0's blocks too
  }

  test("append into a cell with no standing graph builds one there") {
    import spark.implicits._
    // two tight clusters -> two cells; the initial build sees ONLY
    // cluster A, so cell B has no graph block until the append
    val clA = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => 1.0f + ((i * 31 + j * 7) % 10) / 100.0f)))
    val clB = (100L until 140L).map(i =>
      (i, Array.tabulate(8)(j => -1.0f - ((i * 17 + j * 5) % 10) / 100.0f)))
    val df = (clA ++ clB).toDF("vec_id", "embedding")
    val m = Ann.trainIvf(df, "embedding", numCells = 2, seed = 3L)
    val dfA = (clA).toDF("vec_id", "embedding")
    val dfB = (clB).toDF("vec_id", "embedding")
    val pg0 = {
      val p = PackedKnn.packIvf(dfA, m, idCol = "vec_id", vecCol = "embedding")
      try PackedGraph.build[Long](p, degree = 4, efConstruction = 8)
      finally p.unpersist()
    }
    val addPack = PackedKnn.packIvf(dfB, m, idCol = "vec_id", vecCol = "embedding")
    val pg = PackedGraph.append[Long](pg0, addPack)
    try {
      val q = Array((999L, Array.fill(8)(-1.05f)))
      val got = PackedGraph.searchGraph[Long](pg, q, 80, nProbe = 2, ef = 0)
      assert(got.head._2.map(_._1).toSet === (clA ++ clB).map(_._1).toSet)
    } finally pg.unpersist()
  }

  test("remove: tombstones route but never return; exhaustive over survivors") {
    val pg0 = PackedGraph.build[Long](pi, degree = 8, efConstruction = 32)
    // kill the first 200 ids — including row 0 of some cell (the walk
    // ENTRY) and, in the mega-hub sense, plenty of protected parents
    val gone = (0L until 200L).toSet
    val pg = PackedGraph.remove[Long](pg0, gone)
    try {
      assert(PackedGraph.deadFraction(pg) > 0.0)
      val survivors = embs.where(col("vec_id") >= 200)
      val exact = Knn.knnJoin(queryDF, survivors, 10, "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .collect()
        .map(r => (r.getAs[Long]("query_id"),
          (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).map(_._2)).toMap
      val got = PackedGraph.searchGraph[Long](pg, qArr, 10,
        nProbe = ivf.numCells, ef = 0)
      got.foreach { case (qid, nbrs) =>
        assert(nbrs.map(_._1).toSeq === exact(qid).toSeq, s"query $qid")
        assert(!nbrs.exists(n => gone(n._1)))
      }
      // append after remove: new rows never link to tombstones, and the
      // union of (survivors + appended) stays exhaustively searchable
      import spark.implicits._
      val extra = (5000L until 5020L)
        .map(i => (i, Array.tabulate(qArr.head._2.length)(j =>
          ((i * 37 + j * 11) % 100) / 50.0f - 1.0f)))
        .toDF("vec_id", "embedding")
      val addPack = PackedKnn.packIvf(extra, ivf, idCol = "vec_id", vecCol = "embedding")
      val pg2 = PackedGraph.append[Long](pg, addPack)
      val all2 = PackedGraph.searchGraph[Long](pg2, qArr.take(1),
        k = 4000, nProbe = ivf.numCells, ef = 0)
      val expectIds = embs.where(col("vec_id") >= 200)
        .select("vec_id").collect().map(_.getLong(0)).toSet ++ (5000L until 5020L)
      assert(all2.head._2.map(_._1).toSet === expectIds)
      pg2.unpersist()
    } finally pg.unpersist()
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
