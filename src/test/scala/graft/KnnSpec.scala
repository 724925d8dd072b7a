package graft

import graft.operators.{Ann, Filter, Knn, Quantization}
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queries = embs.where(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("aggregator knnJoin equals window knnJoin on all metrics") {
    for (m <- Seq("cosine", "l2", "ip")) {
      val a = Knn.knnJoin(queries, embs, 10, m, corpusId = "vec_id", corpusVec = "embedding")
      val w = Knn.knnJoinWindow(queries, embs, 10, m, corpusId = "vec_id", corpusVec = "embedding")
      assert(asSet(a) === asSet(w), s"metric $m")
    }
  }

  test("rank 1 under cosine is the query itself at distance ~0") {
    val top = Knn.knnJoin(queries, embs, 1, "cosine",
        corpusId = "vec_id", corpusVec = "embedding")
      .collect()
    assert(top.length === 5)
    top.foreach { r =>
      assert(r.getAs[Long]("query_id") === r.getAs[Long]("neighbor_id"))
      assert(math.abs(r.getAs[Double]("dist")) < 1e-9)
    }
  }

  test("filtered knn returns only rows passing the filter") {
    val got = Knn.knnJoin(queries, embs, 10, "cosine",
      corpusId = "vec_id", corpusVec = "embedding",
      filter = Some(Filter.In("label", Seq(2, 4))))
    val labels = got.join(embs, got("neighbor_id") === embs("vec_id"))
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(labels.subsetOf(Set(2, 4)))
  }

  test("single-query search equals the k first rows of the join") {
    val q = embs.where(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0).toArray
    val single = Knn.search(embs, q, 5, "l2", corpusId = "vec_id", corpusVec = "embedding")
      .collect().map(_.getLong(0)).toSeq
    val joined = Knn.knnJoin(
        embs.where(col("vec_id") === 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec")),
        embs, 5, "l2", corpusId = "vec_id", corpusVec = "embedding")
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(single === joined)
  }

  test("IVF and LSH reach usable recall vs exact") {
    val exact = Knn.knnJoin(queries, embs, 10, "cosine",
      corpusId = "vec_id", corpusVec = "embedding")
    val ivf = Ann.ivfSearch(queries, embs,
      Ann.trainIvf(embs, "embedding", numCells = 16), k = 10, nProbe = 4,
      corpusId = "vec_id", vecCol = "embedding")
    val ivfRecall = Quantization.recallAtK(ivf, exact, 10)
      .agg(avg("recall")).head().getDouble(0)
    assert(ivfRecall > 0.5, s"ivf recall $ivfRecall")

    // recall climbs monotonically-ish with the probe knob; these synthetic
    // embeddings are near-uniform (hyperplane bits carry little neighbor
    // signal — the hard case for LSH), so high recall needs a wide probe
    def lshRecallAt(nProbe: Int): Double = {
      val lsh = Ann.lshSearch(queries, embs, k = 10, numBits = 4, dim = 64,
        nProbe = nProbe, corpusId = "vec_id", vecCol = "embedding")
      Quantization.recallAtK(lsh, exact, 10)
        .agg(avg("recall")).head().getDouble(0)
    }
    val singleRecall = lshRecallAt(0)
    val defRecall = lshRecallAt(4)
    val wideRecall = lshRecallAt(10)
    assert(defRecall >= singleRecall,
      s"multi-probe $defRecall vs single-bucket $singleRecall")
    assert(wideRecall >= defRecall,
      s"wide probe $wideRecall vs default $defRecall")
    assert(wideRecall > 0.8, s"wide multi-probe lsh recall $wideRecall")
  }

  test("cell-partitioned corpus prunes the scan to the probed partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case _ => p.children.flatMap(nodes)
    })
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-part").toString
    val model = Ann.trainIvf(embs, "embedding", numCells = 16)
    Ann.writePartitionedByCell(embs, model, dir,
      corpusId = "vec_id", vecCol = "embedding")
    val oneQuery = queries.where(col("query_id") === 3)
    val pruned = Ann.ivfSearchPartitioned(oneQuery, dir, model, k = 10, nProbe = 2)
    val direct = Ann.ivfSearch(oneQuery, embs, model, k = 10, nProbe = 2,
      corpusId = "vec_id", vecCol = "embedding")
    assert(asSet(pruned) === asSet(direct),
      "partitioned search must equal the in-memory cell join")
    // the scan read at most nProbe of the 16 cell directories
    val scan = nodes(pruned.queryExecution.executedPlan)
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no file scan in the partitioned plan"))
    val partsRead = scan.metrics("numPartitions").value
    assert(partsRead <= 2, s"expected <= 2 partitions read, got $partsRead")
  }

  test("matryoshka funnel: exhaustive rerank equals exact; prefix recall is high") {
    val exact = Knn.knnJoin(queries, embs, 10, "cosine",
      corpusId = "vec_id", corpusVec = "embedding")
    // rerankK = corpus size: candidates are everything, so the exact
    // rerank must reproduce exact kNN whatever the prefix loses
    val n = embs.count().toInt
    val exhaustive = Ann.matryoshkaSearch(queries, embs, k = 10, dims = 16,
      rerankK = n, corpusId = "vec_id", vecCol = "embedding")
    assert(asSet(exhaustive) === asSet(exact))
    // practical funnel: 32 of 128 dims, 5x over-fetch. These are RANDOM
    // embeddings (no MRL training concentrates signal in the prefix), so
    // recall is structurally modest — assert a floor and that the
    // rerankK knob climbs toward exact
    def recallAt(rerankK: Int): Double = {
      val funnel = Ann.matryoshkaSearch(queries, embs, k = 10, dims = 32,
        rerankK = rerankK, corpusId = "vec_id", vecCol = "embedding")
      Quantization.recallAtK(funnel, exact, 10).agg(avg("recall")).head().getDouble(0)
    }
    val r50 = recallAt(50)
    assert(r50 >= 0.5, s"matryoshka recall@10 too low: $r50")
    val r200 = recallAt(200)
    assert(r200 >= r50, s"recall must climb with rerankK: $r50 -> $r200")
    assert(r200 >= 0.8, s"wide funnel recall@10 too low: $r200")
  }

  test("hardNegatives: nearest rows with a different label, per anchor") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val anchors = embs.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"),
        col("label").as("query_label"))
    val got = Knn.hardNegatives(anchors, embs, 5,
        corpusId = "vec_id", corpusVec = "embedding")
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
    val labels = embs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    // every negative has a different label than its anchor
    got.foreach { case (q, _, n, _) => assert(labels(q) !== labels(n), s"$q -> $n") }
    // equals a per-anchor filtered exact kNN
    for (q <- Seq(0L, 1L, 2L)) {
      val anchor = anchors.where(col("query_id") === q)
      val exact = Knn.knnJoin(anchor.select("query_id", "query_vec"),
          embs.where(col("label") =!= labels(q)), 5, "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))).sorted
      val mine = got.filter(_._1 == q).map(t => (t._2, t._3)).sorted
      assert(mine.toSeq === exact.toSeq, s"anchor $q")
    }
  }

  test("cellDrift: zero KL on identical snapshots, positive on a biased slice") {
    import graft.operators.Ann
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val m = Ann.trainIvf(embs, "embedding", numCells = 8)
    val same = Ann.cellDrift(embs, embs, m, "embedding").collect()
    assert(same.length === 8)
    // identical histograms: pa == pb exactly per cell, so ln(1) = 0 exactly
    same.foreach(r => assert(r.getAs[Double]("kl_contrib") === 0.0))
    val biased = Ann.cellDrift(embs, embs.where(col("label") < 3), m, "embedding")
      .agg(sum(col("kl_contrib"))).head().getDouble(0)
    assert(biased > 0.0, s"biased slice must drift, got $biased")
    // counts line up with direct assignment
    val counts = Ann.cellDrift(embs, embs.limit(0), m, "embedding")
      .agg(sum(col("n_a")), sum(col("n_b"))).head()
    assert(counts.getLong(0) === embs.count())
    assert(counts.getLong(1) === 0L)
  }
}
