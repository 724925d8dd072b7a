package graft

/** Operating-point tuner for the resident graph tier: builds the
  * RecallFloorSpec 1M clustered corpus, then sweeps (degree, efConstruction,
  * ef, nProbe) printing recall@10 + ms/q per point, with the IVF float tier
  * at nProbe 1/2/4 as the comparison rungs. Run ad hoc when re-tuning the
  * published Sweep/RecallFloor operating points:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.GraphTune"`. */
object GraphTune {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.{Ann, Knn, PackedGraph, PackedKnn}
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("graph-tune")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Dim = 128; val Clusters = 16; val QSample = 30L; val K = 10
    val corpus = spark.range(1000000L).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)), i =>
        ((pmod(xxhash64((col("id") % Clusters) * 7919 + i), lit(2000))
            .cast("float") / lit(1000.0f) - lit(1.0f))
          + (pmod(xxhash64(col("id") * 131 + i), lit(2000))
            .cast("float") / lit(1000.0f) - lit(1.0f)) * lit(0.45f))
          .cast("float"))
        .cast("array<float>").as("embedding"))
      .repartition(8).persist()
    corpus.count()
    val model = Ann.trainIvf(corpus, "embedding", numCells = 64, seed = 42L,
      maxIter = 5, sampleFraction = 0.02)
    val qArr = corpus.where(col("vec_id") < QSample)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val truth = Knn.knnJoinFusedArr(qArr, corpus, K + 1, "cosine",
        corpusId = "vec_id", corpusVec = "embedding")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).take(K).map(_._3).toSet).toMap
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) => got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
        .sum / truth.size
    val pi = PackedKnn.packIvf(corpus, model, idCol = "vec_id", vecCol = "embedding")
    for (np <- Seq(1, 2, 4)) {
      PackedKnn.searchIvf(pi, qArr, K, nProbe = np)
      val t0 = System.nanoTime()
      val r = PackedKnn.searchIvf(pi, qArr, K, nProbe = np)
      val ms = (System.nanoTime() - t0) / 1e6 / qArr.length
      println(f"IVF nProbe=$np recall=${recall(r.map { case (q, n) => q -> n.map(_._1).toSet }.toMap)}%.3f ms/q=$ms%.2f")
    }
    for (deg <- Seq(16, 24); efc <- Seq(64, 128)) {
      val tb = System.nanoTime()
      val pg = PackedGraph.build(pi, degree = deg, efConstruction = efc)
      println(f"build deg=$deg efC=$efc: ${(System.nanoTime() - tb) / 1e9}%.1f s")
      for (np <- Seq(2, 4); ef <- Seq(64, 96, 160, 256)) {
        PackedGraph.searchGraph(pg, qArr, K, nProbe = np, ef = ef)
        val t0 = System.nanoTime()
        val r = PackedGraph.searchGraph(pg, qArr, K, nProbe = np, ef = ef)
        val ms = (System.nanoTime() - t0) / 1e6 / qArr.length
        println(f"GRAPH deg=$deg efC=$efc nProbe=$np ef=$ef recall=${recall(r.map { case (q, n) => q -> n.map(_._1).toSet }.toMap)}%.3f ms/q=$ms%.2f")
      }
      pg.unpersist()
    }
    spark.stop()
  }
}
