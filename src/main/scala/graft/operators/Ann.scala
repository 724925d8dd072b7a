package graft.operators

import graft.functions.vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate nearest neighbor — the 100 TB scale path.
  *
  * The reference's ANN is HNSW (a single-machine, pointer-chasing C++
  * index); distributed Spark wants partition-pruning instead of graph
  * walking, so the two public-standard approaches:
  *
  *  - IVF (inverted file): seeded KMeans coarse centroids; each corpus row
  *    is assigned to its nearest centroid; a query probes only the
  *    `nProbe` nearest cells. At scale: write the corpus bucketed/
  *    partitioned by cell id, and a query's scan prunes to nProbe
  *    partitions — the exact analog of the reference's hash-index point
  *    lookups but for vector space.
  *  - Random-hyperplane LSH: deterministic signed projections give each
  *    row a bit-bucket; queries only join their own bucket (+ optional
  *    multi-probe). No training pass.
  *
  * Both validated by recall@k against the exact kNN join (the reference
  * validates its quantizers the same way, quantization.py:692-703).
  */
object Ann {

  // ------------------------------------------------------------------- IVF

  final case class IvfModel(centroids: Array[Array[Double]]) {
    def numCells: Int = centroids.length
  }

  def trainIvf(vecs: DataFrame, vecCol: String, numCells: Int,
               seed: Long = 42L, maxIter: Int = 20): IvfModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val data = vecs.select(array_to_vector(
      transform(col(vecCol), _.cast("double"))).as("features"))
    val km = new KMeans().setK(numCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
    IvfModel(km.fit(data).clusterCenters.map(_.toArray))
  }

  /** Nearest-centroid cell id per vector (the partition key at scale). */
  def cellId(model: IvfModel)(vecCol: Column): Column = {
    val cents = model.centroids
    val assign = udf { (v: Seq[Float]) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0; var j = 0
        while (j < cents(c).length) { val diff = v(j) - cents(c)(j); d += diff * diff; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    assign(vecCol)
  }

  /** Nearest-centroid assignment WITH the distance to that centroid:
    * struct(cell: int, dist: double). The distance feeds per-cell radius
    * bounds (see Dedup.embeddingNearDupBlocked's triangle-inequality
    * cell-pair pruning). */
  def cellAssign(model: IvfModel)(vecCol: Column): Column = {
    val cents = model.centroids
    val assign = udf { (v: Seq[Float]) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0; var j = 0
        while (j < cents(c).length && j < v.length) {
          val diff = v(j) - cents(c)(j); d += diff * diff; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (best, math.sqrt(bestD))
    }
    assign(vecCol).cast("struct<cell:int,dist:double>")
  }

  /** nProbe nearest cells for each query vector. */
  private def probeCells(model: IvfModel, nProbe: Int)(vecCol: Column): Column = {
    val cents = model.centroids
    val probe = udf { (v: Seq[Float]) =>
      cents.indices.map { c =>
        var d = 0.0; var j = 0
        while (j < cents(c).length) { val diff = v(j) - cents(c)(j); d += diff * diff; j += 1 }
        (c, d)
      }.sortBy(_._2).take(nProbe).map(_._1)
    }
    probe(vecCol)
  }

  /** IVF approximate kNN: join queries only with corpus rows in probed
    * cells — the join key (cell) prunes the scan; everything downstream is
    * the exact kNN machinery on the survivors. */
  def ivfSearch(queries: DataFrame, corpus: DataFrame, model: IvfModel,
                k: Int, nProbe: Int = 4, metric: String = "cosine",
                queryId: String = "query_id", queryVec: String = "query_vec",
                corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val topk = udaf(new Knn.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    val cells = corpus.select(col(corpusId).cast("long").as("_cid"),
      col(vecCol).as("_cvec"), cellId(model)(col(vecCol)).as("_cell"))
    val q = queries.select(col(queryId).as("_qid"), col(queryVec).as("_qvec"),
      explode(probeCells(model, nProbe)(col(queryVec))).as("_cell"))
    cells.join(broadcast(q), "_cell")
      .select(col("_qid"), col("_cid"),
        vector.distance(metric, col("_cvec"), col("_qvec")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col(queryId), (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"), col("_n.dist").as("dist"))
  }

  // ------------------------------------------- Random-hyperplane LSH (cosine)

  /** Deterministic pseudo-random hyperplanes: component h,d derived from a
    * splitmix-style integer hash of (seed, h, d) — reproducible across
    * engines and runs with no RNG state. */
  private def hyperplane(seed: Long, h: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      var z = seed + 0x9e3779b97f4a7c15L * (h.toLong * 10007L + d + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // map to [-1, 1)
      (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }

  /** Bit-bucket id from `numBits` signed projections. */
  def lshBucket(numBits: Int, dim: Int, seed: Long = 42L)(vecCol: Column): Column = {
    val planes = Array.tabulate(numBits)(h => hyperplane(seed, h, dim))
    val bucket = udf { (v: Seq[Float]) =>
      var b = 0L
      var h = 0
      while (h < planes.length) {
        var dot = 0.0; var j = 0
        while (j < planes(h).length && j < v.length) { dot += v(j) * planes(h)(j); j += 1 }
        if (dot > 0) b |= (1L << h)
        h += 1
      }
      b
    }
    bucket(vecCol)
  }

  /** LSH-bucketed approximate kNN under cosine: queries join only their
    * own bucket. Recall improves with fewer bits / multi-table; this is
    * the single-table variant. */
  def lshSearch(queries: DataFrame, corpus: DataFrame, k: Int,
                numBits: Int, dim: Int, seed: Long = 42L,
                queryId: String = "query_id", queryVec: String = "query_vec",
                corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val topk = udaf(new Knn.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    val bucketed = corpus.select(col(corpusId).cast("long").as("_cid"),
      col(vecCol).as("_cvec"), lshBucket(numBits, dim, seed)(col(vecCol)).as("_bkt"))
    val q = queries.select(col(queryId).as("_qid"), col(queryVec).as("_qvec"),
      lshBucket(numBits, dim, seed)(col(queryVec)).as("_bkt"))
    bucketed.join(broadcast(q), "_bkt")
      .select(col("_qid"), col("_cid"),
        vector.cosineDistance(col("_cvec"), col("_qvec")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col(queryId), (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"), col("_n.dist").as("dist"))
  }
}
