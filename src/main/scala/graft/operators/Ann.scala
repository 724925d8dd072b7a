package graft.operators

import graft.functions.{ann, vector}
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
  *    lookups but for vector space (see [[writePartitionedByCell]] /
  *    [[ivfSearchPartitioned]]).
  *  - Random-hyperplane LSH: deterministic signed projections give each
  *    row a bit-bucket; queries join their own bucket plus the `nProbe`
  *    lowest-summed-margin perturbation sets (multi-probe — the recall knob).
  *
  * Assignment kernels are native Catalyst expressions over primitive
  * arrays (graft.functions.ann) — the corpus-side encode is once-per-row
  * at 100 TB, so it runs inside WholeStageCodegen like the distance
  * kernels, not as a boxing Seq[Float] UDF.
  *
  * Both validated by recall@k against the exact kNN join (the reference
  * validates its quantizers the same way, quantization.py:692-703).
  */
object Ann {

  // ------------------------------------------------------------------- IVF

  final case class IvfModel(centroids: Array[Array[Double]]) {
    def numCells: Int = centroids.length
  }

  /** Seeded KMeans coarse quantizer. `sampleFraction` < 1 trains on a
    * deterministic sample — at corpus scale the centroids only need a
    * statistical sketch of the distribution, not every row. */
  def trainIvf(vecs: DataFrame, vecCol: String, numCells: Int,
               seed: Long = 42L, maxIter: Int = 20,
               sampleFraction: Double = 1.0): IvfModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = if (sampleFraction < 1.0) vecs.sample(sampleFraction, seed) else vecs
    val data = base.select(array_to_vector(
      transform(col(vecCol), _.cast("double"))).as("features"))
    val km = new KMeans().setK(numCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
    IvfModel(km.fit(data).clusterCenters.map(_.toArray))
  }

  /** Nearest-centroid cell id per vector (the partition key at scale).
    * Codegen kernel — the hot once-per-corpus-row encode. */
  def cellId(model: IvfModel)(vecCol: Column): Column =
    ann.nearestCell(model.centroids)(vecCol)

  /** Element-wise coarse residual `vec − centroids(cell)`, in DOUBLES
    * (float widened before the subtraction, like every oracle-checked
    * distance here). Takes the cell as a COLUMN — pass the [[cellId]]
    * projection — so the argmin lives in exactly one (codegen) kernel and
    * this udf can never disagree with the routing. */
  def residual(model: IvfModel)(vecCol: Column, cellCol: Column): Column = {
    val cents = model.centroids
    val f = udf { (v: Seq[Float], cell: Int) =>
      val c = cents(cell)
      Array.tabulate(c.length)(j => v(j).toDouble - c(j))
    }
    f(vecCol, cellCol)
  }

  /** Nearest-centroid assignment WITH the distance to that centroid:
    * struct(cell: int, dist: double). The distance feeds per-cell radius
    * bounds (see Dedup.embeddingNearDupBlocked's triangle-inequality
    * cell-pair pruning). */
  def cellAssign(model: IvfModel)(vecCol: Column): Column =
    ann.nearestCellDist(model.centroids)(vecCol)

  /** Embedding-DISTRIBUTION drift between two corpus snapshots, measured
    * in the coarse quantizer's cell space: both snapshots are assigned to
    * the SAME trained model's cells and the two cell histograms compared
    * with add-one-smoothed KL(A || B) — the monitoring primitive for "has
    * the corpus (or the embedder version) moved since this model/index
    * was trained?" (retrain triggers, ingest-source QA, embedding skew),
    * the embedding-space sibling of Sampling.klDivergence's token drift.
    *
    * Scale shape: assignment is the once-per-row codegen kernel riding
    * the scan; each histogram is ONE map-side-combined numCells-sized
    * aggregate; everything downstream (cell spine, totals, the KL
    * algebra) is centroids-sized and broadcasts. Returns one row per
    * cell: (cell, n_a, n_b, kl_contrib) with sum(kl_contrib) = the KL
    * divergence; smoothing guarantees every log is finite even for empty
    * cells. */
  def cellDrift(snapA: DataFrame, snapB: DataFrame, model: IvfModel,
                vecCol: String = "vec"): DataFrame = {
    val spark = snapA.sparkSession
    val c = model.numCells
    def hist(df: DataFrame, n: String) = df.where(col(vecCol).isNotNull)
      .select(cellId(model)(col(vecCol)).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as(n))
    val cells = spark.range(c).select(col("id").cast("int").as("cell"))
    val joined = cells
      .join(hist(snapA, "_na"), Seq("cell"), "left")
      .join(hist(snapB, "_nb"), Seq("cell"), "left")
      .select(col("cell"), coalesce(col("_na"), lit(0L)).as("n_a"),
        coalesce(col("_nb"), lit(0L)).as("n_b"))
    val tot = joined.agg(sum("n_a").as("_ta"), sum("n_b").as("_tb"))
    joined.crossJoin(broadcast(tot))
      .withColumn("_pa", (col("n_a") + lit(1.0)) / (col("_ta") + lit(c)))
      .withColumn("_pb", (col("n_b") + lit(1.0)) / (col("_tb") + lit(c)))
      .select(col("cell"), col("n_a"), col("n_b"),
        (col("_pa") * log(col("_pa") / col("_pb"))).as("kl_contrib"))
  }

  /** nProbe nearest cells for each query vector. */
  private def probeCells(model: IvfModel, nProbe: Int)(vecCol: Column): Column =
    ann.probeCells(model.centroids, nProbe)(vecCol)

  /** IVF approximate kNN: join queries only with corpus rows in probed
    * cells — the join key (cell) prunes the scan; everything downstream is
    * the exact kNN machinery on the survivors. */
  def ivfSearch(queries: DataFrame, corpus: DataFrame, model: IvfModel,
                k: Int, nProbe: Int = 4, metric: String = "cosine",
                queryId: String = "query_id", queryVec: String = "query_vec",
                corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val cells = corpus.select(col(corpusId).cast("long").as("_cid"),
      col(vecCol).as("_cvec"), cellId(model)(col(vecCol)).as("_cell"))
    searchCells(queries, cells, model, k, nProbe, metric, queryId, queryVec)
  }

  /** Write a corpus PARTITIONED BY IVF cell id — the at-scale layout: a
    * query touching nProbe cells scans only nProbe directories, exactly
    * like the reference's hash-index point lookup but for vector space.
    * Assignment runs in the same codegen stage as the write. */
  def writePartitionedByCell(corpus: DataFrame, model: IvfModel, path: String,
                             corpusId: String = "id", vecCol: String = "vec"): Unit =
    corpus.select(col(corpusId).cast("long").as("_cid"),
        col(vecCol).cast("array<float>").as("_cvec"),
        cellId(model)(col(vecCol)).as("_cell"))
      .write.partitionBy("_cell").mode("overwrite").parquet(path)

  /** IVF search against a cell-partitioned corpus directory written by
    * [[writePartitionedByCell]]: the probed cell ids become a partition
    * predicate, so the scan READS only nProbe of the numCells directories
    * (partition pruning — assert via the scan's "partition filters" or
    * input-file count). Collects the tiny probe set (|queries| × nProbe
    * ints) to the driver to form the predicate. */
  def ivfSearchPartitioned(queries: DataFrame, corpusPath: String, model: IvfModel,
                           k: Int, nProbe: Int = 4, metric: String = "cosine",
                           queryId: String = "query_id",
                           queryVec: String = "query_vec"): DataFrame = {
    val spark = queries.sparkSession
    val probed = queries
      .select(explode(probeCells(model, nProbe)(col(queryVec))).as("_cell"))
      .distinct().collect().map(_.getInt(0))
    val cells = spark.read.parquet(corpusPath)
      .where(col("_cell").isin(probed.toSeq: _*))
    searchCells(queries, cells, model, k, nProbe, metric, queryId, queryVec)
  }

  /** IVF-PQ: the standard composition for corpus sizes where even the
    * probed cells' raw vectors are too much to scan (Jegou et al., TPAMI'11
    * — the FAISS IVFADC layout). Three stages, each already scale-shaped:
    *
    *   1. coarse quantizer prunes to nProbe cells (join/partition key);
    *   2. ADC over PQ CODES scores the survivors — the scan touches
    *      m bytes per row instead of 4*dim (16x smaller at 128d/m=8), and
    *      at rest the cell-partitioned corpus stores codes, not vectors;
    *   3. exact rerank of the fetchK ADC candidates against the raw
    *      vectors (a candidate-sided id join, reference
    *      parallel_search.py:895-947) repairs quantization error.
    *
    * Returns exact-distance top-k of the ADC-surfaced candidates. */
  def ivfPqSearch(queries: DataFrame, corpus: DataFrame,
                  ivf: IvfModel, pq: Quantization.PqModel,
                  k: Int, nProbe: Int = 4, fetchK: Int = 50,
                  metric: String = "cosine",
                  queryId: String = "query_id", queryVec: String = "query_vec",
                  corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val coded = corpus.select(col(corpusId).cast("long").as("_cid"),
      cellId(ivf)(col(vecCol)).as("_cell"),
      Quantization.pqEncode(pq)(col(vecCol)).as("_code"))
    val q = queries.select(col(queryId).as("_qid"),
      Quantization.pqLut(pq)(col(queryVec)).as("_lut"),
      explode(probeCells(ivf, nProbe)(col(queryVec))).as("_cell"))
    val topk = udaf(new Knn.TopKAggregator(fetchK),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    val candidates = coded.join(broadcast(q), "_cell")
      .select(col("_qid"),
        col("_cid"), Quantization.adcDistance(col("_lut"), col("_code")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), explode(col("_nbrs")).as("_n"))
      .select(col(queryId), col("_n.id").as("neighbor_id"))
    Quantization.rerankExact(candidates, queries, corpus, k, metric,
      queryId, queryVec, corpusId, vecCol)
  }

  /** Per-(query, probed-cell) ADC lookup table for the RESIDUAL encoding:
    * lut[m][c] = ‖(q − cellCentroid)_m − codebook[m][c]‖². Unlike the raw
    * LUT (one per query) the residual LUT depends on the probed cell —
    * the query side explodes to (query, cell) pairs anyway, so each pair
    * carries its own table and the corpus-side join is unchanged. */
  def pqLutResidual(ivf: IvfModel, pq: Quantization.PqModel)(
      queryVec: Column, cellCol: Column): Column = {
    val books = pq.codebooks; val subDim = pq.subDim; val mCount = pq.numSubspaces
    val cents = ivf.centroids
    val f = udf { (q: Seq[Float], cell: Int) =>
      val cc = cents(cell)
      Array.tabulate(mCount, books(0).length) { (m, c) =>
        var d = 0.0; var j = 0
        while (j < subDim) {
          val idx = m * subDim + j
          val diff = (q(idx).toDouble - cc(idx)) - books(m)(c)(j)
          d += diff * diff; j += 1
        }
        d
      }.map(_.toSeq).toSeq
    }
    f(queryVec, cellCol)
  }

  /** [[ivfPqSearch]] with RESIDUAL codes (train `pq` via
    * [[Quantization.trainPqResidual]] against the SAME coarse model):
    * identical plan shape — coarse prune, ADC over resident-size codes,
    * exact rerank — but the codes quantize `vec − cellCentroid`, which is
    * the FAISS IVFADC composition and recovers most of the recall the raw
    * encoding loses at the same m bytes/row. The only structural delta is
    * the LUT: per (query, cell) instead of per query, riding the already
    * exploded probe rows, so the broadcast grows nProbe× on a batch-sized
    * side while the corpus-side scan stays byte-for-byte the same. */
  def ivfPqSearchResidual(queries: DataFrame, corpus: DataFrame,
                          ivf: IvfModel, pq: Quantization.PqModel,
                          k: Int, nProbe: Int = 4, fetchK: Int = 50,
                          metric: String = "cosine",
                          queryId: String = "query_id", queryVec: String = "query_vec",
                          corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val withCell = corpus.select(col(corpusId).cast("long").as("_cid"),
      col(vecCol).as("_v"), cellId(ivf)(col(vecCol)).as("_cell"))
    val coded = withCell.select(col("_cid"), col("_cell"),
      Quantization.pqEncodeDouble(pq)(
        residual(ivf)(col("_v"), col("_cell"))).as("_code"))
    val q = queries
      .select(col(queryId).as("_qid"), col(queryVec).as("_qv"),
        explode(probeCells(ivf, nProbe)(col(queryVec))).as("_cell"))
      .select(col("_qid"), col("_cell"),
        pqLutResidual(ivf, pq)(col("_qv"), col("_cell")).as("_lut"))
    val topk = udaf(new Knn.TopKAggregator(fetchK),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    val candidates = coded.join(broadcast(q), "_cell")
      .select(col("_qid"),
        col("_cid"), Quantization.adcDistance(col("_lut"), col("_code")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), explode(col("_nbrs")).as("_n"))
      .select(col(queryId), col("_n.id").as("neighbor_id"))
    Quantization.rerankExact(candidates, queries, corpus, k, metric,
      queryId, queryVec, corpusId, vecCol)
  }

  /** [[ivfPqSearch]] with OPQ-ROTATED codes (train via
    * [[Quantization.trainOpq]]): coarse routing stays in the RAW space
    * (cell assignment and probe selection are untouched — rotation is
    * orthogonal, so raw-space cells partition the rotated space
    * identically well), while the code tier quantizes `R·vec` and the
    * per-query LUT is built from `R·query`. ADC then estimates
    * ‖R·q − R·v‖ = ‖q − v‖ with the rotation-balanced codebooks — the
    * FAISS `OPQMatrix + IVFADC` composition with the transform scoped to
    * the quantizer. Plan shape is byte-identical to [[ivfPqSearch]]:
    * the rotation rides the encode/LUT column functions. */
  def ivfPqSearchOpq(queries: DataFrame, corpus: DataFrame,
                     ivf: IvfModel, opq: Quantization.OpqModel,
                     k: Int, nProbe: Int = 4, fetchK: Int = 50,
                     metric: String = "cosine",
                     queryId: String = "query_id", queryVec: String = "query_vec",
                     corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val coded = corpus.select(col(corpusId).cast("long").as("_cid"),
      cellId(ivf)(col(vecCol)).as("_cell"),
      Quantization.opqEncode(opq)(col(vecCol)).as("_code"))
    val q = queries.select(col(queryId).as("_qid"),
      Quantization.opqLut(opq)(col(queryVec)).as("_lut"),
      explode(probeCells(ivf, nProbe)(col(queryVec))).as("_cell"))
    val topk = udaf(new Knn.TopKAggregator(fetchK),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    val candidates = coded.join(broadcast(q), "_cell")
      .select(col("_qid"),
        col("_cid"), Quantization.adcDistance(col("_lut"), col("_code")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), explode(col("_nbrs")).as("_n"))
      .select(col(queryId), col("_n.id").as("neighbor_id"))
    Quantization.rerankExact(candidates, queries, corpus, k, metric,
      queryId, queryVec, corpusId, vecCol)
  }

  /** IVF approximate kNN with STRING corpus ids — the collection facade's
    * id type (no hash surrogate: two distinct ids can never merge). Same
    * plan shape as [[ivfSearch]]: cell equi-join prunes the scan, bounded
    * per-query top-k aggregation downstream. */
  def ivfSearchStr(queries: DataFrame, corpus: DataFrame, model: IvfModel,
                   k: Int, nProbe: Int = 4, metric: String = "cosine",
                   queryId: String = "query_id", queryVec: String = "query_vec",
                   corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val topk = udaf(new Knn.TopKAggregatorS(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.NeighborS]())
    val cells = corpus.select(col(corpusId).cast("string").as("_cid"),
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

  private def searchCells(queries: DataFrame, cells: DataFrame, model: IvfModel,
                          k: Int, nProbe: Int, metric: String,
                          queryId: String, queryVec: String): DataFrame = {
    val topk = udaf(new Knn.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
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

  private[graft] def planes(numBits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(numBits)(h => hyperplane(seed, h, dim))

  /** Bit-bucket id from `numBits` signed projections (codegen kernel). */
  def lshBucket(numBits: Int, dim: Int, seed: Long = 42L)(vecCol: Column): Column =
    ann.lshBucket(planes(numBits, dim, seed))(vecCol)

  /** LSH-bucketed approximate kNN under cosine. Multi-probe: each query
    * joins its own bucket PLUS the `nProbe` perturbation-set buckets with
    * the smallest summed |margin| (Lv et al. VLDB'07 — single-bit flips
    * first, then low-margin multi-bit combinations) — near neighbors split
    * by bad hyperplanes land a few flips away, so recall climbs smoothly
    * with nProbe while the corpus side stays a plain bucket equi-join (the
    * probe fan-out is query-side only). nProbe=0 is the single-bucket
    * variant. */
  def lshSearch(queries: DataFrame, corpus: DataFrame, k: Int,
                numBits: Int, dim: Int, seed: Long = 42L, nProbe: Int = 4,
                queryId: String = "query_id", queryVec: String = "query_vec",
                corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val ps = planes(numBits, dim, seed)
    val topk = udaf(new Knn.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    val bucketed = corpus.select(col(corpusId).cast("long").as("_cid"),
      col(vecCol).as("_cvec"), ann.lshBucket(ps)(col(vecCol)).as("_bkt"))
    val q = queries.select(col(queryId).as("_qid"), col(queryVec).as("_qvec"),
      explode(ann.lshProbeBuckets(ps, nProbe)(col(queryVec))).as("_bkt"))
    bucketed.join(broadcast(q), "_bkt")
      .select(col("_qid"), col("_cid"),
        vector.cosineDistance(col("_cvec"), col("_qvec")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col(queryId), (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"), col("_n.dist").as("dist"))
  }

  /** Matryoshka retrieval funnel (Kusupati et al. 2022, "Matryoshka
    * Representation Learning" — public paper; prefix-truncatable
    * embeddings): coarse top-`rerankK` kNN over only the FIRST `dims`
    * components of every vector, then exact rerank of those candidates on
    * the full vectors.
    *
    * The scale lever: the coarse pass scans dims/D of the vector bytes
    * (with a column-pruned prefix materialized at rest, it is also the
    * only thing read), and the full vectors are fetched for just
    * rerankK*|queries| rows. For MRL-trained embeddings the prefix
    * preserves neighborhood structure, so modest rerankK recovers exact
    * top-k; the rerank step makes the final ordering exact over the
    * candidate set either way. */
  def matryoshkaSearch(queries: DataFrame, corpus: DataFrame, k: Int,
                       dims: Int, rerankK: Int,
                       metric: String = "cosine",
                       queryId: String = "query_id", queryVec: String = "query_vec",
                       corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    require(dims > 0, s"dims must be positive: $dims")
    require(rerankK >= k, s"rerankK ($rerankK) must be >= k ($k)")
    val coarse = Knn.knnJoin(
      queries.select(col(queryId), slice(col(queryVec), 1, dims).as(queryVec)),
      corpus.select(col(corpusId), slice(col(vecCol), 1, dims).as(vecCol)),
      rerankK, metric, queryId, queryVec, corpusId, vecCol)
    Quantization.rerankExact(coarse, queries, corpus, k, metric,
      queryId, queryVec, corpusId, vecCol)
  }
}
