package graft.operators

import graft.functions.vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scalar / binary / product quantization with quantize-then-search, the
  * Spark-native re-expression of reference quantization.py.
  *
  * Training is a distributed aggregation producing a SMALL model (per-dim
  * stats or codebooks) that is then broadcast back into a per-row encode
  * map — exactly how a 100 TB corpus wants it: one pass to train (or a
  * sample), one codegen'd map pass to encode, columnar uint8/binary
  * storage thereafter. Search decodes approximately (or XOR-popcounts) and
  * optionally exact-reranks survivors — the reference's "hybrid" plan
  * (parallel_search.py:895-947).
  */
object Quantization {

  // ------------------------------------------------------------ Scalar (SQ)

  /** Per-dimension min/max/scale, the SQ model (quantization.py:85-106).
    * scale==0 dims are forced to 1.0 like the reference. */
  final case class SqModel(mins: Array[Double], maxs: Array[Double]) {
    val scales: Array[Double] =
      mins.indices.map(i => { val s = maxs(i) - mins(i); if (s == 0) 1.0 else s }).toArray
  }

  /** One distributed pass: posexplode + per-dim min/max (SURVEY A7).
    * At corpus scale pass sampleFraction < 1 — quantizer statistics
    * converge on a seeded sample and the training pass stops being a
    * full-corpus shuffle. Default 1.0 keeps oracle-exact behavior. */
  def trainSq(vecs: DataFrame, vecCol: String,
              sampleFraction: Double = 1.0, seed: Long = 42L): SqModel = {
    val src = if (sampleFraction < 1.0) vecs.sample(sampleFraction, seed) else vecs
    val stats = src
      .select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .orderBy("dim").collect()
    SqModel(stats.map(_.getDouble(1)), stats.map(_.getDouble(2)))
  }

  /** Encode to uint8 codes (stored as array<int>): clip then TRUNCATE —
    * the reference's `.astype(np.uint8)` truncates, it does not round
    * (quantization.py:119-124). */
  def sqEncode(m: SqModel)(vecCol: Column): Column = {
    val mins = typedLit(m.mins.toSeq)
    val scales = typedLit(m.scales.toSeq)
    transform(vecCol, (x, i) =>
      floor(least(greatest(
        (x.cast("double") - element_at(mins, i + 1)) / element_at(scales, i + 1) * 255.0,
        lit(0.0)), lit(255.0))).cast("int"))
  }

  /** Decode codes back to approximate doubles (quantization.py:127-139). */
  def sqDecode(m: SqModel)(codeCol: Column): Column = {
    val mins = typedLit(m.mins.toSeq)
    val scales = typedLit(m.scales.toSeq)
    transform(codeCol, (q, i) =>
      q.cast("double") / 255.0 * element_at(scales, i + 1) + element_at(mins, i + 1))
  }

  /** Approximate kNN over SQ codes: decode-and-distance (the reference's
    * distances_cosine decodes too, quantization.py:154-174), with the
    * query itself round-tripped through the quantizer for symmetry. */
  def sqSearch(queries: DataFrame, corpus: DataFrame, m: SqModel, k: Int,
               metric: String = "cosine",
               queryId: String = "query_id", queryVec: String = "query_vec",
               corpusId: String = "id", codeCol: String = "sq_code"): DataFrame = {
    val decoded = corpus.withColumn("_dec", sqDecode(m)(col(codeCol)))
    val q = queries.withColumn("_qdec", sqDecode(m)(sqEncode(m)(col(queryVec))))
    Knn.knnJoin(
      q.select(col(queryId), col("_qdec").as(queryVec)),
      decoded.select(col(corpusId), col("_dec")),
      k, metric, queryId, queryVec, corpusId, "_dec")
  }

  // ------------------------------------------------------------- fp16 codec

  /** Approximate kNN over fp16-encoded vectors (binary_persistence.py:
    * 347-349's `fp16` compression level): decode-and-distance, with the
    * query round-tripped through the codec for symmetry — the [[sqSearch]]
    * stance one rung up the fidelity ladder (2 bytes/dim, ~2^-11 relative
    * error, no training pass needed). */
  def fp16Search(queries: DataFrame, corpus: DataFrame, k: Int,
                 metric: String = "cosine",
                 queryId: String = "query_id", queryVec: String = "query_vec",
                 corpusId: String = "id", codeCol: String = "fp16_code"): DataFrame = {
    val decoded = corpus.withColumn("_dec", vector.fp16Decode(col(codeCol)))
    val q = queries.withColumn("_qdec",
      vector.fp16Decode(vector.fp16Encode(col(queryVec))))
    Knn.knnJoin(
      q.select(col(queryId), col("_qdec").as(queryVec)),
      decoded.select(col(corpusId), col("_dec")),
      k, metric, queryId, queryVec, corpusId, "_dec")
  }

  // ------------------------------------------------------------ Binary (BQ)

  /** Per-dimension median thresholds (quantization.py:307-327). Exact
    * interpolated percentile == np.median; sample like trainSq at scale. */
  def trainBq(vecs: DataFrame, vecCol: String,
              sampleFraction: Double = 1.0, seed: Long = 42L): Array[Double] = {
    val src = if (sampleFraction < 1.0) vecs.sample(sampleFraction, seed) else vecs
    src.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(expr("percentile(CAST(v AS DOUBLE), 0.5)").as("thr"))
      .orderBy("dim").collect().map(_.getDouble(1))
  }

  /** Unpacked bits (array<int> of 0/1): v > threshold (quantization.py:347). */
  def bqBits(thresholds: Array[Double])(vecCol: Column): Column = {
    val thr = typedLit(thresholds.toSeq)
    transform(vecCol, (x, i) =>
      when(x.cast("double") > element_at(thr, i + 1), 1).otherwise(0))
  }

  /** Packed form for storage + XOR/popcount Hamming (quantization.py:349-374). */
  def bqEncode(thresholds: Array[Double])(vecCol: Column): Column =
    vector.packBits(bqBits(thresholds)(vecCol))

  /** Hamming kNN over packed codes (smaller dist = closer). */
  def bqSearch(queries: DataFrame, corpus: DataFrame, thresholds: Array[Double],
               k: Int, queryId: String = "query_id", queryVec: String = "query_vec",
               corpusId: String = "id", codeCol: String = "bq_code"): DataFrame = {
    val q = queries.select(col(queryId).as("_qid"),
      bqEncode(thresholds)(col(queryVec)).as("_qcode"))
    val topk = udaf(new Knn.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    corpus.select(col(corpusId).cast("long").as("_cid"), col(codeCol).as("_ccode"))
      .crossJoin(broadcast(q))
      .select(col("_qid"), col("_cid"),
        vector.hammingDistance(col("_ccode"), col("_qcode")).cast("double").as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col(queryId), (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"), col("_n.dist").cast("int").as("hamming"))
  }

  // ----------------------------------------------------------- Product (PQ)

  /** PQ model: per-subspace codebooks, trained with seeded MLlib KMeans
    * (SURVEY A6; reference trains its own kmeans++ at quantization.py:
    * 480-508 — MLlib's distributed KMeans is the Spark-native equivalent). */
  final case class PqModel(numSubspaces: Int, subDim: Int,
                           codebooks: Array[Array[Array[Double]]]) // [m][k][subDim]

  def trainPq(vecs: DataFrame, vecCol: String, numSubspaces: Int = 8,
              numCentroids: Int = 16, seed: Long = 42L,
              maxIter: Int = 10, sampleFraction: Double = 1.0): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    import org.apache.spark.ml.functions.array_to_vector
    val src = if (sampleFraction < 1.0) vecs.sample(sampleFraction, seed) else vecs
    val dim = src.select(size(col(vecCol))).head().getInt(0)
    require(dim % numSubspaces == 0, s"dim $dim not divisible by $numSubspaces")
    val subDim = dim / numSubspaces
    val cached = src.select(col(vecCol)).persist()
    try {
      // the M per-subspace fits are independent Spark jobs — submit them
      // concurrently so the scheduler interleaves their stages
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val codebooks = Await.result(Future.sequence((0 until numSubspaces).map { m =>
        Future {
          val sub = cached.select(array_to_vector(
            transform(slice(col(vecCol), m * subDim + 1, subDim), _.cast("double"))).as("features"))
          // random init (seeded): kmeans|| init alone costs several Spark
          // jobs per subspace; with 8 concurrent fits the scheduling
          // overhead dominates the tiny fits
          val km = new KMeans().setK(numCentroids).setSeed(seed + m)
            .setMaxIter(maxIter).setInitMode("random").setFeaturesCol("features")
          km.fit(sub).clusterCenters.map(_.toArray)
        }
      }), Duration.Inf).toArray
      PqModel(numSubspaces, subDim, codebooks)
    } finally cached.unpersist()
  }

  /** Encode: nearest centroid id per subspace (array<int>[M]). Broadcast
    * codebooks inside a scala UDF — one map pass, no shuffle. */
  def pqEncode(model: PqModel)(vecCol: Column): Column = {
    val mCount = model.numSubspaces; val subDim = model.subDim
    val books = model.codebooks
    val enc = udf { (v: Seq[Float]) =>
      // one unboxed copy up front: indexing the boxed Seq inside the
      // m*c*subDim loop was ~8k boxed reads PER ROW (the whole-corpus
      // encode spent seconds in Float.valueOf at sf0.1)
      val va = v.toArray
      Array.tabulate(mCount) { m =>
        val book = books(m)
        val base = m * subDim
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val cent = book(c)
          var d = 0.0; var j = 0
          while (j < subDim) {
            val diff = va(base + j) - cent(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    }
    enc(vecCol)
  }

  /** [[pqEncode]] over an `array<double>` column — the residual path
    * ([[trainPqResidual]]) computes `vec − cellCentroid` in doubles so the
    * engine's arithmetic stays bit-aligned with the SQL oracle's
    * `CAST(x AS DOUBLE) − y − z`. Same argmin + lowest-code tie rule. */
  def pqEncodeDouble(model: PqModel)(vecCol: Column): Column = {
    val mCount = model.numSubspaces; val subDim = model.subDim
    val books = model.codebooks
    val enc = udf { (v: Seq[Double]) =>
      val va = v.toArray
      Array.tabulate(mCount) { m =>
        val book = books(m)
        val base = m * subDim
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val cent = book(c)
          var d = 0.0; var j = 0
          while (j < subDim) {
            val diff = va(base + j) - cent(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    }
    enc(vecCol)
  }

  /** Train PQ on IVF RESIDUALS (`vec − centroid(cell(vec))`) — the FAISS
    * IVFADC default (Jegou et al., TPAMI'11 §III-B): after coarse
    * quantization the residuals concentrate near the origin with far less
    * variance than raw vectors, so the same byte budget quantizes much
    * finer and ADC recall climbs. The codebooks share [[PqModel]]'s shape;
    * what changes is only WHAT they encode, so every downstream consumer
    * (encode/LUT/ADC/pack) reuses the same machinery with the residual
    * column in place of the raw vector. */
  def trainPqResidual(vecs: DataFrame, vecCol: String, ivf: Ann.IvfModel,
                      numSubspaces: Int = 8, numCentroids: Int = 16,
                      seed: Long = 42L, maxIter: Int = 10,
                      sampleFraction: Double = 1.0): PqModel = {
    val res = vecs.select(
      Ann.residual(ivf)(col(vecCol), Ann.cellId(ivf)(col(vecCol))).as("_res"))
    trainPq(res, "_res", numSubspaces, numCentroids, seed, maxIter, sampleFraction)
  }

  // ------------------------------------------------------------- OPQ

  /** Optimized Product Quantization (Ge et al., CVPR'13, non-parametric;
    * FAISS `OPQMatrix`): a learned ORTHOGONAL rotation applied before PQ,
    * so the subspace split cuts the data along balanced, decorrelated
    * axes instead of whatever order the raw dimensions happen to arrive
    * in. Rotation preserves L2/IP/cosine exactly, so the rotated-space
    * ADC distances estimate the raw-space distances — only the encode
    * gets better. `rotation(i)(j)` is laid out so `y_j = Σ_i x_i·R_ij`
    * with i ascending — the exact double arithmetic the q125 oracle
    * re-derives in SQL. */
  final case class OpqModel(rotation: Array[Array[Double]], pq: PqModel)

  /** Apply the learned rotation: float/double array in, double array out.
    * The input is widened to double FIRST (`CAST(x AS DOUBLE)` in the
    * oracle), then accumulated in ascending-i order so the sum is
    * bit-identical to DuckDB's ordered list sum. */
  def opqRotate(r: Array[Array[Double]])(vecCol: Column): Column = {
    val rot = udf { (v: Seq[Double]) =>
      val d = r.length
      val va = v.toArray
      Array.tabulate(r(0).length) { j =>
        var s = 0.0; var i = 0
        while (i < d) { s += va(i) * r(i)(j); i += 1 }
        s
      }
    }
    rot(transform(vecCol, _.cast("double")))
  }

  /** Train OPQ-NP: alternate (1) fit PQ codebooks in the rotated space,
    * (2) re-solve the rotation as an orthogonal Procrustes problem
    * against the current reconstructions — min_R ‖XR − Ŷ‖² ⇒ R = UVᵀ
    * where XᵀŶ = USVᵀ. The d×d cross-covariance is ONE treeAggregate
    * (d² doubles of driver state, corpus never collected); the SVD is a
    * d×d driver-side solve. Codebook fits reuse [[trainPq]]'s concurrent
    * per-subspace KMeans. */
  def trainOpq(vecs: DataFrame, vecCol: String, numSubspaces: Int = 8,
               numCentroids: Int = 16, seed: Long = 42L, maxIter: Int = 10,
               opqIter: Int = 2, sampleFraction: Double = 1.0): OpqModel = {
    import breeze.linalg.{qr => bqr, svd => bsvd, DenseMatrix => BDM}
    val src = if (sampleFraction < 1.0) vecs.sample(sampleFraction, seed) else vecs
    val cached = src.select(transform(col(vecCol), _.cast("double")).as("_x")).persist()
    try {
      val dim = cached.select(size(col("_x"))).head().getInt(0)
      require(dim % numSubspaces == 0, s"dim $dim not divisible by $numSubspaces")
      val subDim = dim / numSubspaces
      // seeded RANDOM-orthogonal init (QR of a Gaussian), not identity:
      // identity is a Procrustes fixed point whenever XᵀŶ comes out
      // near-symmetric PSD (U≈V ⇒ R≈I), which is exactly the case on
      // axis-aligned data — the regime OPQ exists to fix. Ge'13 §4 and
      // FAISS's OPQMatrix both start from a random rotation for this
      // reason. Sign-canonicalized so the init is unique.
      var r: Array[Array[Double]] = {
        val rnd = new scala.util.Random(seed)
        val g = BDM.tabulate(dim, dim)((_, _) => rnd.nextGaussian())
        val f = bqr(g)
        Array.tabulate(dim, dim)((i, j) =>
          f.q(i, j) * (if (f.r(j, j) < 0) -1.0 else 1.0))
      }
      for (_ <- 0 until opqIter) {
        val pq = trainPq(cached.select(opqRotate(r)(col("_x")).as("_y")), "_y",
          numSubspaces, numCentroids, seed, maxIter)
        // cross-covariance M(i,j) = Σ_rows x_i·ŷ_j, accumulated
        // column-major (acc(j·d+i)) so it loads straight into breeze
        val books = pq.codebooks
        val rLocal = r
        val acc = cached.select(col("_x"), opqRotate(rLocal)(col("_x")).as("_y"))
          .rdd.treeAggregate(new Array[Double](dim * dim))(
            (a, row) => {
              val x = row.getSeq[Double](0); val y = row.getSeq[Double](1)
              val yhat = new Array[Double](dim)
              var m = 0
              while (m < numSubspaces) {
                val book = books(m); val base = m * subDim
                var best = 0; var bestD = Double.MaxValue; var c = 0
                while (c < book.length) {
                  val cent = book(c); var dd = 0.0; var j = 0
                  while (j < subDim) { val df = y(base + j) - cent(j); dd += df * df; j += 1 }
                  if (dd < bestD) { bestD = dd; best = c }
                  c += 1
                }
                var j = 0
                while (j < subDim) { yhat(base + j) = book(best)(j); j += 1 }
                m += 1
              }
              var j = 0
              while (j < dim) {
                var i = 0
                while (i < dim) { a(j * dim + i) += x(i) * yhat(j); i += 1 }
                j += 1
              }
              a
            },
            (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
        val s = bsvd(new BDM(dim, dim, acc))
        val rm = s.U * s.Vt
        r = Array.tabulate(dim, dim)((i, j) => rm(i, j))
      }
      // final codebooks under the final rotation
      val pq = trainPq(cached.select(opqRotate(r)(col("_x")).as("_y")), "_y",
        numSubspaces, numCentroids, seed, maxIter)
      OpqModel(r, pq)
    } finally cached.unpersist()
  }

  /** OPQ encode: rotate (doubles), then the double-arithmetic PQ argmin —
    * same strict-< lowest-code tie rule as [[pqEncodeDouble]]. */
  def opqEncode(model: OpqModel)(vecCol: Column): Column =
    pqEncodeDouble(model.pq)(opqRotate(model.rotation)(vecCol))

  /** Per-query ADC LUT in the ROTATED space (double query subvectors). */
  def opqLut(model: OpqModel)(queryVec: Column): Column = {
    val mCount = model.pq.numSubspaces; val subDim = model.pq.subDim
    val books = model.pq.codebooks
    val lutUdf = udf { (q: Seq[Double]) =>
      Array.tabulate(mCount, books(0).length) { (m, c) =>
        var d = 0.0; var j = 0
        while (j < subDim) { val diff = q(m * subDim + j) - books(m)(c)(j); d += diff * diff; j += 1 }
        d
      }.map(_.toSeq).toSeq
    }
    lutUdf(opqRotate(model.rotation)(queryVec))
  }

  /** ADC funnel under OPQ: rotate+encode the corpus, rotated LUT per
    * query, asymmetric top-`fetchK`, exact rerank on the RAW vectors
    * (rotation is orthogonal, so rotated-space ADC already estimates the
    * raw metric; the rerank stays byte-identical to [[pqSearch]]'s).
    * Same broadcast + bounded-aggregator plan shape as [[pqSearch]]. */
  def opqSearch(queries: DataFrame, corpus: DataFrame, model: OpqModel,
                k: Int, fetchK: Int = 50, metric: String = "cosine",
                queryId: String = "query_id", queryVec: String = "query_vec",
                corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val coded = corpus.select(col(corpusId).cast("long").as("_cid"),
      opqEncode(model)(col(vecCol)).as("_code"))
    val q = queries.select(col(queryId).as("_qid"),
      opqLut(model)(col(queryVec)).as("_lut"))
    val topk = udaf(new Knn.TopKAggregator(fetchK),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    val candidates = coded.crossJoin(broadcast(q))
      .select(col("_qid"), col("_cid"),
        adcDistance(col("_lut"), col("_code")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), explode(col("_nbrs")).as("_n"))
      .select(col(queryId), col("_n.id").as("neighbor_id"))
    rerankExact(candidates, queries, corpus, k, metric,
      queryId, queryVec, corpusId, vecCol)
  }

  /** Per-query ADC lookup table: [m][c] = squared distance from the
    * query's m-th subvector to centroid c (quantization.py:541-560). */
  def pqLut(model: PqModel)(queryVec: Column): Column = {
    val mCount = model.numSubspaces; val subDim = model.subDim
    val books = model.codebooks
    val lutUdf = udf { (q: Seq[Float]) =>
      Array.tabulate(mCount, books(0).length) { (m, c) =>
        var d = 0.0; var j = 0
        while (j < subDim) { val diff = q(m * subDim + j) - books(m)(c)(j); d += diff * diff; j += 1 }
        d
      }.map(_.toSeq).toSeq
    }
    lutUdf(queryVec)
  }

  /** Asymmetric distance: sum the LUT entries the code selects. */
  def adcDistance(lutCol: Column, codeCol: Column): Column = {
    val adc = udf { (lut: Seq[Seq[Double]], code: Seq[Int]) =>
      var s = 0.0; var m = 0
      while (m < code.length) { s += lut(m)(code(m)); m += 1 }
      math.sqrt(s)
    }
    adc(lutCol, codeCol)
  }

  /** Asymmetric-distance kNN: per-query LUT of query-subvector-to-centroid
    * distances, summed over code entries (quantization.py:541-578). */
  def pqSearch(queries: DataFrame, corpus: DataFrame, model: PqModel, k: Int,
               queryId: String = "query_id", queryVec: String = "query_vec",
               corpusId: String = "id", codeCol: String = "pq_code"): DataFrame = {
    val q = queries.select(col(queryId).as("_qid"), pqLut(model)(col(queryVec)).as("_lut"))
    val topk = udaf(new Knn.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    corpus.select(col(corpusId).cast("long").as("_cid"), col(codeCol).as("_code"))
      .crossJoin(broadcast(q))
      .select(col("_qid"), col("_cid"), adcDistance(col("_lut"), col("_code")).as("_dist"))
      .groupBy(col("_qid").as(queryId))
      .agg(topk(col("_cid"), col("_dist")).as("_nbrs"))
      .select(col(queryId), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col(queryId), (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"), col("_n.dist").as("dist"))
  }

  // -------------------------------------------------- Rerank + recall eval

  /** Quantized-first scan + exact rerank: approximate top-`fetchK`
    * candidates, then exact distances on the survivors only — the
    * reference's hybrid two-stage plan (parallel_search.py:895-947). */
  def rerankExact(approxTopK: DataFrame, queries: DataFrame, corpus: DataFrame,
                  k: Int, metric: String = "cosine",
                  queryId: String = "query_id", queryVec: String = "query_vec",
                  corpusId: String = "id", vecCol: String = "vec"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(queryId).orderBy(col("dist"), col("neighbor_id"))
    approxTopK.select(col(queryId), col("neighbor_id"))
      .join(corpus.select(col(corpusId).cast("long").as("neighbor_id"), col(vecCol)), "neighbor_id")
      .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
      .withColumn("dist", vector.distance(metric, col(vecCol), col(queryVec)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col("rank"), col("neighbor_id"), col("dist"))
  }

  /** recall@k: |approx ∩ exact| / k per query (quantization.py:692-703). */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int,
                queryId: String = "query_id"): DataFrame =
    approx.select(col(queryId), col("neighbor_id"))
      .join(exact.select(col(queryId), col("neighbor_id")), Seq(queryId, "neighbor_id"))
      .groupBy(queryId)
      .agg((count(lit(1)).cast("double") / k).as("recall"))
}
