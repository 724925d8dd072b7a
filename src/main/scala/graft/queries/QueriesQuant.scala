package graft.queries

import graft.operators.{Ann, Knn, ModelStore, PackedPq, PackedPq4, PackedSq, QualityClassifier, Quantization}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once model sidecars for the ANN/quantization queries, keyed by sf
  * dir. The reference trains on `fit()` and searches many times
  * (quantization.py:85-106, 480-508); at scale a trained model is an
  * ingest-time artifact like the BM25 index or the cell-partitioned
  * corpus layout. First access per JVM trains and persists via
  * [[ModelStore]]; every TIMED query thereafter loads the sidecar, so its
  * cost is scan + ADC + rerank — not 9 KMeans fits. */
private[queries] object TrainedModels {
  private val roots = scala.collection.mutable.Map.empty[String, String]
  private def root(dir: String): String =
    roots.getOrElseUpdate(dir,
      java.nio.file.Files.createTempDirectory("graft-models").toString)

  // The most recently loaded models, kept so the recall-oracle SQL can
  // inline the SAME parameters the queries searched with (oracleSql is
  // accessed after the query battery runs — Verify's flow). One dir per
  // JVM in practice; last-wins is the matching behavior for a subset run.
  @volatile private[queries] var lastIvf: Option[Ann.IvfModel] = None
  @volatile private[queries] var lastPq: Option[Quantization.PqModel] = None
  @volatile private[queries] var lastPqRes: Option[Quantization.PqModel] = None
  @volatile private[queries] var lastPq4: Option[Quantization.PqModel] = None
  @volatile private[queries] var lastLr: Option[QualityClassifier.LrModel] = None
  @volatile private[queries] var lastOpq: Option[Quantization.OpqModel] = None
  /** q150's Spark-side candidate cut (query_id, neighbor_id), captured at
    * query time so the oracle reranks THE KERNEL'S candidates — the int
    * kernel is approximate by contract (~1e-4 relative dot error), so an
    * oracle re-deriving its own decoded-space top-50 can legitimately
    * disagree at a rank-50 near-tie; the funnel's gated claim is "emitted
    * top-10 = exact rerank of the candidates the kernel produced". The
    * kernel's own cut quality is spec'd separately (PackedSqSpec +
    * Sweep sq_int_recall10). */
  @volatile private[queries] var lastSqIntCand: Option[Seq[(Long, Long)]] = None

  /** Clears the dynamic-oracle captures at battery start (Verify): a
    * stale capture from a prior corpus/dir in the same JVM must never
    * seed an oracle for a battery that didn't run its query. Disk model
    * sidecars are dir-keyed and unaffected — a query that runs re-sets
    * its capture as part of running. */
  private[queries] def resetCaptures(): Unit = {
    lastIvf = None; lastPq = None; lastPqRes = None; lastPq4 = None
    lastLr = None; lastOpq = None; lastSqIntCand = None
  }

  def ivf(s: SparkSession, dir: String): Ann.IvfModel = synchronized {
    val d = s"${root(dir)}/ivf16"
    if (!ModelStore.exists(d))
      ModelStore.saveIvf(s, Ann.trainIvf(
        s.read.parquet(s"$dir/embeddings.parquet"), "embedding",
        numCells = 16, sampleFraction = 0.25), d)
    val m = ModelStore.loadIvf(s, d)
    lastIvf = Some(m)
    m
  }

  /** Quality classifier: positives = the English slice, negatives = the
    * rest — a deterministic seed-set split whose learned weights the q115
    * oracle inlines (training happens once per JVM; the oracle checks the
    * SCORING path against whatever was learned, like the recall oracles
    * check search against whatever was trained). */
  def lrQuality(s: SparkSession, dir: String): QualityClassifier.LrModel = synchronized {
    val d = s"${root(dir)}/lr1024"
    if (!ModelStore.exists(d)) {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      ModelStore.saveLr(s, QualityClassifier.train(
        docs.where(org.apache.spark.sql.functions.col("lang") === "en"),
        docs.where(org.apache.spark.sql.functions.col("lang") =!= "en"),
        "text"), d)
    }
    val m = ModelStore.loadLr(s, d)
    lastLr = Some(m)
    m
  }

  def pq(s: SparkSession, dir: String): Quantization.PqModel = synchronized {
    val d = s"${root(dir)}/pq8x64"
    if (!ModelStore.exists(d))
      ModelStore.savePq(s, Quantization.trainPq(
        s.read.parquet(s"$dir/embeddings.parquet"), "embedding",
        numSubspaces = 8, numCentroids = 64, sampleFraction = 0.25), d)
    val m = ModelStore.loadPq(s, d)
    lastPq = Some(m)
    m
  }

  /** 16-centroid PQ for the 4-bit (fastscan-layout) tier — nibble codes
    * need every code < 16; same subspace count as [[pq]] so the byte
    * budget halves at comparable geometry. */
  def pq4(s: SparkSession, dir: String): Quantization.PqModel = synchronized {
    val d = s"${root(dir)}/pq8x16"
    if (!ModelStore.exists(d))
      ModelStore.savePq(s, Quantization.trainPq(
        s.read.parquet(s"$dir/embeddings.parquet"), "embedding",
        numSubspaces = 8, numCentroids = 16, sampleFraction = 0.25), d)
    val m = ModelStore.loadPq(s, d)
    lastPq4 = Some(m)
    m
  }

  /** PQ trained on IVF residuals against the SAME coarse model as
    * [[ivf]] — the q123 pairing (the coarse model and the residual
    * codebooks are one artifact: residuals from a different coarse
    * geometry are meaningless). */
  /** OPQ: learned rotation + codebooks fitted in the rotated space (Ge
    * CVPR'13) — one artifact, persisted like the others so the TIMED
    * query pays rotate + ADC + rerank, not the alternating fits. */
  def opq(s: SparkSession, dir: String): Quantization.OpqModel = synchronized {
    val d = s"${root(dir)}/opq8x64"
    if (!ModelStore.exists(d))
      ModelStore.saveOpq(s, Quantization.trainOpq(
        s.read.parquet(s"$dir/embeddings.parquet"), "embedding",
        numSubspaces = 8, numCentroids = 64, opqIter = 2,
        sampleFraction = 0.25), d)
    val m = ModelStore.loadOpq(s, d)
    lastOpq = Some(m)
    m
  }

  def pqResidual(s: SparkSession, dir: String): Quantization.PqModel = synchronized {
    val d = s"${root(dir)}/pqres8x64"
    if (!ModelStore.exists(d)) {
      val im = ivf(s, dir)
      ModelStore.savePq(s, Quantization.trainPqResidual(
        s.read.parquet(s"$dir/embeddings.parquet"), "embedding", im,
        numSubspaces = 8, numCentroids = 64, sampleFraction = 0.25), d)
    }
    val m = ModelStore.loadPq(s, d)
    lastPqRes = Some(m)
    m
  }
}

/** Quantization coverage (SURVEY §2 A6-A8, F6-F8 + rerank): SQ round-trip
  * stats, SQ/BQ approximate kNN, PQ recall, quantize-then-rerank. */
object QueriesQuant {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Battery-start hook for Verify: see [[TrainedModels.resetCaptures]]. */
  def resetCaptures(): Unit = TrainedModels.resetCaptures()

  /** q122's resident code corpus, packed once per JVM/sf (the at-scale
    * lifecycle: pack at ingest, serve many queries) — rebuilt if a test
    * harness unpersisted it. */
  private val packedPqCache =
    scala.collection.mutable.Map.empty[String, PackedPq.PackedPqCorpus[Long]]
  private def cachedPackPq(s: SparkSession, dir: String): PackedPq.PackedPqCorpus[Long] =
    packedPqCache.synchronized {
      packedPqCache.get(dir)
        .filter(_.blocks.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        .getOrElse {
          val pi = PackedPq.packIvfPq(t(s, dir, "embeddings"),
            TrainedModels.ivf(s, dir), TrainedModels.pq(s, dir),
            idCol = "vec_id", vecCol = "embedding")
          packedPqCache(dir) = pi
          pi
        }
    }

  /** q145's 4-bit nibble corpus, packed once per JVM/sf like the raw
    * tier above (8-bit encode pass + narrow re-layout). */
  private val packedPq4Cache =
    scala.collection.mutable.Map.empty[String, PackedPq4.PackedPq4Corpus[Long]]
  private def cachedPackPq4(s: SparkSession, dir: String): PackedPq4.PackedPq4Corpus[Long] =
    packedPq4Cache.synchronized {
      packedPq4Cache.get(dir)
        .filter(_.blocks.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        .getOrElse {
          val pi = PackedPq4.packIvfPq4(t(s, dir, "embeddings"),
            TrainedModels.ivf(s, dir), TrainedModels.pq4(s, dir),
            idCol = "vec_id", vecCol = "embedding")
          packedPq4Cache(dir) = pi
          pi
        }
    }

  /** q129's OPQ-rotated code corpus, packed once per JVM/sf like the raw
    * tier above. */
  private val packedOpqCache =
    scala.collection.mutable.Map.empty[String, PackedPq.PackedPqCorpus[Long]]
  private def cachedPackOpq(s: SparkSession, dir: String): PackedPq.PackedPqCorpus[Long] =
    packedOpqCache.synchronized {
      packedOpqCache.get(dir)
        .filter(_.blocks.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        .getOrElse {
          val om = TrainedModels.opq(s, dir)
          val pi = PackedPq.packIvfPq(t(s, dir, "embeddings"),
            TrainedModels.ivf(s, dir), om.pq,
            idCol = "vec_id", vecCol = "embedding",
            rotation = Some(om.rotation))
          packedOpqCache(dir) = pi
          pi
        }
    }

  /** q130's resident SQ8 corpus, packed once per JVM/sf like the PQ
    * tiers above. The SQ model is the full-corpus fit (the q17 oracle
    * re-derives the same stats in SQL). */
  private val packedSqCache =
    scala.collection.mutable.Map.empty[String, PackedSq.PackedSqCorpus[Long]]
  private def cachedPackSq(s: SparkSession, dir: String): PackedSq.PackedSqCorpus[Long] =
    packedSqCache.synchronized {
      packedSqCache.get(dir)
        .filter(_.blocks.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        .getOrElse {
          val embs = t(s, dir, "embeddings")
          val pi = PackedSq.packIvfSq(embs, TrainedModels.ivf(s, dir),
            Quantization.trainSq(embs, "embedding"),
            idCol = "vec_id", vecCol = "embedding")
          packedSqCache(dir) = pi
          pi
        }
    }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RESIDENT SQ8 tier (PackedSq): q17's decode-and-distance search
    // served from per-cell byte slabs at full probe — row-identical to
    // Quantization.sqSearch (PackedSqSpec: bit-equal distances, same
    // (dist, id) cut), so it hash-checks against the SAME DuckDB
    // re-derivation as q17. The middle rung of the resident ladder:
    // 4x less memory than the float slabs, byte-LUT scans, no rerank
    // needed to serve.
    "q130_packed_sq" -> ((s, dir) => {
      val pi = cachedPackSq(s, dir)
      PackedSq.search(pi, QueriesVector.queryBatch(s, dir, 5),
          k = 10, nProbe = pi.ivf.numCells)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // Resident SQ funnel: byte-LUT scan -> exact rerank (the q20
    // quantized-first hybrid, parallel_search.py:895-947, served from
    // the packed tier). Full probe makes the candidate cut row-identical
    // to sqSearch's top-50 (PackedSqSpec), so the composition
    // hash-checks against q20's oracle verbatim.
    "q137_packed_sq_rerank" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val pi = cachedPackSq(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val qArr = queries
        .select(col("query_id").cast("long"), col("query_vec").cast("array<float>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val cand = PackedSq.searchSq[Long](pi, qArr, k = 50, nProbe = pi.ivf.numCells)
      import s.implicits._
      val candDF = cand.toSeq
        .flatMap { case (qid, nbrs) => nbrs.map(n => (qid, n._1)) }
        .toDF("query_id", "neighbor_id")
      Quantization.rerankExact(candDF, queries, embs, k = 10,
          metric = "cosine", corpusId = "vec_id", vecCol = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // INT-DOMAIN SQ funnel under the hash gate: the integer-ADC kernel
    // (PackedSq.searchSqInt) produces the candidate cut, exact rerank
    // produces the emitted top-10. The kernel is approximate (~15-bit
    // query-side multipliers, relative dot error ~1e-4) so its top-50
    // can legitimately differ from the decoded-space top-50 at a
    // rank-50 near-tie; the oracle therefore reranks THE KERNEL'S OWN
    // candidates (captured via TrainedModels.lastSqIntCand, the
    // recall-oracle pattern) — the gate proves the rerank stage
    // bit-exactly. The CUT itself is gated by the kernel_recall_hits
    // column (r12 verdict #3): Spark counts how many of ITS exact
    // brute-force top-10 (Knn.knnJoin, an independent code path) appear
    // in the kernel's 50 candidates, requires >= 9 fail-loud, and emits
    // the count; the DuckDB oracle recomputes exact top-10 from the
    // parquet INDEPENDENTLY and counts the same intersection against the
    // captured candidates. A silently-broken kernel now flips
    // CORRECTNESS red on its own: garbage candidates either trip the
    // require (err non-null) or hash-mismatch the recomputed gate.
    // The EMITTED column is the boolean (hits >= 9) as int, not the raw
    // count: a float-vs-double near-tie at exact rank 10 can swap one
    // boundary member between the two sides' exact top-10s, moving the
    // count 10 vs 9 — the >= 9 predicate absorbs exactly that one-member
    // slack while any real kernel break (hits far below 9) still flips.
    "q150_packed_sq_int_rerank" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val pi = cachedPackSq(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val qArr = queries
        .select(col("query_id").cast("long"), col("query_vec").cast("array<float>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val cand = PackedSq.searchSqInt[Long](pi, qArr, k = 50, nProbe = pi.ivf.numCells)
      import s.implicits._
      val flat = cand.toSeq.flatMap { case (qid, nbrs) => nbrs.map(n => (qid, n._1)) }
      TrainedModels.lastSqIntCand = Some(flat)
      val candDF = flat.toDF("query_id", "neighbor_id")
      val exact10 = Knn.knnJoin(queries, embs, k = 10, metric = "cosine",
        corpusId = "vec_id", corpusVec = "embedding")
        .select(col("query_id").cast("long").as("query_id"), col("neighbor_id"))
      val hits = queries.select(col("query_id").cast("long").as("query_id"))
        .join(candDF.join(exact10, Seq("query_id", "neighbor_id"))
                .groupBy("query_id").agg(count(lit(1)).as("_h")),
          Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("_h"), lit(0L)) >= 9).cast("int").as("kernel_recall_ok"))
      val lost = hits.where(col("kernel_recall_ok") === 0).count()
      require(lost == 0,
        s"searchSqInt candidate cut lost exact-top-10 coverage for $lost " +
          "of 5 queries — the int kernel is broken, not near-tied")
      Quantization.rerankExact(candDF, queries, embs, k = 10,
          metric = "cosine", corpusId = "vec_id", vecCol = "embedding")
        .join(hits, Seq("query_id"))
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"), col("kernel_recall_ok"))
    }),

    // A7 + F6: per-dim SQ model + reconstruction error
    "q16_sq_stats" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val m = Quantization.trainSq(embs, "embedding")
      val mins = typedLit(m.mins.toSeq); val maxs = typedLit(m.maxs.toSeq)
      embs.select(posexplode(arrays_zip(
          transform(col("embedding"), _.cast("double")),
          Quantization.sqDecode(m)(Quantization.sqEncode(m)(col("embedding")))
        )).as(Seq("dim0", "z")))
        .select(col("dim0"), abs(col("z.0") - col("z.1")).as("err"))
        .groupBy("dim0").agg(round(avg("err"), 6).as("mean_abs_err"))
        .select((col("dim0") + 1).as("dim"),
          round(element_at(mins, col("dim0") + 1), 6).as("mn"),
          round(element_at(maxs, col("dim0") + 1), 6).as("mx"),
          col("mean_abs_err"))
    }),

    // F6 approximate kNN on SQ codes (decode-and-distance)
    "q17_sq_knn" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val m = Quantization.trainSq(embs, "embedding")
      val corpus = embs.withColumn("sq_code",
        Quantization.sqEncode(m)(col("embedding")))
      Quantization.sqSearch(QueriesVector.queryBatch(s, dir, 5), corpus, m, k = 10,
          corpusId = "vec_id")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // A8 + F7/F4: binary quantization + Hamming kNN
    "q18_bq_knn" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val thr = Quantization.trainBq(embs, "embedding")
      val corpus = embs.withColumn("bq_code",
        Quantization.bqEncode(thr)(col("embedding")))
      Quantization.bqSearch(QueriesVector.queryBatch(s, dir, 5), corpus, thr,
          k = 10, corpusId = "vec_id")
    }),

    // A6 + F8: PQ with seeded MLlib KMeans; recall@10 vs exact (A13).
    // KMeans centroids are engine-specific => no SQL oracle (rows-only).
    // IVF-PQ composition (coarse prune -> ADC on codes -> exact rerank):
    // recall@10 vs exact under the same metric. Rows-only (recall floors
    // asserted in QuantizationSpec); probing ALL cells isolates the
    // PQ+rerank error from cell-miss error.

    // The ROUND-7 stages composed as ONE Pipeline plan: learned
    // classifier gate -> boilerplate line strip (counts over the gate's
    // SURVIVORS) -> whitespace-empty drop -> exact dedup. The planted
    // footer masks the +100000 duplicate copies of the even docs until
    // the strip re-unifies them — stage ordering is part of the check.
    // Oracle: the q115/q112/q27 SQL fragments chained in the same order
    // from the inlined learned weights.
    "q117_pipeline_learned" -> ((s, dir) => {
      val m = TrainedModels.lrQuality(s, dir)
      val docs = t(s, dir, "documents")
      val corpus = docs.select(col("doc_id"),
          when(col("doc_id") % 2 === 0,
            concat(col("text"),
              lit("\nSubscribe to our newsletter today\nCopyright 2020 Example Corp")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.where(col("doc_id") < 25)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val spec = graft.operators.PipelineSpec(
        qualityModel = Some(m), minClassifierScore = 0.5,
        stripBoilerplateMinDocs = Some(3), exactDedup = true)
      graft.operators.Pipeline.prepare(corpus, "doc_id", "text", spec)
        .data.select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    "q72_ivfpq_recall" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      // models load from the persisted sidecar (trained+saved once per
      // JVM/sf): the timed query pays scan + ADC + rerank, not 9 fits
      val ivf = TrainedModels.ivf(s, dir)
      val pq = TrainedModels.pq(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx = Ann.ivfPqSearch(queries, embs, ivf, pq,
        k = 10, nProbe = 4, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "l2",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // RESIDENT IVF-PQ tier (PackedPq): codes packed one CodeBlock per
    // cell (m bytes/row — 64x below the float tier), per-query ADC LUTs
    // broadcast to probed partitions only, exact rerank of the survivors.
    // Row-identical to Ann.ivfPqSearch on the same models (PackedPqSpec
    // proves bit-equal ADC distances), so it hash-checks against the SAME
    // DuckDB re-execution as q72. Pack is cached per JVM like q99/q100 —
    // the timed query pays probe + ADC + rerank, not the encode.
    "q122_packed_ivfpq" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val pi = cachedPackPq(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx = PackedPq.search(pi, queries, embs,
        k = 10, nProbe = 4, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "l2",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // 4-BIT (fastscan-layout) resident PQ codes (PackedPq4): 16-centroid
    // subspaces, two codes per byte, 16-entry L1-dense LUTs — half the
    // 8-bit tier's code bytes (128x below the float slabs at dim=128,
    // m=8). Nibble packing is a lossless re-layout, so the ADC stage is
    // BIT-IDENTICAL to Ann.ivfPqSearch on the same models (PackedPq4Spec)
    // and the query hash-checks the same full DuckDB re-execution oracle
    // as q72/q122 — built on the 16-centroid model this tier serves.
    "q145_packed_pq4" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val pi = cachedPackPq4(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx = PackedPq4.search(pi, queries, embs,
        k = 10, nProbe = 4, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "l2",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // RESIDUAL IVF-PQ (FAISS IVFADC, Jegou'11): same funnel as q72 but
    // the codes quantize vec - cellCentroid under the SAME coarse model,
    // and the ADC LUT is per (query, probed cell). Hash-checked by a full
    // DuckDB re-execution (encode, per-cell LUT, ADC, rerank) like q72 —
    // proving the residual arithmetic end to end, not just recall floors.
    "q123_ivfpq_residual" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val ivf = TrainedModels.ivf(s, dir)
      val pq = TrainedModels.pqResidual(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx = Ann.ivfPqSearchResidual(queries, embs, ivf, pq,
        k = 10, nProbe = 4, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "l2",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // OPQ (Ge CVPR'13): learned orthogonal rotation before PQ, fitted by
    // alternating codebook-fit / Procrustes-SVD steps; search rotates the
    // query, ADCs the rotated-space codes, exact-reranks the raw vectors.
    // Hash-checked by a full DuckDB re-execution — the inlined rotation
    // matrix and codebooks re-derive rotate, encode, LUT, ADC, rerank.
    "q125_opq_recall" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val om = TrainedModels.opq(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx = Quantization.opqSearch(queries, embs, om,
        k = 10, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "l2",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // OPQ + IVFADC (the FAISS OPQMatrix composition): coarse routing on
    // raw vectors, codes/LUTs in the learned rotated space, exact rerank.
    // Same full-re-execution oracle stance as q72/q123/q125.
    "q128_ivfpq_opq" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val ivf = TrainedModels.ivf(s, dir)
      val om = TrainedModels.opq(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx = Ann.ivfPqSearchOpq(queries, embs, ivf, om,
        k = 10, nProbe = 4, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "l2",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // RESIDENT OPQ tier: the q128 funnel served from the packed byte
    // slabs — rotated-query LUTs on the driver, ADC over probed
    // partitions, exact rerank. Row-identical to Ann.ivfPqSearchOpq
    // (PackedPqSpec), so it hash-checks against the SAME DuckDB
    // re-execution as q128 — the q122↔q72 stance.
    "q129_packed_opq" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val pi = cachedPackOpq(s, dir)
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx = PackedPq.search(pi, queries, embs,
        k = 10, nProbe = 4, fetchK = 50, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "l2",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // Embedding-distribution drift in cell space (Ann.cellDrift): the
    // label<5 slice vs the full corpus under the persisted IVF model —
    // add-one-smoothed per-cell KL contributions; sum = KL(A||B). The
    // oracle re-derives cell assignment from the inlined centroids like
    // the recall oracles, then recomputes the KL algebra.
    "q114_embedding_drift" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val m = TrainedModels.ivf(s, dir)
      Ann.cellDrift(embs, embs.where(col("label") < 5), m, "embedding")
        .select(col("cell"), col("n_a"), col("n_b"),
          (round(col("kl_contrib"), 6) + lit(0.0)).as("kl_contrib"))
        .orderBy("cell")
    }),

    // Learned quality filter (FineWeb-Edu/DCLM shape): logistic model on
    // hashed-unigram counts, trained once on the en-vs-rest seed split,
    // scoring the whole corpus — the oracle recomputes every score from
    // the inlined learned weights (the scoring path is what runs at
    // 100 TB; training is a seed-set-sized job).
    "q115_quality_classifier" -> ((s, dir) => {
      val m = TrainedModels.lrQuality(s, dir)
      QualityClassifier.score(t(s, dir, "documents"), m, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          (round(col("score"), 4) + lit(0.0)).as("score"))
        .orderBy("doc_id")
    }),

    // Matryoshka funnel: coarse cosine top-50 on the 32-dim PREFIX of
    // every vector, exact rerank to top-10 on the full 128 dims. No
    // trained model — fully deterministic, so hash-checked end to end
    // (unlike the recall-floor ANN queries).
    "q83_matryoshka" -> ((s, dir) =>
      Ann.matryoshkaSearch(QueriesVector.queryBatch(s, dir, 5),
          t(s, dir, "embeddings"), k = 10, dims = 32, rerankK = 50,
          metric = "cosine", corpusId = "vec_id", vecCol = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))),

    "q19_pq_recall" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      // codebooks trained on a 25% sample, persisted, and LOADED here —
      // the sidecar split between train-time and search-time cost
      val model = TrainedModels.pq(s, dir)
      val corpus = embs.withColumn("pq_code",
        Quantization.pqEncode(model)(col("embedding")))
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx = Quantization.pqSearch(queries, corpus, model, k = 10,
        corpusId = "vec_id")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "l2",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // Quantized-first scan + exact rerank (parallel_search.py:895-947)
    "q20_sq_rerank" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val m = Quantization.trainSq(embs, "embedding")
      val corpus = embs.withColumn("sq_code",
        Quantization.sqEncode(m)(col("embedding")))
      val queries = QueriesVector.queryBatch(s, dir, 5)
      val approx50 = Quantization.sqSearch(queries, corpus, m, k = 50,
        corpusId = "vec_id")
      Quantization.rerankExact(approx50, queries, embs, k = 10,
          metric = "cosine", corpusId = "vec_id", vecCol = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // S9 fp16 at-rest codec (binary_persistence.py:347-349): per-dim
    // round-trip reconstruction error. Encode is IEEE half with
    // round-half-to-even (2 bytes/dim, no training pass); the oracle
    // replays decode(encode(v)) as exact power-of-two grid arithmetic
    // in SQL — the q16 stance for the fp16 rung.
    "q140_fp16_stats" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      embs.select(posexplode(arrays_zip(
          transform(col("embedding"), _.cast("double")),
          transform(graft.functions.vector.fp16Decode(
            graft.functions.vector.fp16Encode(col("embedding"))), _.cast("double"))
        )).as(Seq("dim0", "z")))
        .select(col("dim0"), abs(col("z.0") - col("z.1")).as("err"))
        .groupBy("dim0").agg(round(avg("err"), 8).as("mean_abs_err"),
          round(max("err"), 9).as("max_abs_err"))
        .select((col("dim0") + 1).as("dim"),
          col("mean_abs_err"), col("max_abs_err"))
    }),

    // S9 fp16 decode-and-distance kNN (the q17 shape one fidelity rung
    // up): corpus at 2 bytes/dim, query round-tripped for symmetry.
    "q141_fp16_knn" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val corpus = embs.withColumn("fp16_code",
        graft.functions.vector.fp16Encode(col("embedding")))
      Quantization.fp16Search(QueriesVector.queryBatch(s, dir, 5), corpus,
          k = 10, corpusId = "vec_id")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),
  )

  /** Shared SQ CTE prefix: per-dim stats + decoded vectors, matching
    * trainSq/sqEncode/sqDecode arithmetic exactly (floor-truncation like
    * numpy's astype(uint8), scale-0 dims forced to 1). */
  private val sqCte =
    """elems AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |stats AS (
      |  SELECT dim, min(v) AS mn, max(v) AS mx,
      |         CASE WHEN max(v) - min(v) = 0 THEN 1.0 ELSE max(v) - min(v) END AS scale
      |  FROM elems GROUP BY dim),
      |dec AS (
      |  SELECT e.vec_id, e.dim, e.v,
      |         floor(least(greatest((e.v - s.mn) / s.scale * 255.0, 0.0), 255.0))
      |           / 255.0 * s.scale + s.mn AS vd
      |  FROM elems e JOIN stats s USING (dim))""".stripMargin

  /** Decoded-space cosine distance between corpus vec c and roundtripped
    * query q (both from `dec`). */
  private val sqKnn =
    s"""WITH $sqCte,
       |qd AS (SELECT vec_id AS query_id, dim, vd FROM dec WHERE vec_id < 5),
       |pairs AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |         CASE WHEN sum(c.vd * c.vd) = 0 OR sum(q.vd * q.vd) = 0 THEN 1.0
       |              ELSE 1.0 - sum(c.vd * q.vd) /
       |                   (sqrt(sum(c.vd * c.vd)) * sqrt(sum(q.vd * q.vd))) END AS dist
       |  FROM dec c JOIN qd q USING (dim)
       |  GROUP BY q.query_id, c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, dist,
       |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
       |  FROM pairs)""".stripMargin

  /** Shared fp16 CTE: decode(encode(v)) replayed as exact half-grid
    * rounding. The binade exponent comes from floor(log2) with a
    * two-sided power-of-two correction (log2 can land an epsilon off an
    * exact power); grid spacing is 2^(e-10) clamped to the subnormal
    * grid at e = -14; rounding is half-to-even. Every step is exact in
    * double (the float value, the power-of-two spacing, and their
    * quotient all keep the full mantissa), so the SQL value equals the
    * engine's bit-twiddled IEEE half exactly — no tolerance needed. */
  private val fp16Cte =
    """elems AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |fe0 AS (
      |  SELECT vec_id, dim, v, abs(v) AS a,
      |         CAST(floor(log2(abs(v))) AS INT) AS e0
      |  FROM elems WHERE v <> 0),
      |fe1 AS (
      |  SELECT vec_id, dim, v, a,
      |         CASE WHEN power(2.0, e0) > a THEN e0 - 1
      |              WHEN power(2.0, e0 + 1) <= a THEN e0 + 1
      |              ELSE e0 END AS e1
      |  FROM fe0),
      |fq AS (
      |  SELECT vec_id, dim, v,
      |         a / power(2.0, greatest(e1, -14) - 10) AS q,
      |         power(2.0, greatest(e1, -14) - 10) AS s
      |  FROM fe1),
      |fdec AS (
      |  SELECT vec_id, dim, v,
      |         (CASE WHEN q - floor(q) > 0.5 THEN floor(q) + 1
      |               WHEN q - floor(q) < 0.5 THEN floor(q)
      |               WHEN CAST(floor(q) AS BIGINT) % 2 = 0 THEN floor(q)
      |               ELSE floor(q) + 1 END)
      |           * s * (CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END) AS vd
      |  FROM fq
      |  UNION ALL
      |  SELECT vec_id, dim, v, 0.0 AS vd FROM elems WHERE v = 0)""".stripMargin

  /** `def`, not `val`: the q19/q72 recall oracles inline the PQ/IVF model
    * parameters loaded by the query run (see RecallOracles) — present
    * once the models are in memory, which Verify's queries-then-oracles
    * flow guarantees for the full battery. */
  def oracles: Map[String, String] = dynamicOracles ++ Map(
    "q16_sq_stats" ->
      s"""WITH $sqCte
         |SELECT s.dim, round(s.mn, 6) AS mn, round(s.mx, 6) AS mx,
         |       round(avg(abs(d.v - d.vd)), 6) AS mean_abs_err
         |FROM dec d JOIN stats s USING (dim)
         |GROUP BY s.dim, s.mn, s.mx""".stripMargin,

    "q17_sq_knn" ->
      s"""$sqKnn
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |       round(dist, 6) + 0.0 AS dist
         |FROM ranked WHERE rank <= 10""".stripMargin,

    // resident SQ funnel at full probe == q20's quantize-then-rerank
    "q137_packed_sq_rerank" ->
      s"""$sqKnn,
         |cand AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 50),
         |exact AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
         |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
         |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
         |                  CAST(unnest(q.embedding) AS DOUBLE) AS y)) AS dist
         |  FROM cand
         |  JOIN embeddings c ON c.vec_id = cand.neighbor_id
         |  JOIN embeddings q ON q.vec_id = cand.query_id),
         |reranked AS (
         |  SELECT query_id, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |  FROM exact)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |       round(dist, 6) + 0.0 AS dist
         |FROM reranked WHERE rank <= 10""".stripMargin,

    // q150's oracle is DYNAMIC (reranks the kernel's captured candidate
    // cut) — see dynamicOracles and TrainedModels.lastSqIntCand

    // full-probe resident SQ8 == sqSearch (PackedSqSpec) == q17's oracle
    "q130_packed_sq" ->
      s"""$sqKnn
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |       round(dist, 6) + 0.0 AS dist
         |FROM ranked WHERE rank <= 10""".stripMargin,

    "q140_fp16_stats" ->
      s"""WITH $fp16Cte
         |SELECT dim, round(avg(abs(v - vd)), 8) AS mean_abs_err,
         |       round(max(abs(v - vd)), 9) AS max_abs_err
         |FROM fdec GROUP BY dim""".stripMargin,

    "q141_fp16_knn" ->
      s"""WITH $fp16Cte,
         |qd AS (SELECT vec_id AS query_id, dim, vd FROM fdec WHERE vec_id < 5),
         |pairs AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |         CASE WHEN sum(c.vd * c.vd) = 0 OR sum(q.vd * q.vd) = 0 THEN 1.0
         |              ELSE 1.0 - sum(c.vd * q.vd) /
         |                   (sqrt(sum(c.vd * c.vd)) * sqrt(sum(q.vd * q.vd))) END AS dist
         |  FROM fdec c JOIN qd q USING (dim)
         |  GROUP BY q.query_id, c.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |  FROM pairs)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |       round(dist, 6) + 0.0 AS dist
         |FROM ranked WHERE rank <= 10""".stripMargin,

    "q18_bq_knn" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |thr AS (SELECT dim, median(v) AS t FROM elems GROUP BY dim),
        |bits AS (
        |  SELECT e.vec_id, e.dim, CASE WHEN e.v > t.t THEN 1 ELSE 0 END AS bit
        |  FROM elems e JOIN thr t USING (dim)),
        |qb AS (SELECT vec_id AS query_id, dim, bit FROM bits WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |         sum(abs(c.bit - q.bit)) AS hamming
        |  FROM bits c JOIN qb q USING (dim)
        |  GROUP BY q.query_id, c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, hamming,
        |         row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
        |       CAST(hamming AS INT) AS hamming
        |FROM ranked WHERE rank <= 10""".stripMargin,

    "q20_sq_rerank" ->
      s"""$sqKnn,
         |cand AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 50),
         |exact AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
         |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
         |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
         |                  CAST(unnest(q.embedding) AS DOUBLE) AS y)) AS dist
         |  FROM cand
         |  JOIN embeddings c ON c.vec_id = cand.neighbor_id
         |  JOIN embeddings q ON q.vec_id = cand.query_id),
         |reranked AS (
         |  SELECT query_id, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |  FROM exact)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |       round(dist, 6) + 0.0 AS dist
         |FROM reranked WHERE rank <= 10""".stripMargin,

    "q83_matryoshka" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |coarse AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
        |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
        |     FROM (SELECT CAST(unnest(list_slice(c.embedding, 1, 32)) AS DOUBLE) AS x,
        |                  CAST(unnest(list_slice(q.qv, 1, 32)) AS DOUBLE) AS y)) AS cdist
        |  FROM q, embeddings c),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY cdist, neighbor_id) AS rn
        |    FROM coarse) WHERE rn <= 50),
        |exact AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
        |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
        |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
        |                  CAST(unnest(q.qv) AS DOUBLE) AS y)) AS dist
        |  FROM cand
        |  JOIN embeddings c ON c.vec_id = cand.neighbor_id
        |  JOIN q ON q.query_id = cand.query_id),
        |reranked AS (
        |  SELECT query_id, neighbor_id, dist,
        |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
        |  FROM exact)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
        |       round(dist, 6) + 0.0 AS dist
        |FROM reranked WHERE rank <= 10""".stripMargin,
  )

  private def dynamicOracles: Map[String, String] =
    // rerank-of-the-kernel's-candidates gate: cand is the Spark run's own
    // top-50, inlined as VALUES (250 rows at the battery's batch shape).
    // kernel_recall_ok is the INDEPENDENT half (r12 verdict #3): DuckDB
    // recomputes the exact float-cosine top-10 per query straight from
    // the parquet and checks the captured cut still covers >= 9 of it —
    // the one gate a broken searchSqInt cannot satisfy from its own
    // output.
    TrainedModels.lastSqIntCand.map { cs =>
      val values = cs.map { case (q, n) => s"($q, $n)" }.mkString(", ")
      "q150_packed_sq_int_rerank" ->
        s"""WITH cand AS (
           |  SELECT CAST(c0 AS BIGINT) AS query_id, CAST(c1 AS BIGINT) AS neighbor_id
           |  FROM (VALUES $values) t(c0, c1)),
           |qv AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
           |allpairs AS (
           |  SELECT qv.query_id, c.vec_id AS neighbor_id,
           |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
           |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
           |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
           |                  CAST(unnest(qv.qv) AS DOUBLE) AS y)) AS dist
           |  FROM qv, embeddings c),
           |exact10 AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
           |    FROM allpairs) WHERE rank <= 10),
           |recall AS (
           |  SELECT qv.query_id,
           |         CAST((count(hit.neighbor_id) >= 9) AS INT) AS kernel_recall_ok
           |  FROM qv
           |  LEFT JOIN (SELECT cand.query_id, cand.neighbor_id
           |             FROM cand JOIN exact10 USING (query_id, neighbor_id)) hit
           |    USING (query_id)
           |  GROUP BY qv.query_id),
           |exact AS (
           |  SELECT cand.query_id, cand.neighbor_id,
           |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
           |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
           |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
           |                  CAST(unnest(q.embedding) AS DOUBLE) AS y)) AS dist
           |  FROM cand
           |  JOIN embeddings c ON c.vec_id = cand.neighbor_id
           |  JOIN embeddings q ON q.vec_id = cand.query_id),
           |reranked AS (
           |  SELECT query_id, neighbor_id, dist,
           |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
           |  FROM exact)
           |SELECT r.query_id, CAST(r.rank AS INT) AS rank, r.neighbor_id,
           |       round(r.dist, 6) + 0.0 AS dist, rc.kernel_recall_ok
           |FROM reranked r JOIN recall rc ON r.query_id = rc.query_id
           |WHERE r.rank <= 10""".stripMargin
    }.toMap ++
    TrainedModels.lastPq.map(pm =>
      "q19_pq_recall" -> RecallOracles.pqRecallSql(pm, k = 10)).toMap ++
    (for { im <- TrainedModels.lastIvf; pm <- TrainedModels.lastPq } yield
      "q72_ivfpq_recall" -> RecallOracles.ivfPqRecallSql(
        im, pm, nProbe = 4, fetchK = 50, k = 10)).toMap ++
    // q122 is row-identical to q72's plan by construction (PackedPqSpec),
    // so the SAME full re-execution oracle certifies the packed tier
    (for { im <- TrainedModels.lastIvf; pm <- TrainedModels.lastPq } yield
      "q122_packed_ivfpq" -> RecallOracles.ivfPqRecallSql(
        im, pm, nProbe = 4, fetchK = 50, k = 10)).toMap ++
    // q145's ADC stage is bit-identical to the 8-bit tier on the same
    // 16-centroid model (PackedPq4Spec), so the q72 re-execution oracle
    // certifies the nibble tier too — parameterized by THAT model
    (for { im <- TrainedModels.lastIvf; pm <- TrainedModels.lastPq4 } yield
      "q145_packed_pq4" -> RecallOracles.ivfPqRecallSql(
        im, pm, nProbe = 4, fetchK = 50, k = 10)).toMap ++
    (for { im <- TrainedModels.lastIvf; pm <- TrainedModels.lastPqRes } yield
      "q123_ivfpq_residual" -> RecallOracles.ivfPqResidualRecallSql(
        im, pm, nProbe = 4, fetchK = 50, k = 10)).toMap ++
    TrainedModels.lastOpq.map(om =>
      "q125_opq_recall" -> RecallOracles.opqRecallSql(
        om, fetchK = 50, k = 10)).toMap ++
    (for { im <- TrainedModels.lastIvf; om <- TrainedModels.lastOpq } yield
      "q128_ivfpq_opq" -> RecallOracles.ivfOpqRecallSql(
        im, om, nProbe = 4, fetchK = 50, k = 10)).toMap ++
    (for { im <- TrainedModels.lastIvf; om <- TrainedModels.lastOpq } yield
      "q129_packed_opq" -> RecallOracles.ivfOpqRecallSql(
        im, om, nProbe = 4, fetchK = 50, k = 10)).toMap ++
    TrainedModels.lastIvf.map(im =>
      "q114_embedding_drift" -> RecallOracles.cellDriftSql(im)).toMap ++
    TrainedModels.lastLr.map(lm =>
      "q115_quality_classifier" -> RecallOracles.lrScoreSql(lm)).toMap ++
    TrainedModels.lastLr.map(lm =>
      "q117_pipeline_learned" -> RecallOracles.pipelineLearnedSql(lm)).toMap
}
