package graft.queries

import graft.functions.vector
import graft.operators.{Ann, Knn, PackedGraph, PackedKnn, Pooling, Quantization}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Vector-search coverage beyond the four core kNN queries: batch
  * throughput shape and normalization (F5). */
object QueriesVector {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def queryBatch(s: SparkSession, dir: String, n: Int): DataFrame =
    t(s, dir, "embeddings").where(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  /** q64's cell-partitioned corpus + its IVF model, keyed by sf dir (laid
    * out once per JVM — the at-scale corpus layout is written at ingest,
    * not per query). */
  private val ivfCorpus =
    scala.collection.mutable.Map.empty[String, (Ann.IvfModel, String)]

  /** q99/q100's resident packed indexes, keyed by sf dir — packed once
    * per JVM like q64's layout (the index build is ingest-time work; the
    * queries measure steady-state search). Never unpersisted: ~30 MB at
    * sf0.1, released with the JVM. */
  /** q103's/q56's near-dup blocking model, fit once per sf dir (lossless
    * under any centroids — see Dedup.trainNearDupModel; r14 shares it
    * with q56, whose per-call KMeans refit produced the identical model
    * from the identical (corpus, trainFraction=0.5, seed) inputs). */
  private[queries] val nearDupModelCache =
    scala.collection.mutable.Map.empty[String, Ann.IvfModel]

  private val packedCache =
    scala.collection.mutable.Map.empty[String, PackedKnn.PackedCorpus[Long]]
  private val packedIvfCache =
    scala.collection.mutable.Map.empty[String, PackedKnn.PackedIvfCorpus[Long]]

  /** Self-healing get-or-pack: Bench-style hygiene sweeps can unpersist a
    * cached handle's blocks, which would leave it recomputing its whole
    * lineage inside every search job — drop and repack instead. */
  private def cached[T](cache: scala.collection.mutable.Map[String, T], key: String)(
      alive: T => Boolean)(build: => T): T = cache.synchronized {
    cache.get(key).filter(alive).getOrElse { val p = build; cache(key) = p; p }
  }

  private def cachedPack(key: String)(build: => PackedKnn.PackedCorpus[Long]) =
    cached(packedCache, key)(
      _.blocks.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)(build)

  private def cachedPackIvf(key: String)(build: => PackedKnn.PackedIvfCorpus[Long]) =
    cached(packedIvfCache, key)(
      _.blocks.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)(build)

  private val packedGraphCache =
    scala.collection.mutable.Map.empty[String, PackedGraph.PackedGraphCorpus[Long]]
  private def cachedPackGraph(key: String)(build: => PackedGraph.PackedGraphCorpus[Long]) =
    cached(packedGraphCache, key)(
      _.blocks.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)(build)

  private val mutatedGraphCache =
    scala.collection.mutable.Map.empty[String, PackedGraph.PackedGraphCorpus[Long]]
  private def cachedMutatedGraph(key: String)(build: => PackedGraph.PackedGraphCorpus[Long]) =
    cached(mutatedGraphCache, key)(
      _.blocks.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)(build)

  /** q147/q148's collection facade, built once per sf dir (collection
    * write + coarse model are ingest-time work; the queries measure
    * serving). The resident graph is re-packed if a hygiene sweep
    * unpersisted it. */
  private val graphCollectionCache =
    scala.collection.mutable.Map.empty[String, graft.GraftCollection]

  private def graphCollection(s: SparkSession, dir: String): graft.GraftCollection =
    graphCollectionCache.synchronized {
      graphCollectionCache.getOrElseUpdate(dir, {
        val embs = t(s, dir, "embeddings")
        val dim = embs.select("embedding").head.getSeq[Float](0).size
        val root = java.nio.file.Files
          .createTempDirectory("graft-q147-collection").toString
        val coll = new graft.GraftClient(s, root, embedDim = dim)
          .createCollection("graph_filtered", dimensions = dim)
        coll.add(embs.select(
          col("vec_id").cast("string").as("id"),
          concat(lit("vec "), col("vec_id")).as("document"),
          col("embedding").cast("array<float>").as("embedding"),
          col("label")))
        coll.buildVectorIndex(numCells = 4)
        coll
      })
    }

  /** Shared candidate -> exact-rerank funnel for the graph queries
    * (q101/q102): float32 graph candidates (k=10 over-fetch per node),
    * exact double rerank to top-5 — one place for the funnel parameters
    * like [[packedFunnel]]. */
  private def graphFunnel(sub: DataFrame,
                          cand: DataFrame): DataFrame = {
    val queries = sub.select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"))
    Quantization.rerankExact(cand.select(col("query_id"), col("neighbor_id")),
        queries, sub, k = 5, metric = "cosine",
        corpusId = "vec_id", vecCol = "embedding")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("dist"), 6).as("dist"))
  }

  /** Shared over-fetch + exact-rerank funnel for the packed-kernel
    * queries (q99/q100): float32 candidates (top-20 per query) from the
    * given search, exact double rerank to top-10 — the single place the
    * funnel parameters live so the two hash-checked variants cannot
    * drift apart. */
  private def packedFunnel(s: SparkSession, dir: String)(
      search: (DataFrame, Array[(Long, Array[Float])]) => Array[(Long, Array[(Long, Double)])]): DataFrame = {
    val embs = t(s, dir, "embeddings")
    val qdf = queryBatch(s, dir, 5)
    val qArr = qdf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val cand = search(embs, qArr)
    import s.implicits._
    val candDF = cand.toSeq
      .flatMap { case (qid, nbrs) => nbrs.map { case (nid, _) => (qid, nid) } }
      .toDF("query_id", "neighbor_id")
    Quantization.rerankExact(candDF, qdf, embs, k = 10, metric = "cosine",
        corpusId = "vec_id", vecCol = "embedding")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("dist"), 6).as("dist"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 at batch width: 50 queries — the reference's batch-GEMM shape
    // (parallel_search.py:246-311), served by the fused KnnTopK physical
    // operator (graft.plans) and checked against the same exact oracle
    "q14_knn_batch" -> ((s, dir) =>
      Knn.knnJoinFused(queryBatch(s, dir, 50), t(s, dir, "embeddings"), k = 10,
          metric = "cosine", corpusId = "vec_id", corpusVec = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))),

    // F5 l2-normalize: norm + first normalized component per vector
    "q15_vector_norm" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .withColumn("_norm",
          sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)))
        .withColumn("_normed", vector.l2Normalize(col("embedding")))
        .select(col("vec_id"), round(col("_norm"), 6).as("norm"),
          round(element_at(col("_normed"), 1), 6).as("first_elem"))),

    // IVF approximate kNN: recall@10 vs exact (KMeans centroids are
    // engine-specific => rows-only check; recall floor asserted in tests)
    "q48_ivf_recall" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val queries = queryBatch(s, dir, 5)
      // coarse centroids (25% sample) load from the persisted model
      // sidecar — trained once per JVM/sf, searched many times
      val model = TrainedModels.ivf(s, dir)
      val approx = Ann.ivfSearch(queries, embs, model, k = 10, nProbe = 4,
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "cosine",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),

    // IVF against the CELL-PARTITIONED corpus layout (Ann
    // .writePartitionedByCell -> ivfSearchPartitioned): the probed cells
    // become a partition predicate on the scan. Probing ALL cells makes
    // the result exactly the cosine kNN — so this path is hash-checked
    // against the same exact oracle as q10 (any mis-assignment, lost
    // partition, or float damage in the layout round-trip would break the
    // hash), while KnnSpec separately asserts that nProbe < numCells reads
    // only the probed directories.
    "q64_ivf_partitioned" -> ((s, dir) => {
      val (model, path) = ivfCorpus.synchronized {
        ivfCorpus.getOrElseUpdate(dir, {
          val embs = t(s, dir, "embeddings")
          // same persisted coarse quantizer the other IVF queries load
          val m = TrainedModels.ivf(s, dir)
          val d = java.nio.file.Files
            .createTempDirectory("graft-q64-ivfcorpus").toString
          Ann.writePartitionedByCell(embs, m, d,
            corpusId = "vec_id", vecCol = "embedding")
          (m, d)
        })
      }
      Ann.ivfSearchPartitioned(queryBatch(s, dir, 5), path, model,
          k = 10, nProbe = model.numCells)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // Embedding mean-pooling (chunk -> doc / cluster centroid): one
    // map-side-partial shuffle of dim-length buffers; exploded back to
    // (group, pos, value) rows so the oracle also checks array ordering.
    // Rounded at 4 decimals (not 6): the aggregator merges partition
    // buffers in nondeterministic order while DuckDB sums sequentially, so
    // the hash gate needs headroom above double summation-order noise.
    "q69_mean_pool" -> ((s, dir) =>
      Pooling.meanPool(
          t(s, dir, "embeddings").select((col("vec_id") % 10).as("g"), col("embedding")),
          "g", "embedding")
        .select(col("g"), posexplode(col("centroid")).as(Seq("pos", "v")))
        .select(col("g"), (col("pos") + 1).as("pos"),
          (round(col("v"), 4) + lit(0.0)).as("v"))),  // +0.0 folds -0.0

    // Packed-matrix BLAS search (operators.PackedKnn — the resident
    // float32 matrix layout the reference's batch GEMM uses): over-fetch
    // top-20 under the float32 sgemm kernel, then exact double rerank to
    // top-10. Hash-checked against the SAME exact oracle as q10 — the
    // packed candidate set must contain the true top-10 (float32 error is
    // orders of magnitude below the #10/#21 separation) and the rerank
    // restores exact distances and order.
    "q99_packed_knn" -> ((s, dir) =>
      packedFunnel(s, dir) { (embs, qArr) =>
        val pc = cachedPack(dir)(
          PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding"))
        PackedKnn.search(pc, qArr, 20, "cosine")
      }),

    // IVF-PACKED resident index (PackedKnn.packIvf/searchIvf): one IVF
    // cell per partition, a probe launches tasks ONLY on probed
    // partitions (runJob partition subset — the resident-memory analog of
    // q64's directory pruning; PackedKnnSpec asserts the task count).
    // Probing ALL cells makes it exact, so like q64/q99 it hash-checks
    // against the q10 oracle through the over-fetch + exact-rerank
    // funnel; the pruned-probe path is asserted equal to Ann.ivfSearch
    // in PackedKnnSpec.
    "q100_packed_ivf" -> ((s, dir) =>
      packedFunnel(s, dir) { (embs, qArr) =>
        val pi = cachedPackIvf(dir)(
          PackedKnn.packIvf(embs, TrainedModels.ivf(s, dir),
            idCol = "vec_id", vecCol = "embedding"))
        PackedKnn.searchIvf(pi, qArr, 20, nProbe = pi.model.numCells)
      }),

    // GRAPH-ANN resident tier (PackedGraph.build/searchGraph): one NSW
    // graph per IVF cell over the resident float slabs — the analog of
    // the reference's hnswlib headline index (vectordb.py:527). Full
    // probe + unbounded ef is EXHAUSTIVE by the protected-spanning-tree
    // contract (PackedGraphSpec), so like q99/q100 it hash-checks the
    // exact q10 oracle through the over-fetch + exact-rerank funnel;
    // the bounded-ef recall floor at 1M lives in RecallFloorSpec.
    "q143_packed_graph" -> ((s, dir) =>
      packedFunnel(s, dir) { (embs, qArr) =>
        val pg = cachedPackGraph(dir) {
          val pi = cachedPackIvf(dir)(
            PackedKnn.packIvf(embs, TrainedModels.ivf(s, dir),
              idCol = "vec_id", vecCol = "embedding"))
          PackedGraph.build(pi, degree = 16, efConstruction = 64)
        }
        PackedGraph.searchGraph(pg, qArr, 20,
          nProbe = pg.model.numCells, ef = 0)
      }),

    // FILTERED serving on the graph tier through the collection facade
    // (GraftCollection.packedGraphQuery(where) — the reference's filtered
    // HNSW over-fetch, vectordb.py:519-559, hardened with the bounded
    // per-query exact fallback). Full probe + unbounded ef makes the
    // over-fetch page a distance-prefix of the corpus, so the filtered
    // result is EXACT — survivors of the page when >= k pass, the
    // per-query exact fallback otherwise — and the row hash-checks the
    // q13-style filtered oracle (ids ride the facade as strings, cast
    // back for the oracle).
    "q147_graph_filtered" -> ((s, dir) => {
      val c = graphCollection(s, dir)
      if (!c.residentPackedGraph.exists(_.blocks.getStorageLevel !=
          org.apache.spark.storage.StorageLevel.NONE))
        c.buildPackedGraphIndex(degree = 16, efConstruction = 64)
      c.packedGraphQuery(queryBatch(s, dir, 5), k = 10, nProbe = 4, ef = 0,
          where = Some(graft.operators.Filter.In("label", Seq(1, 3, 7))))
        .select(col("query_id"), col("rank"),
          col("id").cast("bigint").as("neighbor_id"),
          round(col("distance"), 6).as("dist"))
    }),

    // J3 id-lookup join through the collection facade
    // (GraftCollection.get(ids, where) — the reference's get-by-ids,
    // client.py:276-355): id pushdown composed with a metadata
    // predicate, both reaching the parquet scan as PushedFilters. The
    // previously test-only row now sits under the driver's hash gate.
    "q148_get_lookup" -> ((s, dir) => {
      val c = graphCollection(s, dir)
      c.get(ids = Seq("3", "5", "8", "404", "no_such_id"),
          where = Some(graft.operators.Filter.Gt("label", 1)))
        .select(col("id"), col("document"), col("label"))
    }),

    // Filter.Custom under the hash gate: the reference's ARBITRARY filter
    // closures (Filter(evaluate_fn), vectordb.py:139-143) as a wrapped
    // Column predicate, composed with a typed operator and served through
    // the facade's exact filtered path — membership and distances must
    // match the DuckDB re-derivation of the same predicate.
    "q149_custom_filter" -> ((s, dir) => {
      val c = graphCollection(s, dir)
      import graft.operators.Filter
      val f = Filter.Custom(pmod(col("label"), lit(2)) === 0) && Filter.Gt("label", 2)
      c.query(queryBatch(s, dir, 5), k = 10, where = Some(f))
        .select(col("query_id"), col("rank"),
          col("id").cast("bigint").as("neighbor_id"),
          round(col("distance"), 6).as("dist"))
    }),

    // MUTATED graph tier under the hash gate: build on the evens, APPEND
    // the odds (insertion is the graph's native maintenance op), then
    // TOMBSTONE vec_id [100, 200) (HNSW mark-deleted — dead rows route
    // walks, are never emitted). Full probe + unbounded ef is exhaustive
    // over the live set by the append/remove contracts (PackedGraphSpec
    // proves each), so the funnel hash-checks the exact DuckDB oracle
    // over the SURVIVOR corpus — CRUD maintenance itself is what this
    // row certifies, not just a fresh build.
    "q146_graph_mutated" -> ((s, dir) => {
      import s.implicits._
      val embs = t(s, dir, "embeddings")
      val qdf = queryBatch(s, dir, 5)
      val qArr = qdf.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val pg = cachedMutatedGraph(dir) {
        val model = TrainedModels.ivf(s, dir)
        val pe = PackedKnn.packIvf(embs.where(col("vec_id") % 2 === 0), model,
          idCol = "vec_id", vecCol = "embedding")
        val g0 = PackedGraph.build[Long](pe, degree = 16, efConstruction = 64)
        pe.unpersist()
        val addPack = PackedKnn.packIvf(embs.where(col("vec_id") % 2 === 1),
          model, idCol = "vec_id", vecCol = "embedding")
        PackedGraph.remove[Long](PackedGraph.append[Long](g0, addPack),
          (100L until 200L).toSet)
      }
      val cand = PackedGraph.searchGraph[Long](pg, qArr, 20,
        nProbe = pg.model.numCells, ef = 0)
      val candDF = cand.toSeq
        .flatMap { case (qid, nbrs) => nbrs.map { case (nid, _) => (qid, nid) } }
        .toDF("query_id", "neighbor_id")
      val survivors = embs.where(col("vec_id") < 100 || col("vec_id") >= 200)
      Quantization.rerankExact(candDF, qdf, survivors, k = 10,
          metric = "cosine", corpusId = "vec_id", vecCol = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // WARM-START of the resident index (PackedKnn.saveSlabs/loadSlabs):
    // the packed corpus is persisted as the binary slab sidecar and
    // REOPENED — one task per partition reading one slab file, zero
    // Exchange, zero parquet decode (PackedKnnSpec asserts the lineage) —
    // then searched through the reopened handle. Hash-checks the same q10
    // oracle through the same funnel as q99, so a session restart's
    // warm-started index is driver-proven identical to the fresh pack.
    "q110_packed_warm" -> ((s, dir) =>
      packedFunnel(s, dir) { (embs, qArr) =>
        val slabDir = java.nio.file.Files
          .createTempDirectory("graft-warm-q110").toString
        val pc = cachedPack(dir)(
          PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding"))
        PackedKnn.saveSlabs(pc, s"$slabDir/slabs")
        val re = PackedKnn.loadSlabs[Long](s, s"$slabDir/slabs")
        try PackedKnn.search(re, qArr, 20, "cosine")
        finally {
          re.unpersist(blocking = false)
          val p = new org.apache.hadoop.fs.Path(slabDir)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
      }),

    // HOT-CELL SPLIT of the resident IVF index (PackedKnn.splitCell):
    // the hottest cell's rows 2-means into two cells — a NEW partition
    // appended at index C, every other partition passing through by
    // reference (narrow-only rebuild, PackedKnnSpec asserts the lineage
    // and per-cell conservation). Full probe through the REFINED model
    // is exact, so the split index hash-checks the same q10 oracle
    // through the same funnel as q100 — index maintenance is driver-
    // proven to lose nothing.
    "q124_split_ivf" -> ((s, dir) =>
      packedFunnel(s, dir) { (embs, qArr) =>
        val split = cachedPackIvf(dir + "#split") {
          // base stays persisted (residentName): split partitions that
          // fall out of memory recompute through it, not the pack shuffle
          val base = PackedKnn.packIvf(embs, TrainedModels.ivf(s, dir),
            idCol = "vec_id", vecCol = "embedding")
          val hot = PackedKnn.cellSizes(base).zipWithIndex.maxBy(_._1)._2
          PackedKnn.splitCell(base, hot)
        }
        PackedKnn.searchIvf(split, qArr, 20, nProbe = split.model.numCells)
      }),

    // Contrastive hard-negative mining (Knn.hardNegatives): for each
    // anchor, the k nearest embeddings with a DIFFERENT label — the
    // per-anchor exclusion rides the broadcast join condition (no static
    // corpus filter can express it). The oracle recomputes the same
    // label-excluded top-k in DuckDB.
    "q113_hard_negatives" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val anchors = embs.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"),
          col("label").as("query_label"))
      graft.operators.Knn.hardNegatives(anchors, embs, k = 10,
          metric = "cosine", corpusId = "vec_id", corpusVec = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // kNN GRAPH over a 1000-vector subset: the corpus x corpus top-k
    // self-join (every row is query AND candidate — neither side
    // broadcastable at scale; block-pair sgemm over the resident slabs,
    // P^2 tasks). Float32 over-fetch (k=10) then exact rerank to k=5,
    // hash-checked against the all-pairs DuckDB oracle with self-matches
    // excluded. PackedKnnSpec pins the full graph to the broadcast path.
    "q101_knn_graph" -> ((s, dir) => {
      val sub = t(s, dir, "embeddings").where(col("vec_id") < 1000)
      val pc = cachedPack(s"$dir#graph1000")(
        PackedKnn.pack(sub, idCol = "vec_id", vecCol = "embedding"))
      graphFunnel(sub, PackedKnn.knnGraph(pc, 10, "cosine"))
    }),

    // Same-cell (IVF-blocked) kNN graph — the APPROXIMATE graph path at
    // scale: the pair grid collapses from P^2 tasks to P (each cell
    // scores only itself). Hash-checked end-to-end: the oracle re-derives
    // the cell assignment from the inlined centroids, restricts pairs to
    // equal cells, and ranks by exact cosine — the engine's float32
    // over-fetch + exact rerank must land on identical rows.
    "q102_cell_graph" -> ((s, dir) => {
      val sub = t(s, dir, "embeddings").where(col("vec_id") < 2000)
      val pi = cachedPackIvf(s"$dir#cellgraph2000")(
        PackedKnn.packIvf(sub, TrainedModels.ivf(s, dir),
          idCol = "vec_id", vecCol = "embedding"))
      // rerank among the same-cell candidates only: exact distances and
      // (dist, id) order, matching the oracle's cell-restricted ranking
      graphFunnel(sub, PackedKnn.knnGraphIvf(pi, 10, "cosine"))
    }),

    // Semantic duplicate clusters (SemDeDup-shaped, Abbas et al. 2023):
    // embedding near-dup pairs from the lossless IVF-cell-blocked join
    // (q56's operator — cell-pair pruning via the triangle inequality,
    // exact verify) contracted to connected components by the
    // large-star/small-star CC (q71's operator). The oracle recomputes
    // the exact all-pairs edges and the components with a recursive CTE.
    "q103_semantic_clusters" -> ((s, dir) => {
      // blocking model fit once per corpus (fit-once/dedup-many — any
      // centroids are lossless, so a cached fit changes nothing)
      val m = nearDupModelCache.synchronized {
        nearDupModelCache.getOrElseUpdate(dir,
          graft.operators.Dedup.trainNearDupModel(
            t(s, dir, "embeddings"), "vec_id", "embedding",
            trainFraction = 0.5))
      }
      val pairs = graft.operators.Dedup.embeddingNearDupBlocked(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, model = Some(m))
      graft.operators.Dedup.duplicateClusters(pairs, "id_a", "id_b")
    }),

    // Random-hyperplane LSH approximate kNN: recall@10 vs exact
    // (deterministic planes, but bucket-join recall is probabilistic =>
    // rows-only check + test floor)
    "q49_lsh_recall" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val queries = queryBatch(s, dir, 5)
      val approx = Ann.lshSearch(queries, embs, k = 10, numBits = 4, dim = 64,
        corpusId = "vec_id", vecCol = "embedding")
      val exact = Knn.knnJoin(queries, embs, k = 10, metric = "cosine",
        corpusId = "vec_id", corpusVec = "embedding")
      Quantization.recallAtK(approx, exact, 10)
    }),
  )

  private val knnOracleCosine50 =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 50),
      |pairs AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id,
      |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
      |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
      |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
      |                  CAST(unnest(q.qv) AS DOUBLE) AS y)) AS dist
      |  FROM q, embeddings c),
      |ranked AS (
      |  SELECT query_id, neighbor_id, dist,
      |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
      |  FROM pairs)
      |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
      |       round(dist, 6) + 0.0 AS dist
      |FROM ranked WHERE rank <= 10""".stripMargin

  private val knnOracleCosine5 =
    knnOracleCosine50.replace("WHERE vec_id < 50", "WHERE vec_id < 5")

  /** `def`, not `val`: the q48 recall oracle inlines the IVF centroids
    * loaded by the query run, so it exists only once the model is in
    * memory (always true in Verify's full-battery flow — queries run
    * before oracle_sql.json is written). q49's planes are a pure hash, so
    * its oracle is unconditionally present. */
  def oracles: Map[String, String] = Map(
    "q49_lsh_recall" -> RecallOracles.lshRecallSql(
      numBits = 4, dim = 64, seed = 42L, nProbe = 4, k = 10),
    "q14_knn_batch" -> knnOracleCosine50,
    "q64_ivf_partitioned" -> knnOracleCosine5,
    "q99_packed_knn" -> knnOracleCosine5,
    "q100_packed_ivf" -> knnOracleCosine5,
    "q110_packed_warm" -> knnOracleCosine5,
    "q143_packed_graph" -> knnOracleCosine5,
    // the q143 oracle restricted to the survivor set — the corpus the
    // mutated graph serves after the tombstoned range
    "q146_graph_mutated" -> knnOracleCosine5.replace(
      "FROM q, embeddings c)",
      "FROM q, embeddings c WHERE c.vec_id < 100 OR c.vec_id >= 200)"),
    // the q143 oracle under the metadata filter — the filtered graph
    // facade must keep exact membership at full probe + unbounded ef
    "q147_graph_filtered" -> knnOracleCosine5.replace(
      "FROM q, embeddings c)",
      "FROM q, embeddings c WHERE c.label IN (1, 3, 7))"),
    // the same oracle under the Custom-closure predicate (label even AND
    // label > 2) — Filter.Custom's membership must equal the SQL
    "q149_custom_filter" -> knnOracleCosine5.replace(
      "FROM q, embeddings c)",
      "FROM q, embeddings c WHERE c.label % 2 = 0 AND c.label > 2)"),
    // id lookup + predicate through the same collection's corpus
    "q148_get_lookup" ->
      """SELECT CAST(vec_id AS VARCHAR) AS id,
        |       'vec ' || CAST(vec_id AS VARCHAR) AS document, label
        |FROM embeddings
        |WHERE CAST(vec_id AS VARCHAR) IN ('3', '5', '8', '404', 'no_such_id')
        |  AND label > 1""".stripMargin,
    "q124_split_ivf" -> knnOracleCosine5,
    "q113_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlab
         |          FROM embeddings WHERE vec_id < 5),
         |pairs AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
         |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
         |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
         |                  CAST(unnest(q.qv) AS DOUBLE) AS y)) AS dist
         |  FROM q, embeddings c
         |  WHERE c.label IS DISTINCT FROM q.qlab),
         |ranked AS (
         |  SELECT query_id, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |  FROM pairs)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |       round(dist, 6) + 0.0 AS dist
         |FROM ranked WHERE rank <= 10""".stripMargin,
    "q103_semantic_clusters" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    (SELECT 1.0 - (CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
        |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END)
        |     FROM (SELECT CAST(unnest(a.embedding) AS DOUBLE) AS x,
        |                  CAST(unnest(b.embedding) AS DOUBLE) AS y)) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |pr AS (SELECT id_a, id_b FROM p WHERE sim >= 0.4),
        |eb AS (
        |  SELECT id_a AS a, id_b AS b FROM pr
        |  UNION ALL
        |  SELECT id_b, id_a FROM pr),
        |reach(node, r) AS (
        |  SELECT a, b FROM eb
        |  UNION
        |  SELECT rr.node, e.b FROM reach rr JOIN eb e ON e.a = rr.r)
        |SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |FROM reach GROUP BY node""".stripMargin,
    "q101_knn_graph" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 1000),
        |pairs AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
        |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
        |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
        |                  CAST(unnest(q.qv) AS DOUBLE) AS y)) AS dist
        |  FROM q, embeddings c
        |  WHERE c.vec_id < 1000 AND c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, dist,
        |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
        |       round(dist, 6) + 0.0 AS dist
        |FROM ranked WHERE rank <= 5""".stripMargin,
    "q69_mean_pool" ->
      """WITH ex AS (
        |  SELECT vec_id % 10 AS g, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings)
        |SELECT g, pos, round(avg(v), 4) + 0.0 AS v
        |FROM ex GROUP BY g, pos""".stripMargin,
    "q15_vector_norm" ->
      """SELECT vec_id,
        |  round(norm, 6) AS norm,
        |  round(CAST(embedding[1] AS DOUBLE) / norm, 6) AS first_elem
        |FROM (
        |  SELECT vec_id, embedding,
        |    (SELECT sqrt(sum(x*x)) FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x)) AS norm
        |  FROM embeddings)""".stripMargin,
  ) ++ TrainedModels.lastIvf.map(m =>
    "q48_ivf_recall" -> RecallOracles.ivfRecallSql(m, nProbe = 4, k = 10)) ++
    TrainedModels.lastIvf.map(m =>
      "q102_cell_graph" -> RecallOracles.sameCellGraphSql(m, maxId = 2000, k = 5))
}
