package graft.operators

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Resident PQ-code serving layer — the memory tier below [[PackedKnn]].
  *
  * [[PackedKnn]] keeps the raw float32 matrix resident (4*dim bytes/row:
  * 512 B at 128d). At corpus sizes where even that doesn't fit executor
  * memory, the standard move (Jegou et al., TPAMI'11 — the FAISS IVFADC
  * layout) is to keep only PQ CODES resident — m bytes/row (8–16 B), a
  * 32–64× smaller footprint — score candidates with per-query asymmetric
  * distance (ADC) lookup tables, and repair quantization error by exactly
  * reranking the few surviving candidates against the on-disk vectors.
  * The reference's quantized search is the single-process version of the
  * same funnel (quantization.py:541-578 builds the LUT and sums code
  * entries; parallel_search.py:895-947 reranks survivors exactly).
  *
  * Distributed shape: codes live in one [[CodeBlock]] per IVF cell
  * (partition i = cell i, like [[PackedKnn.packIvf]]); a query batch
  * broadcasts per-query LUTs (m×c doubles each) to its probed partitions
  * only; each task scans its cell's byte codes with the LUT — pure
  * sequential byte reads, no vector decode — and keeps a bounded
  * per-query heap. Task results are ≤ cells×Q×fetchK triples; the driver
  * merge is the same `_merge_top_k` shape as [[PackedKnn.search]]. The
  * corpus never moves after pack, and the rerank touches only the
  * candidates' raw vectors.
  *
  * Numeric contract: codes come from the SAME [[Quantization.pqEncode]]
  * column as [[Ann.ivfPqSearch]]'s, cell routing from the same
  * [[Ann.cellId]] / ProbeCellIds ranking, LUTs and ADC sums replicate
  * [[Quantization.pqLut]]/[[Quantization.adcDistance]] loop-for-loop
  * (same float→double widening, same accumulation order), and the
  * candidate cut is the same total order (dist, id) — so [[search]] is
  * row-identical to [[Ann.ivfPqSearch]] on the same models, and q122
  * hash-checks it against the same DuckDB re-execution as q72. */
object PackedPq {

  /** One IVF cell's codes: row r occupies bytes [r*m, (r+1)*m). */
  final case class CodeBlock[I](ids: Array[I], codes: Array[Byte], m: Int) {
    def rows: Int = ids.length
  }

  /** A packed, persisted code corpus. `unpersist()` releases executor
    * memory; chained handles (append) release every generation.
    * `residual = true` means the codes quantize `vec − cellCentroid`
    * (the FAISS IVFADC composition — [[Quantization.trainPqResidual]]);
    * the flag travels with the handle (and its slab sidecar) because ADC
    * must build the matching per-(query, cell) LUTs or every distance is
    * garbage. */
  final class PackedPqCorpus[I](val blocks: RDD[CodeBlock[I]],
                                val ivf: Ann.IvfModel,
                                val pq: Quantization.PqModel,
                                chain: Seq[RDD[_]],
                                val residual: Boolean = false,
                                val rotation: Option[Array[Array[Double]]] = None,
                                /** Append generations (1 = freshly packed/
                                  * compacted) — the driver-side
                                  * fragmentation gauge; removes prune in
                                  * place and carry the count through. */
                                val generations: Int = 1) {
    def this(blocks: RDD[CodeBlock[I]], ivf: Ann.IvfModel, pq: Quantization.PqModel) =
      this(blocks, ivf, pq, Nil)
    def m: Int = pq.numSubspaces
    private[PackedPq] def parents: Seq[RDD[_]] =
      if (chain.isEmpty) Seq(blocks) else chain
    def unpersist(blocking: Boolean = false): Unit =
      parents.foreach(_.unpersist(blocking))
  }

  /** Pack a corpus into resident per-cell code blocks: one pass encodes
    * (cell id + PQ code in the scan's codegen stage feeding the UDF), one
    * shuffle routes rows to their cell partition, and each partition
    * packs into a single byte slab. Memory after pack: rows × (m + id)
    * bytes — the corpus a [[PackedKnn.packIvf]] float tier cannot hold. */
  def packIvfPq(corpus: DataFrame, ivf: Ann.IvfModel, pq: Quantization.PqModel,
                idCol: String = "id", vecCol: String = "vec",
                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                residual: Boolean = false,
                rotation: Option[Array[Array[Double]]] = None): PackedPqCorpus[Long] =
    packBy[Long](corpus, ivf, pq, idCol, "long", vecCol, storage, residual,
      rotation)(_.getLong(0))

  /** [[packIvfPq]] keyed by a natural string id (the client facade). */
  def packIvfPqStr(corpus: DataFrame, ivf: Ann.IvfModel, pq: Quantization.PqModel,
                   idCol: String = "id", vecCol: String = "vec",
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                   residual: Boolean = false,
                   rotation: Option[Array[Array[Double]]] = None): PackedPqCorpus[String] =
    packBy[String](corpus, ivf, pq, idCol, "string", vecCol, storage, residual,
      rotation)(_.getUTF8String(0).toString)

  /** Append a batch without repacking standing slabs: the batch encodes
    * through the SAME models into its own cell-partitioned blocks and a
    * zip concatenates the generations per cell — partition i stays cell i,
    * so probe routing is unchanged ([[PackedKnn.appendIvf]]'s contract). */
  def appendIvfPq(pi: PackedPqCorpus[Long], batch: DataFrame,
                  idCol: String = "id", vecCol: String = "vec",
                  storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedPqCorpus[Long] =
    appendBy[Long](pi, batch, idCol, "long", vecCol, storage)(_.getLong(0))

  /** [[appendIvfPq]] keyed by a natural string id (the client facade). */
  def appendIvfPqStr(pi: PackedPqCorpus[String], batch: DataFrame,
                     idCol: String = "id", vecCol: String = "vec",
                     storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedPqCorpus[String] =
    appendBy[String](pi, batch, idCol, "string", vecCol, storage)(
      _.getUTF8String(0).toString)

  private def appendBy[I: ClassTag](pi: PackedPqCorpus[I], batch: DataFrame,
                                    idCol: String, idType: String, vecCol: String,
                                    storage: StorageLevel)(
      getId: org.apache.spark.sql.catalyst.InternalRow => I): PackedPqCorpus[I] = {
    val add = packBy[I](batch, pi.ivf, pi.pq, idCol, idType, vecCol, storage,
      pi.residual, pi.rotation)(getId)
    val zipped = pi.blocks.zipPartitions(add.blocks,
      preservesPartitioning = true)((a, b) => a ++ b)
    new PackedPqCorpus(zipped, pi.ivf, pi.pq, pi.parents ++ add.parents,
      residual = pi.residual, rotation = pi.rotation,
      generations = pi.generations + 1)
  }

  /** Tombstone removal, the [[PackedKnn.remove]] contract: miss blocks
    * pass through BY REFERENCE, hit blocks rebuild minus the dead rows,
    * partition i stays cell i, and no per-candidate check ever reaches
    * the ADC hot loop. The result is persisted and materialized; release
    * the original afterwards. */
  def remove[I: ClassTag](pi: PackedPqCorpus[I], ids: Set[I],
                          storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedPqCorpus[I] = {
    if (ids.isEmpty) return pi
    val bc = pi.blocks.sparkContext.broadcast(ids)
    val pruned = pi.blocks.mapPartitions(
      _.flatMap(pruneCodeBlock(bc.value, _)), preservesPartitioning = true)
      .setName(PackedKnn.residentName).persist(storage)
    pruned.count()
    new PackedPqCorpus(pruned, pi.ivf, pi.pq, Nil, pi.residual, pi.rotation,
      generations = pi.generations)
  }

  /** Fold each cell's append-generation chain back into one code slab —
    * no shuffle, no partition change ([[PackedKnn.compactIvf]]'s
    * contract): a long CRUD history otherwise turns every probe into
    * many tiny ADC loops. */
  def compactIvfPq[I: ClassTag](pi: PackedPqCorpus[I],
                                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedPqCorpus[I] = {
    val merged = pi.blocks.mapPartitions(mergeCodeBlocks[I], preservesPartitioning = true)
      .setName(PackedKnn.residentName).persist(storage)
    merged.count()
    new PackedPqCorpus(merged, pi.ivf, pi.pq, Nil, pi.residual, pi.rotation)
  }

  private def mergeCodeBlocks[I: ClassTag](it: Iterator[CodeBlock[I]]): Iterator[CodeBlock[I]] = {
    val bs = it.toArray
    if (bs.length <= 1) bs.iterator
    else {
      val m = bs.head.m
      require(bs.forall(_.m == m),
        s"PackedPq.compact: mixed code widths ${bs.map(_.m).distinct.mkString(",")}")
      PackedKnn.requireSlabFits(bs.map(_.rows.toLong).sum, m, "PackedPq.compact")
      val n = bs.map(_.rows).sum
      val ids = new Array[I](n)
      val codes = new Array[Byte](n * m)
      var off = 0
      for (b <- bs) {
        System.arraycopy(b.ids, 0, ids, off, b.rows)
        System.arraycopy(b.codes, 0, codes, off * m, b.rows * m)
        off += b.rows
      }
      Iterator.single(CodeBlock(ids, codes, m))
    }
  }

  private def pruneCodeBlock[I: ClassTag](dead: Set[I], b: CodeBlock[I]): Iterator[CodeBlock[I]] = {
    var hits = 0
    var r = 0
    while (r < b.ids.length) { if (dead.contains(b.ids(r))) hits += 1; r += 1 }
    if (hits == 0) Iterator.single(b)
    else if (hits == b.rows) Iterator.empty
    else {
      val n = b.rows - hits
      val m = b.m
      val ids2 = new Array[I](n)
      val codes2 = new Array[Byte](n * m)
      var j = 0
      r = 0
      while (r < b.ids.length) {
        if (!dead.contains(b.ids(r))) {
          ids2(j) = b.ids(r)
          System.arraycopy(b.codes, r * m, codes2, j * m, m)
          j += 1
        }
        r += 1
      }
      Iterator.single(CodeBlock(ids2, codes2, m))
    }
  }

  private def packBy[I: ClassTag](corpus: DataFrame, ivf: Ann.IvfModel,
                                  pq: Quantization.PqModel, idCol: String,
                                  idType: String, vecCol: String,
                                  storage: StorageLevel,
                                  residual: Boolean = false,
                                  rotation: Option[Array[Array[Double]]] = None)(
      getId: org.apache.spark.sql.catalyst.InternalRow => I): PackedPqCorpus[I] = {
    val m = pq.numSubspaces
    require(pq.codebooks(0).length <= 256,
      s"PackedPq: ${pq.codebooks(0).length} centroids per subspace exceed a " +
        "byte code — train with numCentroids <= 256")
    // OPQ composes with RAW codes: coarse routing is raw-space either
    // way, the rotation scopes to the quantizer (Ann.ivfPqSearchOpq's
    // contract). A rotated-RESIDUAL tier would need its own verified
    // batch twin first — refuse rather than serve unanchored distances.
    require(!(residual && rotation.isDefined),
      "PackedPq: rotation (OPQ) composes with raw codes only — pass one of " +
        "residual/rotation")
    val dim = m * pq.subDim
    val src = corpus
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast(idType),
        // fail loud on a ragged corpus BEFORE the encode UDF indexes past
        // the end of a short vector
        when(size(col(vecCol)) === lit(dim), col(vecCol))
          .otherwise(raise_error(concat(lit(s"PackedPq.pack: vector dim "),
            size(col(vecCol)).cast("string"), lit(s" != model dim $dim")))).as("_v"))
      .select(col(idCol), Ann.cellId(ivf)(col("_v")).as("_cell"), col("_v"))
      .select(col(idCol), col("_cell"),
        (rotation match {
          case Some(r) =>
            Quantization.pqEncodeDouble(pq)(Quantization.opqRotate(r)(col("_v")))
          case None if residual =>
            Quantization.pqEncodeDouble(pq)(Ann.residual(ivf)(col("_v"), col("_cell")))
          case None => Quantization.pqEncode(pq)(col("_v"))
        }).as("_code"))
    val keyed: RDD[(Int, (I, Array[Byte]))] =
      src.queryExecution.toRdd.mapPartitions { iter =>
        iter.map { row =>
          val arr = row.getArray(2)
          val code = new Array[Byte](m)
          var i = 0
          while (i < m) { code(i) = (arr.getInt(i) & 0xFF).toByte; i += 1 }
          (row.getInt(1), (getId(row), code))
        }
      }
    val packed: RDD[CodeBlock[I]] = keyed
      .partitionBy(new PackedKnn.CellPartitioner(ivf.numCells))
      .mapPartitions { iter =>
        val ids = new ArrayBuffer[I]()
        val codes = new ArrayBuffer[Array[Byte]]()
        while (iter.hasNext) {
          val (_, (id, c)) = iter.next()
          ids += id; codes += c
        }
        if (ids.isEmpty) Iterator.empty
        else {
          PackedKnn.requireSlabFits(ids.length.toLong, m, "PackedPq.pack")
          val flat = new Array[Byte](ids.length * m)
          var r = 0
          while (r < ids.length) {
            System.arraycopy(codes(r), 0, flat, r * m, m); r += 1
          }
          Iterator.single(CodeBlock(ids.toArray, flat, m))
        }
      }.setName(PackedKnn.residentName).persist(storage)
    packed.count()
    new PackedPqCorpus(packed, ivf, pq, Nil, residual, rotation)
  }

  // ------------------------------------------------------------- search

  /** LUTs are FLAT numSubspaces*numCentroids arrays indexed mi*nC + c —
    * one bounds check, one dereference, and DENSE cache lines in the ADC
    * hot loop (the PackedSq lesson, minus its 256-padding: padding to a
    * power of two wastes 4x the cache at 64 centroids and measured 5x
    * SLOWER at 1M — density beats shift-indexing). */
  private[operators] def flatLut(m: Int, nC: Int)(entry: (Int, Int) => Double): Array[Double] =
    Array.tabulate(m * nC)(j => entry(j / nC, j % nC))

  /** Per-query ADC lookup table, replicating [[Quantization.pqLut]]'s
    * arithmetic exactly: lut(m)(c) = Σ_j (q_float(m*subDim+j) − book(m)(c)(j))²
    * accumulated in doubles, j ascending. */
  private[operators] def lutFor(pq: Quantization.PqModel, qv: Array[Float]): Array[Double] = {
    val books = pq.codebooks; val subDim = pq.subDim
    flatLut(pq.numSubspaces, books(0).length) { (mi, c) =>
      var d = 0.0; var j = 0
      while (j < subDim) {
        val diff = qv(mi * subDim + j) - books(mi)(c)(j); d += diff * diff; j += 1
      }
      d
    }
  }

  /** Residual-code LUT for one (query, cell) pair, replicating
    * [[Ann.pqLutResidual]]'s arithmetic exactly:
    * lut(m)(c) = Σ_j ((q_j − cent_j) − book(m)(c)(j))², doubles, j asc. */
  private[operators] def lutForResidual(pq: Quantization.PqModel, qv: Array[Float],
                             cc: Array[Double]): Array[Double] = {
    val books = pq.codebooks; val subDim = pq.subDim
    flatLut(pq.numSubspaces, books(0).length) { (mi, c) =>
      var d = 0.0; var j = 0
      while (j < subDim) {
        val idx = mi * subDim + j
        val diff = (qv(idx).toDouble - cc(idx)) - books(mi)(c)(j)
        d += diff * diff; j += 1
      }
      d
    }
  }

  /** Rotate one query, replicating [[Quantization.opqRotate]]'s
    * arithmetic exactly: y_j = Σ_i (double)q_i · R(i)(j), i ascending. */
  private[operators] def rotateQ(r: Array[Array[Double]], qv: Array[Float]): Array[Double] = {
    val d = r.length
    Array.tabulate(r(0).length) { j =>
      var s = 0.0; var i = 0
      while (i < d) { s += qv(i).toDouble * r(i)(j); i += 1 }
      s
    }
  }

  /** Rotated-query LUT, replicating [[Quantization.opqLut]]'s arithmetic
    * exactly: lut(m)(c) = Σ_j (rq(m·subDim+j) − book(m)(c)(j))², doubles,
    * j ascending. */
  private[operators] def lutForRotated(pq: Quantization.PqModel, rq: Array[Double]): Array[Double] = {
    val books = pq.codebooks; val subDim = pq.subDim
    flatLut(pq.numSubspaces, books(0).length) { (mi, c) =>
      var d = 0.0; var j = 0
      while (j < subDim) {
        val diff = rq(mi * subDim + j) - books(mi)(c)(j); d += diff * diff; j += 1
      }
      d
    }
  }

  /** Resident ADC stage: per query, the `fetchK` smallest asymmetric
    * distances (sqrt of the LUT sum — [[Quantization.adcDistance]]) over
    * the `nProbe` probed cells, ties by id. The job runs ONLY on probed
    * partitions; each task reads m bytes per candidate row. Returns, per
    * query id, (neighbor_id, adc_dist) sorted by (dist, id) — feed
    * [[Quantization.rerankExact]] (or use [[search]]) to repair
    * quantization error before trusting the distances. */
  def searchAdc[I: ClassTag: Ordering](pi: PackedPqCorpus[I],
                                       queries: Array[(Long, Array[Float])],
                                       fetchK: Int, nProbe: Int): Array[(Long, Array[(I, Double)])] = {
    require(queries.nonEmpty, "empty query batch")
    val cents = pi.ivf.centroids
    val dim = pi.pq.numSubspaces * pi.pq.subDim
    queries.foreach { case (qid, qv) =>
      require(qv.length == dim, s"query $qid dim ${qv.length} != model dim $dim") }
    val byCell: Map[Int, Array[Int]] = queries.indices
      .flatMap(qi => PackedKnn.driverProbes(cents, queries(qi)._2, nProbe).map(c => (c, qi)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap
    // raw codes: one LUT per query, shared across its probed cells.
    // residual codes: one LUT per (query, probed cell) — Q×nProbe tables,
    // same size class, built on the driver and shipped with the closure
    // keyed by cell so each task indexes its own row positionally.
    val luts: Array[Array[Double]] =
      if (pi.residual) null
      else pi.rotation match {
        case Some(r) => queries.map(q => lutForRotated(pi.pq, rotateQ(r, q._2)))
        case None => queries.map(q => lutFor(pi.pq, q._2))
      }
    val lutsByCell: Map[Int, Array[Array[Double]]] =
      if (!pi.residual) null
      else byCell.map { case (cell, qIdxs) =>
        cell -> qIdxs.map(qi => lutForResidual(pi.pq, queries(qi)._2, cents(cell)))
      }
    val partIds = byCell.keys.toArray.sorted
    val idOrd = implicitly[Ordering[I]]
    val nC = pi.pq.codebooks(0).length // flat-LUT row stride
    val sc = pi.blocks.sparkContext
    val partials: Array[Array[(Int, I, Double)]] = sc.runJob(pi.blocks,
      (ctx: org.apache.spark.TaskContext, it: Iterator[CodeBlock[I]]) => {
        val qIdxs = byCell.getOrElse(ctx.partitionId(), Array.empty[Int])
        if (qIdxs.isEmpty || !it.hasNext) Array.empty[(Int, I, Double)]
        else {
          // positional: cellLuts(qi) pairs with qIdxs(qi) (residual path)
          val cellLuts = if (lutsByCell == null) null else lutsByCell(ctx.partitionId())
          // worst-on-top heap per probing query: keep-(fetchK) by the same
          // total order (dist, id) the TopKAggregator cut uses
          val heaps = qIdxs.map(_ => new java.util.PriorityQueue[(I, Double)](
            fetchK + 1, (a: (I, Double), b: (I, Double)) => {
              val c = java.lang.Double.compare(b._2, a._2)
              if (c != 0) c else idOrd.compare(b._1, a._1)
            }))
          while (it.hasNext) {
            val blk = it.next()
            val codes = blk.codes; val bm = blk.m; val n = blk.rows
            var qi = 0
            while (qi < qIdxs.length) {
              val lut = if (cellLuts != null) cellLuts(qi) else luts(qIdxs(qi))
              val heap = heaps(qi)
              var r = 0
              while (r < n) {
                var s = 0.0; var mi = 0; val base = r * bm; var off = 0
                while (mi < bm) {
                  s += lut(off + (codes(base + mi) & 0xFF)); mi += 1; off += nC
                }
                val d = math.sqrt(s)
                val id = blk.ids(r)
                if (heap.size < fetchK) heap.add((id, d))
                else {
                  val worst = heap.peek()
                  if (d < worst._2 || (d == worst._2 && idOrd.lt(id, worst._1))) {
                    heap.poll(); heap.add((id, d))
                  }
                }
                r += 1
              }
              qi += 1
            }
          }
          val out = new ArrayBuffer[(Int, I, Double)]()
          var qi = 0
          while (qi < qIdxs.length) {
            heaps(qi).forEach(c => out += ((qIdxs(qi), c._1, c._2)))
            qi += 1
          }
          out.toArray
        }
      }, scala.collection.immutable.ArraySeq.unsafeWrapArray(partIds))
    val byQuery = partials.iterator.flatten.toArray.groupBy(_._1)
    queries.indices.map { qi =>
      val merged = byQuery.getOrElse(qi, Array.empty[(Int, I, Double)])
        .map(t => (t._2, t._3))
        .sortBy { case (id, d) => (d, id) }
        .take(fetchK)
      (queries(qi)._1, merged)
    }.toArray
  }

  /** Drop-in for [[Ann.ivfPqSearch]] backed by the resident code tier:
    * collect the (contract-capped) query batch, resident ADC to fetchK
    * candidates, then the SAME [[Quantization.rerankExact]] against the
    * raw corpus — row-identical output on the same models. The ADC stage
    * runs eagerly (the returned plan references only the tiny candidate
    * set), so callers may `unpersist()` the index once this returns. */
  def search(pi: PackedPqCorpus[Long], queries: DataFrame, corpus: DataFrame,
             k: Int, nProbe: Int = 4, fetchK: Int = 50, metric: String = "cosine",
             queryId: String = "query_id", queryVec: String = "query_vec",
             corpusId: String = "id", vecCol: String = "vec",
             maxQueryRows: Int = 65536): DataFrame = {
    val spark = queries.sparkSession
    val rows = queries
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .limit(maxQueryRows + 1)
      .collect()
    require(rows.length <= maxQueryRows,
      s"PackedPq.search query batch exceeds maxQueryRows=$maxQueryRows: the " +
        "packed path broadcasts per-query LUTs and merges on the driver — " +
        "route corpus-sized query sets through Ann.ivfPqSearch instead")
    require(rows.nonEmpty, "empty query batch")
    val qArr = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cand = searchAdc[Long](pi, qArr, fetchK, nProbe)
    import spark.implicits._
    val candidates = cand.toSeq
      .flatMap { case (qid, nbrs) => nbrs.map { case (nid, _) => (qid, nid) } }
      .toDF(queryId, "neighbor_id")
    Quantization.rerankExact(candidates, queries, corpus, k, metric,
      queryId, queryVec, corpusId, vecCol)
  }

  // ------------------------------------------------------ slab sidecars

  /** Persist the code blocks for warm start (the [[PackedKnn.saveSlabs]]
    * rename-swap contract) plus both models as ModelStore sidecars — at
    * 100 TB the coarse+product quantizers MUST reload byte-identical or
    * the reopened index answers from a different geometry. */
  def saveSlabs[I: ClassTag](pi: PackedPqCorpus[I], dir: String): Unit = {
    PackedKnn.writeSlabDir(pi.blocks, pi.m, dir)
    val spark = org.apache.spark.sql.SparkSession.active
    ModelStore.saveIvf(spark, pi.ivf, s"$dir/ivf")
    ModelStore.savePq(spark, pi.pq, s"$dir/pq")
    // the encoding geometry is part of the on-disk contract: a reopened
    // index that guessed wrong would serve garbage distances silently
    // scheme-aware (s3a/hdfs/file) like writeSlabDir and ModelStore — an
    // NIO path here would crash on a remote URI, or worse, silently no-op
    // the stale-opq deletion and serve rotated queries against raw codes
    if (pi.residual)
      ModelStore.writeString(s"$dir/residual.json", """{"residual": true}""")
    else ModelStore.deleteIfExists(s"$dir/residual.json")
    pi.rotation match {
      case Some(r) =>
        ModelStore.saveOpq(spark, Quantization.OpqModel(r, pi.pq), s"$dir/opq")
      case None =>
        // a stale rotation sidecar from an earlier pack of this dir
        // would silently rotate queries against unrotated codes
        ModelStore.deleteIfExists(s"$dir/opq")
    }
  }

  def slabsExist(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    PackedKnn.slabsExist(spark, dir) &&
      ModelStore.exists(s"$dir/ivf") && ModelStore.exists(s"$dir/pq")

  /** Reopen: one task per cell reading exactly its slab — zero Exchange,
    * zero re-encode. Partition i = cell i survives the sidecar. */
  def loadSlabs[I: ClassTag](spark: org.apache.spark.sql.SparkSession, dir: String,
                             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedPqCorpus[I] = {
    val ivf = ModelStore.loadIvf(spark, s"$dir/ivf")
    val pq = ModelStore.loadPq(spark, s"$dir/pq")
    val (blocks, m) = PackedKnn.readSlabDir[CodeBlock[I]](spark, dir, storage)
    require(m == pq.numSubspaces,
      s"PQ slab sidecar at $dir has $m bytes/row but the model has ${pq.numSubspaces} subspaces")
    require(blocks.getNumPartitions == ivf.numCells,
      s"PQ slab sidecar at $dir has ${blocks.getNumPartitions} partitions " +
        s"but the coarse model has ${ivf.numCells} cells")
    val residual = ModelStore.pathExists(s"$dir/residual.json")
    val rotation =
      if (ModelStore.exists(s"$dir/opq"))
        Some(ModelStore.loadOpq(spark, s"$dir/opq").rotation)
      else None
    new PackedPqCorpus(blocks, ivf, pq, Nil, residual, rotation)
  }

  /** Resident footprint in code bytes (ids excluded) — rows × m. The same
    * corpus in the float tier is rows × dim × 4: the ratio is the whole
    * point of this layer. */
  def codeBytes[I](pi: PackedPqCorpus[I]): Long =
    pi.blocks.map(_.codes.length.toLong).fold(0L)(_ + _)
}
