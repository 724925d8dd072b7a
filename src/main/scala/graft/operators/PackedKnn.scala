package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

/** Distributed packed-matrix vector index: the Spark analog of the
  * reference's resident float32 corpus matrix (vectordb.py:495-561 holds
  * NumPy `self.vectors` and scores a query batch with one GEMM;
  * parallel_search.py:246-311 chunks the same matrix across workers).
  *
  * [[pack]] converts a (id, vec) DataFrame into an `RDD[Block]` with ONE
  * object per partition — ids, a row-major float matrix, and per-row
  * norms — persisted deserialized. A search then runs one task per
  * partition: a blocked `sgemm` (netlib VectorBLAS when the JVM has
  * `jdk.incubator.vector`, pure-Java fallback otherwise) scores the whole
  * partition against the query batch, a bounded per-query heap keeps k,
  * and the driver merges the <= parts*Q*k partials — the reference's
  * `_search_chunk` + `_merge_top_k` (parallel_search.py:137-156, 313-368)
  * with the chunk scoring done by real BLAS.
  *
  * Scale shape: the corpus never moves after pack (no shuffle, no
  * per-search scan of parquet), task results are Q*k rows, and block
  * memory is exactly n*dim*4 bytes plus ids/norms — the same footprint
  * the reference pays single-node, here spread over executors. Distances
  * accumulate in float32 inside the GEMM, matching the reference's
  * float32 matrix math; callers needing the engine's bit-exact
  * double-accumulation contract either rerank the over-fetched candidates
  * exactly (q99_packed_knn) or use [[Knn.knnJoin]] / [[Knn.knnJoinFused]].
  *
  * Ids are generic: Long for surrogate-keyed corpora, String for the
  * client facade's natural document ids — the labels live inside the
  * blocks (distributed), never in a driver-side dictionary.
  */
object PackedKnn {

  /** One partition's corpus slab: `mat` is row-major `rows x dim`;
    * `sqrtNorms(i)` caches sqrt(sum sq) of row i for cosine/l2. */
  final case class Block[I](ids: Array[I], mat: Array[Float], dim: Int,
                            sqrtNorms: Array[Double]) {
    def rows: Int = ids.length
  }

  /** A packed, persisted corpus. `unpersist()` releases executor memory —
    * including every persisted constituent of an [[append]] union (the
    * union RDD itself holds no blocks; only its parents do). */
  final class PackedCorpus[I](val blocks: RDD[Block[I]], val dim: Int,
                              persistedParents: Seq[RDD[_]],
                              /** Append generations riding this handle
                                * (1 = freshly packed/compacted) — the
                                * driver-side fragmentation gauge, so
                                * `optimize()` skips healthy tiers for
                                * free. Removes prune in place and carry
                                * the count through. */
                              val generations: Int = 1) {
    def this(blocks: RDD[Block[I]], dim: Int) = this(blocks, dim, Nil)
    private[PackedKnn] def parents: Seq[RDD[_]] =
      if (persistedParents.nonEmpty) persistedParents else Seq(blocks)
    def unpersist(blocking: Boolean = false): Unit =
      parents.foreach(_.unpersist(blocking))
  }

  // One BLAS handle per executor JVM. VectorBLAS needs the incubator
  // vector module (build.sbt adds --add-modules=jdk.incubator.vector);
  // without it netlib silently falls back to Java11BLAS — still correct.
  @transient private[operators] lazy val blas: dev.ludovic.netlib.blas.BLAS =
    dev.ludovic.netlib.blas.BLAS.getInstance()

  /** Pack `corpus` (long-castable id column) into per-partition matrix
    * blocks and persist them. */
  def pack(corpus: DataFrame, idCol: String = "id", vecCol: String = "vec",
           storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedCorpus[Long] =
    packBy[Long](corpus, idCol, "long", vecCol, storage)(_.getLong(0))

  /** [[pack]] keyed by a natural string id (the client facade's corpora;
    * no surrogate, so distinct ids can never collide). */
  def packStr(corpus: DataFrame, idCol: String = "id", vecCol: String = "vec",
              storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedCorpus[String] =
    packBy[String](corpus, idCol, "string", vecCol, storage)(_.getUTF8String(0).toString)

  /** Append a batch to a packed corpus WITHOUT repacking the standing
    * blocks: the batch packs into its own partitions and the search RDD
    * becomes the union — the append-only ingest path (the standing
    * 100 TB matrix never moves; each batch adds O(batch) resident bytes).
    * Returns the combined corpus; the original remains valid, and
    * `unpersist()` on the combined handle releases BOTH generations'
    * blocks. A dim mismatch fails during the batch pack (executor-side
    * check against the standing dim) and releases the partial batch. */
  def append(pc: PackedCorpus[Long], batch: DataFrame,
             idCol: String = "id", vecCol: String = "vec",
             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedCorpus[Long] =
    appendBy[Long](pc, batch, idCol, "long", vecCol, storage)(_.getLong(0))

  /** [[append]] keyed by a natural string id (the client facade). */
  def appendStr(pc: PackedCorpus[String], batch: DataFrame,
                idCol: String = "id", vecCol: String = "vec",
                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedCorpus[String] =
    appendBy[String](pc, batch, idCol, "string", vecCol, storage)(
      _.getUTF8String(0).toString)

  private def appendBy[I: ClassTag](pc: PackedCorpus[I], batch: DataFrame,
                                    idCol: String, idType: String, vecCol: String,
                                    storage: StorageLevel)(
      getId: org.apache.spark.sql.catalyst.InternalRow => I): PackedCorpus[I] = {
    val add = packBy[I](batch, idCol, idType, vecCol, storage,
      expectDim = pc.dim)(getId)
    if (pc.dim != 0 && add.dim != 0 && pc.dim != add.dim) {
      add.unpersist()
      throw new IllegalArgumentException(
        s"PackedKnn.append: batch dim ${add.dim} != corpus dim ${pc.dim}")
    }
    new PackedCorpus(pc.blocks.union(add.blocks),
      if (pc.dim != 0) pc.dim else add.dim,
      pc.parents ++ add.parents, pc.generations + 1)
  }

  /** Remove ids from a packed corpus WITHOUT touching blocks that hold
    * none of them: a broadcast tombstone set maps over the blocks — miss
    * blocks pass through BY REFERENCE (zero copy; in a shared cache the
    * object is stored once), hit blocks rebuild their three arrays minus
    * the dead rows. No per-candidate tombstone check ever reaches the
    * sgemm/heap hot path: deletion cost is paid once at delete time, on
    * O(hit blocks), and searches stay full speed. The returned corpus is
    * persisted and MATERIALIZED before returning, so the caller can
    * release the original immediately (its blocks remain the recompute
    * lineage for evicted partitions — MEMORY_AND_DISK spills rather than
    * drops, so that path is for failure recovery, not steady state).
    * Tombstone batches are driver-sized, like CRUD deletes. */
  def remove[I: ClassTag](pc: PackedCorpus[I], ids: Set[I],
                          storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedCorpus[I] = {
    if (ids.isEmpty) return pc
    val bc = pc.blocks.sparkContext.broadcast(ids)
    val pruned = pc.blocks.mapPartitions(
      _.flatMap(pruneBlock(bc.value, _)), preservesPartitioning = true)
      .setName(residentName).persist(storage)
    pruned.count()
    new PackedCorpus(pruned, pc.dim, Nil, pc.generations)
  }

  /** [[remove]] for a cell-partitioned corpus: partition i stays cell i
    * (map preserves partitioning, centroids are untouched), so probe
    * routing in [[searchIvf]] is unchanged. */
  def removeIvf[I: ClassTag](pi: PackedIvfCorpus[I], ids: Set[I],
                             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedIvfCorpus[I] = {
    if (ids.isEmpty) return pi
    val bc = pi.blocks.sparkContext.broadcast(ids)
    val pruned = pi.blocks.mapPartitions(
      _.flatMap(pruneBlock(bc.value, _)), preservesPartitioning = true)
      .setName(residentName).persist(storage)
    pruned.count()
    new PackedIvfCorpus(pruned, pi.dim, pi.model, Nil, pi.generations)
  }

  /** Compact a flat packed corpus after heavy append traffic: each
    * [[append]] adds its own (often tiny) partitions, so a long ingest
    * history turns every search into many small tasks over many small
    * slabs. A shuffle-free `coalesce` folds the generations into
    * `numPartitions` tasks and the blocks within each merge into ONE
    * slab — task count and sgemm call count drop back to the packed
    * baseline. The result is persisted and materialized; release the
    * original afterwards (same contract as [[remove]]). */
  def compact[I: ClassTag](pc: PackedCorpus[I], numPartitions: Int,
                           storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedCorpus[I] = {
    val merged = pc.blocks.coalesce(math.max(1, numPartitions))
      .mapPartitions(mergeBlocks[I], preservesPartitioning = false)
      .setName(residentName).persist(storage)
    merged.count()
    new PackedCorpus(merged, pc.dim)
  }

  /** Compact a cell-partitioned corpus: [[appendIvf]] zips leave one
    * block per generation per cell; merge each cell's chain into one
    * slab with NO shuffle and NO partition change (partition i stays
    * cell i, probe routing untouched). */
  def compactIvf[I: ClassTag](pi: PackedIvfCorpus[I],
                              storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedIvfCorpus[I] = {
    val merged = pi.blocks.mapPartitions(mergeBlocks[I], preservesPartitioning = true)
      .setName(residentName).persist(storage)
    merged.count()
    new PackedIvfCorpus(merged, pi.dim, pi.model)
  }

  /** Fail-loud guard on the one hard limit of the slab layout: a
    * partition's matrix is ONE float array, so rows*dim must stay under
    * 2^31 (about 16.7M rows at 128 dims). Without this, an oversized
    * compaction/pack dies deep in allocation with an unhelpful
    * NegativeArraySizeException. */
  private[graft] def requireSlabFits(rows: Long, dim: Int, op: String): Unit =
    require(rows * dim <= Int.MaxValue.toLong,
      s"${if (op.contains(".")) op else s"PackedKnn.$op"}: " +
        s"slab of $rows rows x $dim dims = ${rows * dim} floats " +
        "exceeds Int.MaxValue (one partition's matrix is a single float " +
        "array) — spread the corpus over more partitions (repartition " +
        "before pack, or compact to a higher partition count)")

  private def mergeBlocks[I: ClassTag](it: Iterator[Block[I]]): Iterator[Block[I]] = {
    val bs = it.toArray
    if (bs.length <= 1) bs.iterator
    else {
      val d = bs.head.dim
      require(bs.forall(_.dim == d),
        s"PackedKnn.compact: mixed dims ${bs.map(_.dim).distinct.mkString(",")}")
      requireSlabFits(bs.map(_.rows.toLong).sum, d, "compact")
      val n = bs.map(_.rows).sum
      val ids = new Array[I](n)
      val mat = new Array[Float](n * d)
      val norms = new Array[Double](n)
      var off = 0
      for (b <- bs) {
        System.arraycopy(b.ids, 0, ids, off, b.rows)
        System.arraycopy(b.mat, 0, mat, off * d, b.rows * d)
        System.arraycopy(b.sqrtNorms, 0, norms, off, b.rows)
        off += b.rows
      }
      Iterator.single(Block(ids, mat, d, norms))
    }
  }

  private def pruneBlock[I: ClassTag](dead: Set[I], b: Block[I]): Iterator[Block[I]] = {
    var hits = 0
    var r = 0
    while (r < b.ids.length) { if (dead.contains(b.ids(r))) hits += 1; r += 1 }
    if (hits == 0) Iterator.single(b)
    else if (hits == b.rows) Iterator.empty
    else {
      val n = b.rows - hits
      val d = b.dim
      val ids2 = new Array[I](n)
      val mat2 = new Array[Float](n * d)
      val norms2 = new Array[Double](n)
      var j = 0
      r = 0
      while (r < b.ids.length) {
        if (!dead.contains(b.ids(r))) {
          ids2(j) = b.ids(r)
          System.arraycopy(b.mat, r * d, mat2, j * d, d)
          norms2(j) = b.sqrtNorms(r)
          j += 1
        }
        r += 1
      }
      Iterator.single(Block(ids2, mat2, d, norms2))
    }
  }

  private def packBy[I: ClassTag](corpus: DataFrame, idCol: String, idType: String,
                                  vecCol: String, storage: StorageLevel,
                                  expectDim: Int = 0)(
      getId: org.apache.spark.sql.catalyst.InternalRow => I): PackedCorpus[I] = {
    val src = corpus
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast(idType), col(vecCol).cast("array<float>"))
    val packed: RDD[Block[I]] = src.queryExecution.toRdd.mapPartitions { iter =>
      val ids = new ArrayBuffer[I]()
      var mat = new Array[Float](0)
      var used = 0
      var dim = -1
      while (iter.hasNext) {
        val row = iter.next()
        val arr = row.getArray(1)
        val n = arr.numElements()
        if (dim < 0) dim = n
        require(n == dim, s"PackedKnn.pack: ragged corpus (saw dims $dim and $n)")
        require(expectDim <= 0 || n == expectDim,
          s"PackedKnn.pack: batch dim $n != corpus dim $expectDim")
        if (mat.length - used < n) {
          require(used.toLong + n <= Int.MaxValue.toLong - 8,
            s"PackedKnn.pack: partition slab would exceed Int.MaxValue floats " +
              s"(${used.toLong + n} needed at dim $n; one partition's matrix is " +
              "a single float array) — spread the corpus over more partitions " +
              "(repartition before pack)")
          val grown = new Array[Float](math.min(Int.MaxValue.toLong - 8,
            math.max(mat.length.toLong * 2, used.toLong + n.toLong * 1024)).toInt)
          System.arraycopy(mat, 0, grown, 0, used)
          mat = grown
        }
        var i = 0
        while (i < n) { mat(used + i) = arr.getFloat(i); i += 1 }
        used += n
        ids += getId(row)
      }
      if (ids.isEmpty) Iterator.empty
      else {
        val m = java.util.Arrays.copyOf(mat, used)
        val norms = new Array[Double](ids.length)
        var r = 0
        while (r < ids.length) {
          var s = 0.0; var i = r * dim
          val end = i + dim
          while (i < end) { s += m(i).toDouble * m(i); i += 1 }
          norms(r) = math.sqrt(s)
          r += 1
        }
        Iterator.single(Block(ids.toArray, m, dim, norms))
      }
    }.setName(residentName).persist(storage)
    packed.count() // materialize so searches never pay the parquet scan
    val dim = packed.take(1).headOption.map(_.dim).getOrElse(0)
    new PackedCorpus(packed, dim)
  }

  /** RDD name marking resident index blocks — ingest-time state like the
    * on-disk sidecars, which battery hygiene sweeps (Bench's between-query
    * unpersist) should leave alone. */
  val residentName = "graft-resident-index"

  // ------------------------------------------------- IVF-partitioned packing

  /** A packed corpus laid out one IVF CELL per partition: probing p of C
    * cells runs a job on exactly p partitions ([[searchIvf]] passes the
    * probed partition ids to `runJob`) — the resident-memory analog of
    * [[Ann.writePartitionedByCell]]'s directory pruning. `unpersist()`
    * releases every persisted generation of an [[appendIvf]] zip (the
    * zipped RDD itself holds no blocks; only its parents do). */
  final class PackedIvfCorpus[I](val blocks: RDD[Block[I]], val dim: Int,
                                 val model: Ann.IvfModel,
                                 persistedParents: Seq[RDD[_]],
                                 /** Append generations (1 = freshly
                                   * packed/compacted) — see
                                   * [[PackedCorpus.generations]]. */
                                 val generations: Int = 1) {
    def this(blocks: RDD[Block[I]], dim: Int, model: Ann.IvfModel) =
      this(blocks, dim, model, Nil)
    private[PackedKnn] def parents: Seq[RDD[_]] =
      if (persistedParents.nonEmpty) persistedParents else Seq(blocks)
    def unpersist(blocking: Boolean = false): Unit =
      parents.foreach(_.unpersist(blocking))
  }

  private[operators] final class CellPartitioner(n: Int) extends org.apache.spark.Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** Pack `corpus` into per-CELL matrix blocks (partition i = IVF cell i).
    * Cell assignment runs in the same codegen stage as the scan (the
    * once-per-row encode); the one-time shuffle routes each row to its
    * cell's partition. */
  def packIvf(corpus: DataFrame, model: Ann.IvfModel,
              idCol: String = "id", vecCol: String = "vec",
              storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedIvfCorpus[Long] =
    packIvfBy[Long](corpus, model, idCol, "long", vecCol, storage)(_.getLong(0))

  /** [[packIvf]] keyed by a natural string id (the client facade). */
  def packIvfStr(corpus: DataFrame, model: Ann.IvfModel,
                 idCol: String = "id", vecCol: String = "vec",
                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedIvfCorpus[String] =
    packIvfBy[String](corpus, model, idCol, "string", vecCol, storage)(_.getUTF8String(0).toString)

  /** Append a batch into a cell-partitioned corpus WITHOUT repacking the
    * standing slabs: the batch routes through the SAME coarse quantizer
    * into its own cell-partitioned blocks (same partitioner, same cell
    * count), and a zip concatenates the two generations per cell —
    * partition i stays exactly cell i, so [[searchIvf]] probe routing is
    * unchanged and the standing matrix never moves. */
  def appendIvf(pi: PackedIvfCorpus[Long], batch: DataFrame,
                idCol: String = "id", vecCol: String = "vec",
                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedIvfCorpus[Long] =
    appendIvfBy[Long](pi, batch, idCol, "long", vecCol, storage)(_.getLong(0))

  /** [[appendIvf]] keyed by a natural string id (the client facade). */
  def appendIvfStr(pi: PackedIvfCorpus[String], batch: DataFrame,
                   idCol: String = "id", vecCol: String = "vec",
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedIvfCorpus[String] =
    appendIvfBy[String](pi, batch, idCol, "string", vecCol, storage)(
      _.getUTF8String(0).toString)

  private def appendIvfBy[I: ClassTag](pi: PackedIvfCorpus[I], batch: DataFrame,
                                       idCol: String, idType: String, vecCol: String,
                                       storage: StorageLevel)(
      getId: org.apache.spark.sql.catalyst.InternalRow => I): PackedIvfCorpus[I] = {
    val add = packIvfBy[I](batch, pi.model, idCol, idType, vecCol, storage,
      expectDim = pi.dim)(getId)
    if (pi.dim != 0 && add.dim != 0 && pi.dim != add.dim) {
      add.unpersist()
      throw new IllegalArgumentException(
        s"PackedKnn.appendIvf: batch dim ${add.dim} != corpus dim ${pi.dim}")
    }
    val zipped = pi.blocks.zipPartitions(add.blocks,
      preservesPartitioning = true)((a, b) => a ++ b)
    new PackedIvfCorpus(zipped, if (pi.dim != 0) pi.dim else add.dim,
      pi.model, pi.parents ++ add.parents, pi.generations + 1)
  }

  private def packIvfBy[I: ClassTag](corpus: DataFrame, model: Ann.IvfModel,
                                     idCol: String, idType: String, vecCol: String,
                                     storage: StorageLevel, expectDim: Int = 0)(
      getId: org.apache.spark.sql.catalyst.InternalRow => I): PackedIvfCorpus[I] = {
    val src = corpus
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast(idType), col(vecCol).cast("array<float>"),
        Ann.cellId(model)(col(vecCol)).as("_cell"))
    val keyed: RDD[(Int, (I, Array[Float]))] =
      src.queryExecution.toRdd.mapPartitions { iter =>
        iter.map { row =>
          val arr = row.getArray(1)
          val n = arr.numElements()
          val v = new Array[Float](n)
          var i = 0
          while (i < n) { v(i) = arr.getFloat(i); i += 1 }
          (row.getInt(2), (getId(row), v))
        }
      }
    val packed: RDD[Block[I]] = keyed
      .partitionBy(new CellPartitioner(model.numCells))
      .mapPartitions { iter =>
        val ids = new ArrayBuffer[I]()
        val vecs = new ArrayBuffer[Array[Float]]()
        while (iter.hasNext) {
          val (_, (id, v)) = iter.next()
          ids += id; vecs += v
        }
        if (ids.isEmpty) Iterator.empty
        else {
          val dim = vecs.head.length
          require(expectDim <= 0 || dim == expectDim,
            s"PackedKnn.packIvf: batch dim $dim != corpus dim $expectDim")
          requireSlabFits(ids.length.toLong, dim, "packIvf")
          val m = new Array[Float](ids.length * dim)
          val norms = new Array[Double](ids.length)
          var r = 0
          while (r < ids.length) {
            val v = vecs(r)
            require(v.length == dim, s"PackedKnn.packIvf: ragged corpus (saw dims $dim and ${v.length})")
            System.arraycopy(v, 0, m, r * dim, dim)
            var s = 0.0; var i = 0
            while (i < dim) { s += v(i).toDouble * v(i); i += 1 }
            norms(r) = math.sqrt(s)
            r += 1
          }
          Iterator.single(Block(ids.toArray, m, dim, norms))
        }
      }.setName(residentName).persist(storage)
    packed.count()
    val dim = packed.take(1).headOption.map(_.dim).getOrElse(0)
    new PackedIvfCorpus(packed, dim, model)
  }

  /** Split one HOT cell of a cell-partitioned corpus in place — the
    * index-maintenance move for a cell that outgrew its neighbors under
    * append traffic (skewed ingest makes one cell's scan dominate every
    * probe that touches it). The alternatives both re-shuffle the world:
    * retraining the coarse quantizer invalidates EVERY cell's layout, and
    * repacking moves the whole corpus to fix one cell. This touches only
    * the split cell:
    *
    *   - a seeded 2-means over the cell's own rows (every job runs on
    *     that ONE partition, via partition pruning) refines its centroid
    *     into two children;
    *   - child A replaces the old centroid at index `cell`, child B
    *     appends at index C — probe routing stays positional (partition
    *     i = cell i, the new cell is partition C);
    *   - the block RDD becomes union(retained, moved): every other
    *     partition passes through by reference with NARROW dependencies
    *     only (no shuffle — the spec asserts the lineage), the split
    *     partition keeps the rows nearest child A, and one new partition
    *     holds the rest.
    *
    * Assignment stays at-insert-time (the FAISS contract): rows in OTHER
    * cells are not revisited even if a child centroid is now closer, and
    * a full-probe search is exact regardless of placement — splitting
    * tightens future routing and halves the hot scan, nothing else.
    * Like [[remove]], the result is persisted and materialized; release
    * the original afterwards. */
  def splitCell[I: ClassTag](pi: PackedIvfCorpus[I], cell: Int,
                             maxIter: Int = 10,
                             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedIvfCorpus[I] = {
    val numCells = pi.model.numCells
    require(cell >= 0 && cell < numCells,
      s"splitCell: cell $cell out of range [0, $numCells)")
    val dim = pi.dim
    val one = org.apache.spark.rdd.PartitionPruningRDD.create(pi.blocks, _ == cell)

    // --- seeded 2-means over the one partition ---
    // init: the parent centroid and the cell's row farthest from it — a
    // deterministic spread (k-means++'s first step without an RNG)
    val parent = pi.model.centroids(cell)
    val farthestCand = one.mapPartitions { it =>
      var best: Array[Float] = null; var bestD = -1.0
      it.foreach { b =>
        var r = 0
        while (r < b.rows) {
          var d = 0.0; var j = 0
          while (j < dim) {
            val diff = b.mat(r * dim + j) - parent(j); d += diff * diff; j += 1
          }
          if (d > bestD) {
            bestD = d
            best = java.util.Arrays.copyOfRange(b.mat, r * dim, (r + 1) * dim)
          }
          r += 1
        }
      }
      if (best == null) Iterator.empty else Iterator.single((bestD, best))
    }.collect()
    require(farthestCand.nonEmpty, s"splitCell: cell $cell is empty")
    val (spread, farthest) = farthestCand.maxBy(_._1)
    require(spread > 0.0,
      s"splitCell: cell $cell is degenerate (every row equals the centroid); " +
        "splitting cannot separate identical rows")
    var ca = parent.clone()
    var cb = farthest.map(_.toDouble)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val (sa, na, sb, nb) = one.mapPartitions { it =>
        val pa = new Array[Double](dim); val pb = new Array[Double](dim)
        var na0 = 0L; var nb0 = 0L
        it.foreach { b =>
          var r = 0
          while (r < b.rows) {
            var da = 0.0; var db = 0.0; var j = 0
            while (j < dim) {
              val x = b.mat(r * dim + j).toDouble
              val ea = x - ca(j); da += ea * ea
              val eb = x - cb(j); db += eb * eb
              j += 1
            }
            val tgt = if (da <= db) pa else pb
            var j2 = 0
            while (j2 < dim) { tgt(j2) += b.mat(r * dim + j2); j2 += 1 }
            if (da <= db) na0 += 1 else nb0 += 1
            r += 1
          }
        }
        Iterator.single((pa, na0, pb, nb0))
      }.collect().head
      if (na == 0 || nb == 0) {
        moved = false // degenerate partition this round; keep previous split
      } else {
        val nca = sa.map(_ / na); val ncb = sb.map(_ / nb)
        moved = !(java.util.Arrays.equals(nca, ca) && java.util.Arrays.equals(ncb, cb))
        ca = nca; cb = ncb
      }
      iter += 1
    }
    val caF = ca; val cbF = cb

    // --- rebuild: split partition filtered two ways, everything else by
    // reference; union keeps partition order (0..C-1, then C) ---
    def sideOf(b: Block[I], keepA: Boolean): Iterator[Block[I]] = {
      val keep = new ArrayBuffer[Int]()
      var r = 0
      while (r < b.rows) {
        var da = 0.0; var db = 0.0; var j = 0
        while (j < dim) {
          val x = b.mat(r * dim + j).toDouble
          val ea = x - caF(j); da += ea * ea
          val eb = x - cbF(j); db += eb * eb
          j += 1
        }
        if ((da <= db) == keepA) keep += r
        r += 1
      }
      if (keep.isEmpty) Iterator.empty
      else if (keep.length == b.rows) Iterator.single(b)
      else {
        val n = keep.length
        val ids = new Array[I](n)
        val mat = new Array[Float](n * dim)
        val norms = new Array[Double](n)
        var i = 0
        while (i < n) {
          val r2 = keep(i)
          ids(i) = b.ids(r2)
          System.arraycopy(b.mat, r2 * dim, mat, i * dim, dim)
          norms(i) = b.sqrtNorms(r2)
          i += 1
        }
        Iterator.single(Block(ids, mat, dim, norms))
      }
    }
    val retained = pi.blocks.mapPartitionsWithIndex((i, it) =>
      if (i == cell) it.flatMap(sideOf(_, keepA = true)) else it)
    val movedPart = one.mapPartitions(_.flatMap(sideOf(_, keepA = false)))
    val newBlocks = retained.union(movedPart)
      .setName(residentName).persist(storage)
    newBlocks.count()
    val newModel = Ann.IvfModel(pi.model.centroids.updated(cell, caF) :+ cbF)
    new PackedIvfCorpus(newBlocks, dim, newModel)
  }

  /** Per-cell resident row counts — one lightweight job, the input to a
    * split policy. Index i = cell i; empty cells report 0. */
  def cellSizes[I](pi: PackedIvfCorpus[I]): Array[Long] = {
    val counts = pi.blocks.mapPartitionsWithIndex((i, it) =>
      Iterator.single(i -> it.map(_.rows.toLong).sum)).collect().toMap
    Array.tabulate(pi.model.numCells)(i => counts.getOrElse(i, 0L))
  }

  /** Split every cell above `maxRows` until none remains (or a cell
    * cannot split further — identical rows — which fails loud like
    * [[splitCell]]). Each round releases the superseded handle; returns
    * the final corpus and how many splits ran. The split order is
    * largest-first, so the hottest scan shrinks first. */
  def splitHotCells[I: ClassTag](pi: PackedIvfCorpus[I], maxRows: Long,
                                 maxIter: Int = 10, maxSplits: Int = 1024,
                                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): (PackedIvfCorpus[I], Int) = {
    require(maxRows > 0, s"splitHotCells: maxRows must be positive, got $maxRows")
    var cur = pi
    var splits = 0
    var hot = cellSizes(cur).zipWithIndex.filter(_._1 > maxRows)
    while (hot.nonEmpty) {
      require(splits < maxSplits,
        s"splitHotCells: $splits splits have not brought every cell under " +
          s"$maxRows rows (near-duplicate mass keeps re-concentrating?) — " +
          "raise maxRows or maxSplits, or dedup the corpus first")
      val (_, cellIdx) = hot.maxBy(_._1)
      val next = splitCell(cur, cellIdx, maxIter, storage)
      if (cur ne pi) cur.unpersist()
      cur = next
      splits += 1
      hot = cellSizes(cur).zipWithIndex.filter(_._1 > maxRows)
    }
    (cur, splits)
  }

  /** Approximate batch top-k through the cell-partitioned packed corpus:
    * each query probes its `nProbe` nearest cells (same squared-L2 /
    * tie-by-cell ranking as the codegen ProbeCellIds kernel, so results
    * match [[Ann.ivfSearch]] on the same model), and the job runs ONLY on
    * the union of probed partitions — at 1000 cells and nProbe=4, a
    * 20-query batch touches at most 80 partitions, not 1000. */
  def searchIvf[I: ClassTag: Ordering](pc: PackedIvfCorpus[I],
                                       queries: Array[(Long, Array[Float])],
                                       k: Int, nProbe: Int,
                                       metric: String = "cosine"): Array[(Long, Array[(I, Double)])] = {
    require(queries.nonEmpty, "empty query batch")
    val cents = pc.model.centroids
    val probes: Array[Array[Int]] =
      queries.map { case (_, qv) => driverProbes(cents, qv, nProbe) }
    val byCell: Map[Int, Array[Int]] = probes.zipWithIndex
      .flatMap { case (cells, qi) => cells.map(c => (c, qi)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val partIds = byCell.keys.toArray.sorted
    val sc = pc.blocks.sparkContext
    val qs = queries
    val partials: Array[Array[(Int, I, Double)]] = sc.runJob(pc.blocks,
      (ctx: org.apache.spark.TaskContext, it: Iterator[Block[I]]) => {
        val qIdxs = byCell.getOrElse(ctx.partitionId(), Array.empty[Int])
        if (qIdxs.isEmpty || !it.hasNext) Array.empty[(Int, I, Double)]
        else {
          val sub = qIdxs.map(qs)
          val out = new ArrayBuffer[(Int, I, Double)]()
          while (it.hasNext)
            out ++= searchBlock(it.next(), sub, k, metric)
              .map { case (local, id, d) => (qIdxs(local), id, d) }
          out.toArray
        }
      }, scala.collection.immutable.ArraySeq.unsafeWrapArray(partIds))
    val byQuery = partials.iterator.flatten.toArray.groupBy(_._1)
    queries.indices.map { qi =>
      val merged = byQuery.getOrElse(qi, Array.empty[(Int, I, Double)])
        .map(t => (t._2, t._3))
        .sortBy { case (id, d) => (d, id) }
        .take(k)
      (queries(qi)._1, merged)
    }.toArray
  }

  /** Driver-side probe ranking: the query's nProbe nearest coarse cells by
    * squared L2, ties by cell index — the SAME ranking as the codegen
    * ProbeCellIds kernel, so packed probe routing matches [[Ann.ivfSearch]]
    * on the same model. Shared by [[searchIvf]] and [[PackedPq]]. */
  private[operators] def driverProbes(cents: Array[Array[Double]],
                                      qv: Array[Float], nProbe: Int): Array[Int] = {
    val dists = cents.map { c =>
      val n = math.min(qv.length, c.length)
      var d = 0.0; var j = 0
      while (j < n) { val diff = qv(j).toDouble - c(j); d += diff * diff; j += 1 }
      d
    }
    Array.range(0, cents.length).sortBy(i => (dists(i), i))
      .take(math.min(nProbe, cents.length))
  }

  /** Exact batch top-k over a packed corpus. Returns, per query id, the k
    * nearest (neighbor_id, dist) sorted by (dist, id) — merged on the
    * driver like the reference's `_merge_top_k`. O(parts*Q*k) driver
    * memory. */
  def search[I: ClassTag: Ordering](pc: PackedCorpus[I],
                                    queries: Array[(Long, Array[Float])], k: Int,
                                    metric: String = "cosine"): Array[(Long, Array[(I, Double)])] = {
    require(queries.nonEmpty, "empty query batch")
    val sc = pc.blocks.sparkContext
    val partials: Array[Array[(Int, I, Double)]] =
      sc.runJob(pc.blocks, (it: Iterator[Block[I]]) => {
        val out = new ArrayBuffer[(Int, I, Double)]()
        while (it.hasNext) out ++= searchBlock(it.next(), queries, k, metric)
        out.toArray
      })
    val byQuery = partials.iterator.flatten.toArray.groupBy(_._1)
    queries.indices.map { qi =>
      val merged = byQuery.getOrElse(qi, Array.empty[(Int, I, Double)])
        .map(t => (t._2, t._3))
        .sortBy { case (id, d) => (d, id) }
        .take(k)
      (queries(qi)._1, merged)
    }.toArray
  }

  // --------------------------------------------------- kNN graph (self-join)

  /** k-nearest-neighbor GRAPH over a packed corpus: every row is a query
    * AND a candidate — the corpus×corpus top-k self-join that kNN-graph
    * dedup/clustering pipelines build, and that the broadcast-queries
    * operators cannot express (neither side is small). Block-pair
    * parallelism: every pair of partition slabs is scored with one
    * chunked sgemm (P² tasks over resident matrices, nothing re-read),
    * per-pair bounded top-k partials, then the existing Q*k-row
    * partial/final merge. Self-matches (same id) are excluded.
    *
    * Returns (query_id, rank, neighbor_id, dist) like [[Knn.knnJoin]].
    * Task count is quadratic in the block-grid size, so the grid is
    * SELF-ENFORCING: when the corpus holds more than `maxBlocks`
    * partitions (default: ceil(sqrt(2 * defaultParallelism)), which puts
    * the P(P+1)/2 pair-task count at about the cluster's core count), the
    * blocks are shuffle-free coalesced and merged before pairing — a long
    * append history or an over-partitioned pack cannot quietly explode
    * the grid. The exact flops are irreducible either way; at 100 TB the
    * same join runs IVF-blocked (score only same/nearby cells — see
    * [[knnGraphIvf]] and Dedup.embeddingNearDupBlocked for the lossless
    * variant); this is the exact all-pairs baseline those paths are
    * validated against. */
  def knnGraph(pc: PackedCorpus[Long], k: Int,
               metric: String = "cosine", maxBlocks: Int = 0): DataFrame = {
    val kk = k
    val m = metric
    // one task per UNORDERED block pair: the (a,b) GEMM already contains
    // every (b,a) dot product, so the symmetric kernel feeds both sides'
    // heaps from one pass — P(P+1)/2 tasks, not P², and half the flops
    val blocks = graphBlocks(pc, maxBlocks)
    val indexed = blocks.zipWithIndex().map(_.swap)
    val partials: RDD[(Long, Long, Double)] =
      indexed.cartesian(indexed)
        .filter { case ((ia, _), (ib, _)) => ia <= ib }
        .flatMap { case ((ia, a), (ib, b)) =>
          scorePair(a, b, kk, m, bothSides = ia != ib)
        }
    val result = graphResult(partials, kk)
    if (blocks eq pc.blocks) result
    else {
      // the grid ran over TEMPORARY persisted merged slabs: materialize
      // the (Q*k-row) result eagerly, then release them deterministically
      // instead of waiting for the ContextCleaner to notice the RDD is
      // unreachable (GiB-scale slabs lingering in executor storage would
      // evict the caller's own persisted corpora first). The unpersist
      // sits in a finally so a failed grid job / checkpoint releases
      // them too — the failure path is exactly where an evicted caller
      // corpus would hurt most (the retry would re-pack it).
      try result.localCheckpoint(true)
      finally blocks.unpersist(blocking = false)
    }
  }

  /** The block grid [[knnGraph]] actually pairs: the corpus's own blocks
    * when the partition count already fits the grid budget, else a
    * shuffle-free coalesce+merge down to the budget. The budget is
    * FLOOR-ed by slab capacity — one cheap job over the resident blocks
    * counts rows, and the grid never coalesces below the partition count
    * that keeps each merged slab under ~1 GiB of floats (so the
    * self-enforcement can neither trip the Int.MaxValue slab guard nor
    * force multi-slab-sized task memory on a corpus that used to run
    * fine over many partitions). Merged blocks are persisted: every pair
    * task reads both its slabs from storage instead of re-running the
    * merge copies L times; the ContextCleaner (and Bench's between-query
    * sweep) reclaims them once the graph result is dereferenced. Exposed
    * to tests so the self-enforcement is assertable. */
  private[graft] def graphBlocks(pc: PackedCorpus[Long],
                                 maxBlocks: Int): RDD[Block[Long]] = {
    val requested =
      if (maxBlocks > 0) maxBlocks
      else math.max(1, math.ceil(math.sqrt(
        2.0 * pc.blocks.sparkContext.defaultParallelism)).toInt)
    if (pc.blocks.getNumPartitions <= requested) pc.blocks
    else {
      val totalFloats = pc.blocks.map(b => b.rows.toLong * b.dim).sum().toLong
      val capacityFloor = math.max(1L,
        (totalFloats + MaxSlabFloats - 1) / MaxSlabFloats).toInt
      val limit = math.max(requested, capacityFloor)
      if (pc.blocks.getNumPartitions <= limit) pc.blocks
      else {
        // the capacity floor bounds the AVERAGE group; coalesce groups by
        // count/locality, not bytes, so a skewed mix (few giant pack
        // slabs among many tiny append blocks) can still route an
        // over-cap byte total into one partition — the CAPPED merge
        // emits multiple slabs there instead of tripping the guard
        val merged = pc.blocks.coalesce(limit)
          .mapPartitions(mergeBlocksCapped[Long](_, MaxSlabFloats),
            preservesPartitioning = false)
          .persist(StorageLevel.MEMORY_AND_DISK)
        merged.count()
        merged
      }
    }
  }

  /** Greedy size-capped variant of [[mergeBlocks]]: fold consecutive
    * blocks into slabs of at most `capFloats` floats, emitting a new slab
    * whenever the next block would overflow (a single block larger than
    * the cap passes through unmerged — it was already packed that way). */
  private def mergeBlocksCapped[I: ClassTag](it: Iterator[Block[I]],
                                             capFloats: Long): Iterator[Block[I]] = {
    val bs = it.toArray
    if (bs.length <= 1) bs.iterator
    else {
      val out = scala.collection.mutable.ArrayBuffer[Block[I]]()
      val group = scala.collection.mutable.ArrayBuffer[Block[I]]()
      var floats = 0L
      def flush(): Unit = if (group.nonEmpty) {
        out ++= mergeBlocks[I](group.iterator)
        group.clear(); floats = 0L
      }
      for (b <- bs) {
        val sz = b.rows.toLong * b.dim
        if (group.nonEmpty && floats + sz > capFloats) flush()
        group += b; floats += sz
      }
      flush()
      out.iterator
    }
  }

  /** Target ceiling for a self-enforced merged slab (~1 GiB of float32) —
    * far under the 2^31 hard limit, so auto-merge never constructs a slab
    * the guards would reject. */
  private val MaxSlabFloats: Long = 1L << 28

  /** Cell-blocked approximate kNN graph over an IVF-packed corpus: each
    * partition (= cell) scores itself — the pair grid collapses from P²
    * tasks to P, the standard blocked construction for billion-row graphs.
    * Each cell's generation chain ([[appendIvf]] leaves one block per
    * generation) is merged before scoring, so same-cell cross-generation
    * edges are found whether or not [[compactIvf]] has run.
    *
    * `nProbe` > 1 adds the standard RIM expansion for boundary points:
    * every row ALSO queries its 2nd..nProbe-th nearest cells (one routing
    * shuffle of (id, vec) copies per extra probe; the standing slabs never
    * move), so near neighbors just across a cell boundary are recovered —
    * recall climbs toward [[knnGraph]]'s exact graph at ~nProbe× the
    * scoring cost, still P-ish tasks, never a pair grid. With nProbe = 1
    * only same-cell neighbors are found (recall is governed by the coarse
    * quantizer, like any IVF search). Same output shape as [[knnGraph]],
    * which is its exact baseline. */
  def knnGraphIvf(pi: PackedIvfCorpus[Long], k: Int,
                  metric: String = "cosine", nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")
    val kk = k
    val m = metric
    // the merged view is consumed exactly ONCE (the same-cell scoring);
    // the rim path reads the PERSISTED raw blocks directly — deriving rim
    // copies and hosting rim queries per generation block needs no merge,
    // and re-merging per consumer would re-copy the whole corpus
    val same: RDD[(Long, Long, Double)] =
      pi.blocks.mapPartitions(it => mergeBlocks[Long](it).flatMap(b =>
        scorePair(b, b, kk, m, bothSides = false)))
    val partials =
      if (nProbe <= 1) same
      else same.union(rimPartials(pi.blocks, pi.model, kk, m, nProbe))
    graphResult(partials, kk)
  }

  /** Rim-expansion partials for [[knnGraphIvf]]: route a (id, vec) COPY of
    * every row to its 2nd..nProbe-th nearest cells as a QUERY-only block,
    * then score each rim block against its host cell's generation blocks
    * one-directional (rim rows gain cross-cell neighbors; the host slabs
    * never move, and the downstream top-k merge combines per-generation
    * partials, so no merge pass is needed here). The row's HOME partition
    * is excluded by position, not by recomputed nearest-cell
    * (floating-point ties could disagree with the stored layout), so a
    * rim copy never re-scores its own cell. */
  private def rimPartials(cells: RDD[Block[Long]], model: Ann.IvfModel,
                          k: Int, metric: String,
                          nProbe: Int): RDD[(Long, Long, Double)] = {
    val cents = model.centroids
    val nCells = model.numCells
    val extra = nProbe - 1
    val rimKeyed: RDD[(Int, (Long, Array[Float]))] =
      cells.mapPartitionsWithIndex { (home, it) =>
        it.flatMap { b =>
          (0 until b.rows).iterator.flatMap { r =>
            val v = new Array[Float](b.dim)
            System.arraycopy(b.mat, r * b.dim, v, 0, b.dim)
            val dists = cents.map { c =>
              val n = math.min(v.length, c.length)
              var d = 0.0; var j = 0
              while (j < n) { val diff = v(j).toDouble - c(j); d += diff * diff; j += 1 }
              d
            }
            Array.range(0, nCells).sortBy(i => (dists(i), i)).iterator
              .filter(_ != home).take(extra)
              .map(c => (c, (b.ids(r), v)))
          }
        }
      }.partitionBy(new CellPartitioner(nCells))
    val rimBlocks: RDD[Block[Long]] = rimKeyed.mapPartitions { it =>
      val ids = new ArrayBuffer[Long]()
      val vecs = new ArrayBuffer[Array[Float]]()
      while (it.hasNext) { val (_, (id, v)) = it.next(); ids += id; vecs += v }
      if (ids.isEmpty) Iterator.empty
      else {
        val dim = vecs.head.length
        requireSlabFits(ids.length.toLong, dim, "PackedKnn.knnGraphIvf.rim")
        val mat = new Array[Float](ids.length * dim)
        val norms = new Array[Double](ids.length)
        var r = 0
        while (r < ids.length) {
          val v = vecs(r)
          System.arraycopy(v, 0, mat, r * dim, dim)
          var s = 0.0; var i = 0
          while (i < dim) { s += v(i).toDouble * v(i); i += 1 }
          norms(r) = math.sqrt(s)
          r += 1
        }
        Iterator.single(Block(ids.toArray, mat, dim, norms))
      }
    }
    cells.zipPartitions(rimBlocks, preservesPartitioning = true) { (cellIt, rimIt) =>
      val hosts = cellIt.toArray
      rimIt.flatMap(rb => hosts.iterator.flatMap(hb =>
        scorePair(hb, rb, k, metric, bothSides = false)))
    }
  }

  /** Shared finishing stage of the graph builds: bounded top-k merge of
    * the per-pair partials, ranked (dist, id) ascending. */
  private def graphResult(partials: RDD[(Long, Long, Double)], k: Int): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val topk = udaf(new Knn.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Knn.Neighbor]())
    partials.toDF("query_id", "neighbor_id", "dist")
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("dist")).as("_nbrs"))
      .select(col("query_id"), posexplode(col("_nbrs")).as(Seq("_pos", "_n")))
      .select(col("query_id"), (col("_pos") + 1).cast("int").as("rank"),
        col("_n.id").as("neighbor_id"), col("_n.dist").as("dist"))
  }

  /** One block pair of the kNN-graph join, zero-copy on both sides: one
    * chunked sgemm between `b` (rows as queries) and `a` (candidates),
    * pushing every dot product into b-side heaps and — when `bothSides`
    * (distinct blocks) — into a-side heaps too, since C(r,c) IS the
    * (c,r) score. Identical-id pairs are skipped (the graph's self-match
    * exclusion; also makes the self-block call with bothSides=false the
    * complete one-directional self-join). The score buffer adapts to the
    * query count so it stays ~16 MB however large the blocks are (a
    * fixed 8192-chunk at whole-block nq overflowed Int and allocated
    * gigabytes). */
  private def scorePair(a: Block[Long], b: Block[Long], k: Int,
                        metric: String, bothSides: Boolean): Iterator[(Long, Long, Double)] = {
    val nq = b.rows
    if (nq == 0 || a.rows == 0) return Iterator.empty
    require(a.dim == b.dim, s"block dims differ: ${a.dim} vs ${b.dim}")
    val dim = a.dim
    val mcode = metric match {
      case "cosine" => 0; case "l2" => 1; case "ip" => 2
      case other => throw new IllegalArgumentException(s"metric $other")
    }
    final case class Cand(id: Long, d: Double)
    def mkHeaps(n: Int) = Array.fill(n)(
      new java.util.PriorityQueue[Cand](k + 1,
        (x: Cand, y: Cand) => {
          val c = java.lang.Double.compare(y.d, x.d)
          if (c != 0) c else java.lang.Long.compare(x.id, y.id)
        }))
    val bHeaps = mkHeaps(nq)
    val aHeaps = if (bothSides) mkHeaps(a.rows) else null
    @inline def push(h: java.util.PriorityQueue[Cand], id: Long, d: Double): Unit = {
      if (h.size < k) h.add(Cand(id, d))
      else {
        val worst = h.peek()
        if (d < worst.d || (d == worst.d && id < worst.id)) { h.poll(); h.add(Cand(id, d)) }
      }
    }
    val chunk = math.max(1, math.min(a.rows,
      math.min(8192, 4000000 / math.max(1, nq))))
    val scores = new Array[Float](nq * chunk)
    var c0 = 0
    while (c0 < a.rows) {
      val cols = math.min(chunk, a.rows - c0)
      // C (nq x cols, col-major) = B^T (nq x dim) * A-chunk (dim x cols)
      blas.sgemm("T", "N", nq, cols, dim, 1.0f,
        b.mat, 0, dim, a.mat, c0 * dim, dim, 0.0f, scores, 0, nq)
      var c = 0
      while (c < cols) {
        val aRow = c0 + c
        val aId = a.ids(aRow)
        val aNorm = a.sqrtNorms(aRow)
        var r = 0
        while (r < nq) {
          val bId = b.ids(r)
          if (aId != bId) {
            val dot = scores(c * nq + r).toDouble
            val bNorm = b.sqrtNorms(r)
            val d = (mcode: @annotation.switch) match {
              case 0 =>
                val denom = aNorm * bNorm
                if (denom == 0.0) 1.0 else 1.0 - dot / denom
              case 1 =>
                val sq = aNorm * aNorm + bNorm * bNorm - 2.0 * dot
                math.sqrt(math.max(sq, 0.0))
              case _ => -dot
            }
            push(bHeaps(r), aId, d)
            if (bothSides) push(aHeaps(aRow), bId, d)
          }
          r += 1
        }
        c += 1
      }
      c0 += cols
    }
    def drain(heaps: Array[java.util.PriorityQueue[Cand]],
              ids: Array[Long]): Iterator[(Long, Long, Double)] =
      heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
        val out = new ArrayBuffer[(Long, Long, Double)](h.size)
        while (!h.isEmpty) { val e = h.poll(); out += ((ids(i), e.id, e.d)) }
        out
      }
    if (bothSides) drain(bHeaps, b.ids) ++ drain(aHeaps, a.ids)
    else drain(bHeaps, b.ids)
  }

  // ----------------------------------------------------- durable slab sidecar

  /** Persist a packed corpus as a binary slab sidecar: one java-serialized
    * file per partition plus a `slabs.json` meta. [[loadSlabs]] reopens it
    * with ONE task per partition reading ONE file — no corpus scan, no
    * decode, no shuffle — so a session restart never repeats the pack job
    * (the reference's mmap store reopens the same way,
    * parallel_search.py:427-516; the parquet-side analog is
    * Ann.writePartitionedByCell's directory layout). Crash-safe temp-dir +
    * rename swap; meta is written inside the temp dir LAST, so a
    * half-written sidecar is never loadable. */
  def saveSlabs[I](pc: PackedCorpus[I], dir: String): Unit =
    writeSlabDir(pc.blocks, pc.dim, dir)

  /** [[saveSlabs]] for a cell-partitioned corpus: partition i = cell i is
    * preserved through the sidecar (file i reloads as partition i), and
    * the coarse-quantizer model rides along as a ModelStore sidecar at
    * `dir/model` — so probe routing after reopen is identical. */
  def saveIvfSlabs[I](pi: PackedIvfCorpus[I], dir: String): Unit = {
    writeSlabDir(pi.blocks, pi.dim, dir)
    val spark = org.apache.spark.sql.SparkSession.active
    ModelStore.saveIvf(spark, pi.model, s"$dir/model")
  }

  def slabsExist(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "slabs.json")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def ivfSlabsExist(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    slabsExist(spark, dir) && ModelStore.exists(s"$dir/model")

  /** Reopen a [[saveSlabs]] sidecar: one task per partition, each reading
    * exactly its own slab file — zero Exchange, zero corpus-format decode.
    * The result is persisted and materialized like a fresh [[pack]]. */
  def loadSlabs[I: ClassTag](spark: org.apache.spark.sql.SparkSession, dir: String,
                             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedCorpus[I] = {
    val (blocks, dim) = readSlabDir[Block[I]](spark, dir, storage)
    new PackedCorpus(blocks, dim)
  }

  /** Reopen a [[saveIvfSlabs]] sidecar: partition i = cell i positionally
    * (exactly what [[searchIvf]]'s probe routing keys on), model from the
    * ModelStore sidecar. */
  def loadIvfSlabs[I: ClassTag](spark: org.apache.spark.sql.SparkSession, dir: String,
                                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedIvfCorpus[I] = {
    val model = ModelStore.loadIvf(spark, s"$dir/model")
    val (blocks, dim) = readSlabDir[Block[I]](spark, dir, storage)
    require(blocks.getNumPartitions == model.numCells,
      s"IVF slab sidecar at $dir has ${blocks.getNumPartitions} partitions " +
        s"but the model has ${model.numCells} cells")
    new PackedIvfCorpus(blocks, dim, model)
  }

  /** Hadoop conf as a plain serializable map (the conf object itself is
    * not serializable and Spark's wrapper is private) — rebuilt per task
    * so slab IO honors the session's filesystem settings (s3a creds...). */
  private def confMap(sc: org.apache.spark.SparkContext): Map[String, String] = {
    val it = sc.hadoopConfiguration.iterator()
    val m = scala.collection.mutable.Map[String, String]()
    while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue }
    m.toMap
  }

  private def mkConf(m: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Generic over the slab element (float [[Block]]s here, PQ code blocks
    * in [[PackedPq]]) — the meta's `dim` field stores whatever per-row
    * width the caller wants back from [[readSlabDir]]. */
  private[operators] def writeSlabDir[T: ClassTag](blocks: RDD[T], dim: Int, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val sc = blocks.sparkContext
    val cm = confMap(sc)
    val target = new Path(dir)
    val tmpDir = dir + "_tmp"
    val tmp = new Path(tmpDir)
    val fs = target.getFileSystem(sc.hadoopConfiguration)
    fs.delete(tmp, true)
    fs.mkdirs(tmp)
    val n = blocks.getNumPartitions
    blocks.mapPartitionsWithIndex { (i, it) =>
      // attempt-unique temp name + rename: a speculative or retried
      // attempt can run concurrently with the original, and
      // create(overwrite) is not atomic on every filesystem — two
      // attempts interleaving into ONE file could leave a truncated
      // slab. Each attempt writes its own complete file, then renames
      // into place; the rename loser (dest already present, or
      // overwritten atomically on POSIX-rename filesystems) just drops
      // its temp — either way part-$i.slab is one attempt's full bytes.
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val fsT = new Path(tmpDir).getFileSystem(mkConf(cm))
      val tmpP = new Path(s"$tmpDir/part-$i.slab.attempt-$attempt")
      val out = fsT.create(tmpP, true)
      val oos = new java.io.ObjectOutputStream(
        new java.io.BufferedOutputStream(out, 1 << 20))
      try oos.writeObject(it.toArray) finally oos.close()
      if (!fsT.rename(tmpP, new Path(s"$tmpDir/part-$i.slab")))
        fsT.delete(tmpP, false) // another attempt committed first
      Iterator.single(i)
    }.count()
    val meta = fs.create(new Path(tmp, "slabs.json"), true)
    try meta.write(s"""{"numPartitions": $n, "dim": $dim}""".getBytes("UTF-8"))
    finally meta.close()
    val old = new Path(dir + "_old")
    fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    fs.delete(old, true)
  }

  private[operators] def readSlabDir[T: ClassTag](spark: org.apache.spark.sql.SparkSession,
                                                  dir: String, storage: StorageLevel): (RDD[T], Int) = {
    import org.apache.hadoop.fs.Path
    val sc = spark.sparkContext
    val fs = new Path(dir).getFileSystem(sc.hadoopConfiguration)
    val metaIn = fs.open(new Path(dir, "slabs.json"))
    val raw = try scala.io.Source.fromInputStream(metaIn, "UTF-8").mkString
      finally metaIn.close()
    def intField(k: String): Int =
      s""""$k"\\s*:\\s*([0-9]+)""".r.findFirstMatchIn(raw)
        .getOrElse(throw new IllegalArgumentException(
          s"slab sidecar meta at $dir missing $k: $raw"))
        .group(1).toInt
    val n = intField("numPartitions")
    val dim = intField("dim")
    if (n == 0) {
      // a zero-partition corpus round-trips as a zero-partition corpus
      // (parallelize requires a positive slice count)
      return (sc.emptyRDD[T].setName(residentName), dim)
    }
    val cm = confMap(sc)
    val blocks: RDD[T] = sc.parallelize(0 until n, n)
      .mapPartitionsWithIndex { (i, _) =>
        val p = new Path(s"$dir/part-$i.slab")
        val ois = new java.io.ObjectInputStream(
          new java.io.BufferedInputStream(p.getFileSystem(mkConf(cm)).open(p), 1 << 20))
        val arr = try ois.readObject().asInstanceOf[Array[T]]
          finally ois.close()
        arr.iterator
      }.setName(residentName).persist(storage)
    blocks.count()
    (blocks, dim)
  }

  /** Score one block against the query batch with chunked sgemm; bounded
    * heaps keep k per query. Emits (queryIndex, neighborId, dist). */
  private[operators] def searchBlock[I: Ordering](b: Block[I], queries: Array[(Long, Array[Float])],
                                                  k: Int, metric: String): Array[(Int, I, Double)] = {
    val idOrd = implicitly[Ordering[I]]
    val nq = queries.length
    val dim = b.dim
    val mcode = metric match {
      case "cosine" => 0; case "l2" => 1; case "ip" => 2
      case other => throw new IllegalArgumentException(s"metric $other")
    }
    // queries packed row-major [nq][dim] == column-major dim x nq
    val qMat = new Array[Float](nq * dim)
    val qSqrtNorm = new Array[Double](nq)
    var qi = 0
    while (qi < nq) {
      val qv = queries(qi)._2
      require(qv.length == dim,
        s"query dim ${qv.length} != corpus dim $dim")
      System.arraycopy(qv, 0, qMat, qi * dim, dim)
      var s = 0.0; var i = 0
      while (i < dim) { s += qv(i).toDouble * qv(i); i += 1 }
      qSqrtNorm(qi) = math.sqrt(s)
      qi += 1
    }
    // one bounded max-heap per query, worst candidate on top; exact-tie
    // survival matches the composed join's (dist, id) order
    final case class Cand(row: Int, d: Double)
    val bids = b.ids
    @inline def idLt(a: Int, b: Int): Boolean = idOrd.lt(bids(a), bids(b))
    // heap head = the candidate to EVICT first = largest dist, then
    // largest id among exact ties (so the kept set matches the composed
    // join's (dist, id) ascending order — same convention as KnnTopKExec)
    val heaps = Array.fill(nq)(
      new java.util.PriorityQueue[Cand](k + 1,
        (x: Cand, y: Cand) => {
          val c = java.lang.Double.compare(y.d, x.d)
          if (c != 0) c else { if (idLt(y.row, x.row)) -1 else if (idLt(x.row, y.row)) 1 else 0 }
        }))
    @inline def push(j: Int, row: Int, d: Double): Unit = {
      val h = heaps(j)
      if (h.size < k) h.add(Cand(row, d))
      else {
        val worst = h.peek()
        if (d < worst.d || (d == worst.d && idLt(row, worst.row))) {
          h.poll(); h.add(Cand(row, d))
        }
      }
    }
    // chunk the corpus rows so the score buffer stays cache-sized AND
    // bounded (~16 MB) for large query batches — nq*chunk at a fixed
    // 8192 overflows Int past ~262k queries
    val chunk = math.max(1, math.min(b.rows,
      math.min(8192, 4000000 / math.max(1, nq))))
    val scores = new Array[Float](nq * chunk)
    var r0 = 0
    while (r0 < b.rows) {
      val rows = math.min(chunk, b.rows - r0)
      // C (nq x rows, col-major) = Q^T (nq x dim) * corpusChunk (dim x rows)
      blas.sgemm("T", "N", nq, rows, dim, 1.0f,
        qMat, 0, dim, b.mat, r0 * dim, dim, 0.0f, scores, 0, nq)
      var r = 0
      while (r < rows) {
        val cNorm = b.sqrtNorms(r0 + r)
        var j = 0
        while (j < nq) {
          val dot = scores(r * nq + j).toDouble
          val d = (mcode: @annotation.switch) match {
            case 0 =>
              val denom = cNorm * qSqrtNorm(j)
              if (denom == 0.0) 1.0 else 1.0 - dot / denom
            case 1 =>
              val sq = cNorm * cNorm + qSqrtNorm(j) * qSqrtNorm(j) - 2.0 * dot
              math.sqrt(math.max(sq, 0.0))
            case _ => -dot
          }
          push(j, r0 + r, d)
          j += 1
        }
        r += 1
      }
      r0 += rows
    }
    val out = new ArrayBuffer[(Int, I, Double)](nq * k)
    var j = 0
    while (j < nq) {
      val h = heaps(j)
      while (!h.isEmpty) { val e = h.poll(); out += ((j, b.ids(e.row), e.d)) }
      j += 1
    }
    out.toArray
  }
}
