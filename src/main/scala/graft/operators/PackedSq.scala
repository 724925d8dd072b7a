package graft.operators

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Resident scalar-quantized (SQ8) serving layer — the middle rung of the
  * packed-index memory ladder:
  *
  *   [[PackedKnn]]  raw float32   4·dim bytes/row  exact
  *   [[PackedSq]]   uint8 per dim    dim bytes/row  ~exact (decode error)
  *   [[PackedPq]]   PQ codes           m bytes/row  coarse, needs rerank
  *
  * The reference's scalar quantizer searches decoded codes the same way
  * (quantization.py:119-174: encode clips+truncates to uint8, search
  * decodes and measures in float space); this is that operator rebuilt for
  * a corpus that lives as one byte slab per IVF cell across executors —
  * 4× less resident memory than the float tier with near-exact ranking,
  * and unlike PQ the distances are usually good enough to serve unreranked.
  *
  * Distributed shape: by default one partition per IVF cell, each
  * holding one cell-tagged byte slab. A query batch ships per-query
  * per-dim lookup tables (dim×256 doubles) to the partitions holding
  * its probed cells only; inside a task, probe pruning continues at
  * BLOCK granularity, so the layout also supports GROUPING several
  * cells into one partition (`numParts` on the pack entry points) for
  * cell-heavy deployments where tens of thousands of bounded cells
  * would mean tens of thousands of tasks per probe fan-out. Grouping
  * is an explicit knob, not the default — MEASURED (r12 sweep):
  * rows-sized grouping (~25K rows/task) lost latency at every preset
  * shape because the runJob scheduling floor is per-JOB, not per-task
  * (probed tasks launch in parallel on idle cores), so
  * fewer-but-bigger tasks only under-parallelize the byte scan
  * (100K: 2.2 ms/q at 4 grouped partitions vs 1.7 at 8
  * cell-partitions).
  *
  * Numeric contract: with nProbe = numCells, [[searchSq]] is ROW-IDENTICAL
  * to [[Quantization.sqSearch]] on the same [[Quantization.SqModel]]: the
  * LUT entries are precisely the per-dimension products/squares the
  * codegen distance kernels (functions/VectorExpressions.scala) compute on
  * the decoded arrays — v̂_i(c) = c/255·scale_i + min_i, the query
  * round-tripped through encode∘decode exactly as `sqSearch` does — and
  * both sides accumulate doubles in ascending-dimension order, so every
  * distance is bit-identical and the (dist, id) total order matches the
  * TopKAggregator cut. q130 hash-checks the packed tier against the same
  * DuckDB re-derivation as q17.
  */
object PackedSq {

  /** One IVF cell's codes: row r occupies bytes [r*dim, (r+1)*dim).
    * `cell` tags the block so a partition holding several cells can
    * probe-prune at block granularity. */
  final case class SqBlock[I](ids: Array[I], codes: Array[Byte], dim: Int,
                              cell: Int) {
    def rows: Int = ids.length
  }

  /** Deterministic contiguous cell→partition map — a pure function of
    * (numCells, numParts), so appended generations and reopened sidecars
    * reconstruct the identical layout with no stored table. */
  private[graft] def partOf(cell: Int, numCells: Int, numParts: Int): Int =
    (cell.toLong * numParts / numCells).toInt

  private final class CellGroupPartitioner(numCells: Int, parts: Int)
      extends org.apache.spark.Partitioner {
    def numPartitions: Int = parts
    def getPartition(key: Any): Int =
      partOf(key.asInstanceOf[Int], numCells, parts)
  }

  /** A packed, persisted SQ-code corpus. `unpersist()` releases executor
    * memory; chained handles (append) release every generation. */
  final class PackedSqCorpus[I](val blocks: RDD[SqBlock[I]],
                                val ivf: Ann.IvfModel,
                                val sq: Quantization.SqModel,
                                chain: Seq[RDD[_]],
                                /** Append generations (1 = freshly packed/
                                  * compacted) — the driver-side
                                  * fragmentation gauge; removes prune in
                                  * place and carry the count through. */
                                val generations: Int = 1) {
    def dim: Int = sq.mins.length
    /** Partition holding `cell`'s slab (the contiguous grouping map). */
    private[graft] def partOf(cell: Int): Int =
      PackedSq.partOf(cell, ivf.numCells, blocks.getNumPartitions)
    private[PackedSq] def parents: Seq[RDD[_]] =
      if (chain.isEmpty) Seq(blocks) else chain
    def unpersist(blocking: Boolean = false): Unit =
      parents.foreach(_.unpersist(blocking))
  }

  /** Pack a corpus into resident per-cell SQ slabs: one codegen pass
    * computes (cell id, uint8 codes), one shuffle routes rows to their
    * cell partition, each partition packs one byte slab. Cell routing uses
    * the RAW vector (like [[PackedPq.packIvfPq]]) so probe pruning agrees
    * with [[Ann.ivfSearch]]'s geometry; the codes themselves are
    * metric-free and searchable under cosine / l2 / ip. */
  def packIvfSq(corpus: DataFrame, ivf: Ann.IvfModel, sq: Quantization.SqModel,
                idCol: String = "id", vecCol: String = "vec",
                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                /** <= 0 = one partition per cell (the measured-fastest
                  * serving layout); explicit values group cells for
                  * cell-heavy deployments. */
                numParts: Int = 0): PackedSqCorpus[Long] =
    packBy[Long](corpus, ivf, sq, idCol, "long", vecCol, storage,
      numPartsOverride = if (numParts > 0) Some(numParts) else None)(_.getLong(0))

  /** [[packIvfSq]] keyed by a natural string id (the client facade). */
  def packIvfSqStr(corpus: DataFrame, ivf: Ann.IvfModel, sq: Quantization.SqModel,
                   idCol: String = "id", vecCol: String = "vec",
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                   numParts: Int = 0): PackedSqCorpus[String] =
    packBy[String](corpus, ivf, sq, idCol, "string", vecCol, storage,
      numPartsOverride = if (numParts > 0) Some(numParts) else None)(
      _.getUTF8String(0).toString)

  /** Append a batch without repacking standing slabs ([[PackedPq.appendIvfPq]]'s
    * zip-generations contract: the batch packs onto the standing
    * partition layout, so generations zip partition-wise). */
  def appendIvfSq(pi: PackedSqCorpus[Long], batch: DataFrame,
                  idCol: String = "id", vecCol: String = "vec",
                  storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedSqCorpus[Long] =
    appendBy[Long](pi, batch, idCol, "long", vecCol, storage)(_.getLong(0))

  /** [[appendIvfSq]] keyed by a natural string id. */
  def appendIvfSqStr(pi: PackedSqCorpus[String], batch: DataFrame,
                     idCol: String = "id", vecCol: String = "vec",
                     storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedSqCorpus[String] =
    appendBy[String](pi, batch, idCol, "string", vecCol, storage)(
      _.getUTF8String(0).toString)

  private def appendBy[I: ClassTag](pi: PackedSqCorpus[I], batch: DataFrame,
                                    idCol: String, idType: String, vecCol: String,
                                    storage: StorageLevel)(
      getId: org.apache.spark.sql.catalyst.InternalRow => I): PackedSqCorpus[I] = {
    val add = packBy[I](batch, pi.ivf, pi.sq, idCol, idType, vecCol, storage,
      numPartsOverride = Some(pi.blocks.getNumPartitions))(getId)
    val zipped = pi.blocks.zipPartitions(add.blocks,
      preservesPartitioning = true)((a, b) => a ++ b)
    new PackedSqCorpus(zipped, pi.ivf, pi.sq, pi.parents ++ add.parents,
      generations = pi.generations + 1)
  }

  /** Tombstone removal ([[PackedPq.remove]]'s contract): miss blocks pass
    * through by reference, hit blocks rebuild minus the dead rows, no
    * per-candidate check ever reaches the scan hot loop. */
  def remove[I: ClassTag](pi: PackedSqCorpus[I], ids: Set[I],
                          storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedSqCorpus[I] = {
    if (ids.isEmpty) return pi
    val bc = pi.blocks.sparkContext.broadcast(ids)
    val pruned = pi.blocks.mapPartitions(
      _.flatMap(pruneBlock(bc.value, _)), preservesPartitioning = true)
      .setName(PackedKnn.residentName).persist(storage)
    pruned.count()
    new PackedSqCorpus(pruned, pi.ivf, pi.sq, Nil,
      generations = pi.generations)
  }

  /** Fold each cell's append-generation chain back into one slab — no
    * shuffle, no partition change. */
  def compactIvfSq[I: ClassTag](pi: PackedSqCorpus[I],
                                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedSqCorpus[I] = {
    val merged = pi.blocks.mapPartitions(mergeBlocks[I], preservesPartitioning = true)
      .setName(PackedKnn.residentName).persist(storage)
    merged.count()
    new PackedSqCorpus(merged, pi.ivf, pi.sq, Nil)
  }

  private def mergeBlocks[I: ClassTag](it: Iterator[SqBlock[I]]): Iterator[SqBlock[I]] = {
    val bs = it.toArray
    if (bs.length <= 1) bs.iterator
    else bs.groupBy(_.cell).toArray.sortBy(_._1).iterator.map {
      case (_, Array(only)) => only
      case (cell, cbs) =>
        val d = cbs.head.dim
        require(cbs.forall(_.dim == d),
          s"PackedSq.compact: mixed dims ${cbs.map(_.dim).distinct.mkString(",")}")
        PackedKnn.requireSlabFits(cbs.map(_.rows.toLong).sum, d, "PackedSq.compact")
        val n = cbs.map(_.rows).sum
        val ids = new Array[I](n)
        val codes = new Array[Byte](n * d)
        var off = 0
        for (b <- cbs) {
          System.arraycopy(b.ids, 0, ids, off, b.rows)
          System.arraycopy(b.codes, 0, codes, off * d, b.rows * d)
          off += b.rows
        }
        SqBlock(ids, codes, d, cell)
    }
  }

  private def pruneBlock[I: ClassTag](dead: Set[I], b: SqBlock[I]): Iterator[SqBlock[I]] = {
    var hits = 0
    var r = 0
    while (r < b.ids.length) { if (dead.contains(b.ids(r))) hits += 1; r += 1 }
    if (hits == 0) Iterator.single(b)
    else if (hits == b.rows) Iterator.empty
    else {
      val n = b.rows - hits
      val d = b.dim
      val ids2 = new Array[I](n)
      val codes2 = new Array[Byte](n * d)
      var j = 0
      r = 0
      while (r < b.ids.length) {
        if (!dead.contains(b.ids(r))) {
          ids2(j) = b.ids(r)
          System.arraycopy(b.codes, r * d, codes2, j * d, d)
          j += 1
        }
        r += 1
      }
      Iterator.single(SqBlock(ids2, codes2, d, b.cell))
    }
  }

  private def packBy[I: ClassTag](corpus: DataFrame, ivf: Ann.IvfModel,
                                  sq: Quantization.SqModel, idCol: String,
                                  idType: String, vecCol: String,
                                  storage: StorageLevel,
                                  /** Appends must reuse the standing
                                    * corpus's partition count so the
                                    * generations zip partition-wise. */
                                  numPartsOverride: Option[Int] = None)(
      getId: org.apache.spark.sql.catalyst.InternalRow => I): PackedSqCorpus[I] = {
    val dim = sq.mins.length
    val numParts = numPartsOverride.getOrElse(ivf.numCells)
    require(numParts >= 1 && numParts <= ivf.numCells,
      s"numParts $numParts must be in [1, numCells=${ivf.numCells}]")
    val src = corpus
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast(idType),
        // fail loud on a ragged corpus BEFORE the encode indexes past the
        // end of a short vector
        when(size(col(vecCol)) === lit(dim), col(vecCol))
          .otherwise(raise_error(concat(lit(s"PackedSq.pack: vector dim "),
            size(col(vecCol)).cast("string"), lit(s" != model dim $dim")))).as("_v"))
      .select(col(idCol), Ann.cellId(ivf)(col("_v")).as("_cell"),
        Quantization.sqEncode(sq)(col("_v")).as("_code"))
    val keyed: RDD[(Int, (I, Array[Byte]))] =
      src.queryExecution.toRdd.mapPartitions { iter =>
        iter.map { row =>
          val arr = row.getArray(2)
          val code = new Array[Byte](dim)
          var i = 0
          while (i < dim) { code(i) = (arr.getInt(i) & 0xFF).toByte; i += 1 }
          (row.getInt(1), (getId(row), code))
        }
      }
    val packed: RDD[SqBlock[I]] = keyed
      .partitionBy(new CellGroupPartitioner(ivf.numCells, numParts))
      .mapPartitions { iter =>
        // one slab PER CELL within the partition: block-level probe
        // pruning needs cell-pure slabs
        val perCell = scala.collection.mutable.LinkedHashMap
          .empty[Int, (ArrayBuffer[I], ArrayBuffer[Array[Byte]])]
        while (iter.hasNext) {
          val (cell, (id, c)) = iter.next()
          val e = perCell.getOrElseUpdate(cell,
            (new ArrayBuffer[I](), new ArrayBuffer[Array[Byte]]()))
          e._1 += id; e._2 += c
        }
        perCell.toArray.sortBy(_._1).iterator.map { case (cell, (ids, codes)) =>
          PackedKnn.requireSlabFits(ids.length.toLong, dim, "PackedSq.pack")
          val flat = new Array[Byte](ids.length * dim)
          var r = 0
          while (r < ids.length) {
            System.arraycopy(codes(r), 0, flat, r * dim, dim); r += 1
          }
          SqBlock(ids.toArray, flat, dim, cell)
        }
      }.setName(PackedKnn.residentName).persist(storage)
    packed.count()
    new PackedSqCorpus(packed, ivf, sq, Nil)
  }

  // ------------------------------------------------------------- search

  /** Per-executor cache of each block's decoded-space row norms
    * (cosine's corpus-side Σ x̂², accumulated over sqLut entries in
    * ascending-dim order — BIT-IDENTICAL to the kernel's former inline
    * `na` loop, so [[searchSq]]'s decoded-space contract vs
    * [[Quantization.sqSearch]] is unchanged). Weakly keyed by the block
    * (case-class equality on array fields is reference equality), so an
    * unpersisted block's norms are collectable with it; the sqLut is a
    * pure function of the corpus's one quantizer, so a block can never
    * pair with two different tables. */
  private val normCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SqBlock[_], Array[Double]]())

  private def blockNorms(blk: SqBlock[_], sqLut: Array[Double]): Array[Double] = {
    val cached = normCache.get(blk)
    if (cached != null) return cached
    val bd = blk.dim; val n = blk.rows; val codes = blk.codes
    val out = new Array[Double](n)
    var r = 0
    while (r < n) {
      val base = r * bd
      var na = 0.0; var i = 0
      while (i < bd) { na += sqLut((i << 8) | (codes(base + i) & 0xFF)); i += 1 }
      out(r) = na
      r += 1
    }
    normCache.put(blk, out)
    out
  }

  /** Query round-trip through the quantizer, replicating
    * [[Quantization.sqEncode]]∘[[Quantization.sqDecode]]'s Column
    * arithmetic exactly: clip to [0,255], floor-truncate, decode
    * c/255·scale + min — all in doubles. */
  private def roundtrip(sq: Quantization.SqModel, qv: Array[Float]): Array[Double] = {
    Array.tabulate(qv.length) { i =>
      val c = math.floor(math.min(math.max(
        (qv(i).toDouble - sq.mins(i)) / sq.scales(i) * 255.0, 0.0), 255.0))
      c / 255.0 * sq.scales(i) + sq.mins(i)
    }
  }

  /** Decoded corpus value for (dim i, code c). */
  @inline private def dec(sq: Quantization.SqModel, i: Int, c: Int): Double =
    c / 255.0 * sq.scales(i) + sq.mins(i)

  /** Resident SQ scan: per query, the k smallest decoded-space distances
    * over the `nProbe` probed cells, ties by id — with nProbe = numCells
    * this is row-identical to [[Quantization.sqSearch]] (bit-equal
    * distances, same (dist, id) cut). Returns, per query id,
    * (neighbor_id, dist) sorted by (dist, id). */
  def searchSq[I: ClassTag: Ordering](pi: PackedSqCorpus[I],
                                      queries: Array[(Long, Array[Float])],
                                      k: Int, nProbe: Int,
                                      metric: String = "cosine"): Array[(Long, Array[(I, Double)])] = {
    require(queries.nonEmpty, "empty query batch")
    require(metric == "cosine" || metric == "l2" || metric == "ip",
      s"unknown metric: $metric")
    val dim = pi.dim
    queries.foreach { case (qid, qv) =>
      require(qv.length == dim, s"query $qid dim ${qv.length} != model dim $dim") }
    val sq = pi.sq
    val cents = pi.ivf.centroids
    val byCell: Map[Int, Array[Int]] = queries.indices
      .flatMap(qi => PackedKnn.driverProbes(cents, queries(qi)._2, nProbe).map(c => (c, qi)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap
    // per-dim decode tables. The distance kernels compute, per element,
    //   cosine: dot += x*y; na += x*x; nb += y*y   (x = corpus, y = query)
    //   l2:     s += (x-y)^2
    //   ip:     s += x*y, negated at the end
    // so per (dim, code) we pre-tabulate exactly those products; the scan
    // then sums the SAME doubles in the SAME ascending-dim order.
    //
    // The tables are built EXECUTOR-SIDE, per task, on demand: a dim×256
    // double LUT is 256 KB, so a 20-query batch driver-built would ship
    // a ~5 MB task binary on every job (measured: the serialize/broadcast
    // cost alone was ~1.5 ms/q of the exact tier's latency) — the task
    // instead receives the round-tripped queries (dim doubles each) plus
    // the 2-vector quantizer model and tabulates only the LUTs its own
    // blocks' query sets need (~33k multiplies per table, microseconds).
    // Same inputs, same arithmetic, same doubles — the bit-exactness
    // contract vs Quantization.sqSearch is untouched.
    val qhat: Array[Array[Double]] = queries.map(q => roundtrip(sq, q._2))
    // query norms Σ y*y, ascending-dim like the kernel's nb accumulator
    val qNorm: Array[Double] =
      if (metric == "cosine") qhat.map { qd =>
        var s = 0.0; var i = 0
        while (i < dim) { s += qd(i) * qd(i); i += 1 }
        s
      } else null
    val cosine = metric == "cosine"
    val l2 = metric == "l2"
    // tasks launch per PARTITION holding >= 1 probed cell; pruning
    // continues at block granularity inside the task
    val partIds = byCell.keys.map(pi.partOf).toArray.distinct.sorted
    val idOrd = implicitly[Ordering[I]]
    val sc = pi.blocks.sparkContext
    val partials: Array[Array[(Int, I, Double)]] = sc.runJob(pi.blocks,
      (ctx: org.apache.spark.TaskContext, it: Iterator[SqBlock[I]]) => {
        // heaps keyed by GLOBAL query index — one partition may hold
        // several probed cells with different query sets
        val heapMap = new java.util.HashMap[Int, java.util.PriorityQueue[(I, Double)]]()
        def heapFor(qg: Int): java.util.PriorityQueue[(I, Double)] = {
          var h = heapMap.get(qg)
          if (h == null) {
            h = new java.util.PriorityQueue[(I, Double)](
              k + 1, (a: (I, Double), b: (I, Double)) => {
                val c = java.lang.Double.compare(b._2, a._2)
                if (c != 0) c else idOrd.compare(b._1, a._1)
              })
            heapMap.put(qg, h)
          }
          h
        }
        // executor-side tables (see the header comment): corpus x*x once
        // per task, per-query main LUTs on demand for THIS task's queries
        lazy val sqLut: Array[Double] = Array.tabulate(dim * 256)(j => {
          val x = dec(sq, j >> 8, j & 0xFF); x * x
        })
        val lutCache = new Array[Array[Double]](qhat.length)
        def lutFor(qg: Int): Array[Double] = {
          if (lutCache(qg) == null) {
            val qd = qhat(qg)
            lutCache(qg) = Array.tabulate(dim * 256) { j =>
              val i = j >> 8; val x = dec(sq, i, j & 0xFF)
              if (l2) { val d = x - qd(i); d * d } else x * qd(i)
            }
          }
          lutCache(qg)
        }
        {
          while (it.hasNext) {
            val blk = it.next()
            val qIdxs = byCell.getOrElse(blk.cell, null)
            if (qIdxs == null) () // cell nobody probed: skip the slab
            else {
            val codes = blk.codes; val bd = blk.dim; val n = blk.rows
            // corpus-side norms are query-independent: one pass per block
            // (cached per block across query batches) instead of a second
            // LUT lookup on every (query, row, dim) — the cosine scan
            // drops to ONE lookup per element, ~2x on batch traffic
            val rowNorms = if (cosine) blockNorms(blk, sqLut) else null
            var qi = 0
            while (qi < qIdxs.length) {
              val lut = lutFor(qIdxs(qi))
              val nb = if (cosine) qNorm(qIdxs(qi)) else 0.0
              val heap = heapFor(qIdxs(qi))
              var r = 0
              while (r < n) {
                val base = r * bd
                var d = 0.0
                if (cosine) {
                  var dot = 0.0; var i = 0
                  while (i < bd) {
                    dot += lut((i << 8) | (codes(base + i) & 0xFF)); i += 1
                  }
                  val na = rowNorms(r)
                  d = if (na == 0.0 || nb == 0.0) 1.0
                      else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
                } else {
                  var s = 0.0; var i = 0
                  while (i < bd) {
                    s += lut((i << 8) | (codes(base + i) & 0xFF)); i += 1
                  }
                  d = if (l2) math.sqrt(s) else -s
                }
                val id = blk.ids(r)
                if (heap.size < k) heap.add((id, d))
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
          }
          val out = new ArrayBuffer[(Int, I, Double)]()
          heapMap.forEach((qg, h) => h.forEach(c => out += ((qg, c._1, c._2))))
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

  /** Integer-domain ADC twin of [[searchSq]] — the byte tier made to earn
    * LATENCY, not just footprint. [[searchSq]]'s hot loop is a per-element
    * double gather from a dim×256 LUT (256 KB at dim 128 — L2-resident,
    * one dependent load per element, vectorization-hostile); here the
    * decode algebra is refactored so the per-element work is a pure
    * uint8×int multiply-add the JIT auto-vectorizes:
    *
    *   x̂_i(c) = c·a_i + m_i  (a_i = scale_i/255)
    *   dot(x̂, ŷ) = Σ c_i·(a_i·ŷ_i) + Σ m_i·ŷ_i ≈ β·Σ c_i·w_i + C
    *
    * with the per-dim multipliers t_i = a_i·ŷ_i quantized once per query
    * to ints w_i = round(t_i/β), β = max|t_i|/Q. Every metric folds onto
    * the same int dot S = Σ c_i·w_i: cosine = 1 − (βS+C)/(√na·√nb), l2 =
    * √(na − 2(βS+C) + nb), ip = −(βS+C) — the corpus-side norms na are
    * the SAME query-independent [[blockNorms]] the cosine scan already
    * caches per block.
    *
    * Contract: APPROXIMATE. Query-side quantization adds |ε| ≤
    * 255·dim·β/2 per dot (Q is sized so the int32 accumulator is exact:
    * Q = min(32767, Int.MaxValue/(255·dim) − 1) — at dim 128 that is
    * ~15 bits of multiplier precision, relative dot error ~1e-4), so
    * rankings can flip near ties; use [[searchSq]] where the decoded-space
    * bit-exactness contract matters (q130's oracle). Recall@k at the
    * sweep shapes is measured unchanged (Sweep sq_int_recall10). */
  def searchSqInt[I: ClassTag: Ordering](pi: PackedSqCorpus[I],
                                         queries: Array[(Long, Array[Float])],
                                         k: Int, nProbe: Int,
                                         metric: String = "cosine"): Array[(Long, Array[(I, Double)])] = {
    require(queries.nonEmpty, "empty query batch")
    require(metric == "cosine" || metric == "l2" || metric == "ip",
      s"unknown metric: $metric")
    val dim = pi.dim
    queries.foreach { case (qid, qv) =>
      require(qv.length == dim, s"query $qid dim ${qv.length} != model dim $dim") }
    val sq = pi.sq
    val cents = pi.ivf.centroids
    val byCell: Map[Int, Array[Int]] = queries.indices
      .flatMap(qi => PackedKnn.driverProbes(cents, queries(qi)._2, nProbe).map(c => (c, qi)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap
    val qhat: Array[Array[Double]] = queries.map(q => roundtrip(sq, q._2))
    val cosine = metric == "cosine"
    val l2 = metric == "l2"
    // na = Σ x̂² per row, needed by cosine AND l2 — the same per-block
    // cached table as the exact kernel (Σ x̂² is metric-free); built
    // EXECUTOR-SIDE like the exact kernel's tables (256 KB of doubles
    // has no business riding the task binary when the 2-vector model
    // rebuilds it in microseconds)
    val needNorms = metric != "ip"
    // int32-exact accumulation bound: |S| <= 255 * dim * Q
    val qCap = math.max(1, math.min(32767, Int.MaxValue / (255 * dim) - 1))
    // per-query quantized multipliers + affine rebase (beta, C, nb)
    val ws = new Array[Array[Int]](queries.length)
    val betas = new Array[Double](queries.length)
    val cAdds = new Array[Double](queries.length)
    val qNorm = new Array[Double](queries.length)
    var qi0 = 0
    while (qi0 < queries.length) {
      val qd = qhat(qi0)
      val t = new Array[Double](dim)
      var c0 = 0.0; var nb = 0.0; var tMax = 0.0
      var i = 0
      while (i < dim) {
        t(i) = sq.scales(i) / 255.0 * qd(i)
        c0 += sq.mins(i) * qd(i)
        nb += qd(i) * qd(i)
        val a = math.abs(t(i)); if (a > tMax) tMax = a
        i += 1
      }
      val beta = if (tMax == 0.0) 1.0 else tMax / qCap
      val w = new Array[Int](dim)
      i = 0
      while (i < dim) { w(i) = math.round(t(i) / beta).toInt; i += 1 }
      ws(qi0) = w; betas(qi0) = beta; cAdds(qi0) = c0; qNorm(qi0) = nb
      qi0 += 1
    }
    val qSqrt = qNorm.map(math.sqrt)
    // partition-level task pruning + block-level cell pruning (searchSq's
    // layout contract)
    val partIds = byCell.keys.map(pi.partOf).toArray.distinct.sorted
    val idOrd = implicitly[Ordering[I]]
    val sc = pi.blocks.sparkContext
    val partials: Array[Array[(Int, I, Double)]] = sc.runJob(pi.blocks,
      (ctx: org.apache.spark.TaskContext, it: Iterator[SqBlock[I]]) => {
        val heapMap = new java.util.HashMap[Int, java.util.PriorityQueue[(I, Double)]]()
        // executor-side corpus-norm table (see searchSq's header note)
        lazy val sqLut: Array[Double] = Array.tabulate(dim * 256)(j => {
          val x = dec(sq, j >> 8, j & 0xFF); x * x
        })
        def heapFor(qg: Int): java.util.PriorityQueue[(I, Double)] = {
          var h = heapMap.get(qg)
          if (h == null) {
            h = new java.util.PriorityQueue[(I, Double)](
              k + 1, (a: (I, Double), b: (I, Double)) => {
                val c = java.lang.Double.compare(b._2, a._2)
                if (c != 0) c else idOrd.compare(b._1, a._1)
              })
            heapMap.put(qg, h)
          }
          h
        }
        {
          while (it.hasNext) {
            val blk = it.next()
            val qIdxs = byCell.getOrElse(blk.cell, null)
            if (qIdxs == null) () // cell nobody probed: skip the slab
            else {
            // heaps hoisted per block: the rows-outer hot loop must not
            // pay a map lookup per (row, query)
            val bheaps = Array.tabulate(qIdxs.length)(qi => heapFor(qIdxs(qi)))
            val codes = blk.codes; val bd = blk.dim; val n = blk.rows
            val rowNorms = if (needNorms) blockNorms(blk, sqLut) else null
            // rows OUTER, queries INNER: a row's code line (bd bytes)
            // stays in L1 while the whole query batch dots it — the
            // query-outer order re-reads the full code slab per query,
            // batch-size× the memory traffic on corpus-sized blocks
            var r = 0
            while (r < n) {
              val base = r * bd
              val id = blk.ids(r)
              val sqrtNa = if (rowNorms == null) 0.0 else math.sqrt(rowNorms(r))
              var qi = 0
              while (qi < qIdxs.length) {
                val qg = qIdxs(qi)
                val w = ws(qg)
                // the vectorizable hot loop: zero-extended byte * int
                var s = 0; var i = 0
                while (i < bd) { s += (codes(base + i) & 0xFF) * w(i); i += 1 }
                val dot = betas(qg) * s + cAdds(qg)
                val d =
                  if (cosine) {
                    val sqrtNb = qSqrt(qg)
                    if (sqrtNa == 0.0 || sqrtNb == 0.0) 1.0
                    else 1.0 - dot / (sqrtNa * sqrtNb)
                  } else if (l2)
                    math.sqrt(math.max(rowNorms(r) - 2.0 * dot + qNorm(qg), 0.0))
                  else -dot
                val heap = bheaps(qi)
                if (heap.size < k) heap.add((id, d))
                else {
                  val worst = heap.peek()
                  if (d < worst._2 || (d == worst._2 && idOrd.lt(id, worst._1))) {
                    heap.poll(); heap.add((id, d))
                  }
                }
                qi += 1
              }
              r += 1
            }
            }
          }
          val out = new ArrayBuffer[(Int, I, Double)]()
          heapMap.forEach((qg, h) => h.forEach(c => out += ((qg, c._1, c._2))))
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

  /** Drop-in for [[Quantization.sqSearch]] backed by the resident tier:
    * collect the (contract-capped) query batch, resident scan, emit the
    * [[Knn.knnJoin]] result shape (query_id, rank, neighbor_id, dist).
    * With nProbe = numCells the output is row-identical to `sqSearch`;
    * smaller nProbe trades recall for probed-cell pruning. Runs eagerly —
    * callers may `unpersist()` the index once this returns. */
  def search(pi: PackedSqCorpus[Long], queries: DataFrame,
             k: Int, nProbe: Int, metric: String = "cosine",
             queryId: String = "query_id", queryVec: String = "query_vec",
             maxQueryRows: Int = 65536,
             /** "exact" = [[searchSq]] (decoded-space bit-exactness);
               * "int" = [[searchSqInt]] (the faster approximate ADC). */
             domain: String = "exact"): DataFrame = {
    require(domain == "exact" || domain == "int",
      s"domain must be 'exact' or 'int': '$domain'")
    val spark = queries.sparkSession
    val rows = queries
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .limit(maxQueryRows + 1)
      .collect()
    require(rows.length <= maxQueryRows,
      s"PackedSq.search query batch exceeds maxQueryRows=$maxQueryRows: the " +
        "packed path ships per-query LUTs and merges on the driver — route " +
        "corpus-sized query sets through Quantization.sqSearch instead")
    require(rows.nonEmpty, "empty query batch")
    val qArr = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val res =
      if (domain == "int") searchSqInt[Long](pi, qArr, k, nProbe, metric)
      else searchSq[Long](pi, qArr, k, nProbe, metric)
    import spark.implicits._
    res.toSeq
      .flatMap { case (qid, nbrs) =>
        nbrs.iterator.zipWithIndex.map { case ((nid, d), pos) => (qid, pos + 1, nid, d) }
      }
      .toDF(queryId, "rank", "neighbor_id", "dist")
  }

  // ------------------------------------------------------ slab sidecars

  /** Persist for warm start ([[PackedKnn.saveSlabs]]'s rename-swap
    * contract) plus both models — the quantizer stats MUST reload
    * byte-identical or the reopened index decodes a different geometry. */
  def saveSlabs[I: ClassTag](pi: PackedSqCorpus[I], dir: String): Unit = {
    PackedKnn.writeSlabDir(pi.blocks, pi.dim, dir)
    val spark = org.apache.spark.sql.SparkSession.active
    ModelStore.saveIvf(spark, pi.ivf, s"$dir/ivf")
    ModelStore.saveSq(spark, pi.sq, s"$dir/sq")
  }

  def slabsExist(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    PackedKnn.slabsExist(spark, dir) &&
      ModelStore.exists(s"$dir/ivf") && ModelStore.exists(s"$dir/sq")

  /** Reopen: one task per partition reading exactly its slab file — zero
    * Exchange, zero re-encode. The cell→partition map is a pure function
    * of (numCells, numParts), so the sidecar's partition count fully
    * reconstructs the layout; each block's cell tag is validated against
    * that map on load (fail loud on a foreign or reshaped sidecar). */
  def loadSlabs[I: ClassTag](spark: org.apache.spark.sql.SparkSession, dir: String,
                             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedSqCorpus[I] = {
    val ivf = ModelStore.loadIvf(spark, s"$dir/ivf")
    val sq = ModelStore.loadSq(spark, s"$dir/sq")
    val (blocks, d) = PackedKnn.readSlabDir[SqBlock[I]](spark, dir, storage)
    require(d == sq.mins.length,
      s"SQ slab sidecar at $dir has $d bytes/row but the model has ${sq.mins.length} dims")
    val numParts = blocks.getNumPartitions
    require(numParts >= 1 && numParts <= ivf.numCells,
      s"SQ slab sidecar at $dir has $numParts partitions " +
        s"but the coarse model has only ${ivf.numCells} cells")
    val misplaced = blocks.mapPartitionsWithIndex { (p, it) =>
      it.collect { case b if b.cell < 0 || b.cell >= ivf.numCells ||
        partOf(b.cell, ivf.numCells, numParts) != p => (p, b.cell) }
    }.take(1)
    require(misplaced.isEmpty,
      s"SQ slab sidecar at $dir: cell ${misplaced.head._2} found in " +
        s"partition ${misplaced.head._1}, which the (numCells=${ivf.numCells}, " +
        s"numParts=$numParts) layout map does not place there — stale or " +
        "foreign sidecar; rebuild the index")
    new PackedSqCorpus(blocks, ivf, sq, Nil)
  }

  /** Resident footprint in code bytes (ids excluded) — rows × dim; the
    * float tier is rows × dim × 4. */
  def codeBytes[I](pi: PackedSqCorpus[I]): Long =
    pi.blocks.map(_.codes.length.toLong).fold(0L)(_ + _)
}
