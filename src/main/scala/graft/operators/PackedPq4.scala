package graft.operators

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** 4-bit resident PQ codes (the fastscan code layout — André et al.,
  * VLDB'15 / FAISS `IndexIVFPQFastScan`): with 16 centroids per subspace a
  * code is one NIBBLE, two subspaces share a byte, and the per-subspace
  * LUT is 16 entries — half the code bytes of the m×8-bit tier at the
  * same subspace count, and the whole LUT set for a query fits in a
  * couple of cache lines. The published fastscan kernels go further and
  * shuffle-lookup 16-entry LUTs in SIMD registers; on the JVM the win we
  * keep is the footprint (the 100-TB argument: code bytes ARE the
  * resident budget) and the L1-dense LUTs — the scan is the same
  * sequential byte read as [[PackedPq.searchAdc]] over half the bytes.
  *
  * Numeric contract: codes are the SAME integers the 8-bit tier stores
  * (nibble packing is a lossless re-layout, verified fail-loud at build),
  * LUTs come from the SAME builders, and the ADC loop accumulates in the
  * SAME ascending-subspace double order — so [[searchAdc4]] is
  * BIT-IDENTICAL to [[PackedPq.searchAdc]] on the same ≤16-centroid
  * models (PackedPq4Spec proves it), and q145 hash-checks against the
  * same full DuckDB re-execution as q72/q122.
  *
  * Scope: a serving-tier rung — build from a packed 8-bit corpus
  * ([[fromPacked]], a narrow per-partition re-layout) or from a raw
  * DataFrame ([[packIvfPq4]]); CRUD maintenance (append/remove/compact/
  * slab sidecars) stays on the 8-bit tier, which this tier re-derives
  * from in one narrow pass. */
object PackedPq4 {

  /** One IVF cell's nibble codes: row r occupies bytes
    * [r*bpr, (r+1)*bpr), bpr = ceil(m/2); subspace mi of row r is the
    * LOW nibble of byte r*bpr + mi/2 for even mi, the HIGH nibble for
    * odd mi (an odd m leaves the last high nibble zero and unread). */
  final case class NibbleBlock[I](ids: Array[I], codes: Array[Byte], m: Int) {
    def rows: Int = ids.length
    def bytesPerRow: Int = (m + 1) / 2
  }

  final class PackedPq4Corpus[I](val blocks: RDD[NibbleBlock[I]],
                                 val ivf: Ann.IvfModel,
                                 val pq: Quantization.PqModel,
                                 val residual: Boolean = false,
                                 val rotation: Option[Array[Array[Double]]] = None) {
    def m: Int = pq.numSubspaces
    def unpersist(blocking: Boolean = false): Unit = blocks.unpersist(blocking)
  }

  /** Re-lay an 8-bit packed corpus into nibble blocks — per-partition,
    * no shuffle, partition i stays cell i. Fails loud if any code
    * exceeds a nibble (a >16-centroid model reached the 4-bit tier). */
  def fromPacked[I: ClassTag](pi: PackedPq.PackedPqCorpus[I],
                              storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedPq4Corpus[I] = {
    require(pi.pq.codebooks(0).length <= 16,
      s"PackedPq4: ${pi.pq.codebooks(0).length} centroids per subspace " +
        "exceed a nibble code — train with numCentroids <= 16")
    val blocks = pi.blocks.mapPartitions(_.map { b =>
      val m = b.m
      val bpr = (m + 1) / 2
      val out = new Array[Byte](b.rows * bpr)
      var r = 0
      while (r < b.rows) {
        var mi = 0
        while (mi < m) {
          val c = b.codes(r * m + mi) & 0xFF
          if (c > 0xF) throw new IllegalArgumentException(
            s"PackedPq4: code $c at row $r subspace $mi exceeds a nibble — " +
              "the source corpus was packed from a >16-centroid model")
          val pos = r * bpr + (mi >> 1)
          if ((mi & 1) == 0) out(pos) = (out(pos) | c).toByte
          else out(pos) = (out(pos) | (c << 4)).toByte
          mi += 1
        }
        r += 1
      }
      NibbleBlock(b.ids, out, m)
    }, preservesPartitioning = true)
      .setName(PackedKnn.residentName).persist(storage)
    blocks.count()
    new PackedPq4Corpus(blocks, pi.ivf, pi.pq, pi.residual, pi.rotation)
  }

  /** Pack a raw corpus straight into the 4-bit tier: the 8-bit encode +
    * cell-route pass, then the narrow nibble re-layout; the transient
    * 8-bit generation is released once the nibble slabs materialize. */
  def packIvfPq4(corpus: DataFrame, ivf: Ann.IvfModel, pq: Quantization.PqModel,
                 idCol: String = "id", vecCol: String = "vec",
                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                 residual: Boolean = false,
                 rotation: Option[Array[Array[Double]]] = None): PackedPq4Corpus[Long] = {
    val pi = PackedPq.packIvfPq(corpus, ivf, pq, idCol, vecCol, storage,
      residual, rotation)
    try fromPacked[Long](pi, storage) finally pi.unpersist()
  }

  /** [[PackedPq.searchAdc]] over nibble codes: same driver probe
    * ranking, same LUT builders, same (dist, id) heap cut — the ADC
    * inner loop unpacks two codes per byte and accumulates in the same
    * ascending-subspace double order, so distances are bit-identical to
    * the 8-bit tier's on the same models. */
  def searchAdc4[I: ClassTag: Ordering](pi: PackedPq4Corpus[I],
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
    val luts: Array[Array[Double]] =
      if (pi.residual) null
      else pi.rotation match {
        case Some(r) => queries.map(q =>
          PackedPq.lutForRotated(pi.pq, PackedPq.rotateQ(r, q._2)))
        case None => queries.map(q => PackedPq.lutFor(pi.pq, q._2))
      }
    val lutsByCell: Map[Int, Array[Array[Double]]] =
      if (!pi.residual) null
      else byCell.map { case (cell, qIdxs) =>
        cell -> qIdxs.map(qi => PackedPq.lutForResidual(pi.pq, queries(qi)._2, cents(cell)))
      }
    val partIds = byCell.keys.toArray.sorted
    val idOrd = implicitly[Ordering[I]]
    val nC = pi.pq.codebooks(0).length // flat-LUT row stride (≤16)
    val sc = pi.blocks.sparkContext
    val partials: Array[Array[(Int, I, Double)]] = sc.runJob(pi.blocks,
      (ctx: org.apache.spark.TaskContext, it: Iterator[NibbleBlock[I]]) => {
        val qIdxs = byCell.getOrElse(ctx.partitionId(), Array.empty[Int])
        if (qIdxs.isEmpty || !it.hasNext) Array.empty[(Int, I, Double)]
        else {
          val cellLuts = if (lutsByCell == null) null else lutsByCell(ctx.partitionId())
          val heaps = qIdxs.map(_ => new java.util.PriorityQueue[(I, Double)](
            fetchK + 1, (a: (I, Double), b: (I, Double)) => {
              val c = java.lang.Double.compare(b._2, a._2)
              if (c != 0) c else idOrd.compare(b._1, a._1)
            }))
          while (it.hasNext) {
            val blk = it.next()
            val codes = blk.codes; val bm = blk.m; val n = blk.rows
            val bpr = blk.bytesPerRow
            val pairs = bm >> 1 // full bytes per row (two codes each)
            var qi = 0
            while (qi < qIdxs.length) {
              val lut = if (cellLuts != null) cellLuts(qi) else luts(qIdxs(qi))
              val heap = heaps(qi)
              var r = 0
              while (r < n) {
                var s = 0.0; val base = r * bpr; var off = 0; var bi = 0
                while (bi < pairs) {
                  val b = codes(base + bi)
                  s += lut(off + (b & 0xF)); off += nC
                  s += lut(off + ((b >> 4) & 0xF)); off += nC
                  bi += 1
                }
                if ((bm & 1) == 1) // odd m: the tail byte's low nibble
                  s += lut(off + (codes(base + pairs) & 0xF))
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

  /** [[PackedPq.search]]'s funnel over the nibble tier: capped query
    * collect, 4-bit ADC to fetchK candidates, exact rerank — row-identical
    * to the 8-bit facade on the same ≤16-centroid models. */
  def search(pi: PackedPq4Corpus[Long], queries: DataFrame, corpus: DataFrame,
             k: Int, nProbe: Int = 4, fetchK: Int = 50, metric: String = "cosine",
             queryId: String = "query_id", queryVec: String = "query_vec",
             corpusId: String = "id", vecCol: String = "vec",
             maxQueryRows: Int = 65536): DataFrame = {
    val spark = queries.sparkSession
    val rows = queries
      .select(org.apache.spark.sql.functions.col(queryId).cast("long"),
        org.apache.spark.sql.functions.col(queryVec).cast("array<float>"))
      .limit(maxQueryRows + 1)
      .collect()
    require(rows.length <= maxQueryRows,
      s"PackedPq4.search query batch exceeds maxQueryRows=$maxQueryRows: the " +
        "packed path broadcasts per-query LUTs and merges on the driver — " +
        "route corpus-sized query sets through Ann.ivfPqSearch instead")
    require(rows.nonEmpty, "empty query batch")
    val qArr = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cand = searchAdc4[Long](pi, qArr, fetchK, nProbe)
    import spark.implicits._
    val candidates = cand.toSeq
      .flatMap { case (qid, nbrs) => nbrs.map { case (nid, _) => (qid, nid) } }
      .toDF(queryId, "neighbor_id")
    Quantization.rerankExact(candidates, queries, corpus, k, metric,
      queryId, queryVec, corpusId, vecCol)
  }

  /** Resident footprint in code bytes — rows × ceil(m/2), half the
    * 8-bit tier at the same subspace count. */
  def codeBytes[I](pi: PackedPq4Corpus[I]): Long =
    pi.blocks.map(_.codes.length.toLong).fold(0L)(_ + _)
}
