package graft.operators

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Resident graph-ANN serving tier — the small-world-graph rung of the
  * packed-index ladder, the analog of the reference's headline hnswlib
  * index (vectordb.py:527 `self._index.knn_query`;
  * vectordb_optimized.py:540): at high recall and low probe budgets a
  * navigable-graph walk touches orders of magnitude fewer candidates than
  * an IVF cell scan.
  *
  * Spark-first shape: one single-layer navigable-small-world graph PER IVF
  * CELL, built over the resident float slabs of a [[PackedKnn.PackedIvfCorpus]]
  * (partition i = cell i survives into this tier). A query routes to its
  * nProbe nearest cells (the same driver-side probe ranking every packed
  * tier uses), runs a bounded best-first walk inside each probed
  * partition's graph — `ef`-bounded result set, greedy expansion from a
  * fixed entry row — and the driver merges the per-cell (id, dist)
  * partials. Distances on the walk are EXACT float-slab distances
  * (double-accumulated in index order, the codegen kernels' convention),
  * so unlike the PQ tiers no decode error enters: the only approximation
  * is which nodes the walk visits.
  *
  * Exactness contract (the q99/q100 funnel stance): the per-cell graph
  * contains a protected spanning tree — node i's edge to its
  * insertion-time nearest predecessor is never pruned, in either
  * direction — so a walk with unbounded `ef` visits the ENTIRE cell and
  * the search degenerates to the exact scan. q143 probes all cells at
  * unbounded ef and hash-checks the same exact DuckDB oracle as the
  * float tier; RecallFloorSpec holds the bounded-ef recall floor at 1M
  * rows against the IVF tier at matched probe budgets.
  *
  * Degenerate-input note: a cell of near-identical vectors (the
  * boilerplate mega-cluster) makes every insertion's nearest predecessor
  * the entry row, so the entry's protected child list grows past
  * `degree` (protected edges are exempt from pruning — connectivity
  * first). Search in that cell degrades toward a one-hop scan of the
  * entry's list, i.e. brute force over the duplicates — correct, and no
  * worse than the flat tier on the same pathology.
  *
  * At 100 TB: cells are partitions, the build is embarrassingly parallel
  * per partition (no shuffle — the slabs are already cell-resident), a
  * probe launches tasks only on probed partitions (runJob subset), and
  * driver traffic is ≤ probes × Q × k triples — the [[PackedSq]] serving
  * contract with a graph walk instead of a byte scan.
  */
object PackedGraph {

  /** Two-level entry ladder over a cell — the materialized form of
    * hnswlib's upper layers (vectordb.py:18: multi-layer HNSW, whose
    * sparse upper layers exist only to drop a query near its layer-0
    * neighborhood). `beacons` are ~[[BeaconCount]] stride-sampled rows;
    * every row is assigned to its nearest beacon at finalize time and
    * `perm`/`off` store the groups as CSR. Entry selection scores the
    * beacons, then a stride sample INSIDE the best beacon's group —
    * geometric refinement a flat sample cannot give (the flat 64-sample
    * lands at distance quantile ~1/65; the ladder's leaf sample explores
    * the best 1/64th of the cell at the same density, quantile
    * ~1/4096). Depth 2 at branching 64 resolves any [[splitHotCells]]-
    * bounded cell and cells far beyond (64·64·[[BeaconMinRows]] ≈ 16M
    * rows) — the log-spaced generalization would nest further CSR
    * levels, unnecessary under the bounded-cell discipline. Resident
    * cost: one int per row + 65 ints; build cost: |beacons| distance
    * evaluations per row, a bounded fraction of the insertion walk that
    * built the row's edges. */
  final case class EntryLadder(beacons: Array[Int], off: Array[Int],
                               perm: Array[Int])

  /** One cell's navigable graph: rows in insertion order (the initial
    * build inserts ascending by id; appended batches follow, each batch
    * id-sorted — every tie-break below is deterministic for a given
    * append history), the resident float matrix + norms, per-row
    * adjacency (local row indices; slot order irrelevant — the walk
    * orders by distance), each row's PROTECTED insertion parent
    * (-1 for the entry row) — carried in the block so appends can keep
    * honoring the spanning-tree protection after a save/load — and the
    * search ENTRY row: the live row nearest the cell's resident mean
    * (a cheap medoid), recomputed whenever a block is (re)finalized, so
    * walks start central instead of spending early hops escaping row
    * 0's neighborhood. Correctness never depends on the entry choice
    * (unbounded ef is exhaustive from any row via the spanning tree). */
  final case class GraphBlock[I](ids: Array[I], mat: Array[Float], dim: Int,
                                 sqrtNorms: Array[Double],
                                 adj: Array[Array[Int]],
                                 parent: Array[Int],
                                 dead: Array[Boolean] = null,
                                 entry: Int = 0,
                                 ladder: EntryLadder = null) {
    def rows: Int = ids.length
    def liveRows: Int =
      if (dead == null) rows else rows - dead.count(identity)
  }

  final class PackedGraphCorpus[I](val blocks: RDD[GraphBlock[I]],
                                   val model: Ann.IvfModel,
                                   val dim: Int, val degree: Int,
                                   val efConstruction: Int,
                                   chain: Seq[RDD[_]] = Nil) {
    private[PackedGraph] def parents: Seq[RDD[_]] =
      if (chain.isEmpty) Seq(blocks) else chain
    /** CRUD generations riding this handle (1 = freshly built/compacted). */
    def generations: Int = parents.length
    def unpersist(blocking: Boolean = false): Unit =
      parents.foreach(_.unpersist(blocking))
  }

  private def mcodeOf(metric: String): Int = metric match {
    case "cosine" => 0; case "l2" => 1; case "ip" => 2
    case other => throw new IllegalArgumentException(s"metric $other")
  }

  /** Exact distance of stored row `row` to query `q` — double accumulation
    * in ascending index order, the same convention as the codegen distance
    * kernels, so full-ef results merge bit-identically with the exact
    * tiers' rerank funnels. */
  @inline private def rowDist(mat: Array[Float], row: Int, dim: Int,
                              norm: Double, q: Array[Float], qNorm: Double,
                              mcode: Int): Double = {
    var dot = 0.0; var j = 0; val off = row * dim
    while (j < dim) { dot += mat(off + j).toDouble * q(j); j += 1 }
    (mcode: @annotation.switch) match {
      case 0 =>
        val denom = norm * qNorm
        if (denom == 0.0) 1.0 else 1.0 - dot / denom
      case 1 =>
        val sq = norm * norm + qNorm * qNorm - 2.0 * dot
        math.sqrt(math.max(sq, 0.0))
      case _ => -dot
    }
  }

  /** Adjacency accessor shared by the build (growing ArrayBuffers) and
    * the serve path (frozen arrays). */
  private trait Adj {
    def len(u: Int): Int
    def get(u: Int, i: Int): Int
  }
  private final class FrozenAdj(a: Array[Array[Int]]) extends Adj {
    def len(u: Int): Int = a(u).length
    def get(u: Int, i: Int): Int = a(u)(i)
  }
  private final class GrowingAdj(a: ArrayBuffer[ArrayBuffer[Int]]) extends Adj {
    def len(u: Int): Int = a(u).length
    def get(u: Int, i: Int): Int = a(u)(i)
  }

  /** Primitive bounded binary heap over (dist, row) pairs — no boxing in
    * the walk's hot loop. `max = true` keeps the WORST on top (the kept
    * set, evict-friendly); `max = false` keeps the BEST on top (the
    * frontier). Ties order by row (max-heap: larger row = "worse"), so
    * every pop is deterministic. */
  private final class PairHeap(cap: Int, max: Boolean) {
    private var ds = new Array[Double](math.min(cap, 1024) + 1)
    private var rs = new Array[Int](ds.length)
    var size: Int = 0
    @inline private def worseThan(d1: Double, r1: Int, d2: Double, r2: Int): Boolean = {
      // "worse" = larger dist (ties: larger row); flip for min-heaps
      val c = java.lang.Double.compare(d1, d2)
      if (max) c > 0 || (c == 0 && r1 > r2)
      else c < 0 || (c == 0 && r1 < r2)
    }
    def topDist: Double = ds(0)
    def topRow: Int = rs(0)
    def add(d: Double, r: Int): Unit = {
      if (size == ds.length) {
        ds = java.util.Arrays.copyOf(ds, ds.length * 2)
        rs = java.util.Arrays.copyOf(rs, rs.length * 2)
      }
      var i = size; size += 1
      ds(i) = d; rs(i) = r
      while (i > 0 && worseThan(ds(i), rs(i), ds((i - 1) / 2), rs((i - 1) / 2))) {
        val p = (i - 1) / 2
        val td = ds(i); ds(i) = ds(p); ds(p) = td
        val tr = rs(i); rs(i) = rs(p); rs(p) = tr
        i = p
      }
    }
    def pop(): Unit = {
      size -= 1
      ds(0) = ds(size); rs(0) = rs(size)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val rr = l + 1
        var m = i
        if (l < size && worseThan(ds(l), rs(l), ds(m), rs(m))) m = l
        if (rr < size && worseThan(ds(rr), rs(rr), ds(m), rs(m))) m = rr
        if (m == i) done = true
        else {
          val td = ds(i); ds(i) = ds(m); ds(m) = td
          val tr = rs(i); rs(i) = rs(m); rs(m) = tr
          i = m
        }
      }
    }
  }

  /** Walk instrumentation for specs (local-mode only: tasks share the
    * driver JVM, so a spec can bracket a search and read the distance-
    * evaluation count — the "walk length" a recall floor trades against).
    * Off by default; the guard is one volatile load per evaluation
    * against a 128-MAC distance kernel. */
  private[graft] object WalkStats {
    @volatile var enabled = false
    val evals = new java.util.concurrent.atomic.LongAdder
  }

  /** Best-first bounded walk (the NSW/HNSW layer-0 search): expand the
    * closest unexpanded node, keep the `ef` best visited, stop when the
    * closest frontier node cannot improve the kept set. Only rows
    * `< activeRows` exist (the build passes the insertion frontier; search
    * passes `rows`). Returns the kept set sorted by (dist, row) — row
    * order is id order, so ties are globally deterministic. */
  private def walk(mat: Array[Float], dim: Int, norms: Array[Double],
                   adj: Adj, activeRows: Int, entry: Int,
                   q: Array[Float], qNorm: Double, ef: Int,
                   mcode: Int, dead: Array[Boolean] = null,
                   /** Pre-scored (row, dist) frontier seeds — the entry
                     * selector already paid these distance evaluations,
                     * so the walk starts with a FULL kept set and a
                     * spatially spread frontier instead of one row: the
                     * termination bound tightens immediately and the
                     * expansion phase shrinks (HNSW's multi-entry
                     * ef-search). null = classic single-entry walk (the
                     * build path — bit-identical construction). */
                   seeds: Array[(Int, Double)] = null): Array[(Int, Double)] = {
    val res = new PairHeap(ef, max = true) // head = worst kept
    val cand = new PairHeap(64, max = false) // head = closest frontier
    val visited = new java.util.BitSet(activeRows)
    val d0 = rowDist(mat, entry, dim, norms(entry), q, qNorm, mcode)
    if (WalkStats.enabled) WalkStats.evals.increment()
    visited.set(entry)
    // tombstoned rows ROUTE (frontier) but are never EMITTED (kept set)
    // — the HNSW mark-deleted contract: deleting a hub cannot disconnect
    // the graph, and unbounded ef stays exhaustive over the live set
    cand.add(d0, entry)
    if (dead == null || !dead(entry)) res.add(d0, entry)
    if (seeds != null) {
      var si = 0
      while (si < seeds.length) {
        val (r, d) = seeds(si)
        if (!visited.get(r)) {
          visited.set(r)
          cand.add(d, r)
          if (dead == null || !dead(r)) {
            res.add(d, r)
            if (res.size > ef) res.pop()
          }
        }
        si += 1
      }
    }
    var done = false
    while (!done && cand.size > 0) {
      val td = cand.topDist; val tu = cand.topRow
      cand.pop()
      // the closest frontier node is no better than the worst kept and
      // the kept set is full -> nothing reachable can improve it
      if (res.size >= ef &&
          (td > res.topDist || (td == res.topDist && tu > res.topRow))) done = true
      else {
        val n = adj.len(tu)
        var i = 0
        while (i < n) {
          val w = adj.get(tu, i)
          if (w < activeRows && !visited.get(w)) {
            visited.set(w)
            val dw = rowDist(mat, w, dim, norms(w), q, qNorm, mcode)
            if (WalkStats.enabled) WalkStats.evals.increment()
            if (res.size < ef || dw < res.topDist ||
                (dw == res.topDist && w < res.topRow)) {
              cand.add(dw, w)
              if (dead == null || !dead(w)) {
                res.add(dw, w)
                if (res.size > ef) res.pop()
              }
            }
          }
          i += 1
        }
      }
    }
    val out = new Array[(Int, Double)](res.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = (res.topRow, res.topDist); res.pop(); i -= 1 }
    out
  }

  /** Incremental per-cell graph constructor — ONE insertion engine for
    * the initial build AND later appends (HNSW's native advantage over
    * rebuild-the-world indexes: insertion IS the build step). State is
    * growable; [[fromBlock]] reloads a finished block (adjacency +
    * protected parents) so appended rows keep honoring the
    * spanning-tree protection built before them. */
  private[operators] final class GraphBuilder[I: ClassTag](
      dim: Int, degree: Int, efC: Int, mcode: Int, hint: Int) {
    private var ids = new Array[I](math.max(hint, 8))
    private var mat = new Array[Float](math.max(hint, 8) * dim)
    private var norms = new Array[Double](math.max(hint, 8))
    private val adj = ArrayBuffer.empty[ArrayBuffer[Int]]
    private val parent = ArrayBuffer.empty[Int]
    private var deadArr = new Array[Boolean](math.max(hint, 8))
    private var deadCount = 0
    // a node whose protected edges alone exceed `degree` can never be
    // pruned again — skip the (dist-computing) prune scan from then on
    private val saturated = new java.util.BitSet()
    private val adjView = new GrowingAdj(adj)
    private val q = new Array[Float](dim)
    private val rv = new Array[Float](dim)
    var rows: Int = 0

    private def ensure(n: Int): Unit = {
      if (n > ids.length) {
        val cap = math.max(n, ids.length * 2)
        val ni = new Array[I](cap) // ClassTag-aware: ids may be a primitive array
        System.arraycopy(ids, 0, ni, 0, rows)
        ids = ni
        mat = java.util.Arrays.copyOf(mat, cap * dim)
        norms = java.util.Arrays.copyOf(norms, cap)
        deadArr = java.util.Arrays.copyOf(deadArr, cap)
      }
    }

    // stored-row to stored-row distance (both resident) — direct two-row
    // product, no staging copy; float operands widen to double exactly as
    // rowDist's copied path did, so distances are bit-identical
    private def distRR(a: Int, b: Int): Double = {
      var dot = 0.0; var j = 0; val oa = a * dim; val ob = b * dim
      while (j < dim) { dot += mat(ob + j).toDouble * mat(oa + j).toDouble; j += 1 }
      (mcode: @annotation.switch) match {
        case 0 =>
          val denom = norms(b) * norms(a)
          if (denom == 0.0) 1.0 else 1.0 - dot / denom
        case 1 =>
          val sq = norms(b) * norms(b) + norms(a) * norms(a) - 2.0 * dot
          math.sqrt(math.max(sq, 0.0))
        case _ => -dot
      }
    }

    // Neighbor DIVERSIFICATION (the HNSW select-neighbors heuristic,
    // Malkov & Yashunin Alg. 4): walking candidates closest-first, keep c
    // only if it is closer to the anchor than to every already-kept
    // neighbor. On clustered data the plain closest-M rule spends every
    // slot inside the anchor's own clique and the walk cannot navigate
    // BETWEEN cliques (measured at 1M/64 cells: recall@10 0.857 with
    // closest-M vs 0.99+ diversified at the same degree); dominated
    // candidates then fill any leftover slots closest-first, so sparse
    // regions keep full degree.
    private def selectDiverse(cands: Array[(Int, Double)], cap: Int): ArrayBuffer[Int] = {
      val kept = new ArrayBuffer[Int](cap)
      var ci = 0
      while (ci < cands.length && kept.length < cap) {
        val (c, dc) = cands(ci)
        var dominated = false
        var ki = 0
        while (ki < kept.length && !dominated) {
          if (distRR(c, kept(ki)) < dc) dominated = true
          ki += 1
        }
        if (!dominated) kept += c
        ci += 1
      }
      ci = 0
      while (ci < cands.length && kept.length < cap) {
        val c = cands(ci)._1
        if (!kept.contains(c)) kept += c
        ci += 1
      }
      kept
    }

    // Deferred pruning: a node's list may grow to `pruneSlack` before a
    // re-diversify pass trims it back to `degree` — pruning on EVERY
    // over-degree reverse edge made the O(deg^2) diversification the
    // build's dominant cost (each of a row's ~degree links triggered a
    // neighbor prune). Deferral cuts prune count ~degree/2-fold, gives
    // each prune MORE candidates to diversify from, and [[result]] runs a
    // final exact-degree pass so finished blocks never exceed `degree`
    // (protected tree edges excepted, as always).
    private val pruneSlack = degree + math.max(1, degree / 2)

    private def prune(n: Int, trigger: Int): Unit = {
      val lst = adj(n)
      if (lst.length <= trigger || saturated.get(n)) return
      val nv = new Array[Float](dim)
      System.arraycopy(mat, n * dim, nv, 0, dim)
      val scored = lst.toArray.map { c =>
        (c, rowDist(mat, c, dim, norms(c), nv, norms(n), mcode))
      }.sortBy { case (c, d) => (d, c) }
      val keep = new ArrayBuffer[Int](degree + 1)
      // protected first (tree edges survive regardless of rank) ...
      scored.foreach { case (c, _) =>
        if (parent(c) == n || parent(n) == c) keep += c
      }
      if (keep.length >= degree) saturated.set(n)
      else {
        // ... then diversified survivors among the rest up to the cap
        val rest = scored.filter { case (c, _) => parent(c) != n && parent(n) != c }
        keep ++= selectDiverse(rest, degree - keep.length)
      }
      adj(n) = new ArrayBuffer[Int](keep.length + 2) ++= keep
    }

    /** Insert one row: walk the current graph with ef = efConstruction,
      * link diversified bidirectional edges, protect the parent edge. */
    def insert(id: I, vec: Array[Float]): Unit = {
      require(vec.length == dim, s"vector dim ${vec.length} != graph dim $dim")
      val i = rows
      ensure(i + 1)
      ids(i) = id
      System.arraycopy(vec, 0, mat, i * dim, dim)
      var sum = 0.0; var j = 0
      while (j < dim) { val x = vec(j).toDouble; sum += x * x; j += 1 }
      norms(i) = math.sqrt(sum)
      adj += new ArrayBuffer[Int](degree + 2)
      parent += -1
      rows += 1
      if (i == 0) return
      System.arraycopy(mat, i * dim, q, 0, dim)
      // link only to LIVE nodes (the kept set excludes tombstones); dead
      // rows still route the walk, so the tree over live rows + the old
      // protected edges keep every row reachable
      val found = walk(mat, dim, norms, adjView, activeRows = i, entry = 0,
        q, norms(i), efC, mcode, if (deadCount > 0) deadArr else null)
      if (found.isEmpty) {
        // every standing row is tombstoned: anchor the newcomer to the
        // entry with a protected edge so it stays reachable
        parent(i) = 0
        adj(i) += 0
        adj(0) += i
        prune(0, pruneSlack)
        return
      }
      parent(i) = found.head._1
      // diversified out-links; the parent edge is protected regardless of
      // whether diversification would have kept it
      val links = selectDiverse(found, degree)
      if (!links.contains(parent(i))) links.prepend(parent(i))
      links.foreach { n =>
        adj(i) += n
        adj(n) += i
        prune(n, pruneSlack)
      }
    }

    /** Bulk twin of the insertion loop's row storage: resident-store ALL
      * rows up front (empty adjacency, parents unset) so [[linkRow]] can
      * diversify against exact candidate lists. Rows must arrive in
      * insertion (id-ascending) order. */
    def bulkStore(ids0: Array[I], mat0: Array[Float], n: Int): Unit = {
      require(rows == 0, "bulkStore into a non-empty builder")
      ensure(n)
      System.arraycopy(ids0, 0, ids, 0, n)
      System.arraycopy(mat0, 0, mat, 0, n * dim)
      var r = 0
      while (r < n) {
        var sum = 0.0; var j = 0; val off = r * dim
        while (j < dim) { val x = mat(off + j).toDouble; sum += x * x; j += 1 }
        norms(r) = math.sqrt(sum)
        adj += new ArrayBuffer[Int](degree + 2)
        parent += -1
        r += 1
      }
      rows = n
    }

    /** Bulk twin of [[insert]]'s linking step: `cands` is row i's EXACT
      * (dist, row)-sorted top-candidate list among its PREDECESSORS
      * (rows < i) — what the insertion-time ef-bounded walk approximates
      * — so the protected parent edge (cands.head) is the exact
      * insertion-order nearest-predecessor tree and the same
      * spanning-tree exactness contract holds. Diversification, the
      * bidirectional links, and pruning are the shared [[insert]] code
      * paths verbatim. */
    def linkRow(i: Int, cands: Array[(Int, Double)]): Unit = {
      if (cands.isEmpty) return // row 0 (no predecessors)
      parent(i) = cands.head._1
      val links = selectDiverse(cands, degree)
      if (!links.contains(parent(i))) links.prepend(parent(i))
      links.foreach { n =>
        adj(i) += n
        adj(n) += i
        prune(n, pruneSlack)
      }
    }

    /** Adopt a finished block's state (ids, slabs, adjacency, parents)
      * so subsequent [[insert]]s continue the same construction. */
    def preload(b: GraphBlock[I]): Unit = {
      require(rows == 0, "preload into a non-empty builder")
      require(b.dim == dim, s"block dim ${b.dim} != builder dim $dim")
      ensure(b.rows)
      System.arraycopy(b.ids, 0, ids, 0, b.rows)
      System.arraycopy(b.mat, 0, mat, 0, b.rows * dim)
      System.arraycopy(b.sqrtNorms, 0, norms, 0, b.rows)
      var n = 0
      while (n < b.rows) {
        adj += (new ArrayBuffer[Int](b.adj(n).length + 2) ++= b.adj(n))
        parent += b.parent(n)
        if (b.dead != null && b.dead(n)) { deadArr(n) = true; deadCount += 1 }
        n += 1
      }
      rows = b.rows
      // re-derive prune-skip state: a node whose protected edges alone
      // reach `degree` can never be pruned
      n = 0
      while (n < b.rows) {
        var prot = 0
        b.adj(n).foreach { c =>
          if (b.parent(c) == n || b.parent(n) == c) prot += 1 }
        if (prot >= degree) saturated.set(n)
        n += 1
      }
    }

    /** Search entry = live row nearest the live-row mean (one O(n*d)
      * pass — a cheap medoid). Ties break to the smaller row, all-dead
      * blocks fall back to row 0 (dead rows still route). */
    private def computeEntry(): Int = {
      if (rows == 0) return 0
      val sum = new Array[Double](dim)
      var live = 0
      var r = 0
      while (r < rows) {
        if (deadCount == 0 || !deadArr(r)) {
          live += 1
          var j = 0; val off = r * dim
          while (j < dim) { sum(j) += mat(off + j); j += 1 }
        }
        r += 1
      }
      if (live == 0) return 0
      val mean = new Array[Float](dim)
      var ms = 0.0
      var j = 0
      while (j < dim) {
        mean(j) = (sum(j) / live).toFloat
        ms += mean(j).toDouble * mean(j); j += 1
      }
      val mNorm = math.sqrt(ms)
      var best = -1; var bestD = Double.MaxValue
      r = 0
      while (r < rows) {
        if (deadCount == 0 || !deadArr(r)) {
          val d = rowDist(mat, r, dim, norms(r), mean, mNorm, mcode)
          if (d < bestD) { bestD = d; best = r }
        }
        r += 1
      }
      if (best < 0) 0 else best
    }

    def result(): GraphBlock[I] = {
      // settle deferred pruning: finished blocks carry at most `degree`
      // slots per row (protected tree edges excepted)
      var fp = 0
      while (fp < rows) { prune(fp, degree); fp += 1 }
      val outIds = new Array[I](rows)
      System.arraycopy(ids, 0, outIds, 0, rows)
      GraphBlock(outIds, java.util.Arrays.copyOf(mat, rows * dim), dim,
        java.util.Arrays.copyOf(norms, rows),
        adj.iterator.map(_.toArray).toArray, parent.toArray,
        if (deadCount > 0) java.util.Arrays.copyOf(deadArr, rows) else null,
        entry = computeEntry(),
        ladder = if (rows >= BeaconMinRows)
          buildLadder(mat, norms, dim, rows, mcode) else null)
    }
  }

  /** Finalize-time construction of the [[EntryLadder]]: stride-sample the
    * beacons (the flat sample's geometry, unchanged), assign every row to
    * its nearest beacon under the BUILD metric, store the groups as CSR.
    * Dead rows are assigned too — a tombstoned entry merely routes, the
    * walk never emits it. Deterministic: ties break to the smaller
    * beacon row, so replays and appends reproduce the layout exactly. */
  private def buildLadder(mat: Array[Float], norms: Array[Double], dim: Int,
                          rows: Int, mcode: Int): EntryLadder = {
    val want = math.min(BeaconCount, rows)
    val stride = math.max(1, rows / want)
    val bBuf = new ArrayBuffer[Int](want)
    var r = stride / 2
    while (r < rows && bBuf.length < want) { bBuf += r; r += stride }
    val beacons = bBuf.toArray
    val nb = beacons.length
    val assign = new Array[Int](rows)
    val counts = new Array[Int](nb)
    val tmp = new Array[Float](dim)
    var rr = 0
    while (rr < rows) {
      System.arraycopy(mat, rr * dim, tmp, 0, dim)
      val qn = norms(rr)
      var best = 0; var bd = Double.MaxValue
      var i = 0
      while (i < nb) {
        val d = rowDist(mat, beacons(i), dim, norms(beacons(i)), tmp, qn, mcode)
        if (d < bd || (d == bd && beacons(i) < beacons(best))) { bd = d; best = i }
        i += 1
      }
      assign(rr) = best; counts(best) += 1
      rr += 1
    }
    val off = new Array[Int](nb + 1)
    var i = 0
    while (i < nb) { off(i + 1) = off(i) + counts(i); i += 1 }
    val cursor = java.util.Arrays.copyOf(off, nb)
    val perm = new Array[Int](rows)
    rr = 0
    while (rr < rows) {
      val g = assign(rr); perm(cursor(g)) = rr; cursor(g) += 1; rr += 1
    }
    EntryLadder(beacons, off, perm)
  }

  private[operators] object GraphBuilder {
    /** Reload a finished block's full state so later inserts continue the
      * same construction (protected parents included — appended pruning
      * must never drop a pre-existing tree edge). */
    def fromBlock[I: ClassTag](b: GraphBlock[I], degree: Int, efC: Int,
                               mcode: Int, extraHint: Int): GraphBuilder[I] = {
      val g = new GraphBuilder[I](b.dim, degree, efC, mcode, b.rows + extraHint)
      g.preload(b)
      g
    }
  }

  /** Build one cell's graph by sequential NSW insertion in ascending id
    * order (entry = smallest id): each row walks the partial graph with
    * ef = efConstruction, links to its `degree` nearest results
    * bidirectionally, and over-degree lists are pruned to the closest
    * `degree` — EXCEPT protected spanning-tree edges (child <-> its
    * insertion-time nearest predecessor), which pruning never removes, so
    * the cell graph stays connected and unbounded-ef search is exhaustive
    * by construction. */
  private[operators] def buildBlock[I: ClassTag](ids0: Array[I], mat0: Array[Float],
                                                 dim: Int, degree: Int, efC: Int,
                                                 mcode: Int)(
      implicit ord: Ordering[I]): GraphBlock[I] = {
    val rows = ids0.length
    // sort rows by id (deterministic whatever shuffle order fed us)
    val order = Array.range(0, rows).sortBy(ids0.apply)
    val g = new GraphBuilder[I](dim, degree, efC, mcode, rows)
    val vec = new Array[Float](dim)
    var r = 0
    while (r < rows) {
      System.arraycopy(mat0, order(r) * dim, vec, 0, dim)
      g.insert(ids0(order(r)), vec)
      r += 1
    }
    g.result()
  }

  /** Bulk-build one cell's graph from EXACT per-row candidate lists:
    * a tiled sgemm over the strict lower triangle (row i scored against
    * its predecessors j < i only) feeds each row's bounded top-efC heap,
    * then rows link in insertion order through the SAME diversify/
    * protect/prune code as [[buildBlock]]'s sequential insertion —
    * with the walk's approximate candidates replaced by exact ones, so
    * edge quality can only improve and the protected parent tree is the
    * exact nearest-predecessor tree. BLAS turns the O(n^2 d / 2) dots
    * into dense GEMM, but its n^2/2 dots eventually lose to the walk's
    * O(n efC deg d): measured crossover ~26k rows at dim 128 (12.5k-row
    * cells: bulk 3.4 s vs insertion 6.9 s; the quadratic doubles every
    * sqrt(2)x) — [[build]]'s `bulkMaxRows` (default 32768) arbitrates,
    * so a skewed hot cell falls back to insertion instead of paying the
    * square. Task memory: n*cap heap slots (~12 B each) + a T^2-float
    * score tile (16 MB), bounded by bulkMaxRows, on top of the slab. */
  private[operators] def buildBlockBulk[I: ClassTag](ids0: Array[I], mat0: Array[Float],
                                                     dim: Int, degree: Int, efC: Int,
                                                     mcode: Int)(
      implicit ord: Ordering[I]): GraphBlock[I] = {
    val n = ids0.length
    val order = Array.range(0, n).sortBy(ids0.apply)
    val ids = order.map(ids0.apply)
    val mat = new Array[Float](n * dim)
    var r = 0
    while (r < n) {
      System.arraycopy(mat0, order(r) * dim, mat, r * dim, dim)
      r += 1
    }
    val norms = new Array[Double](n)
    r = 0
    while (r < n) {
      var sum = 0.0; var j = 0; val off = r * dim
      while (j < dim) { val x = mat(off + j).toDouble; sum += x * x; j += 1 }
      norms(r) = math.sqrt(sum)
      r += 1
    }
    // Candidate-list depth: efC is a WALK budget (approximate candidates
    // need depth to compensate quality); these lists are EXACT, where the
    // diversifier rarely keeps past ~2x degree — deeper lists only feed
    // its reject pile at O(cands x kept) dominance cost. Floor of 48
    // keeps clustered data enough dominated spares for the fill-up rule.
    val cap = math.max(math.min(efC, 2 * degree), math.min(efC, 48))
    val heaps = Array.fill(n)(new PairHeap(cap, max = true))
    @inline def push(h: PairHeap, d: Double, row: Int): Unit = {
      if (h.size < cap) h.add(d, row)
      else if (d < h.topDist || (d == h.topDist && row < h.topRow)) {
        h.pop(); h.add(d, row)
      }
    }
    // triangular tiling: a (query-rows, candidate-cols) tile runs only
    // when some pair has j < i; the scores buffer stays T*T floats
    val T = 2048
    val scores = new Array[Float](T * T)
    var q0 = 0
    while (q0 < n) {
      val qn = math.min(T, n - q0)
      var c0 = 0
      while (c0 < q0 + qn) {
        val cn = math.min(T, n - c0)
        PackedKnn.blas.sgemm("T", "N", qn, cn, dim, 1.0f,
          mat, q0 * dim, dim, mat, c0 * dim, dim, 0.0f, scores, 0, qn)
        var c = 0
        while (c < cn) {
          val j = c0 + c
          val jNorm = norms(j)
          var rr = 0
          while (rr < qn) {
            val i = q0 + rr
            if (j < i) {
              val dot = scores(c * qn + rr).toDouble
              val iNorm = norms(i)
              val d = (mcode: @annotation.switch) match {
                case 0 =>
                  val denom = iNorm * jNorm
                  if (denom == 0.0) 1.0 else 1.0 - dot / denom
                case 1 =>
                  val sq = iNorm * iNorm + jNorm * jNorm - 2.0 * dot
                  math.sqrt(math.max(sq, 0.0))
                case _ => -dot
              }
              push(heaps(i), d, j)
            }
            rr += 1
          }
          c += 1
        }
        c0 += T
      }
      q0 += T
    }
    val g = new GraphBuilder[I](dim, degree, efC, mcode, n)
    g.bulkStore(ids, mat, n)
    var i = 1
    while (i < n) {
      val h = heaps(i)
      val cands = new Array[(Int, Double)](h.size)
      var x = cands.length - 1
      while (x >= 0) { cands(x) = (h.topRow, h.topDist); h.pop(); x -= 1 }
      g.linkRow(i, cands)
      heaps(i) = null // let the drained heap go before the next links
      i += 1
    }
    g.result()
  }

  /** Build the graph tier over a resident IVF-packed float corpus — one
    * NSW graph per cell, no shuffle (each partition merges its own slabs
    * and inserts locally). Cells up to `bulkMaxRows` rows construct via
    * [[buildBlockBulk]] (exact tiled-GEMM candidates — measured ~15-30x
    * faster at the 10^4-row cells a tuned coarse model produces); larger
    * cells fall back to sequential insertion, whose asymptotics win once
    * n dwarfs the walk budget. Both paths honor the same protected
    * spanning tree and produce interchangeable blocks ([[append]] keeps
    * using insertion either way). The source corpus stays usable; this
    * tier holds its OWN copy of the slabs (id-sorted), so callers
    * typically unpersist the float tier after the build if memory is
    * tight. */
  def build[I: ClassTag: Ordering](pi: PackedKnn.PackedIvfCorpus[I], degree: Int = 16,
            efConstruction: Int = 64, metric: String = "cosine",
            storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
            bulkMaxRows: Int = 32768): PackedGraphCorpus[I] = {
    require(degree >= 1, s"degree must be >= 1: $degree")
    require(efConstruction >= degree,
      s"efConstruction ($efConstruction) must be >= degree ($degree)")
    val d = pi.dim
    val mcode = mcodeOf(metric)
    val deg = degree
    val efC = efConstruction
    val bulkMax = bulkMaxRows
    val blocks = pi.blocks.mapPartitions { it =>
      val bs = it.toArray
      if (bs.isEmpty) Iterator.empty
      else {
        val rows = bs.map(_.rows.toLong).sum
        PackedKnn.requireSlabFits(rows, d, "PackedGraph.build")
        val n = rows.toInt
        val ids = new Array[I](n)
        val mat = new Array[Float](n * d)
        var off = 0
        bs.foreach { b =>
          System.arraycopy(b.ids, 0, ids, off, b.rows)
          System.arraycopy(b.mat, 0, mat, off * d, b.rows * d)
          off += b.rows
        }
        Iterator.single(
          if (n <= bulkMax) buildBlockBulk[I](ids, mat, d, deg, efC, mcode)
          else buildBlock[I](ids, mat, d, deg, efC, mcode))
      }
    }.setName(PackedKnn.residentName).persist(storage)
    blocks.count() // materialize: the build is ingest-time work
    new PackedGraphCorpus(blocks, pi.model, d, degree, efConstruction)
  }

  /** Append a batch WITHOUT rebuilding standing graphs — insertion is
    * HNSW's native maintenance operation, and the blocks carry their
    * protected parents precisely so later insertions keep the
    * connectivity contract: appended rows link through the same
    * ef-bounded walk + diversified selection, the pre-existing spanning
    * tree is never pruned, and the new rows' parent edges extend it — so
    * unbounded-ef search stays exhaustive over old AND new rows (the
    * spec proves it). The batch routes to cells through the SAME coarse
    * model (partition i stays cell i — probe routing unchanged); only
    * partitions that received rows do any work. Note adjacency now
    * depends on insertion HISTORY, so an appended graph is not
    * edge-identical to a fresh rebuild — equivalence is the exactness
    * contract + recall floors, not graph-isomorphism. */
  def append[I: ClassTag: Ordering](pg: PackedGraphCorpus[I],
             add: PackedKnn.PackedIvfCorpus[I],
             metric: String = "cosine",
             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedGraphCorpus[I] = {
    val mcode = mcodeOf(metric)
    val d = pg.dim
    val deg = pg.degree
    val efC = pg.efConstruction
    require(add.blocks.getNumPartitions == pg.model.numCells,
      s"PackedGraph.append: batch pack has ${add.blocks.getNumPartitions} " +
        s"partitions but the graph's coarse model has ${pg.model.numCells} " +
        "cells — pack the batch with PackedKnn.packIvf over pg.model")
    require(add.dim == 0 || add.dim == d,
      s"PackedGraph.append: batch dim ${add.dim} != graph dim $d")
    val zipped = pg.blocks.zipPartitions(add.blocks,
      preservesPartitioning = true) { (git, bit) =>
      val gs = git.toArray
      val bs = bit.toArray
      require(gs.length <= 1, s"multiple graph blocks in one cell partition")
      if (bs.isEmpty) gs.iterator
      else {
        val newRows = bs.map(_.rows.toLong).sum
        val base = gs.headOption.map(_.rows.toLong).getOrElse(0L)
        PackedKnn.requireSlabFits(base + newRows, d, "PackedGraph.append")
        val n = newRows.toInt
        val ids = new Array[I](n)
        val mat = new Array[Float](n * d)
        var off = 0
        bs.foreach { b =>
          System.arraycopy(b.ids, 0, ids, off, b.rows)
          System.arraycopy(b.mat, 0, mat, off * d, b.rows * d)
          off += b.rows
        }
        val g = gs.headOption match {
          case Some(block) => GraphBuilder.fromBlock[I](block, deg, efC, mcode, n)
          case None => new GraphBuilder[I](d, deg, efC, mcode, n)
        }
        // id-sorted insertion within the batch: deterministic whatever
        // shuffle order fed us (the buildBlock stance per append step)
        val order = Array.range(0, n).sortBy(ids.apply)
        val vec = new Array[Float](d)
        order.foreach { r =>
          System.arraycopy(mat, r * d, vec, 0, d)
          g.insert(ids(r), vec)
        }
        Iterator.single(g.result())
      }
    }.setName(PackedKnn.residentName).persist(storage)
    zipped.count()
    add.unpersist() // transient cell-routing of the batch — zipped owns the rows now
    new PackedGraphCorpus(zipped, pg.model, d, deg, efC,
      pg.parents :+ (zipped: RDD[_]))
  }

  /** Tombstone removal — the HNSW mark-deleted contract: dead rows stay
    * in the graph as ROUTING waypoints (deleting a hub cannot disconnect
    * anything, so the exactness contract survives any delete sequence)
    * but are never emitted by a search, and later [[append]]s never link
    * to them. Miss blocks pass through BY REFERENCE; hit blocks rewrite
    * only their (1 byte/row) mask. Rebuild when [[deadFraction]] says the
    * routing overhead is no longer worth the skipped rebuild —
    * tombstones cost walk visits, not correctness. */
  def remove[I: ClassTag](pg: PackedGraphCorpus[I], ids: Set[I],
             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedGraphCorpus[I] = {
    if (ids.isEmpty) return pg
    val bc = pg.blocks.sparkContext.broadcast(ids)
    val marked = pg.blocks.mapPartitions(_.map { b =>
      val dead = bc.value
      var hits = 0
      var r = 0
      while (r < b.rows) {
        if (dead.contains(b.ids(r)) && (b.dead == null || !b.dead(r))) hits += 1
        r += 1
      }
      if (hits == 0) b
      else {
        val mask = if (b.dead == null) new Array[Boolean](b.rows)
          else java.util.Arrays.copyOf(b.dead, b.rows)
        r = 0
        while (r < b.rows) {
          if (dead.contains(b.ids(r))) mask(r) = true
          r += 1
        }
        b.copy(dead = mask)
      }
    }, preservesPartitioning = true)
      .setName(PackedKnn.residentName).persist(storage)
    marked.count()
    new PackedGraphCorpus(marked, pg.model, pg.dim, pg.degree,
      pg.efConstruction, pg.parents :+ (marked: RDD[_]))
  }

  /** Fold an append/remove chain into ONE persisted generation. Unlike
    * the code tiers, graph partitions already hold a single merged block
    * ([[append]] re-finalizes the cell's builder in place), so no merge
    * is needed — but every chained generation's arrays stay persisted
    * for unpersist bookkeeping and lineage, and a long CRUD history
    * multiplies the resident footprint. The fold re-persists the newest
    * blocks under a fresh handle and releases the chain. Results are
    * identical; only resident bytes change. */
  def compact[I: ClassTag](pg: PackedGraphCorpus[I],
              storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedGraphCorpus[I] = {
    if (pg.generations <= 1) return pg
    val folded = pg.blocks.mapPartitions(it => it,
      preservesPartitioning = true)
      .setName(PackedKnn.residentName).persist(storage)
    folded.count()
    new PackedGraphCorpus(folded, pg.model, pg.dim, pg.degree,
      pg.efConstruction)
  }

  /** Fraction of resident rows that are tombstones — the rebuild gauge:
    * dead rows cost walk visits and resident bytes but no correctness. */
  def deadFraction[I](pg: PackedGraphCorpus[I]): Double = {
    val (dead, total) = pg.blocks
      .map(b => ((b.rows - b.liveRows).toLong, b.rows.toLong))
      .fold((0L, 0L)) { case ((a1, b1), (a2, b2)) => (a1 + a2, b1 + b2) }
    if (total == 0L) 0.0 else dead.toDouble / total
  }

  /** Batch search: route each query to its nProbe nearest cells (the
    * shared driver probe ranking), walk each probed cell's graph with the
    * given ef, merge per-cell partials by (dist, id) on the driver.
    * `ef <= 0` means UNBOUNDED (exhaustive — the exactness contract). */
  /** Blocks below this row count walk from the static medoid entry —
    * beacon selection would cost a visible fraction of the whole walk. */
  private val BeaconMinRows = 4096
  /** Beacons scored per large block (one distance evaluation each). */
  private val BeaconCount = 64

  /** Query-adaptive walk SEEDS — hnswlib's upper layers (vectordb.py:
    * 18,527) re-expressed for the bounded-cell regime. Scores a spread
    * of candidate rows and returns ALL of them with their distances:
    *
    *  - the static medoid entry;
    *  - the [[EntryLadder]]'s beacons, then a stride sample INSIDE the
    *    best beacon's CSR group (the two-level descent — lands at
    *    distance quantile ~1/4096 of the cell where a flat sample lands
    *    at ~1/65); blocks without a ladder fall back to the flat
    *    [[BeaconCount]]-row stride sample;
    *
    * The caller hands the whole scored set to [[walk]] as frontier
    * seeds: every evaluation paid here ALSO fills the kept set, so the
    * termination bound starts tight and the expansion phase shrinks —
    * measured on an un-split 100k cell, total distance evaluations DROP
    * net of the seeding cost (RecallFloorSpec) where a best-entry-only
    * use of the same scores saved less than it cost. Correctness is
    * untouched: unbounded ef stays exhaustive through the protected
    * spanning tree from any seed set, and tombstoned seeds merely ROUTE
    * (walk never emits dead rows). Small blocks seed the plain medoid
    * entry. */
  private def beaconSeeds(b: GraphBlock[_], qv: Array[Float], qNorm: Double,
                          mcode: Int): Array[(Int, Double)] = {
    val n = b.rows
    def scored(r: Int): (Int, Double) = {
      if (WalkStats.enabled) WalkStats.evals.increment()
      (r, rowDist(b.mat, r, b.dim, b.sqrtNorms(r), qv, qNorm, mcode))
    }
    if (n < BeaconMinRows) return Array(scored(b.entry))
    val out = new ArrayBuffer[(Int, Double)](2 * BeaconCount + 1)
    out += scored(b.entry)
    val lad = b.ladder
    if (lad != null) {
      // level 1: score the beacons, remember the best GROUP
      var bestG = 0; var bestGd = Double.MaxValue
      var bi = 0
      while (bi < lad.beacons.length) {
        val r = lad.beacons(bi)
        val sc = scored(r)
        out += sc
        if (sc._2 < bestGd || (sc._2 == bestGd && r < lad.beacons(bestG))) {
          bestGd = sc._2; bestG = bi
        }
        bi += 1
      }
      // level 2: stride-sample INSIDE the best beacon's group
      val s = lad.off(bestG); val e = lad.off(bestG + 1)
      val gl = e - s
      if (gl > 0) {
        val step = math.max(1, gl / BeaconCount)
        var p = s + step / 2
        while (p < e) {
          out += scored(lad.perm(p))
          p += step
        }
      }
    } else {
      // legacy flat sample (blocks finalized before the ladder existed)
      val stride = n / BeaconCount
      var r = stride / 2
      while (r < n) {
        out += scored(r)
        r += stride
      }
    }
    out.toArray
  }

  /** Best seed = walk entry (smallest (dist, row) — deterministic). */
  private def bestSeed(seeds: Array[(Int, Double)]): Int = {
    var best = seeds(0)
    var i = 1
    while (i < seeds.length) {
      val s = seeds(i)
      if (s._2 < best._2 || (s._2 == best._2 && s._1 < best._1)) best = s
      i += 1
    }
    best._1
  }

  def searchGraph[I: ClassTag: Ordering](pg: PackedGraphCorpus[I],
                  queries: Array[(Long, Array[Float])],
                  k: Int, nProbe: Int, ef: Int = 64,
                  metric: String = "cosine"): Array[(Long, Array[(I, Double)])] = {
    require(queries.nonEmpty, "empty query batch")
    val mcode = mcodeOf(metric)
    val cents = pg.model.centroids
    val probes: Array[Array[Int]] =
      queries.map { case (_, qv) => PackedKnn.driverProbes(cents, qv, nProbe) }
    val byCell: Map[Int, Array[Int]] = probes.zipWithIndex
      .flatMap { case (cells, qi) => cells.map(c => (c, qi)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val partIds = byCell.keys.toArray.sorted
    val sc = pg.blocks.sparkContext
    val qs = queries
    val kk = math.max(k, 1)
    val efEff = if (ef <= 0) Int.MaxValue else math.max(ef, kk)
    val partials: Array[Array[(Int, I, Double)]] = sc.runJob(pg.blocks,
      (ctx: org.apache.spark.TaskContext, it: Iterator[GraphBlock[I]]) => {
        val qIdxs = byCell.getOrElse(ctx.partitionId(), Array.empty[Int])
        if (qIdxs.isEmpty || !it.hasNext) Array.empty[(Int, I, Double)]
        else {
          val b = it.next()
          val out = new ArrayBuffer[(Int, I, Double)]()
          qIdxs.foreach { qi =>
            val qv = qs(qi)._2
            require(qv.length == b.dim, s"query dim ${qv.length} != corpus dim ${b.dim}")
            var s = 0.0; var j = 0
            while (j < qv.length) { s += qv(j).toDouble * qv(j); j += 1 }
            val qn = math.sqrt(s)
            val seeds = beaconSeeds(b, qv, qn, mcode)
            val found = walk(b.mat, b.dim, b.sqrtNorms, new FrozenAdj(b.adj),
              b.rows, entry = bestSeed(seeds), qv, qn, efEff,
              mcode, b.dead, seeds = seeds)
            found.iterator.take(kk).foreach { case (row, dd) =>
              out += ((qi, b.ids(row), dd))
            }
          }
          out.toArray
        }
      }, scala.collection.immutable.ArraySeq.unsafeWrapArray(partIds))
    val byQuery = partials.iterator.flatten.toArray.groupBy(_._1)
    queries.indices.map { qi =>
      val merged = byQuery.getOrElse(qi, Array.empty[(Int, I, Double)])
        .map(t => (t._2, t._3))
        .sortBy { case (id, dd) => (dd, id) }
        .take(kk)
      (queries(qi)._1, merged)
    }.toArray
  }

  /** DataFrame serving facade — the [[PackedSq.search]] contract: capped
    * query-batch collect, resident walk, (query_id, rank, neighbor_id,
    * dist) out. Runs eagerly. */
  def search(pg: PackedGraphCorpus[Long], queries: DataFrame,
             k: Int, nProbe: Int, ef: Int = 64, metric: String = "cosine",
             queryId: String = "query_id", queryVec: String = "query_vec",
             maxQueryRows: Int = 65536): DataFrame = {
    val spark = queries.sparkSession
    val rows = queries
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .limit(maxQueryRows + 1)
      .collect()
    require(rows.length <= maxQueryRows,
      s"PackedGraph.search query batch exceeds maxQueryRows=$maxQueryRows: " +
        "the packed path merges per-query partials on the driver — route " +
        "corpus-sized query sets through Knn.knnJoin instead")
    require(rows.nonEmpty, "empty query batch")
    val qArr = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val res = searchGraph[Long](pg, qArr, k, nProbe, ef, metric)
    import spark.implicits._
    res.toSeq
      .flatMap { case (qid, nbrs) =>
        nbrs.iterator.zipWithIndex.map { case ((nid, d), pos) => (qid, pos + 1, nid, d) }
      }
      .toDF(queryId, "rank", "neighbor_id", "dist")
  }

  /** Resident footprint of the graph layer itself in int edge slots
    * (adjacency only — the float slabs are the [[PackedKnn]] tier's
    * 4·dim bytes/row on top). */
  def edgeSlots[I](pg: PackedGraphCorpus[I]): Long =
    pg.blocks.map(_.adj.iterator.map(_.length.toLong).sum).fold(0L)(_ + _)

  // ------------------------------------------------------ slab sidecars

  /** Persist the graph tier for warm start ([[PackedKnn.saveSlabs]]'s
    * rename-swap contract): adjacency + slabs per partition, the coarse
    * model, and the build degree as a marker — the graph build is the
    * most expensive ingest artifact on the ladder (sequential insertion
    * per cell), so at 100 TB a restart must reopen, not re-insert. */
  def saveSlabs[I: ClassTag](pg: PackedGraphCorpus[I], dir: String): Unit = {
    PackedKnn.writeSlabDir(pg.blocks, pg.dim, dir)
    val spark = org.apache.spark.sql.SparkSession.active
    ModelStore.saveIvf(spark, pg.model, s"$dir/ivf")
    ModelStore.writeString(s"$dir/graph.json",
      s"""{"degree": ${pg.degree}, "efConstruction": ${pg.efConstruction}, "format": $SlabFormat}""")
  }

  /** Slab wire-format version: bumped when [[GraphBlock]]'s serialized
    * shape changes (format 2 added the medoid entry row). A sidecar
    * written by an older format is treated as ABSENT — the Java-serialized
    * blocks would fail to deserialize anyway, so the caller cold-rebuilds
    * instead of dying on an InvalidClassException mid-search (format 3
    * added the two-level entry ladder). */
  private val SlabFormat = 3

  def slabsExist(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    PackedKnn.slabsExist(spark, dir) && ModelStore.exists(s"$dir/ivf") &&
      ModelStore.pathExists(s"$dir/graph.json") && {
        val raw = ModelStore.readString(s"$dir/graph.json")
        """"format"\s*:\s*(\d+)""".r.findFirstMatchIn(raw)
          .exists(_.group(1).toInt == SlabFormat)
      }

  /** Reopen: one task per cell reading exactly its slab — zero Exchange,
    * zero re-insertion. Partition i = cell i survives the sidecar. */
  def loadSlabs[I: ClassTag](spark: org.apache.spark.sql.SparkSession, dir: String,
                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PackedGraphCorpus[I] = {
    val ivf = ModelStore.loadIvf(spark, s"$dir/ivf")
    val markerJson = ModelStore.readString(s"$dir/graph.json")
    def intField(name: String, fallback: => Int): Int =
      ("\"" + name + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(markerJson)
        .map(_.group(1).toInt).getOrElse(fallback)
    val degree = intField("degree", throw new IllegalStateException(
      s"graph slab sidecar at $dir has a malformed graph.json: $markerJson"))
    // sidecars written before the append feature carry no efC — the
    // build default ratio is the safe reopen value
    val efC = intField("efConstruction", degree * 4)
    val (blocks, dim) = PackedKnn.readSlabDir[GraphBlock[I]](spark, dir, storage)
    require(blocks.getNumPartitions == ivf.numCells,
      s"graph slab sidecar at $dir has ${blocks.getNumPartitions} partitions " +
        s"but the coarse model has ${ivf.numCells} cells")
    new PackedGraphCorpus(blocks, ivf, dim, degree, efC)
  }
}
