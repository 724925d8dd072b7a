package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Property graph over DataFrames — vertices(id, labels, properties-ish
  * typed columns), edges(id, src, dst, type), hyperedges(id, nodes, type)
  * — re-expressing reference graph.py's GraphDB.
  *
  * The reference maintains five hash indexes (graph.py:253-488) for point
  * lookups; distributed, those are equi-joins (hash-partitioned by key =
  * the same index, sharded) plus optional bucketing. Traversals are
  * iterative frontier joins with the frontier checkpointed each hop —
  * Spark has no native recursion, so the loop lives on the driver but
  * every hop is a fully distributed join (SURVEY §4.2.4).
  */
object PropertyGraph {

  /** 1-hop neighbors (graph.py:818-842): direction in|out|both, optional
    * edge-type filter. Returns (node_id, neighbor_id, edge_type). */
  def neighbors(edges: DataFrame, nodeFilter: Column = lit(true),
                direction: String = "both",
                edgeType: Option[String] = None): DataFrame = {
    val typed = edgeType.map(t => edges.where(col("type") === t)).getOrElse(edges)
    val out = typed.select(col("src").as("node_id"), col("dst").as("neighbor_id"), col("type").as("edge_type"))
    val in = typed.select(col("dst").as("node_id"), col("src").as("neighbor_id"), col("type").as("edge_type"))
    val dird = direction match {
      case "out" => out
      case "in" => in
      case "both" => out.unionByName(in)
      case other => throw new IllegalArgumentException(s"direction: $other")
    }
    dird.where(nodeFilter)
  }

  /** Frontier frames at or below this estimated size (bytes, row count ×
    * schema default width) are broadcast into the per-hop join. The
    * ADJACENCY is never broadcast: it is the 100TB side — BFS from a few
    * seeds starts at |seeds| rows, so the frontier is the provably small
    * side of every early hop. */
  private val BroadcastFrontierBytes = 8L << 20

  /** Materialized adjacency for the iterative operators: hash-partitioned
    * by node_id ONCE and persisted. Every hop joins on node_id, so the
    * cached layout already satisfies the join's distribution — Catalyst
    * reuses it and only the frontier side ever shuffles (or, when the
    * frontier is small, broadcasts, moving nothing at all). No count job:
    * the first hop materializes the cache. */
  private[graft] def materializedAdj(edges: DataFrame, direction: String,
                                     edgeType: Option[String]): DataFrame = {
    val p = edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    neighbors(edges, direction = direction, edgeType = edgeType)
      .select(col("node_id"), col("neighbor_id"))
      .repartition(p, col("node_id"))
      .persist()
  }

  /** One traversal hop: frontier ⋈ adjacency on end_id = node_id. The
    * frontier is the broadcast side when its (estimated) size fits the
    * budget — rowsHint < 0 means unknown, which falls back to the
    * shuffled join against the pre-partitioned cached adjacency. Either
    * way the adjacency never moves. */
  private[graft] def hopJoin(frontier: DataFrame, adj: DataFrame,
                             rowsHint: Long): DataFrame = {
    val bytesPerRow = math.max(frontier.schema.defaultSize.toLong, 1L)
    val f = if (rowsHint >= 0 && rowsHint * bytesPerRow <= BroadcastFrontierBytes)
      broadcast(frontier) else frontier
    f.join(adj, f("end_id") === adj("node_id"))
  }

  /** Var-length traversal (graph.py:844-869): all simple paths from the
    * seed set up to maxDepth hops, cycle-avoidance within each path.
    * Returns (start_id, end_id, depth, path).
    *
    * Per-hop frontiers are persisted (hop k+1 must not replay hops 1..k)
    * and released once the final localCheckpoint has materialized the
    * result — the caller's frame owns its own storage. */
  def traverse(edges: DataFrame, seeds: DataFrame, maxDepth: Int,
               direction: String = "out",
               edgeType: Option[String] = None): DataFrame = {
    val adj = materializedAdj(edges, direction, edgeType)
    var frontier = seeds.select(col("id").as("start_id"), col("id").as("end_id"),
      lit(0).as("depth"), array(col("id").cast("string")).as("path"))
      .persist()
    // Per-hop count on the persisted frontier, same stance as
    // shortestPaths: the count triples as (a) cache materialization,
    // (b) the broadcast-size hint for the NEXT hop — a seed-limited
    // frontier broadcasts into the join and the cached adjacency moves
    // nothing — and (c) an early exit when the traversal drains before
    // maxDepth (a dead frontier previously still paid maxDepth joins).
    var n = frontier.count()
    var all = frontier
    val hops = scala.collection.mutable.ListBuffer[DataFrame](frontier)
    var d = 0
    try {
      while (d < maxDepth && n > 0) {
        frontier = hopJoin(frontier, adj, rowsHint = n)
          .where(!array_contains(col("path"), col("neighbor_id").cast("string")))
          .select(col("start_id"), col("neighbor_id").as("end_id"),
            (col("depth") + 1).as("depth"),
            concat(col("path"), array(col("neighbor_id").cast("string"))).as("path"))
          .persist()
        n = frontier.count()
        hops += frontier
        all = all.unionByName(frontier)
        d += 1
      }
      all.where(col("depth") > 0).localCheckpoint(eager = true)
    } finally {
      hops.foreach(_.unpersist())
      adj.unpersist()
    }
  }

  /** BFS shortest path lengths from seeds (graph.py:871-902): Pregel-style
    * frontier expansion with a visited set, capped at maxDepth. Returns
    * (start_id, end_id, hops) — minimal hops per reachable pair.
    *
    * One blocking job per hop: the new frontier is persisted and counted
    * (the count doubles as both cache materialization and the emptiness
    * check). The visited set stays a union of the persisted frontiers —
    * every leaf cached, so no per-hop checkpoint job and no lineage
    * replay — and is checkpointed ONCE on exit, after which all frontier
    * storage is released. */
  def shortestPaths(edges: DataFrame, seeds: DataFrame, maxDepth: Int,
                    direction: String = "both",
                    edgeType: Option[String] = None): DataFrame = {
    val adj = materializedAdj(edges, direction, edgeType)
    val frontiers = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var frontier = seeds.select(col("id").as("start_id"), col("id").as("end_id"),
      lit(0).as("hops")).persist()
    frontiers += frontier
    var visited = frontier
    var n = frontier.count()
    var d = 0
    try {
      while (d < maxDepth && n > 0) {
        // the per-hop emptiness count doubles as the broadcast-size hint:
        // a seed-limited frontier broadcasts, the cached adjacency never moves
        val expanded = hopJoin(frontier, adj, rowsHint = n)
          .select(col("start_id"), col("neighbor_id").as("end_id"), (col("hops") + 1).as("hops"))
          .groupBy("start_id", "end_id").agg(min("hops").as("hops"))
        val seen = visited.select(col("start_id").as("_vs"), col("end_id").as("_ve"))
        val next = expanded.join(seen,
          expanded("start_id") === seen("_vs") && expanded("end_id") === seen("_ve"), "left_anti")
          .persist()
        n = next.count()
        frontiers += next
        if (n > 0) visited = visited.unionByName(next)
        frontier = next
        d += 1
      }
      visited.localCheckpoint(eager = true)
    } finally {
      frontiers.foreach(_.unpersist())
      adj.unpersist()
    }
  }

  /** Hyperedge membership (graph.py:457-478, 800-812): hyperedges touching
    * ANY of the given nodes (union) or ALL of them (intersection —
    * group-count equals the query-set size). */
  def hyperedgesForNodes(hyperedges: DataFrame, nodeIds: Seq[String],
                         mode: String = "any"): DataFrame = {
    val exploded = hyperedges
      .select(col("id"), col("type"), explode(col("nodes")).as("member"))
      .where(col("member").isin(nodeIds: _*))
    mode match {
      case "any" => exploded.select("id", "type").distinct()
      case "all" =>
        exploded.groupBy("id", "type")
          .agg(countDistinct("member").as("n"))
          .where(col("n") === nodeIds.distinct.size)
          .select("id", "type")
      case other => throw new IllegalArgumentException(s"mode: $other")
    }
  }

  /** Graph mutations as batch set operations (reference Suite 2 exercises
    * add/update/delete with hash-index maintenance, graph.py:150-250;
    * distributed, the "indexes" are the frames themselves so maintenance
    * is just the Crud algebra — plus the edge cascade the reference
    * applies on node removal). */
  def addNodes(vertices: DataFrame, nodes: DataFrame): DataFrame =
    Crud.insertNew(vertices, nodes, "id")

  def updateNodes(vertices: DataFrame, updates: DataFrame): DataFrame =
    Crud.upsert(vertices, updates, "id")

  /** PARTIAL node update with the reference's merge semantics
    * (graph.py:603-640 update_node): property columns present in `updates`
    * overwrite only where non-null — absent/null keeps the existing value
    * (the reference merges into the existing dict; it cannot express
    * set-to-null either) — and update columns new to the graph appear as
    * new property columns (null elsewhere). Labels: addLabels unioned,
    * removeLabels removed, on matched nodes only. Non-matching update ids
    * are ignored (the reference returns False). One broadcast-able left
    * join; no full-row replacement. */
  def updateNodesPartial(vertices: DataFrame, updates: DataFrame,
                         addLabels: Seq[String] = Nil,
                         removeLabels: Seq[String] = Nil): DataFrame = {
    val uCols = updates.columns.filterNot(Set("id", "labels")).toSeq
    val u = updates.select(
      (col("id").as("_uid") +: uCols.map(c => col(c).as(s"_u_$c"))): _*)
    val joined = vertices.join(broadcast(u), vertices("id") === u("_uid"), "left")
    val matched = col("_uid").isNotNull
    val outCols = vertices.columns.toSeq.map {
      case "labels" =>
        val withAdds =
          if (addLabels.isEmpty) col("labels")
          else array_union(col("labels"), array(addLabels.map(lit): _*))
        val merged =
          if (removeLabels.isEmpty) withAdds
          else array_except(withAdds, array(removeLabels.map(lit): _*))
        when(matched, merged).otherwise(col("labels")).as("labels")
      case c if uCols.contains(c) => coalesce(col(s"_u_$c"), col(c)).as(c)
      case c => col(c)
    }
    val newCols = uCols.filterNot(vertices.columns.contains)
      .map(c => when(matched, col(s"_u_$c")).as(c))
    joined.select(outCols ++ newCols: _*)
  }

  /** Property-range node finder (graph.py:688-702
    * find_nodes_by_property_range): nodes whose `key` property lies in
    * [minVal, maxVal] — a plain pushdown-friendly range predicate. */
  def findNodesByRange(vertices: DataFrame, key: String,
                       minVal: Any, maxVal: Any): DataFrame =
    vertices.where(col(key) >= lit(minVal) && col(key) <= lit(maxVal))

  /** Remove nodes AND every edge touching them (graph.py:214-238 removes
    * incident edges from all adjacency indexes). Returns (vertices, edges). */
  def removeNodes(vertices: DataFrame, edges: DataFrame,
                  nodeIds: Seq[String]): (DataFrame, DataFrame) = {
    val v = vertices.where(!col("id").isin(nodeIds: _*))
    val e = edges.where(!col("src").isin(nodeIds: _*) &&
      !col("dst").isin(nodeIds: _*))
    (v, e)
  }

  /** Tagged union of the two limit(1)-bounded validation probes — ONE
    * blocking job where two ran before (at ingest cadence the per-batch
    * driver round-trips halve). Each branch is locally limit(1)-bounded,
    * so either scan still stops at its first violating row. */
  private def firstViolation(missingMembers: DataFrame,
                             duplicateIds: DataFrame): Option[(String, String)] =
    missingMembers.select(lit("missing").as("kind"), col("id"))
      .limit(1)
      .unionByName(duplicateIds.select(lit("dup").as("kind"), col("id")).limit(1))
      .limit(1).collect().headOption
      .map(r => (r.getString(0), r.getString(1)))

  /** Edge creation with the reference's validation (graph.py:708-727
    * create_edge): both endpoints must exist, and an existing edge id is
    * an error. One existence-check job (limit(1)-bounded scans), then a
    * union — the distributed analog of the reference's dict insert +
    * adjacency/type index add (the frames ARE the indexes here). */
  def addEdges(vertices: DataFrame, edges: DataFrame,
               newEdges: DataFrame): DataFrame = {
    val vids = vertices.select(col("id"))
    val missing = newEdges
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .join(vids, Seq("id"), "left_anti")
    val dup = newEdges.select("id")
      .join(edges.select("id"), Seq("id"), "left_semi")
    firstViolation(missing, dup).foreach {
      case ("missing", id) => throw new IllegalArgumentException(
        s"addEdges: endpoint node '$id' not found")
      case (_, id) => throw new IllegalArgumentException(
        s"addEdges: edge '$id' already exists")
    }
    edges.unionByName(newEdges, allowMissingColumns = true)
  }

  /** Edge deletion by id (graph.py:729-739 delete_edge). */
  def removeEdges(edges: DataFrame, edgeIds: Seq[String]): DataFrame =
    edges.where(!col("id").isin(edgeIds: _*))

  /** Hyperedge creation (graph.py:766-779 create_hyperedge): every member
    * node must exist; duplicate hyperedge id is an error. Both probes run
    * as one tagged-union job like [[addEdges]]. */
  def addHyperedges(vertices: DataFrame, hyperedges: DataFrame,
                    newHyperedges: DataFrame): DataFrame = {
    val vids = vertices.select(col("id"))
    val missing = newHyperedges
      .select(explode(col("nodes")).as("id"))
      .join(vids, Seq("id"), "left_anti")
    val dup = newHyperedges.select("id")
      .join(hyperedges.select("id"), Seq("id"), "left_semi")
    firstViolation(missing, dup).foreach {
      case ("missing", id) => throw new IllegalArgumentException(
        s"addHyperedges: member node '$id' not found")
      case (_, id) => throw new IllegalArgumentException(
        s"addHyperedges: hyperedge '$id' already exists")
    }
    hyperedges.unionByName(newHyperedges, allowMissingColumns = true)
  }

  /** Hyperedge deletion by id (graph.py:785-793 delete_hyperedge). */
  def removeHyperedges(hyperedges: DataFrame, hyperedgeIds: Seq[String]): DataFrame =
    hyperedges.where(!col("id").isin(hyperedgeIds: _*))

  /** Node removal with the reference's full cascade semantics
    * (graph.py:625-650 delete_node): cascade=true deletes incident edges
    * AND every hyperedge CONTAINING a removed node — the whole hyperedge
    * goes, not just the membership (graph.py:647-650). cascade=false is
    * the reference's fail-loudly mode (graph.py:640-641): refuse the
    * delete if any removed node still has an incident edge or hyperedge.
    * Returns (vertices, edges, hyperedges). */
  def removeNodes(vertices: DataFrame, edges: DataFrame,
                  hyperedges: DataFrame, nodeIds: Seq[String],
                  cascade: Boolean): (DataFrame, DataFrame, DataFrame) = {
    val ids = array(nodeIds.map(lit): _*)
    val touchedEdge = col("src").isin(nodeIds: _*) || col("dst").isin(nodeIds: _*)
    val touchedHyper = arrays_overlap(col("nodes"), ids)
    if (!cascade) {
      // existence checks, not counts — limit(1) stops each scan at the
      // first incident row
      if (edges.where(touchedEdge).limit(1).count() > 0 ||
          hyperedges.where(touchedHyper).limit(1).count() > 0)
        throw new IllegalStateException(
          s"cannot delete nodes [${nodeIds.mkString(",")}]: incident " +
            "edges/hyperedges exist and cascade=false")
    }
    (vertices.where(!col("id").isin(nodeIds: _*)),
      edges.where(!touchedEdge),
      hyperedges.where(!touchedHyper))
  }

  /** Graph stats (graph.py:917-926): counts + distinct labels/types —
    * one lazy union-of-aggregates plan, so the caller pays a single job
    * instead of five driver-side counts. */
  def stats(vertices: DataFrame, edges: DataFrame,
            hyperedges: Option[DataFrame] = None): DataFrame = {
    def one(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("value")).select(lit(name).as("stat"), col("value"))
    val spark = vertices.sparkSession
    import spark.implicits._
    one("num_nodes", vertices)
      .unionByName(one("num_edges", edges))
      .unionByName(hyperedges.map(h => one("num_hyperedges", h))
        .getOrElse(Seq(("num_hyperedges", 0L)).toDF("stat", "value")))
      .unionByName(one("num_labels", vertices.select(explode(col("labels"))).distinct()))
      .unionByName(one("num_edge_types", edges.select("type").distinct()))
  }

  // ------------------------------------------------------- graph analytics

  /** Connected components over the undirected view of an edge relation:
    * (node_id, component_id) for every node in >= 1 edge, component_id =
    * MIN node id of the component — the first-class graph surface of the
    * alternating large-star/small-star kernel (Kiveris et al., SoCC'14)
    * that dedup clustering already runs ([[Dedup.duplicateClusters]]);
    * the reference's component-style traversals (graph.py:844-902) walk
    * adjacency per seed, which cannot enumerate all components at scale.
    * O(log n) rounds regardless of component diameter; each round is a
    * groupBy-min + self-join on the edge relation (see the kernel's doc
    * for the fixpoint machinery). Isolated vertices (no edges) are not
    * emitted — union them in as their own singleton components if the
    * vertex relation is authoritative. */
  def connectedComponents(edges: DataFrame, srcCol: String = "src",
                          dstCol: String = "dst",
                          maxIters: Int = 50): DataFrame =
    Dedup.duplicateClusters(
        edges.select(col(srcCol).as("id_a"), col(dstCol).as("id_b")),
        "id_a", "id_b", maxIters)
      .select(col("doc_id").as("node_id"), col("cluster_id").as("component_id"))

  /** PageRank in the normalized (probability) formulation: ranks start
    * at 1/N, each round `rank = (1-d)/N + d·Σ_in rank_src/outdeg_src`;
    * by DEFAULT dangling-node mass is not redistributed and the
    * iteration count is fixed — deterministic, oracle-checkable
    * (`tolerance` and `redistributeDangling` opt into early-stop
    * convergence and the standard dangling-mass term; see
    * [[pageRankWithStats]]). (Normalized on purpose: with the
    * unnormalized GraphX convention every rank on an integer-out-degree
    * graph is a terminating decimal, which can sit EXACTLY on a rounding
    * boundary and flip under cross-engine summation-order noise; 1/N
    * makes the values non-terminating, so boundaries are hit with
    * probability ~0.)
    *
    * Scale shape: the adjacency (edge list + out-degree) is partitioned
    * by src and cached ONCE; each round re-shuffles only the rank vector
    * (one src-keyed join, one dst-keyed aggregate — the two-exchange
    * round every distributed PageRank pays). localCheckpoint fires every
    * `checkpointInterval` rounds; the default of 1 (every round) is the
    * measured optimum — although the rank lineage is linear (one
    * downstream reference per round), letting 4-5 rounds of join+agg
    * nest into one plan measured ~2x SLOWER end-to-end than per-round
    * materialization (deep shuffle chains replan poorly under AQE). */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               damping: Double = 0.85,
               checkpointInterval: Int = 1,
               tolerance: Double = 0.0,
               redistributeDangling: Boolean = false): DataFrame =
    pageRankWithStats(edges, iterations, damping, checkpointInterval,
      tolerance, redistributeDangling)._1

  /** [[pageRank]] plus the number of rounds actually run (== `iterations`
    * unless `tolerance` stopped early) — package-private so the spec can
    * assert convergence behavior without timing heuristics.
    *
    * `tolerance > 0` adds an early stop: after each round, max |Δrank| is
    * measured (one scalar aggregate over the node-sized rank vector —
    * cheap next to the round's own two exchanges) and iteration ends once
    * it drops below the tolerance. `redistributeDangling` adds the
    * standard dangling-mass term (rank mass sitting on nodes with no
    * out-edges is spread uniformly: rank = (1-d)/N + d·(Σ inflow + dm/N),
    * the convention GraphX/NetworkX follow), at the cost of one scalar
    * aggregate per round. Both are OFF by default — the fixed-iteration,
    * no-redistribution form stays byte-stable for the cross-engine
    * oracle, and when both flags are off the per-round plan is the
    * IDENTICAL column expression (no `+ 0.0` term sneaks in). */
  private[graft] def pageRankWithStats(edges: DataFrame, iterations: Int = 5,
               damping: Double = 0.85,
               checkpointInterval: Int = 1,
               tolerance: Double = 0.0,
               redistributeDangling: Boolean = false): (DataFrame, Int) = {
    require(iterations > 0, s"iterations must be positive: $iterations")
    val spark = edges.sparkSession
    val nparts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col("src"), col("dst"))
    val adj = e.join(e.groupBy("src").agg(count(lit(1)).as("_outdeg")), "src")
      .repartition(nparts, col("src")).persist()
    val plainNodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    // with redistribution the node relation carries a dangling flag
    // (appears as a dst but never as a src), so each round's dangling
    // mass is harvested by an observe() metric ON the round's own
    // checkpoint action — zero extra jobs, where a separate per-round
    // aggregate would double the round count's fixed job cost
    val nodes =
      (if (redistributeDangling)
        plainNodes.join(e.select(col("src").as("id")).distinct()
            .withColumn("_out", lit(true)), Seq("id"), "left")
          .select(col("id"), col("_out").isNull.as("_dangling"))
      else plainNodes).persist()
    try {
      val n = nodes.count().toDouble
      // teleport written as (1.0 - d)/n IN COLUMN ALGEBRA so an SQL
      // oracle computing literally (1.0 - 0.85)/n gets the identical
      // double (1 - 0.85 as a double subtraction != the literal 0.15)
      val teleport = (lit(1.0) - lit(damping)) / lit(n)
      var ranks = nodes.withColumn("rank", lit(1.0) / lit(n))
      // round-0 dangling mass needs its own (node-vector-sized) scalar
      // job; every later round's rides the checkpoint observation
      var dm: Double =
        if (redistributeDangling)
          ranks.where(col("_dangling"))
            .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
        else 0.0
      var itersRun = 0
      var converged = false
      for (i <- 1 to iterations if !converged) {
        // Zero-fill by UNION, not join (r14, guide §2.4): a per-node 0.0
        // row rides the round's one dst-keyed exchange and the aggregate
        // replaces the old `nodes LEFT JOIN inflow` + coalesce — one whole
        // join (and its broadcast/shuffle stage) gone from every round.
        // Bit-identical: contributions are positive finite doubles, and
        // x + 0.0 == x for them, so inserting a 0.0 term leaves every
        // partial sum unchanged; a node with no inflow sums to exactly
        // the 0.0 the coalesce produced. The dangling flag rides the
        // zero row (exactly one per node); contributions carry null, so
        // max() recovers the flag deterministically.
        val contribs = adj
          .join(ranks.select(col("id").as("src"), col("rank")), "src")
          .select(col("dst").as("id"), (col("rank") / col("_outdeg")).as("_c"))
        val zeros = nodes.select(
          col("id") +: lit(0.0).as("_c") +:
            (if (redistributeDangling) Seq(col("_dangling")) else Nil): _*)
        val unioned =
          if (redistributeDangling)
            contribs.withColumn("_dangling", lit(null).cast("boolean"))
              .unionByName(zeros)
          else contribs.unionByName(zeros)
        val aggCols = sum(col("_c")).as("_inflow") +:
          (if (redistributeDangling) Seq(max(col("_dangling")).as("_dangling")) else Nil)
        val inflow = unioned.groupBy("id").agg(aggCols.head, aggCols.tail: _*)
        val spread =
          if (redistributeDangling) col("_inflow") + lit(dm) / lit(n)
          else col("_inflow")
        val outCols = col("id") +:
          (teleport + lit(damping) * spread).as("rank") +:
          (if (redistributeDangling) Seq(col("_dangling")) else Nil)
        var next = inflow.select(outCols: _*)
        val obs =
          if (redistributeDangling) {
            val o = org.apache.spark.sql.Observation(s"pr_dangling_$i")
            next = next.observe(o, coalesce(
              sum(when(col("_dangling"), col("rank"))), lit(0.0)).as("dm"))
            Some(o)
          } else None
        // redistribution materializes every round regardless of the
        // checkpoint interval: the next round's dangling scalar comes
        // from this round's action
        if (i % checkpointInterval == 0 || i == iterations || tolerance > 0 ||
            redistributeDangling)
          next = next.localCheckpoint(eager = true)
        obs.foreach(o => dm = o.get("dm").asInstanceOf[Double])
        if (tolerance > 0) {
          val delta = next
            .join(ranks.select(col("id"), col("rank").as("_prev")), "id")
            .agg(max(abs(col("rank") - col("_prev")))).head().getDouble(0)
          if (delta < tolerance) converged = true
        }
        ranks = next
        itersRun = i
      }
      (ranks.drop("_dangling"), itersRun)
    } finally {
      adj.unpersist(); nodes.unpersist()
    }
  }

  /** Personalized PageRank (the random surfer teleports back to the
    * SOURCE set, not uniformly — Jeh & Widom WWW'03): mass starts at
    * 1/|S| on the sources, each round
    * `rank = (1-d)·1[v∈S]/|S| + d·Σ_in rank_src/outdeg_src`. The
    * relevance ranking "how reachable is v FROM these seeds" — the graph
    * side of seed-expansion retrieval, where plain PageRank is global
    * importance. Fixed-iteration, no dangling redistribution — the
    * [[pageRank]] oracle-stable stance — and the same two-exchange round
    * shape: cached src-partitioned adjacency, only the rank vector
    * shuffles per round. */
  def personalizedPageRank(edges: DataFrame, sources: Seq[String],
                           iterations: Int = 5, damping: Double = 0.85,
                           checkpointInterval: Int = 1): DataFrame = {
    require(iterations > 0, s"iterations must be positive: $iterations")
    require(sources.nonEmpty, "personalizedPageRank needs at least one source")
    val spark = edges.sparkSession
    val nparts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col("src"), col("dst"))
    val adj = e.join(e.groupBy("src").agg(count(lit(1)).as("_outdeg")), "src")
      .repartition(nparts, col("src")).persist()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .withColumn("_src", col("id").isin(sources: _*)).persist()
    try {
      val nSrc = nodes.where(col("_src")).count()
      require(nSrc == sources.distinct.length,
        s"personalizedPageRank: ${sources.distinct.length - nSrc} source(s) " +
          s"absent from the graph: sources must be existing node ids")
      // teleport algebra mirrors pageRank: (1.0 - d)/|S| as COLUMN ops so
      // the SQL oracle's literal arithmetic lands on the identical double
      val teleport = (lit(1.0) - lit(damping)) / lit(nSrc.toDouble)
      val seed = when(col("_src"), lit(1.0) / lit(nSrc.toDouble)).otherwise(lit(0.0))
      var ranks = nodes.withColumn("rank", seed)
      for (i <- 1 to iterations) {
        // union zero-fill, not a join — the pageRank r14 rewrite: the
        // per-node 0.0 row rides the dst-keyed exchange, max() recovers
        // the _src flag from the zero row (contributions carry null)
        val inflow = adj
          .join(ranks.select(col("id").as("src"), col("rank")), "src")
          .select(col("dst").as("id"), (col("rank") / col("_outdeg")).as("_c"),
            lit(null).cast("boolean").as("_src"))
          .unionByName(nodes.select(col("id"), lit(0.0).as("_c"), col("_src")))
          .groupBy("id").agg(sum(col("_c")).as("_inflow"),
            max(col("_src")).as("_src"))
        var next = inflow
          .select(col("id"), col("_src"),
            (when(col("_src"), teleport).otherwise(lit(0.0)) +
              lit(damping) * col("_inflow")).as("rank"))
        if (i % checkpointInterval == 0 || i == iterations)
          next = next.localCheckpoint(eager = true)
        ranks = next
      }
      ranks.drop("_src")
    } finally {
      adj.unpersist(); nodes.unpersist()
    }
  }

  /** HITS hubs-and-authorities (Kleinberg JACM'99) in the sum-normalized
    * formulation: hubs start at 1/N; each round
    * `auth(v) = Σ_{u→v} hub(u)` then `auth ← auth/Σauth`, followed by
    * `hub(u) = Σ_{u→v} auth(v)` then `hub ← hub/Σhub`. Sum-normalization
    * (not the L2 of the original paper) keeps every intermediate a plain
    * ratio of sums — the same cross-engine-roundable regime as
    * [[pageRank]]'s 1/N formulation — and converges to the same ranking
    * (normalization never reorders a non-negative eigenvector iterate).
    * Fixed iteration count, deterministic, oracle-checkable. Returns
    * (id, authority, hub) over all nodes; pure sources score authority 0,
    * pure sinks hub 0 — not NULL — like the reference's degree-style
    * stats over its node universe (graph.py:436-515).
    *
    * Scale shape mirrors [[pageRank]]: the edge list is cached ONCE in
    * both join layouts (src-keyed for the auth gather, dst-keyed for the
    * hub gather); each half-round shuffles only the node-sized score
    * vector, and the normalization sum rides an observe() metric on the
    * half-round's own checkpoint action — zero extra jobs. */
  def hits(edges: DataFrame, iterations: Int = 5): DataFrame = {
    require(iterations > 0, s"iterations must be positive: $iterations")
    val spark = edges.sparkSession
    val nparts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col("src"), col("dst"))
    val bySrc = e.repartition(nparts, col("src")).persist()
    val byDst = e.repartition(nparts, col("dst")).persist()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().persist()
    try {
      val n = nodes.count().toDouble
      var hubs = nodes.withColumn("score", lit(1.0) / lit(n))
      var auths = hubs
      // one half-round: gather scores across edges in the given
      // direction, zero-fill the node universe, materialize the RAW
      // vector with its sum observed, then normalize lazily on top of
      // the checkpointed rows (the division never re-runs the gather)
      def halfRound(scores: DataFrame, keyIn: String, keyOut: String,
                    layout: DataFrame, tag: String): DataFrame = {
        // zero-fill by UNION into the gather's own aggregate (r14, guide
        // §2.4): the old `nodes LEFT JOIN raw` + coalesce cost a second
        // join stage per half-round; a per-node 0.0 row in the same
        // dst-keyed exchange is bit-identical (x + 0.0 == x for the
        // positive finite gathered scores) and the observed sum is
        // unchanged (zeros add +0.0)
        val raw = layout
          .join(scores.select(col("id").as(keyIn), col("score")), keyIn)
          .select(col(keyOut).as("id"), col("score").as("_c"))
          .unionByName(nodes.select(col("id"), lit(0.0).as("_c")))
          .groupBy("id").agg(sum(col("_c")).as("_raw"))
        val o = org.apache.spark.sql.Observation(tag)
        val mat = raw
          .observe(o, sum(col("_raw")).as("s"))
          .localCheckpoint(eager = true)
        val s = o.get("s").asInstanceOf[Double]
        mat.select(col("id"), (col("_raw") / lit(s)).as("score"))
      }
      // FUSED full round: the auth half's normalization cancels out of
      // the hub update (gather is linear — gather(raw/sa)/Σgather(raw/sa)
      // = gather(raw)/Σgather(raw)), so both gathers compose into ONE
      // plan with ONE checkpoint action per round instead of two. The
      // intermediate auth vector needs no zero-fill: a zero score adds
      // +0.0 to a sum (bit-neutral) and an absent group lands as 0.0 via
      // the outer coalesce either way. The LAST round runs unfused so
      // the emitted (auth, hub) pair keeps the half-round arithmetic
      // bit-for-bit.
      def fusedRound(scores: DataFrame, tag: String): DataFrame = {
        // same union zero-fill as halfRound on the hub gather; the fused
        // intermediate auth vector still needs no zero-fill at all
        val rawA = bySrc
          .join(scores.select(col("id").as("src"), col("score")), "src")
          .groupBy(col("dst")).agg(sum(col("score")).as("score"))
        val rawH = byDst.join(rawA, "dst")
          .select(col("src").as("id"), col("score").as("_c"))
          .unionByName(nodes.select(col("id"), lit(0.0).as("_c")))
          .groupBy("id").agg(sum(col("_c")).as("_raw"))
        val o = org.apache.spark.sql.Observation(tag)
        val mat = rawH
          .observe(o, sum(col("_raw")).as("s"))
          .localCheckpoint(eager = true)
        val s = o.get("s").asInstanceOf[Double]
        mat.select(col("id"), (col("_raw") / lit(s)).as("score"))
      }
      for (i <- 1 until iterations)
        hubs = fusedRound(hubs, s"hits_r_$i")
      auths = halfRound(hubs, "src", "dst", bySrc, s"hits_a_$iterations")
      hubs = halfRound(auths, "dst", "src", byDst, s"hits_h_$iterations")
      auths.select(col("id"), col("score").as("authority"))
        .join(hubs.select(col("id"), col("score").as("hub")), "id")
    } finally {
      bySrc.unpersist(); byDst.unpersist(); nodes.unpersist()
    }
  }

  /** k-core of the undirected graph (Seidman'83): the maximal subgraph
    * in which every node has degree >= k, computed by synchronous
    * peeling — each round drops EVERY node whose degree within the
    * current survivor set is below k, until a fixpoint. Rounds are
    * deterministic, so a fixed-round SQL unroll reproduces the result
    * exactly once both sides have converged (peeling is idempotent at
    * the fixpoint — extra rounds are no-ops). Returns the surviving
    * nodes with their within-core degree.
    *
    * Scale shape: input edges are symmetrized + distinct ONCE and
    * cached; each round is one semi-join of the edge list against the
    * survivor set (both endpoints) + one degree aggregation — the edge
    * relation never rebuilds, only the node-sized survivor vector
    * moves. The fixpoint probe rides the survivor count the round
    * already pays for. Peel depth is bounded by the longest removal
    * cascade; `maxIters` is a fail-loud bound, not a silent truncation. */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 50): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val spark = edges.sparkSession
    val nparts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col("src"), col("dst"))
    val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
      .repartition(nparts, col("src")).persist()
    try {
      var alive = und.select(col("src").as("id")).distinct()
        .localCheckpoint(eager = true)
      var aliveN = alive.count()
      var converged = false
      var iters = 0
      while (!converged && iters < maxIters) {
        val deg = und
          .join(alive.select(col("id").as("src")), "src")
          .join(alive.select(col("id").as("dst")), "dst")
          .groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
        val next = deg.where(col("degree") >= k)
          .localCheckpoint(eager = true)
        val nextN = next.count()
        converged = nextN == aliveN
        alive = next.select("id")
        aliveN = nextN
        iters += 1
        if (aliveN == 0) converged = true
      }
      require(converged,
        s"kCore(k=$k) did not converge within $maxIters peel rounds — raise maxIters")
      // final degrees over the fixpoint survivor set
      und.join(alive.select(col("id").as("src")), "src")
        .join(alive.select(col("id").as("dst")), "dst")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
    } finally und.unpersist()
  }

  /** Orient each canonical undirected edge {a,b} from its LOWER-degree
    * endpoint (ties broken by id), returning (u, v, rv) where rv is v's
    * (degree, id) rank struct — kept so the wedge join can order the two
    * out-neighbors without re-joining degrees. Degree ordering is THE
    * scale guard for triangle enumeration: out-degree under it is
    * O(sqrt m), so wedge volume is O(m^1.5) instead of the id-ordered
    * Σd(v)² that explodes on a power-law hub (a degree-d hub with a low
    * id yields C(d,2) wedges). Package-private so the spec can assert
    * wedge volume directly. */
  private[graft] def orientByDegree(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // struct comparison is lexicographic: (deg, id) is a total order
    und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("v"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("db").as("deg"), col("b").as("id")))
          .otherwise(struct(col("da").as("deg"), col("a").as("id"))).as("rv"))
  }

  /** Per-node triangle participation counts over an undirected edge list:
    * canonicalize every edge, orient it low-degree-endpoint-first
    * ([[orientByDegree]]), build wedges with one self-join on the SOURCE
    * (each wedge generated at its lowest-degree corner, the two out-
    * neighbors ordered by rank so every wedge appears once), close them
    * against the oriented edge list with a second equi-join — each
    * triangle enumerated exactly once. Both joins are equi-joins on node
    * ids (shuffle-partitioned, no broadcast of the edge list) and wedge
    * volume is O(m^1.5) regardless of skew, so the plan carries to any
    * graph that fits a shuffle. Returns (id, triangles) for every node
    * incident to at least one edge. */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct().persist()
    try {
      val oriented = orientByDegree(und).persist()
      try {
        val wedges = oriented.select(col("u"), col("v"), col("rv"))
          .join(oriented.select(col("u"), col("v").as("w"), col("rv").as("rw")), Seq("u"))
          .where(col("rv") < col("rw"))
          .select(col("u"), col("v"), col("w"))
        // closing edge between v,w is oriented v->w (rank(v) < rank(w))
        val tris = wedges.join(
          oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
        val nodes = und.select(col("a").as("id"))
          .unionByName(und.select(col("b").as("id"))).distinct()
        val counts = tris
          .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("triangles"))
        nodes.join(counts, Seq("id"), "left")
          .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
          .localCheckpoint(eager = true)
      } finally { oriented.unpersist() }
    } finally { und.unpersist() }
  }

  /** Weighted single-source shortest paths by distributed Bellman-Ford
    * relaxation: the known-distance vector starts as {source → 0} and
    * each round relaxes every outgoing edge of every known node —
    * dist_t(v) = min(dist_{t-1}(v), min_{(u,v,w)} dist_{t-1}(u) + w).
    * Unreached nodes are simply ABSENT (no ∞ sentinel to carry or
    * compare), so the round is one src-keyed join plus one min-aggregate
    * over (known ∪ relaxed) — the [[pageRank]] two-exchange shape, with
    * the shuffled vector growing only as the reachable frontier does.
    * Fixed `iterations` (correct for all paths of ≤ that many hops;
    * Bellman-Ford needs diameter rounds to converge), so the whole run
    * unrolls into a cross-engine SQL oracle like q84/q126. Edges relax
    * DIRECTED as given — symmetrize first for an undirected graph.
    * Extends the unweighted BFS operator (graph.py shortest_path is
    * hop-count only); weights must be non-negative for the fixed-round
    * result to be a true distance (negative edges need n-1 rounds). */
  def shortestPathsWeighted(edges: DataFrame, sourceId: String,
                            iterations: Int = 4,
                            srcCol: String = "src", dstCol: String = "dst",
                            weightCol: String = "weight",
                            checkpointInterval: Int = 1): DataFrame = {
    require(iterations > 0, s"iterations must be positive: $iterations")
    val spark = edges.sparkSession
    val nparts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("double").as("_w"))
      .repartition(nparts, col("src")).persist()
    try {
      var dist = e.sparkSession.range(1)
        .select(lit(sourceId).as("id"), lit(0.0).as("dist"))
      for (i <- 1 to iterations) {
        val relaxed = e
          .join(dist.select(col("id").as("src"), col("dist")), "src")
          .select(col("dst").as("id"), (col("dist") + col("_w")).as("dist"))
        var next = dist.unionByName(relaxed)
          .groupBy("id").agg(min(col("dist")).as("dist"))
        if (i % checkpointInterval == 0 || i == iterations)
          next = next.localCheckpoint(eager = true)
        dist = next
      }
      dist
    } finally e.unpersist()
  }

  /** Synchronous label propagation (Raghavan et al., Phys. Rev. E'07) —
    * community detection by iterated plurality voting: every node starts
    * as its own label; each round it adopts the most frequent label among
    * its neighbors, ties broken by the SMALLEST label, so every round is
    * fully deterministic and the whole run unrolls into a cross-engine
    * SQL oracle (the q84 stance — fixed `iterations`, no early stop).
    * Edges vote UNDIRECTED with multigraph semantics: each edge row is
    * one vote in each direction (graph.py has no community op; this is
    * the standard large-graph extension next to PageRank/CC).
    *
    * Scale shape mirrors [[pageRank]]: the symmetrized adjacency is
    * partitioned by src and cached ONCE; each round shuffles only the
    * label vector — one src-keyed join, then the plurality pick as TWO
    * hash aggregations ((dst,label) counts, then a struct-min over
    * (-count, label) per dst — algebraically the oracle's
    * `row_number() OVER (ORDER BY c DESC, label)` pick without the
    * window sort). localCheckpoint per round, the measured optimum for
    * iterated shuffle plans on this engine. */
  def labelPropagation(edges: DataFrame, iterations: Int = 5,
                       srcCol: String = "src", dstCol: String = "dst",
                       checkpointInterval: Int = 1): DataFrame = {
    require(iterations > 0, s"iterations must be positive: $iterations")
    val spark = edges.sparkSession
    val nparts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(nparts, col("src")).persist()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().persist()
    try {
      var labels = nodes.withColumn("label", col("id"))
      for (i <- 1 to iterations) {
        // keep-old-label fallback by UNION, not a join (r14, guide §2.4):
        // each node contributes its own current label with vote weight 0
        // into the same (id, label)-keyed exchange the real votes ride.
        // A weight-0 candidate loses `min(struct(-count, label))` to any
        // real vote (every real count >= 1 > 0), coincides harmlessly
        // (+0) when the old label was also voted, and wins exactly when
        // the node received no votes — the old LEFT JOIN + coalesce
        // semantics, minus one whole join per round. (On this operator's
        // symmetrized multigraph every node in fact receives >= 1 vote;
        // the fallback row preserves strict semantic parity for free.)
        val votes = und
          .join(labels.select(col("id").as("src"), col("label")), "src")
          .select(col("dst").as("id"), col("label"), lit(1L).as("_v"))
          .unionByName(labels.select(col("id"), col("label"), lit(0L).as("_v")))
        var next = votes
          .groupBy("id", "label").agg(sum(col("_v")).as("_c"))
          .groupBy("id")
          .agg(min(struct((-col("_c")).as("n"), col("label").as("l"))).as("_w"))
          .select(col("id"), col("_w.l").as("label"))
        if (i % checkpointInterval == 0 || i == iterations)
          next = next.localCheckpoint(eager = true)
        labels = next
      }
      labels
    } finally { und.unpersist(); nodes.unpersist() }
  }
}
