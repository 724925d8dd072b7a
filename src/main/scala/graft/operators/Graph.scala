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

  /** Var-length traversal (graph.py:844-869): all simple paths from the
    * seed set up to maxDepth hops, cycle-avoidance within each path.
    * Returns (start_id, end_id, depth, path). Frontier is re-joined per
    * hop; caller should checkpoint for depths beyond ~10 (lineage). */
  def traverse(edges: DataFrame, seeds: DataFrame, maxDepth: Int,
               direction: String = "out",
               edgeType: Option[String] = None): DataFrame = {
    val adj = neighbors(edges, direction = direction, edgeType = edgeType)
      .select(col("node_id"), col("neighbor_id")).persist()
    var frontier = seeds.select(col("id").as("start_id"), col("id").as("end_id"),
      lit(0).as("depth"), array(col("id").cast("string")).as("path"))
    var all = frontier
    var d = 0
    try {
      while (d < maxDepth) {
        // persist each hop's frontier so hop k+1 does not replay hops 1..k
        frontier = frontier.join(adj, frontier("end_id") === adj("node_id"))
          .where(!array_contains(col("path"), col("neighbor_id").cast("string")))
          .select(col("start_id"), col("neighbor_id").as("end_id"),
            (col("depth") + 1).as("depth"),
            concat(col("path"), array(col("neighbor_id").cast("string"))).as("path"))
          .persist()
        all = all.unionByName(frontier)
        d += 1
      }
      all.where(col("depth") > 0).localCheckpoint(eager = true)
    } finally adj.unpersist()
  }

  /** BFS shortest path lengths from seeds (graph.py:871-902): Pregel-style
    * frontier expansion with a visited set, capped at maxDepth. Returns
    * (start_id, end_id, hops) — minimal hops per reachable pair. */
  def shortestPaths(edges: DataFrame, seeds: DataFrame, maxDepth: Int,
                    direction: String = "both",
                    edgeType: Option[String] = None): DataFrame = {
    val adj = neighbors(edges, direction = direction, edgeType = edgeType)
      .select(col("node_id"), col("neighbor_id")).persist()
    var visited = seeds.select(col("id").as("start_id"), col("id").as("end_id"),
      lit(0).as("hops")).persist()
    var frontier = visited
    var d = 0
    try {
      while (d < maxDepth) {
        val next = frontier.join(adj, frontier("end_id") === adj("node_id"))
          .select(col("start_id"), col("neighbor_id").as("end_id"), (col("hops") + 1).as("hops"))
          .groupBy("start_id", "end_id").agg(min("hops").as("hops"))
        val seen = visited.select(col("start_id").as("_vs"), col("end_id").as("_ve"))
        // persist each frontier/visited generation: the loop would otherwise
        // recompute the whole join chain per hop and the lineage grows
        // multiplicatively (SURVEY §7.3 "iterative graph ops" risk)
        frontier = next.join(seen,
          next("start_id") === seen("_vs") && next("end_id") === seen("_ve"), "left_anti")
          .persist()
        if (frontier.isEmpty) return visited
        val nextVisited = visited.unionByName(frontier).localCheckpoint(eager = true)
        visited.unpersist()
        visited = nextVisited
        d += 1
      }
      visited
    } finally adj.unpersist()
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

  /** Remove nodes AND every edge touching them (graph.py:214-238 removes
    * incident edges from all adjacency indexes). Returns (vertices, edges). */
  def removeNodes(vertices: DataFrame, edges: DataFrame,
                  nodeIds: Seq[String]): (DataFrame, DataFrame) = {
    val v = vertices.where(!col("id").isin(nodeIds: _*))
    val e = edges.where(!col("src").isin(nodeIds: _*) &&
      !col("dst").isin(nodeIds: _*))
    (v, e)
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
}
