package graft.queries

import graft.functions.vector
import graft.operators.{Cypher, HybridGraphVector, Knn, PropertyGraph}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Property-graph coverage (SURVEY §2.3 J4-J10, §2.4 A9-A12) over the
  * graph derived from the TPC-H-ish tables (see GraphData) plus the
  * deterministic embedding ring for graph+vector hybrids. */
object QueriesGraph {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Customer vertices with typed numeric properties (for the range finder
    * and partial-update queries). */
  private def customerVerts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      concat(lit("customer_"), col("c_custkey")).as("id"),
      array(lit("Customer")).as("labels"),
      col("c_name").as("name"),
      col("c_acctbal").as("acctbal"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J4 1-hop adjacency join
    "q32_neighbors" -> ((s, dir) =>
      PropertyGraph.neighbors(GraphData.edges(s, dir),
          nodeFilter = col("node_id") === "nation_5", direction = "both")
        .select(col("neighbor_id"), col("edge_type"))
        .orderBy("neighbor_id", "edge_type")),

    // J5 var-length traversal (customer -> nation -> region)
    "q33_traverse" -> ((s, dir) => {
      val seeds = t(s, dir, "customer").where(col("c_custkey") < 20)
        .select(concat(lit("customer_"), col("c_custkey")).as("id"))
      PropertyGraph.traverse(GraphData.edges(s, dir), seeds, maxDepth = 2,
          direction = "out")
        .select(col("start_id"), col("end_id"), col("depth"))
    }),

    // J6 BFS shortest paths: suppliers within 3 hops of customer_1
    "q34_shortest_path" -> ((s, dir) => {
      val spark = s; import spark.implicits._
      val seeds = Seq("customer_1").toDF("id")
      PropertyGraph.shortestPaths(GraphData.edges(s, dir), seeds, maxDepth = 3,
          direction = "both")
        .where(col("end_id").startsWith("supplier_"))
        .select(col("end_id"), col("hops"))
    }),

    // J7 Cypher relationship pattern + WHERE + RETURN
    "q35_cypher_match" -> ((s, dir) =>
      Cypher.query(GraphData.vertices(s, dir), GraphData.edges(s, dir),
        "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) WHERE n.name = 'NATION_5' RETURN c.name, n.name")),

    // J7 Cypher node pattern with inline props
    "q36_cypher_node" -> ((s, dir) =>
      Cypher.query(GraphData.vertices(s, dir), GraphData.edges(s, dir),
        "MATCH (n:Nation {name: 'NATION_3'}) RETURN n.id, n.name")),

    // J8 hyperedge membership, mode=all (orders involving both suppliers)
    "q37_hyperedge_all" -> ((s, dir) =>
      PropertyGraph.hyperedgesForNodes(GraphData.hyperedges(s, dir),
          Seq("supplier_1", "supplier_2"), mode = "all")
        .orderBy("id")),

    // A12 graph stats
    "q38_graph_stats" -> ((s, dir) =>
      PropertyGraph.stats(GraphData.vertices(s, dir), GraphData.edges(s, dir),
        Some(GraphData.hyperedges(s, dir)))),

    // A10 trending entities: top parts by lineitem mentions
    "q39_trending" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("l_partkey")).limit(10)),

    // J9 semantic graph search on the embedding ring
    "q40_semantic_graph" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val queries = embs.where(col("vec_id") === 42)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val seeds = Knn.knnJoin(queries, embs, k = 20, metric = "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .select(col("neighbor_id").cast("string").as("node_id"),
          (lit(1.0) - col("dist")).as("vector_score"))
      HybridGraphVector.semanticGraphSearch(seeds, GraphData.embeddingRing(s, dir),
          k = 10, expandHops = 2, vectorWeight = 0.7, graphWeight = 0.3)
        .select(col("node_id"), col("graph_distance"),
          round(col("vector_score"), 6).as("vector_score"),
          round(col("combined_score"), 6).as("combined_score"))
    }),

    // P7 property-range node finder (graph.py:688-702) — raw stored
    // doubles exported unrounded (no arithmetic, so no rounding drift)
    "q59_node_range" -> ((s, dir) =>
      PropertyGraph.findNodesByRange(customerVerts(s, dir),
          "acctbal", 1000.0, 2000.0)
        .select(col("id"), col("name"), col("acctbal"))
        .orderBy("id")),

    // Partial node update with merge semantics (graph.py:603-640):
    // acctbal overwritten for matched nodes, name kept (absent from the
    // update), vip appears as a NEW property column, Vip label added.
    "q60_node_update" -> ((s, dir) => {
      val updates = t(s, dir, "customer").where(col("c_custkey") < 50)
        .select(concat(lit("customer_"), col("c_custkey")).as("id"),
          lit(9999.0).as("acctbal"), lit(true).as("vip"))
      PropertyGraph.updateNodesPartial(customerVerts(s, dir), updates,
          addLabels = Seq("Vip"))
        .select(col("id"), col("name"), col("acctbal"), col("vip"),
          array_join(col("labels"), ",").as("labels"))
        .orderBy("id")
    }),

    // Node removal with full cascade (graph.py:625-650 delete_node):
    // hyperedges CONTAINING a removed node disappear entirely. Output =
    // surviving ORDER_PARTIES hyperedges in a bounded key range.
    "q61_node_cascade" -> ((s, dir) => {
      val (_, _, h2) = PropertyGraph.removeNodes(
        GraphData.vertices(s, dir), GraphData.edges(s, dir),
        GraphData.hyperedges(s, dir),
        Seq("customer_1", "supplier_2"), cascade = true)
      h2.where(expr("CAST(substring(id, 7) AS BIGINT) < 300"))
        .select(col("id"), size(col("nodes")).cast("long").as("n_nodes"),
          col("type"))
        .orderBy("id")
    }),

    // J10 graph-first traversal + vector rerank on the ring
    "q41_graph_rerank" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
        .select(col("vec_id").cast("string").as("node_id"), col("embedding").as("vec"))
      val qv = t(s, dir, "embeddings").where(col("vec_id") === 42)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      HybridGraphVector.graphSearchWithReranking(GraphData.embeddingRing(s, dir),
          embs, startNodeId = "100", queryVec = qv, maxHops = 3, k = 10)
        .select(col("node_id"), col("graph_distance"),
          round(col("vector_score"), 6).as("vector_score"))
    }),

    // PageRank over the full derived graph, 5 fixed iterations, rounded
    // to 6 decimals — wide headroom over cross-engine summation-order
    // noise (~1e-14 absolute on 1/N-scale ranks; see the operator doc
    // for why the normalized form is the boundary-safe one).
    "q84_pagerank" -> ((s, dir) =>
      PropertyGraph.pageRank(GraphData.edges(s, dir), iterations = 5)
        .select(col("id"), (round(col("rank"), 6) + lit(0.0)).as("rank"))),

    // PageRank WITH the standard dangling-mass redistribution (region
    // nodes are sinks in this graph, so the two variants genuinely
    // differ): rank = (1-d)/N + d*(inflow + dm/N), dm = rank mass on
    // nodes with no out-edges, re-measured each round. The oracle
    // unrolls all five rounds with a per-round dangling-sum CTE.
    "q119_pagerank_dangling" -> ((s, dir) =>
      PropertyGraph.pageRank(GraphData.edges(s, dir), iterations = 5,
          redistributeDangling = true)
        .select(col("id"), (round(col("rank"), 6) + lit(0.0)).as("rank"))),

    // Weighted SSSP from region_0 by 4 rounds of Bellman-Ford relaxation
    // over the symmetrized graph. Deterministic per-edge weights derived
    // from the endpoint strings (1 + (len(src)+2·len(dst)) mod 5, on the
    // ORIGINAL orientation, carried across the symmetrize) so weighted
    // distances genuinely differ from hop counts and the oracle
    // re-derives them in SQL.
    "q127_weighted_sssp" -> ((s, dir) => {
      val e = GraphData.edges(s, dir)
      val ew = e.select(col("src"), col("dst"),
        (lit(1.0) + (length(col("src")) + lit(2) * length(col("dst"))) % lit(5))
          .as("weight"))
      val und = ew.unionByName(ew.select(col("dst").as("src"),
        col("src").as("dst"), col("weight")))
      PropertyGraph.shortestPathsWeighted(und, "region_0", iterations = 4)
        .select(col("id"), (round(col("dist"), 6) + lit(0.0)).as("dist"))
    }),

    // Personalized PageRank seeded at two regions: reachability-weighted
    // relevance FROM the seeds, not global importance (on this DAG the
    // mass flows only along region<-nation<-... reversed edges — i.e.
    // stays near the seeds — so the ranking genuinely differs from q84).
    // Oracle: q84's unroll with the teleport term gated on the seed set.
    "q136_ppr" -> ((s, dir) =>
      PropertyGraph.personalizedPageRank(GraphData.edges(s, dir),
          Seq("region_0", "region_1"), iterations = 5)
        .select(col("id"), (round(col("rank"), 6) + lit(0.0)).as("rank"))),

    // k-core (Seidman'83) over the supplier/nation/region graph
    // densified with the q85 supplier co-location cliques: k=3 keeps the
    // big-enough cliques and their attachment spine, while small-nation
    // cliques peel away in cascades. Synchronous peeling is
    // deterministic, so the oracle unrolls the rounds (MATERIALIZED CTEs
    // — the naive unroll re-inlines each survivor set 3x per round and
    // blows up exponentially).
    "q133_kcore" -> ((s, dir) => {
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val coloc = sup.as("a")
        .join(sup.as("b"), col("a.s_nationkey") === col("b.s_nationkey") &&
          col("a.s_suppkey") < col("b.s_suppkey"))
        .select(concat(lit("supplier_"), col("a.s_suppkey")).as("src"),
          concat(lit("supplier_"), col("b.s_suppkey")).as("dst"))
      val spine = sup
        .select(concat(lit("supplier_"), col("s_suppkey")).as("src"),
          concat(lit("nation_"), col("s_nationkey")).as("dst"))
        .unionByName(t(s, dir, "nation")
          .select(concat(lit("nation_"), col("n_nationkey")).as("src"),
            concat(lit("region_"), col("n_regionkey")).as("dst")))
      PropertyGraph.kCore(spine.unionByName(coloc), k = 3)
    }),

    // HITS hubs-and-authorities (Kleinberg'99), sum-normalized, 5 fixed
    // rounds. On this derived graph the bipartite-ish order→customer→
    // nation→region chain makes hub and authority genuinely different
    // rankings (orders are pure hubs, regions pure authorities). The
    // oracle unrolls each half-round with its normalization-sum CTE —
    // the q84 stance.
    "q131_hits" -> ((s, dir) =>
      PropertyGraph.hits(GraphData.edges(s, dir), iterations = 5)
        .select(col("id"),
          (round(col("authority"), 6) + lit(0.0)).as("authority"),
          (round(col("hub"), 6) + lit(0.0)).as("hub"))),

    // Community detection by synchronous label propagation (Raghavan'07):
    // undirected plurality voting, smallest-label tie break, 5 fixed
    // rounds — every round deterministic, so the oracle unrolls the whole
    // run (the q84 stance).
    "q126_label_propagation" -> ((s, dir) =>
      PropertyGraph.labelPropagation(GraphData.edges(s, dir), iterations = 5)
        .select(col("id"), col("label"))),

    // Triangle counts over the supplier co-location graph (suppliers in
    // the same nation are linked). The oracle never runs the joins: in a
    // co-location clique every supplier in an n-supplier nation sits in
    // exactly C(n-1, 2) triangles — a closed form the generic two-join
    // enumeration must reproduce.
    "q85_triangles" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val coloc = sup.as("a")
        .join(sup.as("b"), col("a.s_nationkey") === col("b.s_nationkey") &&
          col("a.s_suppkey") < col("b.s_suppkey"))
        .select(concat(lit("supplier_"), col("a.s_suppkey")).as("src"),
          concat(lit("supplier_"), col("b.s_suppkey")).as("dst"))
      PropertyGraph.triangleCounts(coloc)
    }),

    // Connected components as a first-class graph operator: the derived
    // graph with the nation->region edges removed and orders thinned to
    // o_orderkey % 10 = 0 splits into one component per nation (customers
    // + suppliers + their orders), labeled by min node id. The oracle
    // recomputes components by recursive-CTE transitive closure — a
    // different algorithm entirely from the large-star/small-star kernel.
    "q109_connected_components" -> ((s, dir) => {
      val edges = GraphData.edges(s, dir)
        .where(col("type") =!= "IN_REGION")
        .where(!col("src").startsWith("order_") ||
          expr("CAST(substring(src, 7) AS BIGINT) % 10 = 0"))
      PropertyGraph.connectedComponents(edges, "src", "dst")
        .orderBy("node_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q32_neighbors" ->
      """SELECT neighbor_id, edge_type FROM (
        |  SELECT 'region_' || n_regionkey AS neighbor_id, 'IN_REGION' AS edge_type
        |  FROM nation WHERE n_nationkey = 5
        |  UNION ALL
        |  SELECT 'customer_' || c_custkey, 'IN_NATION' FROM customer WHERE c_nationkey = 5
        |  UNION ALL
        |  SELECT 'supplier_' || s_suppkey, 'IN_NATION' FROM supplier WHERE s_nationkey = 5)
        |ORDER BY neighbor_id, edge_type""".stripMargin,

    "q33_traverse" ->
      """SELECT 'customer_' || c_custkey AS start_id,
        |       'nation_' || c_nationkey AS end_id, 1 AS depth
        |FROM customer WHERE c_custkey < 20
        |UNION ALL
        |SELECT 'customer_' || c_custkey,
        |       'region_' || n_regionkey, 2
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey < 20""".stripMargin,

    "q34_shortest_path" ->
      """SELECT 'supplier_' || s_suppkey AS end_id, 2 AS hops FROM supplier
        |WHERE s_nationkey = (SELECT c_nationkey FROM customer WHERE c_custkey = 1)""".stripMargin,

    "q35_cypher_match" ->
      """SELECT c_name AS c_name, n_name AS n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5'""".stripMargin,

    "q36_cypher_node" ->
      """SELECT 'nation_' || n_nationkey AS n_id, n_name AS n_name
        |FROM nation WHERE n_name = 'NATION_3'""".stripMargin,

    "q37_hyperedge_all" ->
      """SELECT DISTINCT 'order_' || l1.l_orderkey AS id, 'ORDER_PARTIES' AS type
        |FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
        |WHERE l1.l_suppkey = 1 AND l2.l_suppkey = 2
        |ORDER BY id""".stripMargin,

    "q38_graph_stats" ->
      """SELECT 'num_nodes' AS stat,
        |  (SELECT count(*) FROM nation) + (SELECT count(*) FROM region)
        |  + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier) AS value
        |UNION ALL
        |SELECT 'num_edges',
        |  (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
        |  + (SELECT count(*) FROM nation) + (SELECT count(*) FROM orders)
        |UNION ALL
        |SELECT 'num_hyperedges', (SELECT count(*) FROM orders)
        |UNION ALL
        |SELECT 'num_labels', 4
        |UNION ALL
        |SELECT 'num_edge_types', 3""".stripMargin,

    "q39_trending" ->
      """SELECT l_partkey, count(*) AS n FROM lineitem
        |GROUP BY l_partkey ORDER BY n DESC, l_partkey LIMIT 10""".stripMargin,

    "q40_semantic_graph" ->
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 42),
        |dists AS (
        |  SELECT c.vec_id,
        |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
        |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
        |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
        |                  CAST(unnest(q.qv) AS DOUBLE) AS y)) AS dist
        |  FROM embeddings c, q),
        |seeds AS (
        |  SELECT vec_id, 1.0 - dist AS vector_score FROM (
        |    SELECT vec_id, dist, row_number() OVER (ORDER BY dist, vec_id) AS rn
        |    FROM dists) WHERE rn <= 20),
        |best AS (SELECT max(vector_score) AS b FROM seeds),
        |reach AS (
        |  SELECT c.vec_id AS node_id,
        |         min(least(abs(c.vec_id - s.vec_id),
        |                   n.cnt - abs(c.vec_id - s.vec_id))) AS graph_distance
        |  FROM embeddings c CROSS JOIN seeds s CROSS JOIN n
        |  GROUP BY c.vec_id
        |  HAVING min(least(abs(c.vec_id - s.vec_id), n.cnt - abs(c.vec_id - s.vec_id))) <= 2),
        |scored AS (
        |  SELECT CAST(r.node_id AS VARCHAR) AS node_id, CAST(r.graph_distance AS INT) AS graph_distance,
        |         CASE WHEN r.graph_distance = 0 THEN s.vector_score
        |              ELSE best.b / (r.graph_distance + 1.0) END AS vector_score,
        |         CASE WHEN r.graph_distance = 0 THEN s.vector_score
        |              ELSE 0.7 * best.b / (r.graph_distance + 1.0) + 0.3 / r.graph_distance
        |         END AS combined_score
        |  FROM reach r
        |  LEFT JOIN seeds s ON s.vec_id = r.node_id
        |  CROSS JOIN best)
        |SELECT node_id, graph_distance, round(vector_score, 6) AS vector_score,
        |       round(combined_score, 6) AS combined_score
        |FROM (SELECT *, row_number() OVER (ORDER BY combined_score DESC, node_id) AS rn
        |      FROM scored)
        |WHERE rn <= 10""".stripMargin,

    "q59_node_range" ->
      """SELECT 'customer_' || c_custkey AS id, c_name AS name, c_acctbal AS acctbal
        |FROM customer WHERE c_acctbal >= 1000.0 AND c_acctbal <= 2000.0
        |ORDER BY id""".stripMargin,

    "q60_node_update" ->
      """SELECT 'customer_' || c_custkey AS id, c_name AS name,
        |       CASE WHEN c_custkey < 50 THEN 9999.0 ELSE c_acctbal END AS acctbal,
        |       CASE WHEN c_custkey < 50 THEN TRUE ELSE NULL END AS vip,
        |       CASE WHEN c_custkey < 50 THEN 'Customer,Vip' ELSE 'Customer' END AS labels
        |FROM customer ORDER BY id""".stripMargin,

    "q61_node_cascade" ->
      """WITH members AS (
        |  SELECT l_orderkey AS k, 'supplier_' || l_suppkey AS member FROM lineitem
        |  UNION
        |  SELECT o_orderkey, 'customer_' || o_custkey FROM orders),
        |he AS (
        |  SELECT k, count(DISTINCT member) AS n_nodes,
        |         bool_or(member IN ('customer_1', 'supplier_2')) AS touched
        |  FROM members GROUP BY k)
        |SELECT 'order_' || k AS id, n_nodes, 'ORDER_PARTIES' AS type
        |FROM he WHERE NOT touched AND k < 300 ORDER BY id""".stripMargin,

    "q41_graph_rerank" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 42),
        |n AS (SELECT count(*) AS cnt FROM embeddings),
        |reach AS (
        |  SELECT CAST((100 + h.d) % n.cnt AS BIGINT) AS nid, h.d AS graph_distance
        |  FROM (VALUES (1), (2), (3)) h(d) CROSS JOIN n),
        |sim AS (
        |  SELECT CAST(r.nid AS VARCHAR) AS node_id, r.graph_distance,
        |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 0.0
        |            ELSE sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
        |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
        |                  CAST(unnest(q.qv) AS DOUBLE) AS y)) AS vector_score
        |  FROM reach r JOIN embeddings c ON c.vec_id = r.nid CROSS JOIN q)
        |SELECT node_id, graph_distance, round(vector_score, 6) AS vector_score
        |FROM sim ORDER BY vector_score DESC, node_id""".stripMargin,

    // Power iteration unrolled as one CTE per round (recursive CTEs
    // cannot aggregate per step); same GraphX convention as the Spark op.
    "q84_pagerank" -> {
      val rounds = (1 to 5).map { i =>
        s"""pr$i AS (
           |  SELECT n.id,
           |         (1.0 - 0.85) / ns.n + 0.85 * coalesce(s.inflow, 0.0) AS rank
           |  FROM nodes n CROSS JOIN nstat ns LEFT JOIN (
           |    SELECT e.dst AS id, sum(p.rank / e.outdeg) AS inflow
           |    FROM edeg e JOIN pr${i - 1} p ON p.id = e.src
           |    GROUP BY e.dst) s ON s.id = n.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT 'customer_' || c_custkey AS src, 'nation_' || c_nationkey AS dst FROM customer
         |  UNION ALL
         |  SELECT 'supplier_' || s_suppkey, 'nation_' || s_nationkey FROM supplier
         |  UNION ALL
         |  SELECT 'nation_' || n_nationkey, 'region_' || n_regionkey FROM nation
         |  UNION ALL
         |  SELECT 'order_' || o_orderkey, 'customer_' || o_custkey FROM orders),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |edeg AS (
         |  SELECT e.src, e.dst, d.outdeg
         |  FROM edges e JOIN (SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d
         |    ON d.src = e.src),
         |nstat AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |pr0 AS (SELECT id, 1.0 / ns.n AS rank FROM nodes CROSS JOIN nstat ns),
         |$rounds
         |SELECT id, round(rank, 6) + 0.0 AS rank FROM pr5""".stripMargin
    },

    "q119_pagerank_dangling" -> {
      val rounds = (1 to 5).map { i =>
        s"""dm$i AS (
           |  SELECT coalesce(sum(p.rank), 0.0) AS dm
           |  FROM pr${i - 1} p JOIN dgl ON dgl.id = p.id),
           |pr$i AS (
           |  SELECT n.id,
           |         (1.0 - 0.85) / ns.n
           |           + 0.85 * (coalesce(s.inflow, 0.0) + d.dm / ns.n) AS rank
           |  FROM nodes n CROSS JOIN nstat ns CROSS JOIN dm$i d LEFT JOIN (
           |    SELECT e.dst AS id, sum(p.rank / e.outdeg) AS inflow
           |    FROM edeg e JOIN pr${i - 1} p ON p.id = e.src
           |    GROUP BY e.dst) s ON s.id = n.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT 'customer_' || c_custkey AS src, 'nation_' || c_nationkey AS dst FROM customer
         |  UNION ALL
         |  SELECT 'supplier_' || s_suppkey, 'nation_' || s_nationkey FROM supplier
         |  UNION ALL
         |  SELECT 'nation_' || n_nationkey, 'region_' || n_regionkey FROM nation
         |  UNION ALL
         |  SELECT 'order_' || o_orderkey, 'customer_' || o_custkey FROM orders),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |edeg AS (
         |  SELECT e.src, e.dst, d.outdeg
         |  FROM edges e JOIN (SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d
         |    ON d.src = e.src),
         |dgl AS (
         |  SELECT n.id FROM nodes n
         |  LEFT JOIN (SELECT DISTINCT src FROM edges) s ON s.src = n.id
         |  WHERE s.src IS NULL),
         |nstat AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |pr0 AS (SELECT id, 1.0 / ns.n AS rank FROM nodes CROSS JOIN nstat ns),
         |$rounds
         |SELECT id, round(rank, 6) + 0.0 AS rank FROM pr5""".stripMargin
    },

    "q127_weighted_sssp" -> {
      val rounds = (1 to 4).map { i =>
        s"""d$i AS (
           |  SELECT id, min(dist) AS dist FROM (
           |    SELECT id, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT u.dst AS id, d.dist + u.w AS dist
           |    FROM und u JOIN d${i - 1} d ON d.id = u.src)
           |  GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT 'customer_' || c_custkey AS src, 'nation_' || c_nationkey AS dst FROM customer
         |  UNION ALL
         |  SELECT 'supplier_' || s_suppkey, 'nation_' || s_nationkey FROM supplier
         |  UNION ALL
         |  SELECT 'nation_' || n_nationkey, 'region_' || n_regionkey FROM nation
         |  UNION ALL
         |  SELECT 'order_' || o_orderkey, 'customer_' || o_custkey FROM orders),
         |ew AS (
         |  SELECT src, dst,
         |         CAST(1.0 + (length(src) + 2 * length(dst)) % 5 AS DOUBLE) AS w
         |  FROM edges),
         |und AS (SELECT src, dst, w FROM ew UNION ALL SELECT dst, src, w FROM ew),
         |d0 AS (SELECT 'region_0' AS id, CAST(0.0 AS DOUBLE) AS dist),
         |$rounds
         |SELECT id, round(dist, 6) + 0.0 AS dist FROM d4""".stripMargin
    },

    "q136_ppr" -> {
      val rounds = (1 to 5).map { i =>
        s"""pr$i AS (
           |  SELECT n.id,
           |         (CASE WHEN n.id IN ('region_0', 'region_1')
           |               THEN (1.0 - 0.85) / 2.0 ELSE 0.0 END)
           |           + 0.85 * coalesce(s.inflow, 0.0) AS rank
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS id, sum(p.rank / e.outdeg) AS inflow
           |    FROM edeg e JOIN pr${i - 1} p ON p.id = e.src
           |    GROUP BY e.dst) s ON s.id = n.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT 'customer_' || c_custkey AS src, 'nation_' || c_nationkey AS dst FROM customer
         |  UNION ALL
         |  SELECT 'supplier_' || s_suppkey, 'nation_' || s_nationkey FROM supplier
         |  UNION ALL
         |  SELECT 'nation_' || n_nationkey, 'region_' || n_regionkey FROM nation
         |  UNION ALL
         |  SELECT 'order_' || o_orderkey, 'customer_' || o_custkey FROM orders),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |edeg AS (
         |  SELECT e.src, e.dst, d.outdeg
         |  FROM edges e JOIN (SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d
         |    ON d.src = e.src),
         |pr0 AS (
         |  SELECT id, CASE WHEN id IN ('region_0', 'region_1')
         |                  THEN 1.0 / 2.0 ELSE 0.0 END AS rank
         |  FROM nodes),
         |$rounds
         |SELECT id, round(rank, 6) + 0.0 AS rank FROM pr5""".stripMargin
    },

    "q133_kcore" -> {
      val rounds = (1 to 10).map { i =>
        s"""a$i AS MATERIALIZED (
           |  SELECT u.src AS id
           |  FROM und u
           |  JOIN a${i - 1} s ON s.id = u.src
           |  JOIN a${i - 1} t ON t.id = u.dst
           |  GROUP BY u.src
           |  HAVING count(*) >= 3)""".stripMargin
      }.mkString(",\n")
      s"""WITH coloc AS (
         |  SELECT 'supplier_' || a.s_suppkey AS src, 'supplier_' || b.s_suppkey AS dst
         |  FROM supplier a JOIN supplier b
         |    ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey),
         |spine AS (
         |  SELECT 'supplier_' || s_suppkey AS src, 'nation_' || s_nationkey AS dst
         |  FROM supplier
         |  UNION ALL
         |  SELECT 'nation_' || n_nationkey, 'region_' || n_regionkey FROM nation),
         |e AS (SELECT src, dst FROM coloc UNION ALL SELECT src, dst FROM spine),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)
         |  WHERE src <> dst),
         |a0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM und),
         |$rounds
         |SELECT u.src AS id, count(*) AS degree
         |FROM und u
         |JOIN a10 s ON s.id = u.src
         |JOIN a10 t ON t.id = u.dst
         |GROUP BY u.src""".stripMargin
    },

    "q131_hits" -> {
      // TOLERANCE DEPENDENCE (noted per r12 advice): the engine fuses
      // rounds 1..N-1 (Graph.hits folds the hub normalization into the
      // next gather algebraically — gather(raw/s) ≡ gather(raw)/s) while
      // this oracle normalizes every half-round like the reference. The
      // two forms are mathematically equal but round floating-point
      // differently, compounding ~ulp-scale drift over the fused rounds;
      // the round(_, 6) on both sides absorbs it at sf0.01 (observed
      // drift << 1e-9, five decimal orders under the gate). If the gate
      // ever flickers on a larger corpus, unfuse the engine for the
      // gated query or fuse this SQL identically — do not widen the
      // rounding.
      val rounds = (1 to 5).map { i =>
        s"""araw$i AS (
           |  SELECT n.id, coalesce(s.v, 0.0) AS raw
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS id, sum(h.score) AS v
           |    FROM edges e JOIN hub${i - 1} h ON h.id = e.src
           |    GROUP BY e.dst) s ON s.id = n.id),
           |aut$i AS (
           |  SELECT id, raw / sum(raw) OVER () AS score FROM araw$i),
           |hraw$i AS (
           |  SELECT n.id, coalesce(s.v, 0.0) AS raw
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.src AS id, sum(a.score) AS v
           |    FROM edges e JOIN aut$i a ON a.id = e.dst
           |    GROUP BY e.src) s ON s.id = n.id),
           |hub$i AS (
           |  SELECT id, raw / sum(raw) OVER () AS score FROM hraw$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT 'customer_' || c_custkey AS src, 'nation_' || c_nationkey AS dst FROM customer
         |  UNION ALL
         |  SELECT 'supplier_' || s_suppkey, 'nation_' || s_nationkey FROM supplier
         |  UNION ALL
         |  SELECT 'nation_' || n_nationkey, 'region_' || n_regionkey FROM nation
         |  UNION ALL
         |  SELECT 'order_' || o_orderkey, 'customer_' || o_custkey FROM orders),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |nstat AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |hub0 AS (SELECT id, 1.0 / ns.n AS score FROM nodes CROSS JOIN nstat ns),
         |$rounds
         |SELECT a.id, round(a.score, 6) + 0.0 AS authority,
         |       round(h.score, 6) + 0.0 AS hub
         |FROM aut5 a JOIN hub5 h ON h.id = a.id""".stripMargin
    },

    "q126_label_propagation" -> {
      // per round: plurality pick = count votes per (node, label), then
      // row_number over (count DESC, label ASC) — the engine's
      // struct-min over (-count, label) is the same total order
      val rounds = (1 to 5).map { i =>
        s"""lp$i AS (
           |  SELECT p.id, coalesce(w.label, p.label) AS label
           |  FROM lp${i - 1} p LEFT JOIN (
           |    SELECT id, label FROM (
           |      SELECT u.dst AS id, p2.label,
           |             row_number() OVER (PARTITION BY u.dst
           |               ORDER BY count(*) DESC, p2.label) AS rk
           |      FROM und u JOIN lp${i - 1} p2 ON p2.id = u.src
           |      GROUP BY u.dst, p2.label) WHERE rk = 1) w ON w.id = p.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT 'customer_' || c_custkey AS src, 'nation_' || c_nationkey AS dst FROM customer
         |  UNION ALL
         |  SELECT 'supplier_' || s_suppkey, 'nation_' || s_nationkey FROM supplier
         |  UNION ALL
         |  SELECT 'nation_' || n_nationkey, 'region_' || n_regionkey FROM nation
         |  UNION ALL
         |  SELECT 'order_' || o_orderkey, 'customer_' || o_custkey FROM orders),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
         |lp0 AS (SELECT id, id AS label FROM nodes),
         |$rounds
         |SELECT id, label FROM lp5""".stripMargin
    },

    "q85_triangles" ->
      """WITH cnt AS (SELECT s_nationkey, count(*) AS n FROM supplier GROUP BY 1)
        |SELECT 'supplier_' || s_suppkey AS id,
        |       CAST(((n - 1) * (n - 2)) // 2 AS BIGINT) AS triangles
        |FROM supplier JOIN cnt USING (s_nationkey)
        |WHERE n >= 2""".stripMargin,

    "q109_connected_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'customer_' || c_custkey AS src, 'nation_' || c_nationkey AS dst
        |  FROM customer
        |  UNION ALL
        |  SELECT 'supplier_' || s_suppkey, 'nation_' || s_nationkey FROM supplier
        |  UNION ALL
        |  SELECT 'order_' || o_orderkey, 'customer_' || o_custkey
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |eb AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
        |reach(node, r) AS (
        |  SELECT a, b FROM eb
        |  UNION
        |  SELECT rr.node, e2.b FROM reach rr JOIN eb e2 ON e2.a = rr.r)
        |SELECT node AS node_id, least(node, min(r)) AS component_id
        |FROM reach GROUP BY node ORDER BY node_id""".stripMargin,
  )
}
