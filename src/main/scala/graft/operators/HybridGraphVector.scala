package graft.operators

import graft.functions.vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Combined graph + vector search (reference hybrid_graph_vector.py).
  *
  * Set-oriented Spark shape: seeds come from the exact kNN join, expansion
  * is the BFS frontier join, scoring is column arithmetic — each stage a
  * distributed DataFrame op instead of the reference's per-node Python
  * loops.
  */
object HybridGraphVector {

  /** Semantic graph search (hybrid_graph_vector.py:337-453): ANN seeds +
    * BFS expansion with score decay.
    *
    * Reference scoring, reproduced exactly:
    *  - seeds keep vector_score = similarity, graph_distance = 0,
    *    combined = vector_score (seed results are added as-is)
    *  - an expanded node first reached at hop h gets
    *      vector_score = best_seed_score * 1/(1+h)        [decay]
    *      combined    = vectorWeight * vector_score + graphWeight * (1/h)
    *    where best_seed_score = max over ALL seed scores (the reference's
    *    `max(seed_scores.get(s, 0) for s in seed_ids)` is loop-invariant).
    *
    * @param seedScores (node_id, vector_score) — top seed_k=2k seeds with
    *                   similarity scores (1 - cosineDist for cosine).
    * @return (node_id, vector_score, graph_distance, combined_score)
    */
  def semanticGraphSearch(seedScores: DataFrame, edges: DataFrame, k: Int,
                          expandHops: Int = 2, vectorWeight: Double = 0.7,
                          graphWeight: Double = 0.3,
                          edgeType: Option[String] = None): DataFrame = {
    val seeds = seedScores.select(col("node_id").as("id"))
    val reach = PropertyGraph.shortestPaths(edges, seeds, expandHops,
      direction = "both", edgeType = edgeType)
    // min hops from ANY seed per reached node; hop 0 rows are the seeds
    val hops = reach.groupBy(col("end_id").as("node_id"))
      .agg(min(col("hops")).as("graph_distance"))
    val bestSeed = seedScores.agg(max(col("vector_score")).as("_best"))
    hops
      .join(seedScores, Seq("node_id"), "left")
      .crossJoin(broadcast(bestSeed))
      .select(col("node_id"), col("graph_distance"),
        when(col("graph_distance") === 0, col("vector_score"))
          .otherwise(col("_best") / (col("graph_distance") + 1.0)).as("vector_score"),
        when(col("graph_distance") === 0, col("vector_score"))
          .otherwise(lit(vectorWeight) * col("_best") / (col("graph_distance") + 1.0)
            + lit(graphWeight) / col("graph_distance")).as("combined_score"))
      .orderBy(desc("combined_score"), col("node_id"))
      .limit(k)
  }

  /** Graph-first search with vector rerank (hybrid_graph_vector.py:459-511):
    * traverse from a start node, then rank reached nodes by similarity to
    * the query embedding; nodes without an embedding score 0.
    *
    * @param embeddings (node_id, vec) node embedding table
    */
  def graphSearchWithReranking(edges: DataFrame, embeddings: DataFrame,
                               startNodeId: String, queryVec: Array[Float],
                               maxHops: Int = 3, k: Int = 10,
                               metric: String = "cosine",
                               edgeType: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val seeds = Seq(startNodeId).toDF("id")
    val reached = PropertyGraph.traverse(edges, seeds, maxHops,
        direction = "out", edgeType = edgeType)
      .groupBy(col("end_id").as("node_id"))
      .agg(min(col("depth")).as("graph_distance"))
    val q = lit(queryVec)
    val sim = metric match {
      case "cosine" => lit(1.0) - vector.cosineDistance(col("vec"), q)
      case _ => -vector.l2Distance(col("vec"), q)
    }
    reached
      .join(embeddings.select(col("node_id"), col("vec")), Seq("node_id"), "left")
      .select(col("node_id"), col("graph_distance"),
        coalesce(when(col("vec").isNotNull, sim), lit(0.0)).as("vector_score"))
      .orderBy(desc("vector_score"), col("node_id"))
      .limit(k)
  }
}
