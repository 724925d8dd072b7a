package graft

import graft.operators.{Filter, Knn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 exercised on
  * the driver's parquet tables; [[oracleSql]] holds the DuckDB-equivalent
  * SQL the driver hash-compares against. Column names are aliased
  * identically on both sides; float aggregates are rounded on both sides so
  * the hash compare is stable across engines.
  */
object SparkEntry {

  /** Flagship: filtered exact kNN over the embeddings table (the reference's
    * hot path, vectordb.py:495-561). Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_knn_cosine")(spark, "/root/testdata/sf0.001")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** First 5 embedding rows double as the query batch (deterministic). */
  private def queryBatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-A5-style aggregation (TPC-H Q1 shape) — SURVEY §2.4
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P1-P3 filter DSL compiled to Catalyst predicates — SURVEY §2.2
    "q2_filter_dsl" -> ((s, dir) => {
      import graft.operators.Filter._
      val f = (Contains("p_type", "BRASS") || Regex("p_name", "^.*(red|blue).*$")) &&
        Gte("p_size", 10) && Lt("p_size", 40) &&
        !In("p_brand", Seq("Brand#55")) && Ne("p_type", "zzz")
      t(s, dir, "part").where(f.compile)
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),

    // T1/T4 global top-k — SURVEY §2.5
    "q3_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(25)
    }),

    // J3/J4-style equi-join + aggregation — SURVEY §2.3
    "q4_join_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders"); val n = t(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("total_revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // J1/T2 batch exact kNN, cosine — SURVEY §2.3 J1, the flagship
    "q10_knn_cosine" -> ((s, dir) => {
      Knn.knnJoin(queryBatch(s, dir), t(s, dir, "embeddings"), k = 10,
          metric = "cosine", corpusId = "vec_id", corpusVec = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // J1 under l2 metric
    "q11_knn_l2" -> ((s, dir) => {
      Knn.knnJoin(queryBatch(s, dir), t(s, dir, "embeddings"), k = 10,
          metric = "l2", corpusId = "vec_id", corpusVec = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // J1 under (negated) inner-product metric
    "q12_knn_ip" -> ((s, dir) => {
      Knn.knnJoin(queryBatch(s, dir), t(s, dir, "embeddings"), k = 10,
          metric = "ip", corpusId = "vec_id", corpusVec = "embedding")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // P4/P5 filtered kNN (filter pushes below the join — no over-fetch)
    "q13_knn_filtered" -> ((s, dir) => {
      Knn.knnJoin(queryBatch(s, dir), t(s, dir, "embeddings"), k = 10,
          metric = "cosine", corpusId = "vec_id", corpusVec = "embedding",
          filter = Some(Filter.In("label", Seq(1, 3, 5, 7)) && Filter.Ne("label", 5)))
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("dist"), 6).as("dist"))
    }),
    )
    base ++ graft.queries.QueriesRelational.defs ++
      graft.queries.QueriesVector.defs ++
      graft.queries.QueriesQuant.defs ++
      graft.queries.QueriesText.defs ++
      graft.queries.QueriesGraph.defs ++
      graft.queries.QueriesEvents.defs ++
      graft.queries.QueriesMultimodal.defs ++
      graft.queries.QueriesMisc.defs
  }

  /** DuckDB oracle SQL, same column names + rounding as the Spark side. */
  def oracleSql: Map[String, String] = {
    // Exact kNN oracle: position-aligned unnest (DuckDB zips equal-length
    // unnests), double accumulation, rank by (dist, id).
    def knnOracle(distExpr: String, where: String = "TRUE"): String =
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
         |pairs AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id, $distExpr AS dist
         |  FROM q, embeddings c WHERE $where
         |),
         |ranked AS (
         |  SELECT query_id, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |  FROM pairs)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |       round(dist, 6) + 0.0 AS dist
         |FROM ranked WHERE rank <= 10""".stripMargin

    val cosine =
      """(SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
        |        ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
        | FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
        |              CAST(unnest(q.qv) AS DOUBLE) AS y))""".stripMargin
    val l2 =
      """(SELECT sqrt(sum((x-y)*(x-y)))
        | FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
        |              CAST(unnest(q.qv) AS DOUBLE) AS y))""".stripMargin
    val ip =
      """(SELECT -sum(x*y)
        | FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
        |              CAST(unnest(q.qv) AS DOUBLE) AS y))""".stripMargin

    Map(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |       round(sum(l_quantity), 4) AS sum_qty,
          |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
          |       round(avg(l_discount), 6) AS avg_disc,
          |       count(*) AS n_rows
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "q2_filter_dsl" ->
        """SELECT p_partkey, p_name, p_brand, p_size FROM part
          |WHERE (contains(p_type, 'BRASS') OR regexp_matches(p_name, '^.*(red|blue).*$'))
          |  AND p_size >= 10 AND p_size < 40
          |  AND NOT (p_brand IN ('Brand#55'))
          |  AND p_type <> 'zzz'
          |ORDER BY p_partkey""".stripMargin,

      "q3_topk" ->
        """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
          |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

      "q4_join_agg" ->
        """SELECT n_name, round(sum(o_totalprice), 2) AS total_revenue, count(*) AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin,

      "q10_knn_cosine" -> knnOracle(cosine),
      "q11_knn_l2" -> knnOracle(l2),
      "q12_knn_ip" -> knnOracle(ip),
      "q13_knn_filtered" -> knnOracle(cosine, where = "c.label IN (1, 3, 7)"),
    ) ++ graft.queries.QueriesRelational.oracles ++
      graft.queries.QueriesVector.oracles ++
      graft.queries.QueriesQuant.oracles ++
      graft.queries.QueriesText.oracles ++
      graft.queries.QueriesGraph.oracles ++
      graft.queries.QueriesEvents.oracles ++
      graft.queries.QueriesMultimodal.oracles ++
      graft.queries.QueriesMisc.oracles
  }
}
