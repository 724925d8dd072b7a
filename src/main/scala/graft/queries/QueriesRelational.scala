package graft.queries

import graft.operators.{Crud, Filter}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational operator coverage: windows, pagination, set ops, CRUD-as-
  * batch (SURVEY §2.5, §2.6, S-ops). */
object QueriesRelational {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T2-style per-group top-k via window rank
    "q5_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // T5 pagination
    "q6_pagination" -> ((s, dir) =>
      Crud.page(t(s, dir, "orders"), "o_orderkey", 50, 100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))),

    // U4 set difference: customers with no pending ('P') orders
    "q7_set_except" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .except(t(s, dir, "orders").where(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")),

    // CRUD upsert: +10% totalprice for every 10th order, checksum result
    "q8_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val updates = orders.where(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      Crud.upsert(orders, updates, "o_orderkey")
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // parity-plus: hierarchical rollup aggregation (SURVEY §2.4 notes the
    // reference has no grouping sets; Catalyst provides them natively)
    "q54_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("qty"))),

    // Full CUBE (all 4 grouping sets, vs rollup's 3) — the OLAP twin of
    // q54 with the (ALL, status) slice the rollup lacks
    "q87_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("qty"))),

    // parity-plus analytic window: per-customer running order stats
    // (rank/lag/moving frames — none exist in the reference, SURVEY §2.5)
    "q55_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      t(s, dir, "orders").where(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w.rowsBetween(-2, 0)), 2).as("moving_sum3"),
          round(col("o_totalprice") -
            coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2).as("delta_prev"),
          rank().over(Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"),
            col("o_orderkey"))).as("price_rank"))
    }),

    // CRUD delete-by-filter (negated-filter scan), checksum result
    "q9_delete" -> ((s, dir) => {
      val f = Filter.Gt("o_totalprice", 150000.0) && Filter.Eq("o_orderstatus", "F")
      Crud.deleteByFilter(t(s, dir, "orders"), f)
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q5_window_topk" ->
      """SELECT o_custkey, CAST(rank AS INT) AS rank, o_orderkey,
        |       round(o_totalprice, 2) AS o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) WHERE rank <= 3""".stripMargin,

    "q6_pagination" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,

    "q7_set_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY c_custkey""".stripMargin,

    "q8_upsert" ->
      """SELECT count(*) AS n_rows, round(sum(price), 2) AS total FROM (
        |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
        |              ELSE o_totalprice END AS price FROM orders)""".stripMargin,

    "q9_delete" ->
      """SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE NOT coalesce(o_totalprice > 150000.0 AND o_orderstatus = 'F', FALSE)""".stripMargin,

    "q54_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       count(*) AS n, round(sum(l_quantity), 4) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q87_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       count(*) AS n, round(sum(l_quantity), 4) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q55_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum3,
        |  round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER (
        |        PARTITION BY o_custkey ORDER BY o_orderkey), 0.0), 2) AS delta_prev,
        |  CAST(rank() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank
        |FROM orders WHERE o_custkey < 100""".stripMargin,
  )
}
