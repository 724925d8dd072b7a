package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Derives a property graph from the driver's TPC-H-ish tables (the mapping
  * declared in FIXTURES.md: region/nation hierarchy + customer/supplier/
  * orders as typed nodes).
  *
  * Node ids are "<table>_<key>" strings; labels capitalized table names.
  * Edges: customer-[:IN_NATION]->nation, supplier-[:IN_NATION]->nation,
  * nation-[:IN_REGION]->region, order-[:ORDERED_BY]->customer.
  * Hyperedges: one per order, nodes = customer + suppliers of its
  * lineitems (type ORDER_PARTIES).
  */
object GraphData {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def vertices(s: SparkSession, dir: String): DataFrame = {
    val nation = t(s, dir, "nation").select(
      concat(lit("nation_"), col("n_nationkey")).as("id"),
      array(lit("Nation")).as("labels"), col("n_name").as("name"))
    val region = t(s, dir, "region").select(
      concat(lit("region_"), col("r_regionkey")).as("id"),
      array(lit("Region")).as("labels"), col("r_name").as("name"))
    val customer = t(s, dir, "customer").select(
      concat(lit("customer_"), col("c_custkey")).as("id"),
      array(lit("Customer")).as("labels"), col("c_name").as("name"))
    val supplier = t(s, dir, "supplier").select(
      concat(lit("supplier_"), col("s_suppkey")).as("id"),
      array(lit("Supplier")).as("labels"), col("s_name").as("name"))
    nation.unionByName(region).unionByName(customer).unionByName(supplier)
  }

  def edges(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").select(
      concat(lit("e_cn_"), col("c_custkey")).as("id"),
      concat(lit("customer_"), col("c_custkey")).as("src"),
      concat(lit("nation_"), col("c_nationkey")).as("dst"),
      lit("IN_NATION").as("type"))
    val sn = t(s, dir, "supplier").select(
      concat(lit("e_sn_"), col("s_suppkey")).as("id"),
      concat(lit("supplier_"), col("s_suppkey")).as("src"),
      concat(lit("nation_"), col("s_nationkey")).as("dst"),
      lit("IN_NATION").as("type"))
    val nr = t(s, dir, "nation").select(
      concat(lit("e_nr_"), col("n_nationkey")).as("id"),
      concat(lit("nation_"), col("n_nationkey")).as("src"),
      concat(lit("region_"), col("n_regionkey")).as("dst"),
      lit("IN_REGION").as("type"))
    val oc = t(s, dir, "orders").select(
      concat(lit("e_oc_"), col("o_orderkey")).as("id"),
      concat(lit("order_"), col("o_orderkey")).as("src"),
      concat(lit("customer_"), col("o_custkey")).as("dst"),
      lit("ORDERED_BY").as("type"))
    cn.unionByName(sn).unionByName(nr).unionByName(oc)
  }

  /** One hyperedge per order: the customer plus every supplier appearing in
    * the order's lineitems. */
  def hyperedges(s: SparkSession, dir: String): DataFrame = {
    val members = t(s, dir, "lineitem")
      .select(col("l_orderkey"), concat(lit("supplier_"), col("l_suppkey")).as("member"))
      .distinct()
      .unionByName(t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"),
          concat(lit("customer_"), col("o_custkey")).as("member")))
    members.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("member"))).as("nodes"))
      .select(concat(lit("order_"), col("l_orderkey")).as("id"),
        col("nodes"), lit("ORDER_PARTIES").as("type"))
  }

  /** Ring graph over the embeddings table: vec i -[:NEXT]-> vec (i+1) mod N.
    * Deterministic structure for graph+vector hybrid queries. */
  def embeddingRing(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "embeddings").count()
    t(s, dir, "embeddings").select(
      concat(lit("e_ring_"), col("vec_id")).as("id"),
      col("vec_id").cast("string").as("src"),
      ((col("vec_id") + 1) % n).cast("string").as("dst"),
      lit("NEXT").as("type"))
  }
}
