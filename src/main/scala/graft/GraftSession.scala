package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the confs this engine assumes.
  *
  * Tuned for the driver's local[N] harness but every setting is the one we
  * would also ship on a real cluster: AQE on (skew-join + partition
  * coalescing at 100 TB), shuffle partitions sized to the machine instead of
  * the 200 default, UTC so results hash-match the DuckDB oracle.
  */
object GraftSession {
  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = builder().getOrCreate()
}

/** Loaders for the driver's parquet tables (TESTDATA.md). One DataFrame per
  * table == one "collection" in reference terms (vectordb.py:232-256 maps a
  * collection to exactly this: a named set of rows with typed columns).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so spark.sql(...) mirrors the
    * DuckDB oracle's naming exactly. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
