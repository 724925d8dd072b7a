package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shuffle-shape utilities for the 100 TB target: key-salting for skewed
  * joins and bucketed storage for co-located (shuffle-free) joins. These
  * complement AQE (which GraftSession enables): AQE splits skewed
  * partitions reactively, salting prevents them structurally when one key
  * dominates by orders of magnitude; bucketing removes the shuffle from
  * repeated large-large joins entirely.
  */
object Scale {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random salt in [0, saltFactor); the small-but-hot side is replicated
    * once per salt value. Correct for inner joins on `key`; result columns
    * match left.join(right, key). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("_salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Persist a DataFrame bucketed by `key` as a catalog table. Joining two
    * tables bucketed the same way on the bucket key needs NO Exchange —
    * the co-located join the reference approximates with its in-process
    * hash indexes (graph.py:253-488). */
  def saveBucketed(df: DataFrame, table: String, key: String,
                   numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Count Exchange (shuffle) operators in a DataFrame's executed plan —
    * the assertion primitive for shuffle-shape tests. */
  def countShuffles(df: DataFrame): Int = {
    var plan = df.queryExecution.executedPlan
    plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        plan = a.executedPlan
      case _ =>
    }
    var n = 0
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => n += 1
      case _ =>
    }
    n
  }
}
