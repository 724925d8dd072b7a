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

  /** Morton (Z-order) code over several numeric key columns: each column
    * min-max normalizes into `bits` bits and the bits interleave, so rows
    * close in EVERY dimension get close codes. Bit j*d+i of the result is
    * bit j of column i. Pure column algebra — stays in whole-stage
    * codegen. `mins`/`maxs` come from one stats pass over the data
    * ([[zorderWrite]] runs it); equal-width buckets are the standard
    * Delta/Iceberg OSS choice — under heavy per-column skew, pre-bucket
    * the skewed column (e.g. log transform) before z-ordering. */
  def zorderCol(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
                bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size == mins.size && cols.size == maxs.size)
    val d = cols.size
    require(bits * d <= 62, s"zorder: $bits bits x $d dims overflow a long")
    val scaled = cols.lazyZip(mins).lazyZip(maxs).map { (c, lo, hi) =>
      val span = math.max(hi - lo, Double.MinPositiveValue)
      // clamp into [0, 2^bits): nulls sort first (bucket 0)
      least(greatest(
          ((coalesce(c.cast("double"), lit(lo)) - lit(lo)) / lit(span) *
            lit((1L << bits) - 1)).cast("long"),
          lit(0L)),
        lit((1L << bits) - 1))
    }
    (0 until bits).flatMap(j => scaled.zipWithIndex.map { case (s, i) =>
      shiftleft(shiftright(s, j).bitwiseAND(lit(1L)), j * d + i)
    }).reduce(_.bitwiseOR(_))
  }

  /** Write `df` Z-ORDERED by `keyCols` into ~`numFiles` parquet files:
    * one stats pass for the per-column min/max, then range-partition +
    * sort by the interleaved code. Each output file then covers a small
    * HYPER-RECTANGLE of the key space instead of a stripe, so parquet
    * footer min/max stats tighten on ALL key columns at once and a
    * predicate on ANY of them skips most row groups — the multi-column
    * locality a single-column sort cannot give. At 100 TB this is the
    * difference between a selective 2-column probe reading gigabytes and
    * reading everything. */
  def zorderWrite(df: DataFrame, dir: String, keyCols: Seq[String],
                  numFiles: Int, bits: Int = 16): Unit = {
    val stats = df.agg(
      keyCols.flatMap(c => Seq(min(col(c).cast("double")),
        max(col(c).cast("double")))).head,
      keyCols.flatMap(c => Seq(min(col(c).cast("double")),
        max(col(c).cast("double")))).tail: _*).head()
    val mins = keyCols.indices.map(i => Option(stats.get(2 * i))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    val maxs = keyCols.indices.map(i => Option(stats.get(2 * i + 1))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    val z = zorderCol(keyCols.map(col), mins, maxs, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
  }

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
