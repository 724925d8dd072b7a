package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** One-off measurement harness (r14): compares round-materialization
  * strategies for the iterative graph operators on the real derived graph —
  * (a) per-round eager localCheckpoint (the shipped shape),
  * (b) per-round lazy persist (partitioning metadata survives, the next
  *     round's action materializes the cache in-line),
  * interleaved A/B/A/B in one JVM so JIT and ambient load cancel. Prints
  * wall seconds per variant per round-trip. Tooling only — never part of a
  * query path. */
object GraphRoundExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val iterations = 5
    val damping = 0.85
    val nparts = cpus.toInt

    def run(mode: String): (Double, Long) = {
      val edges = graft.queries.GraphData.edges(spark, sfDir)
      val t0 = System.nanoTime()
      val e = edges.select(col("src"), col("dst"))
      val adj = e.join(e.groupBy("src").agg(count(lit(1)).as("_outdeg")), "src")
        .repartition(nparts, col("src")).persist()
      val nodes = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct().persist()
      val n = nodes.count().toDouble
      val teleport = (lit(1.0) - lit(damping)) / lit(n)
      var ranks = nodes.withColumn("rank", lit(1.0) / lit(n))
      val persisted = scala.collection.mutable.ArrayBuffer[DataFrame]()
      for (_ <- 1 to iterations) {
        val contribs = adj
          .join(ranks.select(col("id").as("src"), col("rank")), "src")
          .select(col("dst").as("id"), (col("rank") / col("_outdeg")).as("_c"))
        val inflow = contribs.unionByName(nodes.select(col("id"), lit(0.0).as("_c")))
          .groupBy("id").agg(sum(col("_c")).as("_inflow"))
        var next = inflow.select(col("id"),
          (teleport + lit(damping) * col("_inflow")).as("rank"))
        mode match {
          case "checkpoint" => next = next.localCheckpoint(eager = true)
          case "persist" => next = next.persist(); persisted += next
          case "lazy" => ()
        }
        ranks = next
      }
      val out = ranks.agg(sum(col("rank"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      adj.unpersist(); nodes.unpersist()
      persisted.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      (dt, math.round(out * 1e6))
    }

    // warm both paths once, then interleave 3 rounds each
    Seq("checkpoint", "persist", "lazy").foreach(run)
    val results = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to 3; m <- Seq("checkpoint", "persist", "lazy")) {
      val (dt, chk) = run(m)
      results(m) = results(m) :+ dt
      println(f"$m%-12s $dt%6.2f s  (checksum $chk)")
    }
    results.foreach { case (m, ts) =>
      println(f"$m%-12s best=${ts.min}%.2f median=${ts.sorted.apply(ts.size / 2)}%.2f")
    }
    spark.stop()
  }
}
