package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Measurement harness for the optimization rounds (guide §1): for each
  * named query, runs it with the bench's own action (count) and records
  *  - the final DataFrame's explain("formatted") — the plan artifact the
  *    judge checks against plans/r14/;
  *  - EVERY executed plan the query drove (iterative operators run many
  *    actions — counts, localCheckpoints — whose plans the final explain
  *    cannot show), summarized as exchange / join-strategy / codegen
  *    counts per action;
  *  - listener totals: jobs, stages, tasks, shuffle bytes read+written.
  *
  * Usage: runMain graft.PlanProbe <outDir> <suffix> <query...>
  * Writes <outDir>/<query>_<suffix>.txt. Reads SPARK_GRAFT_SF_DIR
  * (default sf0.01 — small enough to iterate, large enough that join
  * strategy choices are real). Pure tooling: never touched by queries,
  * never part of the bench contract.
  */
object PlanProbe {
  private final class Totals {
    var jobs = 0L
    var stages = 0L
    var tasks = 0L
    var shuffleRead = 0L
    var shuffleWrite = 0L
  }

  private def planSummary(qe: QueryExecution): String = {
    val s = qe.executedPlan.toString
    def c(p: String) = p.r.findAllIn(s).length
    val exch = c("Exchange hashpartitioning") + c("Exchange rangepartitioning") +
      c("Exchange RoundRobinPartitioning") + c("Exchange SinglePartition")
    val reused = c("ReusedExchange")
    val bhj = c("BroadcastHashJoin")
    val smj = c("SortMergeJoin")
    val shj = c("ShuffledHashJoin")
    val bnl = c("BroadcastNestedLoopJoin")
    val wsc = c("WholeStageCodegen")
    s"exchanges=$exch reused=$reused BHJ=$bhj SMJ=$smj SHJ=$shj BNLJ=$bnl codegen_spans=$wsc"
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanProbe <outDir> <suffix> <query...>")
    val outDir = args(0); val suffix = args(1); val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val totals = new Totals
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        totals.synchronized { totals.jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        totals.synchronized {
          totals.stages += 1
          totals.tasks += sc.stageInfo.numTasks
          totals.shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          totals.shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
    })
    // full per-action executed plans on demand (SPARK_GRAFT_PROBE_FULLPLANS=1):
    // the iterative operators' round plans are only visible here
    val fullPlans = sys.env.get("SPARK_GRAFT_PROBE_FULLPLANS").contains("1")
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        actions.synchronized {
          actions += f"action=$funcName%-16s ${durationNs / 1e6}%9.1f ms  ${planSummary(qe)}"
          if (fullPlans)
            actions += qe.executedPlan.toString.linesIterator
              .map("    | " + _).mkString("", "\n", "\n")
        }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    // warm-up, same as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    names.foreach { n =>
      actions.synchronized(actions.clear())
      totals.synchronized { totals.jobs = 0; totals.stages = 0; totals.tasks = 0
        totals.shuffleRead = 0; totals.shuffleWrite = 0 }
      spark.sparkContext.setJobDescription(s"probe:$n")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val built = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rows = df.count()
      val counted = (System.nanoTime() - t1) / 1e9
      // the final plan, post-AQE would need re-execution; capture the
      // pre-execution formatted plan (matches what Explain printed in
      // prior rounds) plus the executed-plan summaries from the listener
      val explained = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.name == graft.operators.PackedKnn.residentName)
        .foreach(_.unpersist(blocking = true))
      val tot = totals.synchronized {
        f"jobs=${totals.jobs} stages=${totals.stages} tasks=${totals.tasks} " +
          f"shuffleReadMB=${totals.shuffleRead / 1e6}%.2f shuffleWriteMB=${totals.shuffleWrite / 1e6}%.2f"
      }
      val body = new StringBuilder
      body ++= s"# $n  ($suffix)  sf=$sfDir cpus=$cpus\n"
      body ++= f"# build=${built}%.3f s  count=${counted}%.3f s  rows=$rows\n"
      body ++= s"# listener totals (build+count, incl. iterative rounds): $tot\n\n"
      body ++= "## per-action executed-plan summaries (driver-side actions during build + the count)\n"
      actions.synchronized(actions.foreach(a => body ++= s"$a\n"))
      body ++= "\n## explain(\"formatted\") of the returned DataFrame\n"
      body ++= explained
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), body.toString)
      println(s"[probe] $n rows=$rows count=${f"$counted%.3f"}s $tot")
    }
    spark.stop()
  }
}
