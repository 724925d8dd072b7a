package graft

import graft.functions.TextAnalysis
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the minhash pipeline (not part of the
  * driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    if (args.length > 1 && args(1) == "graph") { profileGraph(spark, sfDir); spark.stop(); return }
    if (args.length > 1 && args(1) == "jaccard") {
      val corpus = docs.unionByName(docs.where(col("doc_id") < 250)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 20, 10))").as("text")))
      for (round <- 1 to 2) {
        time(s"plain  exact join (r$round)") {
          Dedup.ngramJaccard(corpus, "doc_id", "text", threshold = 0.5).count()
        }
        time(s"prefix exact join (r$round)") {
          Dedup.ngramJaccardPrefix(corpus, "doc_id", "text", threshold = 0.5).count()
        }
      }
      spark.stop(); return
    }
    time("warmup") { spark.range(100).count() }
    time("read+count") { docs.count() }
    time("tokenize") { docs.select(explode(TextAnalysis.tokens(col("text")))).count() }
    time("shingles") { docs.select(explode(TextAnalysis.shingles(col("text"), 3))).count() }
    time("shingles distinct/row") {
      docs.select(explode(array_distinct(TextAnalysis.shingles(col("text"), 3)))).count()
    }
    time("+md5hash32") {
      docs.select(explode(TextAnalysis.shingles(col("text"), 3)).as("s"))
        .select(TextAnalysis.md5Hash32(col("s")).as("h"))
        .agg(sum("h")).count()
    }
    time("full signatures") {
      Dedup.minhashSignatures(docs, "doc_id", "text").count()
    }
    time("sig via struct-min") {
      val sh = docs.select(col("doc_id"),
          explode(TextAnalysis.shingles(col("text"), 3)).as("s"))
        .select(col("doc_id"), TextAnalysis.md5Hash32(col("s")).as("h"))
      val minExprs = (0 until 32).map { i =>
        min(pmod(lit(Dedup.minhashA(i)) * col("h") + lit(Dedup.minhashB(i)),
          lit(Dedup.MinhashP))).as(s"m$i")
      }
      sh.groupBy("doc_id").agg(minExprs.head, minExprs.tail: _*).count()
    }
    spark.stop()
  }

  /** BFS stage profiler (q34's shape): where do the per-hop seconds go? */
  private def profileGraph(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    for (variant <- Seq("warmup", "op", "op2", "baseline", "op3")) {
      println(s"=== $variant")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      if (variant.startsWith("op")) {
        time("full operator (q34 shape)") {
          graft.operators.PropertyGraph.shortestPaths(
            graft.queries.GraphData.edges(spark, sfDir),
            Seq("customer_1").toDF("id"), maxDepth = 3, direction = "both")
            .where(col("end_id").startsWith("supplier_")).count()
        }
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      } else {
      val edges = graft.queries.GraphData.edges(spark, sfDir)
      val adj = graft.operators.PropertyGraph.materializedAdj(edges, "both", None)
      time("adj materialize")(adj.count())
      val seeds = Seq("customer_1").toDF("id")
      var frontier = seeds.select(col("id").as("start_id"), col("id").as("end_id"),
        lit(0).as("hops")).persist()
      var visited = frontier
      var n = frontier.count()
      for (d <- 1 to 3) {
        time(s"hop $d") {
          val expanded = graft.operators.PropertyGraph.hopJoin(frontier, adj, rowsHint = n)
            .select(col("start_id"), col("neighbor_id").as("end_id"), (col("hops") + 1).as("hops"))
            .groupBy("start_id", "end_id").agg(min("hops").as("hops"))
          val seen = visited.select(col("start_id").as("_vs"), col("end_id").as("_ve"))
          val next = expanded.join(seen,
            expanded("start_id") === seen("_vs") && expanded("end_id") === seen("_ve"), "left_anti")
            .persist()
          n = next.count()
          visited = visited.unionByName(next)
          frontier = next
          n
        }
      }
      time("final checkpoint")(visited.localCheckpoint(eager = true).count())
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
  }
}
