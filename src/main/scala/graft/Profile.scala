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
}
