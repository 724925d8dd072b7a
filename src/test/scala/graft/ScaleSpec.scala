package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share key 0 — the classic skew shape
    val skewed = spark.range(20000)
      .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = Seq((0L, "hot"), (5L, "a"), (10L, "b"), (20L, "c"))
      .toDF("k", "label")
    val plain = skewed.join(dim, "k")
    val salted = Scale.saltedJoin(skewed, dim, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("k", "label").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = salted.groupBy("k", "label").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("bucketed tables join without a shuffle") {
    // the in-memory catalog resets per JVM but the warehouse dir persists;
    // clear any leftover physical locations from prior runs
    for (t <- Seq("bk_left", "bk_right")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val left = spark.range(10000).select(col("id").as("k"), (col("id") * 2).as("v1"))
    val right = spark.range(10000).select(col("id").as("k"), (col("id") * 3).as("v2"))
    Scale.saveBucketed(left, "bk_left", "k", numBuckets = 4)
    Scale.saveBucketed(right, "bk_right", "k", numBuckets = 4)
    val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
    assert(joined.count() === 10000)
    val shuffles = Scale.countShuffles(joined)
    assert(shuffles === 0, s"expected shuffle-free bucketed join, got $shuffles exchanges")
    // contrast: the same join on plain (unbucketed) frames must shuffle
    // once per side when broadcast is off the table (merge hint)
    val unbucketed = left.join(right.hint("merge"), "k")
    unbucketed.count()
    assert(Scale.countShuffles(unbucketed) > 0)
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")
  }
}
