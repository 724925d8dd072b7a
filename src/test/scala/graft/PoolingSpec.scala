package graft

import graft.operators.Pooling
import org.apache.spark.sql.functions._

class PoolingSpec extends SparkSpec {
  import spark.implicits._

  test("meanPool averages elementwise per group, skipping nulls") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)),
      ("a", Seq(3.0f, 6.0f)),
      ("b", Seq(10.0f, 20.0f)),
      ("b", null.asInstanceOf[Seq[Float]]),
      ("c", null.asInstanceOf[Seq[Float]])
    ).toDF("g", "vec")
    val pooled = Pooling.meanPool(df, "g", "vec").collect()
      .map(r => r.getString(0) -> Option(r.getSeq[Double](1))).toMap
    assert(pooled("a").get === Seq(2.0, 4.0))
    assert(pooled("b").get === Seq(10.0, 20.0))   // null vector skipped
    assert(pooled("c").isEmpty)                   // only-null group -> null
  }

  test("meanPool equals the posexplode formulation on real embeddings") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select((col("vec_id") % 7).as("g"), col("embedding"))
    val agg = Pooling.meanPool(embs, "g", "embedding")
      .select(col("g"), posexplode(col("centroid")).as(Seq("pos", "v")))
      .select(col("g"), col("pos"), round(col("v"), 9).as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exploded = embs
      .select(col("g"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("g", "pos").agg(round(avg(col("v")), 9).as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(agg.keySet === exploded.keySet)
    agg.foreach { case (k, v) => assert(math.abs(v - exploded(k)) < 1e-8, s"at $k") }
  }

  test("meanPool rejects mismatched dimensions in a group") {
    val df = Seq(("a", Seq(1.0f)), ("a", Seq(1.0f, 2.0f))).toDF("g", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      Pooling.meanPool(df, "g", "vec").collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }
}
