package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "tiny"),
    (2L, "a somewhat longer document body for the fake decoder"),
    (3L, "x" * 500)).toDF("doc_id", "text")

  test("fromText produces the multimodal schema with metadata") {
    val mm = Multimodal.fromText(docs, "doc_id", "text", "image")
    assert(mm.schema.fieldNames.toSeq === Seq("id", "modality", "content", "meta"))
    val r = mm.where(col("id") === 3).select("meta.width").head()
    assert(r.getInt(0) === 500 % 1024)
  }

  test("stubbed feature extraction is deterministic and fixed-width") {
    val mm = Multimodal.fromText(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(mm).select("id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(mm).select("id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length === 8))
    assert(f1(2L).exists(_ != 0.0f))
  }

  test("feature extraction stays columnar (no RDD scan in the plan)") {
    val mm = Multimodal.fromText(docs, "doc_id", "text")
    val plan = Multimodal.extractFeatures(mm)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), plan)
    // content is dropped before any downstream exchange
    assert(!Multimodal.extractFeatures(mm).columns.contains("content"))
  }

  test("frame sampling yields ceil(len/stride) frames") {
    val mm = Multimodal.fromText(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(mm, stride = 100, frameBytes = 32)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames(1L) === 1) // 4 bytes -> 1 frame
    assert(frames(3L) === 5) // 500 bytes -> 5 frames
  }

  test("partitionBySize spreads blobs across partitions") {
    val mm = Multimodal.fromText(docs, "doc_id", "text")
    val parted = Multimodal.partitionBySize(mm, 2)
    assert(parted.rdd.getNumPartitions === 2)
    assert(parted.count() === 3)
  }
}
