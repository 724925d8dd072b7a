package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column coverage: binary blob plumbing with typed metadata +
  * frame sampling. The text bytes stand in for media bytes (ASCII, so the
  * DuckDB oracle can compute the same fingerprints with text functions);
  * the stubbed decode kernel is exercised in MultimodalSpec. */
object QueriesMultimodal {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column + metadata + whole-blob and head fingerprints
    "q46_multimodal_meta" -> ((s, dir) => {
      val mm = Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text")
      mm.select(col("id"), col("modality"), col("meta.width").as("width"),
        octet_length(col("content")).as("n_bytes"),
        md5(col("content")).as("blob_md5"),
        md5(col("content").substr(lit(1), lit(64))).as("head_md5"))
    }),

    // frame sampling: every 100 bytes -> 32-byte frame fingerprint
    "q47_frame_sample" -> ((s, dir) => {
      val mm = Multimodal.fromText(
        t(s, dir, "documents").where(col("doc_id") < 50), "doc_id", "text")
      Multimodal.frameSample(mm, stride = 100, frameBytes = 32)
    }),
  )

  val oracles: Map[String, String] = Map(
    "q46_multimodal_meta" ->
      """SELECT doc_id AS id, 'image' AS modality,
        |       CAST(length(text) % 1024 AS INT) AS width,
        |       length(text) AS n_bytes,
        |       md5(text) AS blob_md5,
        |       md5(substr(text, 1, 64)) AS head_md5
        |FROM documents""".stripMargin,

    "q47_frame_sample" ->
      """SELECT doc_id AS id, CAST(i AS INT) AS frame_idx,
        |       md5(substr(text, CAST(i AS INT) * 100 + 1, 32)) AS frame_md5
        |FROM documents,
        |     LATERAL (SELECT unnest(range(0, greatest((length(text) - 1) // 100, 0) + 1)) AS i)
        |WHERE doc_id < 50""".stripMargin,
  )
}
