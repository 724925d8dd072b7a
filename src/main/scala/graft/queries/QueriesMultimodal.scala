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

    // Perceptual (dHash) image near-dup: REAL P6 decode + 56-bit dHash +
    // banded Hamming join in Spark, checked hash-exact against a DuckDB
    // oracle that recomputes the expected hashes from the synthetic
    // images' closed pixel formula — an independent end-to-end check of
    // the whole decode->hash->band->verify path. doc_id<25 get 1-pixel-
    // edited copies (near-dups within 1 bit by construction).
    "q82_image_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = docs.where(col("doc_id") < 200)
        .select(col("doc_id").as("img_id"), col("doc_id").as("seed"),
          lit(false).as("tweak"))
      val dups = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("img_id"), col("doc_id").as("seed"),
          lit(true).as("tweak"))
      val mm = Multimodal.syntheticPpm(base.unionByName(dups), "img_id", "seed", "tweak")
      Multimodal.imageNearDup(mm, maxHamming = 3)
    }),
    // Perceptual audio near-dup: REAL 16-bit PCM WAV decode + 31-bit
    // energy-contour hash + banded Hamming join, checked hash-exact
    // against a DuckDB oracle that recomputes the contour from the
    // synthetic samples' closed integer formula (the q82 stance for the
    // audio modality). doc_id<25 get one-sample-edited copies (near-dups
    // within 1 bit by construction).
    "q138_audio_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = docs.where(col("doc_id") < 200)
        .select(col("doc_id").as("aud_id"), col("doc_id").as("seed"),
          lit(false).as("tweak"))
      val dups = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("aud_id"), col("doc_id").as("seed"),
          lit(true).as("tweak"))
      val mm = Multimodal.syntheticWav(base.unionByName(dups), "aud_id", "seed", "tweak")
      Multimodal.audioNearDup(mm, maxHamming = 2)
    }),
  )

  val oracles: Map[String, String] = Map(
    "q138_audio_neardup" ->
      """WITH auds AS (
        |  SELECT doc_id AS id, doc_id AS seed, FALSE AS tweak
        |  FROM documents WHERE doc_id < 200
        |  UNION ALL
        |  SELECT doc_id + 100000 AS id, doc_id AS seed, TRUE AS tweak
        |  FROM documents WHERE doc_id < 25),
        |smp AS (
        |  SELECT id, i,
        |    (seed * 73 + i * i * 13 + i * seed) % 4001 - 2000
        |      + (CASE WHEN tweak AND i = 0 THEN 17 ELSE 0 END) AS k
        |  FROM auds, LATERAL (SELECT unnest(range(0, 1024)) AS i)),
        |wsum AS (SELECT id, i // 32 AS w, sum(abs(k)) AS e FROM smp GROUP BY 1, 2),
        |bits AS (
        |  SELECT l.id, l.w AS b
        |  FROM wsum l JOIN wsum r ON r.id = l.id AND r.w = l.w + 1
        |  WHERE l.e > r.e),
        |hashes AS (
        |  SELECT a.id,
        |         coalesce(CAST(sum(1::BIGINT << CAST(b.b AS INT)) AS BIGINT), 0) AS h
        |  FROM auds a LEFT JOIN bits b ON b.id = a.id
        |  GROUP BY a.id)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
        |FROM hashes a JOIN hashes b ON a.id < b.id
        |WHERE bit_count(xor(a.h, b.h)) <= 2""".stripMargin,
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

    // Recompute each synthetic image's dHash from the pixel formula
    // (grayscale => luma ordering == pixel-value ordering), then all-pairs
    // Hamming — the banded Spark path must find exactly these pairs.
    "q82_image_neardup" ->
      """WITH imgs AS (
        |  SELECT doc_id AS id, doc_id AS seed, FALSE AS tweak
        |  FROM documents WHERE doc_id < 200
        |  UNION ALL
        |  SELECT doc_id + 100000 AS id, doc_id AS seed, TRUE AS tweak
        |  FROM documents WHERE doc_id < 25),
        |px AS (
        |  SELECT id, i,
        |    CASE WHEN tweak AND i = 0 THEN ((seed * 37 + i * i * 11 + i * seed) % 251 + 1) % 251
        |         ELSE (seed * 37 + i * i * 11 + i * seed) % 251 END AS v
        |  FROM imgs, LATERAL (SELECT unnest(range(0, 64)) AS i)),
        |bits AS (
        |  SELECT l.id, (l.i // 8) * 7 + (l.i % 8) AS b
        |  FROM px l JOIN px r ON r.id = l.id AND r.i = l.i + 1
        |  WHERE l.i % 8 < 7 AND l.v > r.v),
        |hashes AS (
        |  SELECT i.id,
        |         coalesce(CAST(sum(1::BIGINT << CAST(b.b AS INT)) AS BIGINT), 0) AS h
        |  FROM imgs i LEFT JOIN bits b ON b.id = i.id
        |  GROUP BY i.id)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
        |FROM hashes a JOIN hashes b ON a.id < b.id
        |WHERE bit_count(xor(a.h, b.h)) <= 3""".stripMargin,
  )
}
