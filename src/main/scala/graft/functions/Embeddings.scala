package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding providers (reference embeddings.py). The network-backed
  * providers (OpenAI/Cohere, embeddings.py:157-336) are out of scope in a
  * zero-egress batch engine — the deterministic hash embedder (the
  * reference's MockEmbedder, embeddings.py:343-371) is the testable core:
  * text -> reproducible unit vector, computed as a codegen-friendly column
  * expression (no RNG state, every engine derives identical values).
  */
object Embeddings {

  /** Deterministic text embedding: component i of dim d is a uniform
    * [-1,1) value derived from md5(text || ":" || i), L2-normalized.
    * Mirrors MockEmbedder's hash-seeded reproducibility (embeddings.py:
    * 361-371) with an engine-portable hash instead of NumPy's RNG. */
  def mockEmbedding(textCol: Column, dim: Int): Column = {
    val raw = transform(sequence(lit(0), lit(dim - 1)), i =>
      conv(substring(md5(concat(textCol, lit(":"), i.cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("double") / 4294967296.0 * 2.0 - 1.0)
    vector.l2Normalize(raw)
  }

  /** Cache-friendly form: embed distinct texts once, join back — the batch
    * analog of the reference's CachedEmbedder (embeddings.py:374-430). */
  def embedDistinct(df: org.apache.spark.sql.DataFrame, textColName: String,
                    dim: Int, outCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val distinctTexts = df.select(col(textColName)).distinct()
      .withColumn(outCol, mockEmbedding(col(textColName), dim))
    df.join(distinctTexts, Seq(textColName), "left")
  }
}
