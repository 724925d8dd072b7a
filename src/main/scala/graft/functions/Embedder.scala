package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Pluggable embedding provider (reference embeddings.py:157-371: one
  * `embed_batch` interface behind OpenAI / Cohere / SentenceTransformer /
  * Mock implementations; every add/query flows through the collection's
  * configured provider, fastpyvectordb/client.py:97-159).
  *
  * The Spark-native contract is set-oriented: an embedder appends an
  * embedding column to a whole DataFrame, so "embed 10M docs" is one
  * distributed stage. Two implementation families:
  *
  *  - column-expression embedders ([[MockEmbedder]]): the embedding is a
  *    codegen'd Catalyst expression — no JVM boundary at all;
  *  - remote/batched embedders ([[BatchedEmbedder]]): implementors
  *    override ONE method, `embedBatch(texts)`, and the base class runs
  *    it over partition-local batches of the DISTINCT texts (the batch
  *    analog of the reference's batched POST + CachedEmbedder cache,
  *    embeddings.py:374-430), joining results back to the rows.
  *
  * The provider NAME is persisted in the collection's config.json
  * (Collections.Config.embedder) like the reference records its model in
  * collection config — a reopened collection embeds queries with the
  * same provider that embedded its corpus.
  */
trait Embedder extends Serializable {
  /** Registry key persisted in collection config. */
  def name: String
  def dimensions: Int
  /** Append `outCol` = embedding of `textCol` (array<float>, unit norm;
    * null text => null embedding). */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame
}

object Embedder {
  /** Built-in providers by config name. Network-backed providers are out
    * of scope in a zero-egress engine; register custom ones through
    * GraftClient's registry parameter. */
  val builtin: Map[String, Int => Embedder] =
    Map("mock" -> (d => MockEmbedder(d)))
}

/** Deterministic hash embedder — the default provider and the testable
  * core (reference MockEmbedder, embeddings.py:343-371). Pure column
  * expression: embedding happens inside WholeStageCodegen. */
final case class MockEmbedder(dimensions: Int) extends Embedder {
  def name: String = "mock"
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol,
      Embeddings.mockEmbedding(col(textCol), dimensions).cast("array<float>"))
}

/** Base for providers that embed via a per-batch call (a remote API, a
  * local model runtime). `embedBatch` sees at most [[batchSize]] texts
  * and runs inside mapPartitions on the executors — one provider call
  * per batch, never per row. Distinct texts are embedded once and joined
  * back, so duplicated documents cost one call (CachedEmbedder
  * semantics) and the heavy text column shuffles at most once. */
abstract class BatchedEmbedder extends Embedder {
  def batchSize: Int = 64

  /** One batched provider call; returns one vector per input text, in
    * order. Implementors: this runs on executors — keep it stateless or
    * lazily-initialized. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bs = batchSize
    val distinct = df.select(col(textCol).cast("string")).na.drop().distinct()
      .as[String]
      .mapPartitions { it =>
        it.grouped(bs).flatMap(batch => batch.zip(embedBatch(batch)))
      }
      .toDF(textCol, outCol)
    df.join(distinct, Seq(textCol), "left")
  }
}
