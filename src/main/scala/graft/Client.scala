package graft

import graft.functions.{Embeddings, vector}
import graft.operators.{Crud, Filter, Knn}
import graft.sources.Collections
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ChromaDB-style client facade (reference fastpyvectordb/client.py) in
  * set-oriented form: every call takes/returns DataFrames, so "add 10M
  * docs" and "run 10K queries" are single distributed jobs instead of
  * client-side loops.
  *
  * Collection layout on disk = Collections (parquet + config.json).
  * Document schema: (id: string, document: string, embedding: array<float>,
  * plus arbitrary typed metadata columns).
  */
final class GraftClient(val spark: SparkSession, root: String,
                        embedDim: Int = 64) {

  def createCollection(name: String, metric: String = "cosine",
                       dimensions: Int = 0): GraftCollection = {
    val dim = if (dimensions > 0) dimensions else embedDim
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      GraftCollection.baseSchema)
    Collections.save(empty, s"$root/$name", Collections.Config(name, dim, metric))
    getCollection(name)
  }

  def getCollection(name: String): GraftCollection = {
    val cfg = Collections.loadConfig(s"$root/$name")
    new GraftCollection(spark, s"$root/$name", cfg)
  }

  def getOrCreateCollection(name: String, metric: String = "cosine"): GraftCollection =
    if (listCollections.contains(name)) getCollection(name)
    else createCollection(name, metric)

  def listCollections: Seq[String] = Collections.list(root)

  def deleteCollection(name: String): Boolean = Collections.delete(root, name)
}

object GraftCollection {
  import org.apache.spark.sql.types._
  val baseSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("document", StringType, nullable = true),
    StructField("embedding", ArrayType(FloatType), nullable = true)))
}

/** One named collection. Mutations rewrite the parquet data dir (the batch
  * engine's transaction unit); reads are plain scans so Catalyst prunes
  * and pushes down into them. */
final class GraftCollection(spark: SparkSession, dir: String,
                            val config: Collections.Config) {

  def df: DataFrame = spark.read.parquet(s"$dir/data")

  def count(): Long = df.count()

  /** Embed any rows missing an embedding (client.py:97-159 embeds
    * documents on add), then append; duplicate ids are rejected like the
    * reference's insert. */
  def add(rows: DataFrame): Unit = {
    val (stored, incoming) = aligned(withEmbedding(rows))
    write(Crud.insertNew(stored, incoming, "id"))
  }

  /** add-or-replace by id (client.py:161-182). */
  def upsert(rows: DataFrame): Unit = {
    val (stored, incoming) = aligned(withEmbedding(rows))
    write(Crud.upsert(stored, incoming, "id"))
  }

  /** Batch query (client.py:184-274): queries as a DataFrame of
    * (query_id, query_text | query_vec); texts are embedded with the
    * deterministic embedder. Returns (query_id, rank, id, document,
    * distance). */
  def query(queries: DataFrame, k: Int = 10,
            where: Option[Filter] = None): DataFrame = {
    val q =
      if (queries.columns.contains("query_vec")) queries
      else queries.withColumn("query_vec",
        Embeddings.mockEmbedding(col("query_text"), config.dimensions))
    val corpus = df.withColumn("_nid", xxhash64(col("id")))
    val hits = Knn.knnJoin(q.select(col("query_id"), col("query_vec")),
      corpus, k, config.metric, corpusId = "_nid", corpusVec = "embedding",
      filter = where)
    hits.join(corpus.select(col("_nid").as("neighbor_id"), col("id"), col("document")),
        "neighbor_id")
      .select(col("query_id"), col("rank"), col("id"), col("document"),
        col("dist").as("distance"))
  }

  /** Hybrid vector+keyword search over the collection (the reference's
    * Collection.hybrid_search, hybrid_search.py:355-477): BM25 over the
    * document column fused with vector similarity at fetch_k = 5*k,
    * alpha-weighted after per-set max-normalization. One query text per
    * call (the BM25 side is a scalar query); vector side comes from the
    * same text through the collection's embedder. */
  def hybridQuery(queryText: String, k: Int = 10,
                  alpha: Double = 0.5): DataFrame = {
    import graft.operators.Bm25
    val fetchK = k * 5
    val corpus = df.withColumn("_nid", xxhash64(col("id")))
    val qvec = corpus.sparkSession.range(1).select(
      Embeddings.mockEmbedding(lit(queryText), config.dimensions).as("query_vec"),
      lit(0L).as("query_id"))
    val vecCand = Knn.knnJoin(qvec, corpus, fetchK, config.metric,
        corpusId = "_nid", corpusVec = "embedding")
      .select(col("neighbor_id").as("_nid"), col("dist"))
      .join(corpus.select(col("_nid"), col("id")), "_nid")
      .select(col("id").as("doc_id"), col("dist"))
    val idx = Bm25.buildIndex(df.where(col("document").isNotNull), "id", "document")
    val kwCand = Bm25.score(idx, queryText)
      .withColumn("_r", round(col("score"), 6))
      .orderBy(desc("_r"), col("doc_id")).limit(fetchK).drop("_r")
    Bm25.hybridFuse(vecCand, kwCand, k, alpha)
      .join(df.select(col("id").as("doc_id"), col("document")), "doc_id")
      .select(col("doc_id").as("id"), col("document"), col("score"),
        col("vector_score"), col("keyword_score"))
      .orderBy(desc("score"), col("id"))
  }

  /** get by ids and/or metadata filter (client.py:276-355). */
  def get(ids: Seq[String] = Nil, where: Option[Filter] = None,
          limit: Int = Int.MaxValue): DataFrame = {
    val base = if (ids.nonEmpty) df.where(col("id").isin(ids: _*)) else df
    where.map(f => base.where(f.compile)).getOrElse(base).limit(limit)
  }

  /** update existing rows by id (client.py:357-394); missing ids ignored. */
  def update(rows: DataFrame): Unit = {
    val (stored, incoming) = aligned(withEmbedding(rows))
    val updates = incoming.join(stored.select("id"), Seq("id"), "left_semi")
    write(Crud.upsert(stored, updates, "id"))
  }

  /** delete by ids or filter (client.py:396-429). */
  def delete(ids: Seq[String] = Nil, where: Option[Filter] = None): Unit = {
    val remaining = (ids, where) match {
      case (Nil, None) => df.limit(0)
      case (is, None) => df.where(!col("id").isin(is: _*))
      case (Nil, Some(f)) => Crud.deleteByFilter(df, f)
      case (is, Some(f)) =>
        df.where(!(col("id").isin(is: _*) || coalesce(f.compile, lit(false))))
    }
    write(remaining)
  }

  /** peek(limit) (client.py:431-436). */
  def peek(limit: Int = 10): DataFrame = df.orderBy("id").limit(limit)

  private def withEmbedding(rows: DataFrame): DataFrame = {
    val withDoc =
      if (rows.columns.contains("document")) rows
      else rows.withColumn("document", lit(null).cast("string"))
    if (withDoc.columns.contains("embedding"))
      withDoc.withColumn("embedding",
        coalesce(col("embedding").cast("array<float>"),
          Embeddings.mockEmbedding(col("document"), config.dimensions).cast("array<float>")))
    else
      withDoc.withColumn("embedding",
        Embeddings.mockEmbedding(col("document"), config.dimensions).cast("array<float>"))
  }

  /** Align both sides to the union of their schemas (new metadata columns
    * appear as nulls on old rows — schemaless-metadata semantics). */
  private def aligned(incoming: DataFrame): (DataFrame, DataFrame) = {
    val stored = df
    val storedPlus = incoming.schema.fields
      .filterNot(f => stored.columns.contains(f.name))
      .foldLeft(stored)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    val incomingPlus = stored.schema.fields
      .filterNot(f => incoming.columns.contains(f.name))
      .foldLeft(incoming)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    (storedPlus, incomingPlus)
  }

  private def write(result: DataFrame): Unit = {
    // rewrite via temp dir: the plan reads the same files it replaces
    val tmp = s"$dir/data_tmp"
    result.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dataPath = new org.apache.hadoop.fs.Path(s"$dir/data")
    fs.delete(dataPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dataPath)
  }
}
