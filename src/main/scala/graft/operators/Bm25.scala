package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** BM25 lexical retrieval as pure DataFrame algebra.
  *
  * Mirrors the reference's BM25Index (hybrid_search.py:40-179):
  *  - tokenizer: lowercase + `\b\w+\b` (hybrid_search.py:71-75)
  *  - idf = ln((N - df + 0.5)/(df + 0.5) + 1)   (hybrid_search.py:119-128)
  *  - score = Σ_terms tf·(k1+1)/(tf + k1·(1 - b + b·len/avglen)) · idf
  *    with k1=1.5, b=0.75                        (hybrid_search.py:130-154)
  *  - a term occurring m times in the QUERY contributes m times
  *    (the reference loops over the raw query token list).
  *
  * Scale shape: the inverted index IS the postings DataFrame — partitioned
  * by term it is exactly the reference's `term -> {doc: tf}` dict
  * (hybrid_search.py:63-65) distributed. Scoring a query = inner join of
  * query terms with postings (only docs sharing >=1 term are touched — the
  * same candidate pruning as hybrid_search.py:163-167) + one partial-final
  * aggregation. No shuffle of the corpus: postings can be bucketed by term.
  */
object Bm25 {
  val K1 = 1.5
  val B = 0.75

  /** Reference tokenizer: lowercase, split on non-word chars
    * (shared with TextAnalysis via Bm25Tokens). */
  def tokenize(c: Column): Column = graft.functions.Bm25Tokens.tokens(c)

  /** Index state: one small stats row + two derived relations.
    * `termBuckets` > 0 marks a persisted index whose postings carry a
    * `_tb` term-hash partition column (see [[saveIndex]]) — [[score]]
    * then prunes the postings scan to the query's buckets. */
  final case class Index(postings: DataFrame,   // (doc_id, term, tf[, _tb])
                         docLengths: DataFrame, // (doc_id, doc_len)
                         nDocs: Long, avgDocLen: Double,
                         termBuckets: Int = 0)

  /** Postings + doc lengths for a batch of documents — the incremental
    * maintenance unit shared by [[buildIndex]] and the persisted-index
    * delta paths. */
  def tokenizeDocs(docs: DataFrame, idCol: String,
                   textCol: String): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc_id"),
      tokenize(col(textCol)).as("_toks"))
    (toks.select(col("doc_id"), explode(col("_toks")).as("term"))
       .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
     toks.select(col("doc_id"), size(col("_toks")).as("doc_len")))
  }

  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Index = {
    val (postings0, docLengths0) = tokenizeDocs(docs, idCol, textCol)
    // r14: an in-memory Index IS an index — persist the two slim relations
    // (the reference's BM25Index likewise holds them in memory,
    // hybrid_search.py:63-65). Unpersisted, every consumer re-ran the
    // tokenize+explode pass: the stats row, score()'s df subquery, its
    // postings join and the doc-length join each re-tokenized the corpus
    // (4 passes per q22-shape query). Cached: one pass per relation.
    // MEMORY_AND_DISK spills at scale; the persisted-sidecar path
    // (saveIndex/loadIndex) remains the standing-corpus design.
    val postings = postings0.persist()
    val docLengths = docLengths0.persist()
    val stats = docLengths.agg(count(lit(1)), avg(col("doc_len"))).head()
    Index(postings, docLengths, stats.getLong(0),
      if (stats.isNullAt(1)) 0.0 else stats.getDouble(1))
  }

  /** Top-k TF-IDF keywords per document: (doc_id, rank, term, tfidf).
    *
    * tfidf = tf * ln((N+1)/(df+1)), ranked per doc on the ROUNDED score
    * (6 decimals, term as tie-break) — ranking on the raw double would let
    * a last-ulp ln() difference between engines flip ranks at the k
    * boundary.
    *
    * Scale shape: document frequency is one partially-aggregated shuffle
    * of the postings keyed by term (postings are unique per (doc, term),
    * so df is a plain count); the df join lands on the SAME term
    * partitioning — no broadcast of a full-vocabulary relation (the A4
    * lesson) and no second shuffle of the postings for the join; the
    * per-doc top-k window is the one remaining exchange, keyed by doc. */
  def tfidfKeywords(index: Index, topK: Int = 5): DataFrame = {
    val df = index.postings.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = index.postings.join(df, Seq("term"))
      .withColumn("tfidf",
        round(col("tf") * log(lit(index.nDocs + 1.0) / (col("df") + lit(1.0))), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("tfidf"), asc("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  // ------------------------------------------------- persisted index sidecar

  /** The reference maintains its inverted index incrementally on
    * add/remove (hybrid_search.py:66-117) instead of re-indexing per
    * query. The batch analog: postings + doc-length relations persisted
    * NEXT TO the collection (slim parquet sidecars) plus a stats.json, all
    * maintained by the Crud algebra — hybridQuery then reads them instead
    * of re-tokenizing the corpus on every call.
    *
    * The postings sidecar is PARTITIONED BY a term-hash bucket `_tb` —
    * the distributed analog of the reference's term-keyed dict
    * (hybrid_search.py:63-65): a query only reads the <= |query terms|
    * buckets its terms hash into, so the scan prunes to a fixed number of
    * directories no matter how large the corpus vocabulary grows. New
    * docs append into their terms' buckets; replace/delete is a
    * copy-on-write rewrite preserving the layout. */
  def indexExists(dir: String): Boolean =
    ModelStore.pathExists(s"$dir/stats.json")

  /** Deterministic term-hash bucket (the postings partition key). */
  def termBucket(buckets: Int)(term: Column): Column =
    pmod(xxhash64(term), lit(buckets.toLong)).cast("int")

  /** Driver-side twin of [[termBucket]] — evaluates the SAME Catalyst
    * xxhash64 expression (seed 42) against a local string, so [[score]]
    * can turn its (driver-local) query terms into partition values
    * without running a Spark job. */
  private[graft] def termBucketLocal(buckets: Int)(term: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    // seed 42L = the seed functions.xxhash64 plants (hash.scala's default)
    val h = XxHash64(Seq(Literal.create(term, org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    (((h % buckets) + buckets) % buckets).toInt
  }

  def saveIndex(index: Index, dir: String, termBuckets: Int = 64): Unit = {
    graft.sources.Collections.swapWrite(
      index.postings.withColumn("_tb", termBucket(termBuckets)(col("term")))
        // cluster rows by bucket BEFORE the partitioned write: without this
        // every write task emits a file into every bucket directory
        // (tasks × buckets small files); clustered, each directory gets
        // O(1) files — the layout a 100TB postings relation needs
        .repartition(col("_tb")),
      s"$dir/postings", partitionCols = Seq("_tb"))
    graft.sources.Collections.swapWrite(index.docLengths, s"$dir/doclen")
    writeStats(dir, index.nDocs, index.avgDocLen, termBuckets)
  }

  def writeStats(dir: String, nDocs: Long, avgDocLen: Double,
                 termBuckets: Int): Unit =
    // tmp + rename inside writeString: a crash mid-write never leaves a
    // torn stats.json (same stance as Collections.swapWrite); scheme-aware
    // so the sidecar follows the postings onto s3a/hdfs
    ModelStore.writeString(s"$dir/stats.json",
      s"""{"n_docs": $nDocs, "avg_doc_len": $avgDocLen, "term_buckets": $termBuckets}""")

  private def statsField(dir: String, k: String): String = {
    val raw = ModelStore.readString(s"$dir/stats.json")
    (s""""$k"\\s*:\\s*([-0-9.eE]+)""").r.findFirstMatchIn(raw).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(s"missing $k in index stats"))
  }

  /** Bucket count of a persisted index (from stats.json). */
  def indexTermBuckets(dir: String): Int = statsField(dir, "term_buckets").toInt

  def loadIndex(spark: org.apache.spark.sql.SparkSession, dir: String): Index =
    Index(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclen"),
      statsField(dir, "n_docs").toLong, statsField(dir, "avg_doc_len").toDouble,
      termBuckets = indexTermBuckets(dir))

  /** Append-only delta for freshly indexed docs: postings land in their
    * terms' `_tb` partition directories, doc lengths append, stats
    * refresh. Touches only the new docs' buckets. */
  def appendDelta(dir: String, postings: DataFrame, docLengths: DataFrame): Unit = {
    val buckets = indexTermBuckets(dir)
    postings.withColumn("_tb", termBucket(buckets)(col("term")))
      .repartition(col("_tb"))
      .write.mode("append").partitionBy("_tb").parquet(s"$dir/postings")
    docLengths.write.mode("append").parquet(s"$dir/doclen")
    refreshStats(docLengths.sparkSession, dir)
  }

  /** Small-file compaction for an append-maintained index: rewrite
    * postings buckets holding more than `maxFilesPerBucket` parquet files
    * (per-bucket atomic swap, cold buckets untouched) and the flat doclen
    * dir past the same threshold. Scores are identical before and after —
    * only the file layout changes. Returns the number of relations
    * rewritten (bucket count + 0/1 for doclen). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                   maxFilesPerBucket: Int = 8): Int = {
    require(indexExists(dir), s"no BM25 index at $dir")
    graft.sources.Collections.compactBuckets(
      spark, s"$dir/postings", maxFilesPerBucket) +
      (if (graft.sources.Collections.compactDir(
        spark, s"$dir/doclen", maxFilesPerBucket)) 1 else 0)
  }

  /** Replace the postings/lengths of changed ids: anti-join out the old
    * rows, append the re-tokenized replacements — unaffected documents are
    * never re-tokenized (copy-on-write rewrite preserving the bucket
    * layout). Pass empty deltas for pure deletion. */
  def replaceDelta(dir: String, changedIds: DataFrame,
                   postings: DataFrame, docLengths: DataFrame): Unit = {
    val spark = changedIds.sparkSession
    val buckets = indexTermBuckets(dir)
    val keyed = changedIds.select(col(changedIds.columns.head).as("doc_id"))
    val fresh = postings.withColumn("_tb", termBucket(buckets)(col("term")))
    graft.sources.Collections.swapWrite(
      spark.read.parquet(s"$dir/postings")
        .join(keyed, Seq("doc_id"), "left_anti").unionByName(fresh)
        .repartition(col("_tb")),
      s"$dir/postings", partitionCols = Seq("_tb"))
    graft.sources.Collections.swapWrite(
      spark.read.parquet(s"$dir/doclen")
        .join(keyed, Seq("doc_id"), "left_anti").unionByName(docLengths),
      s"$dir/doclen")
    refreshStats(spark, dir)
  }

  /** Recompute the two scalar stats from the persisted doc lengths,
    * preserving the bucket count. */
  def refreshStats(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val buckets = indexTermBuckets(dir)
    val st = spark.read.parquet(s"$dir/doclen")
      .agg(count(lit(1)), avg(col("doc_len"))).head()
    writeStats(dir, st.getLong(0),
      if (st.isNullAt(1)) 0.0 else st.getDouble(1), buckets)
  }

  /** Restrict an index to the given doc ids (the pre-filtered hybrid
    * search path): semi-joins the slim relations — no re-tokenization —
    * and recomputes the two scalar stats over the survivors. Values are
    * identical to buildIndex over the filtered corpus. */
  def restrict(index: Index, ids: DataFrame): Index = {
    val keep = ids.select(col(ids.columns.head).as("doc_id"))
    val postings = index.postings.join(keep, Seq("doc_id"), "left_semi")
    val docLengths = index.docLengths.join(keep, Seq("doc_id"), "left_semi")
    val stats = docLengths.agg(count(lit(1)), avg(col("doc_len"))).head()
    Index(postings, docLengths, stats.getLong(0),
      if (stats.isNullAt(1)) 0.0 else stats.getDouble(1),
      termBuckets = index.termBuckets)
  }

  /** Score every matching document for a free-text query.
    * Returns (doc_id, score) — only docs sharing >= 1 query term. */
  def score(index: Index, queryText: String): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    // same character class as the document tokenizer — an ASCII-only split
    // here would shred accented/CJK query terms so they never match postings
    val qTermSeq = graft.functions.Bm25Tokens.tokenize(queryText)
      .groupBy(identity).map { case (t, xs) => (t, xs.size) }.toSeq
    val qTerms = qTermSeq.toDF("term", "q_mult")

    // Persisted (term-bucketed) index: the query's terms hash into a handful
    // of `_tb` partition values, so the postings scan prunes to those
    // directories — vocabulary-size-independent I/O, like the reference's
    // term-keyed dict lookup. The terms are driver-local, so the bucket
    // values are computed driver-side (no Spark job for a handful of ints).
    val postings =
      if (index.termBuckets > 0) {
        val bs = qTermSeq.map(t => termBucketLocal(index.termBuckets)(t._1)).distinct
        index.postings.where(col("_tb").isin(bs: _*))
      } else index.postings

    // Document frequency for the QUERY's terms only: semi-join the postings
    // down to query terms BEFORE aggregating. df is per-term, so dropping
    // other terms cannot change the value — identical results, but the
    // aggregate (and the broadcast below) is |query terms| rows instead of
    // the full corpus vocabulary.
    val df = postings
      .join(broadcast(qTerms.select("term")), "term")
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = index.nDocs
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))

    postings
      .join(broadcast(qTerms), "term")
      .join(broadcast(df), "term")
      .join(index.docLengths, "doc_id")
      .withColumn("_idf", idf)
      .withColumn("_contrib",
        col("q_mult") * col("_idf") * (col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("doc_len") / index.avgDocLen)))
      .groupBy("doc_id")
      .agg(sum(col("_contrib")).as("score"))
  }

  /** BM25 top-k: (doc_id, score, rank), rank by (score desc, doc_id). */
  def search(index: Index, queryText: String, k: Int): DataFrame =
    score(index, queryText)
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)

  /** Weighted vector (+) keyword hybrid fusion, reference semantics
    * (hybrid_search.py:355-477):
    *  - both candidate sets fetched at fetch_k = 5*k
    *  - vector distance d -> similarity 1 - d/max(d) over the candidate set
    *  - keyword score s -> s/max(s) over the candidate set
    *  - combined = alpha*v + (1-alpha)*kw over the UNION of candidates
    *    (full outer join, missing side scores 0)
    *
    * @param vectorResults (doc_id, dist) — top fetch_k by vector distance
    * @param keywordResults (doc_id, score) — top fetch_k by BM25
    */
  def hybridFuse(vectorResults: DataFrame, keywordResults: DataFrame,
                 k: Int, alpha: Double = 0.5): DataFrame = {
    // batch-global max: a one-row broadcast join, not a window — the
    // candidate sets are k*5 rows so this stays tiny at any corpus scale
    val vMax = vectorResults.agg(max(col("dist")).as("_vmax"))
    val kMax = keywordResults.agg(max(col("score")).as("_kmax"))
    val v = vectorResults.crossJoin(broadcast(vMax))
      .select(col("doc_id"),
        when(col("_vmax") > 0, lit(1.0) - col("dist") / col("_vmax"))
          .otherwise(lit(1.0)).as("vector_score"))
    val kw = keywordResults.crossJoin(broadcast(kMax))
      .select(col("doc_id"),
        when(col("_kmax") > 0, col("score") / col("_kmax"))
          .otherwise(lit(0.0)).as("keyword_score"))
    v.join(kw, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("vector_score"), lit(0.0)).as("vector_score"),
        coalesce(col("keyword_score"), lit(0.0)).as("keyword_score"))
      .withColumn("score",
        lit(alpha) * col("vector_score") + lit(1 - alpha) * col("keyword_score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR'09 —
    * public literature; the reference only ships weighted score fusion):
    * `score(d) = Σ_lists 1/(k0 + rank_d)`. Rank-based, so immune to the
    * score-scale mismatch between BM25 and vector distance that
    * [[hybridFuse]] has to max-normalize away.
    *
    * Ranks use deterministic tie-breaks — (dist asc, doc_id) on the
    * vector side, (round(score,6) desc, doc_id) on the keyword side, the
    * same orderings the candidate fetches use. The single-partition rank
    * windows are fine at any corpus scale because both inputs are already
    * top-fetch_k candidate lists (O(k) rows), not corpora.
    *
    * @param vectorResults (doc_id, dist) — top fetch_k by vector distance
    * @param keywordResults (doc_id, score) — top fetch_k by BM25
    */
  def rrfFuse(vectorResults: DataFrame, keywordResults: DataFrame,
              k: Int, k0: Int = 60): DataFrame = {
    val vWin = org.apache.spark.sql.expressions.Window
      .orderBy(col("dist"), col("doc_id"))
    val kWin = org.apache.spark.sql.expressions.Window
      .orderBy(desc("_r"), col("doc_id"))
    val v = vectorResults
      .withColumn("vec_rank", row_number().over(vWin))
      .select(col("doc_id"), col("vec_rank"))
    val kw = keywordResults
      .withColumn("_r", round(col("score"), 6))
      .withColumn("kw_rank", row_number().over(kWin))
      .select(col("doc_id"), col("kw_rank"))
    v.join(kw, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("vec_rank"), col("kw_rank"),
        (coalesce(lit(1.0) / (lit(k0) + col("vec_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("kw_rank")), lit(0.0))).as("rrf_score"))
      .orderBy(desc("rrf_score"), col("doc_id"))
      .limit(k)
  }
}
