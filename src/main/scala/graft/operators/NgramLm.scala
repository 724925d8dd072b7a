package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-trained bigram language model for perplexity-based quality
  * scoring — the CCNet/CC-100 curation signal (Wenzek et al., LREC'20:
  * score crawl text against an LM trained on a trusted slice; low
  * perplexity ≈ well-formed prose, high ≈ boilerplate, garble, or a
  * different language). KenLM there is a 5-gram with Kneser-Ney; the distributed
  * re-expression keeps the shape that matters — train on a reference
  * slice, score everything, threshold — with add-alpha-smoothed bigrams,
  * whose counts and scores are exactly re-derivable by the SQL oracle
  * (q134) the way a backoff KN model would not be.
  *
  * Scale design: the "model" is never collected — bigram and context
  * counts stay DataFrames (corpus-vocabulary-sized, far too big to
  * broadcast at 100 TB), and scoring is two shuffle equi-joins of the
  * document pair stream against them plus one doc-keyed aggregation.
  * Train once, persist the count tables like any other sidecar, score
  * any number of batches.
  */
object NgramLm {

  /** A fitted bigram LM: smoothed conditional is
    * p(w2|w1) = (c(w1,w2) + alpha) / (c_ctx(w1) + alpha·vocabSize),
    * where c_ctx counts w1 as a bigram CONTEXT (so Σ_w2 p(w2|w1) = 1)
    * and vocabSize is the training slice's distinct-token count. */
  final case class BigramLm(bigrams: DataFrame, contexts: DataFrame,
                            vocabSize: Long, alpha: Double)

  /** Per-row token bigram pairs as an exploded (w1, w2) stream. Docs
    * with fewer than two tokens contribute nothing (and drop out of
    * scoring — a 1-token row has no bigram evidence either way). */
  private def pairCols(df: DataFrame, textCol: String, keep: Column*): DataFrame = {
    val ts = Bm25.tokenize(col(textCol))
    df.select(keep :+
        explode(when(size(ts) >= 2,
          arrays_zip(slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1)))
        ).as("_pr"): _*)
      .select(keep :+ col("_pr.0").as("w1") :+ col("_pr.1").as("w2"): _*)
  }

  /** Fit on the trusted slice: one pass for pairs (two aggregations
    * share it), one distinct-count for the vocabulary. */
  def fit(train: DataFrame, textCol: String, alpha: Double = 0.5): BigramLm = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val prs = pairCols(train, textCol)
    val big = prs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val ctx = prs.groupBy("w1").agg(count(lit(1)).as("cc"))
    val v = train
      .select(explode(Bm25.tokenize(col(textCol))).as("w"))
      .agg(count_distinct(col("w"))).head().getLong(0)
    require(v > 0, "NgramLm.fit: training slice has no tokens")
    BigramLm(big, ctx, v, alpha)
  }

  /** Persist the fitted LM as a sidecar (count tables as parquet, the
    * scalars as a small json) — the fit-once/score-many lifecycle of the
    * other persisted models, except these tables are corpus-vocabulary-
    * sized, so unlike [[ModelStore]]'s inlineable models they stay
    * distributed relations on disk and reload as lazy scans. */
  def save(lm: BigramLm, dir: String): Unit = {
    lm.bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
    lm.contexts.write.mode("overwrite").parquet(s"$dir/contexts")
    val spark = lm.bigrams.sparkSession
    val p = new org.apache.hadoop.fs.Path(s"$dir/lm.json")
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true)
    try out.write(
      s"""{"vocab_size": ${lm.vocabSize}, "alpha": ${lm.alpha}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  def exists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/lm.json")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): BigramLm = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/lm.json")
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val v = """"vocab_size":\s*(\d+)""".r.findFirstMatchIn(meta)
      .getOrElse(throw new IllegalStateException(s"malformed LM sidecar at $dir: $meta"))
      .group(1).toLong
    val a = """"alpha":\s*([0-9.eE+-]+)""".r.findFirstMatchIn(meta)
      .getOrElse(throw new IllegalStateException(s"malformed LM sidecar at $dir: $meta"))
      .group(1).toDouble
    BigramLm(spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/contexts"), v, a)
  }

  /** Score documents against the fitted LM: per doc, the bigram count,
    * the mean log-probability, and perplexity exp(−mean). Unseen pairs
    * back off to the smoothed floor (ln(alpha/(alpha·V)) = −ln V when
    * the context is unseen too). Docs with < 2 tokens are absent. */
  def crossEntropy(docs: DataFrame, lm: BigramLm,
                   idCol: String, textCol: String): DataFrame = {
    // r14 (guide §2.3): the scored pair stream sheds its token STRINGS
    // before the exchanges — both lookups join on xxhash64 keys (bigram
    // and context), so the document side ships (id, 8 B, 8 B) per pair
    // instead of two strings. The count tables keep string keys (they are
    // what fit() aggregates and save() persists); only the join key is
    // hashed, on both sides. A 64-bit collision (~2^-64 per distinct-pair
    // pair) could only swap one smoothed count; the q134/q135/q139
    // oracles verify at string level — collision-modulo agreement, the
    // ngramJaccard stance.
    val prs = pairCols(docs, textCol, col(idCol))
      .select(col(idCol), xxhash64(col("w1"), col("w2")).as("_hb"),
        xxhash64(col("w1")).as("_hc"))
    val big = lm.bigrams.select(xxhash64(col("w1"), col("w2")).as("_hb"), col("cb"))
    val ctx = lm.contexts.select(xxhash64(col("w1")).as("_hc"), col("cc"))
    val denom = lit(lm.alpha) * lit(lm.vocabSize.toDouble)
    prs
      .join(big, Seq("_hb"), "left")
      .join(ctx, Seq("_hc"), "left")
      .select(col(idCol),
        log((coalesce(col("cb"), lit(0L)) + lit(lm.alpha)) /
          (coalesce(col("cc"), lit(0L)) + denom)).as("_lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(col("_lp")).as("avg_logp"))
      .withColumn("ppl", exp(-col("avg_logp")))
  }
}
