package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the FineWeb-Edu / DCLM-style
  * pipeline component (public papers: Penedo et al. 2024, Li et al. 2024):
  * train a tiny logistic model on hashed-unigram count features from SEED
  * sets (positive = the wanted domain — curated/educational/reference
  * text; negative = raw web or rejected samples), then score every corpus
  * document and gate on the score. Complements the heuristic
  * [[graft.functions.TextAnalysis.qualityScore]] (no training data
  * needed) with the learned filter real curation pipelines use once seed
  * sets exist.
  *
  * Features are the SAME hashed-unigram buckets as DSIR
  * ([[Sampling.importanceWeights]]): md5-hash each token into one of
  * `buckets` counts — vocabulary-free, engine-portable (the q115 oracle
  * recomputes scores from the same hash in SQL), and the model is just
  * `buckets` doubles + an intercept.
  *
  * Scale shape: TRAINING runs on the seed sets (thousands of docs — a
  * driver-side concern, seeded Spark ML LBFGS); SCORING is the hot path
  * and is one explode + one doc-keyed map-side-combined aggregation with
  * the nonzero weights broadcast — the DSIR plan shape, linear in corpus
  * tokens, no shuffle wider than (doc, bucket) partials. */
object QualityClassifier {

  /** Trained model: dense per-bucket weights (length = buckets) plus the
    * intercept. Score of a doc = sigmoid(intercept + Σ_b count_b * w_b). */
  final case class LrModel(weights: Array[Double], intercept: Double) {
    def buckets: Int = weights.length
  }

  /** (id, bucket, count) hashed-unigram features — the exact DSIR
    * bucketing (same tokenizer, same md5 hash), so one feature pass can
    * feed both operators. */
  private def bucketed(docs: DataFrame, idCol: String, textCol: String,
                       buckets: Int): DataFrame =
    docs.select(col(idCol), explode(Bm25.tokenize(col(textCol))).as("_t"))
      .select(col(idCol), (TextAnalysis.md5Hash32(col("_t")) % buckets).as("_b"))
      .groupBy(col(idCol), col("_b")).agg(count(lit(1)).as("_c"))

  /** Train the logistic quality model from positive/negative seed docs.
    * Seeded and single-node-deterministic; `regParam` keeps weights tame
    * when the seeds are (nearly) separable. */
  def train(pos: DataFrame, neg: DataFrame, textCol: String,
            buckets: Int = 1024, maxIter: Int = 30,
            regParam: Double = 0.1): LrModel = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    // materialized BEFORE branching: _uid is evaluated once, so the
    // feature branch and the label branch can never disagree on a row's
    // id (two lazy evaluations of monotonically_increasing_id over a
    // nondeterministically-ordered input would silently mislabel)
    val labeled = pos.select(col(textCol).as("_txt"), lit(1.0).as("_lab"))
      .unionByName(neg.select(col(textCol).as("_txt"), lit(0.0).as("_lab")))
      .withColumn("_uid", monotonically_increasing_id())
      .localCheckpoint(true)
    val nb = buckets
    // null-tolerant: a seed doc whose text tokenizes to nothing has no
    // feature rows — it still trains (all-zero vector) instead of being
    // silently dropped from its class (an all-empty side would otherwise
    // shrink to one class and fit a degenerate always-one model)
    val toVec = udf((bs: Seq[org.apache.spark.sql.Row]) =>
      Vectors.sparse(nb, Option(bs).getOrElse(Seq.empty)
        .map(r => (r.getLong(0).toInt, r.getLong(1).toDouble))
        .sortBy(_._1)))
    val feats = bucketed(labeled, "_uid", "_txt", buckets)
      .groupBy("_uid").agg(collect_list(struct(col("_b"), col("_c"))).as("_bs"))
    val data = labeled.select(col("_uid"), col("_lab"))
      .join(feats, Seq("_uid"), "left")
      .select(toVec(col("_bs")).as("features"), col("_lab").as("label"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(data)
    LrModel(m.coefficients.toArray, m.intercept)
  }

  /** Score every document: (idCol, n_tokens, score) with score =
    * sigmoid(intercept + Σ count_b * w_b). Token-less docs score
    * sigmoid(intercept) — present in the output, never silently dropped.
    * The nonzero-weight relation broadcasts; the corpus shuffles only as
    * (doc, bucket) count partials. */
  def score(docs: DataFrame, model: LrModel, idCol: String,
            textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDF = model.weights.zipWithIndex.collect {
      case (w, b) if w != 0.0 => (b.toLong, w)
    }.toSeq.toDF("_b", "_w")
    val agg = bucketed(docs, idCol, textCol, model.buckets)
      .join(broadcast(wDF), Seq("_b"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("_c")).cast("long").as("n_tokens"),
        sum(col("_c") * coalesce(col("_w"), lit(0.0))).as("_m"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("_m"), lit(0.0)) + lit(model.intercept)))))
          .as("score"))
  }
}
