package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-call corpus profile — the numbers a curation run starts and ends
  * with (did the mixture shift? how much exact duplication is left? what
  * is the token budget?), assembled from the battery's own oracle-checked
  * primitives: whitespace token counts, the heuristic quality score, the
  * exact-dedup fingerprint and the language column. Long format
  * (stat, value) like PropertyGraph.stats, and like it a LAZY union of
  * aggregates — the caller pays one action and THREE corpus scans (one
  * folded scan-level aggregation, one lang-keyed count, one
  * fingerprint-keyed count), nothing wider. */
object CorpusReport {

  /** Profile rows, ordered by stat name:
    *  - n_docs, total_ws_tokens, mean_ws_tokens
    *  - mean_quality (heuristic score, rounded per-doc first)
    *  - n_langs, top_lang_share
    *  - dup_doc_share (docs sharing a normalized fingerprint with >= 1
    *    other doc, as a fraction of the corpus) */
  def profile(docs: DataFrame, idCol: String, textCol: String,
              langCol: String): DataFrame = {
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), col(langCol).as("_lang"),
        TextAnalysis.wsTokenCount(col(textCol)).as("_tok"),
        round(TextAnalysis.qualityScore(col(textCol)), 6).as("_q"),
        TextAnalysis.fingerprint(col(textCol)).as("_fp"))
    def emit(name: String, v: Column): Column =
      struct(lit(name).as("stat"), (round(v.cast("double"), 6) + lit(0.0)).as("value"))
    // THREE scans of the corpus total: the five scan-level stats fold
    // into ONE aggregation row and unpivot from it; top_lang_share and
    // dup_doc_share each derive BOTH their numerator and the corpus
    // total from their own keyed count relation (sum of group counts =
    // n), so neither needs a separate counting pass
    val core = base.agg(count(lit(1)).as("_n"), sum(col("_tok")).as("_t"),
        avg(col("_tok")).as("_mt"), avg(col("_q")).as("_mq"),
        countDistinct(col("_lang")).as("_nl"))
      .select(explode(array(
        emit("n_docs", col("_n")),
        emit("total_ws_tokens", col("_t")),
        emit("mean_ws_tokens", col("_mt")),
        emit("mean_quality", col("_mq")),
        emit("n_langs", col("_nl")))).as("_s"))
      .select(col("_s.stat").as("stat"), col("_s.value").as("value"))
    val topLang = base.groupBy("_lang").agg(count(lit(1)).as("_c"))
      .agg(max(col("_c")).as("_m"), sum(col("_c")).as("_n"))
      .select(lit("top_lang_share").as("stat"),
        (round(col("_m").cast("double") / col("_n"), 6) + lit(0.0)).as("value"))
    val dupShare = base.groupBy("_fp").agg(count(lit(1)).as("_c"))
      .agg(coalesce(sum(when(col("_c") >= 2, col("_c"))), lit(0L)).as("_d"),
        sum(col("_c")).as("_n"))
      .select(lit("dup_doc_share").as("stat"),
        (round(col("_d").cast("double") / col("_n"), 6) + lit(0.0)).as("value"))
    core.unionByName(topLang).unionByName(dupShare).orderBy("stat")
  }

  // ------------------------------------------- mergeable incremental form

  /** The MERGEABLE partial behind [[profile]], for a batch-ingested
    * corpus: long-format (kind, key, value) rows —
    *  - ("core", n_docs | sum_ws_tokens | sum_quality, Σ)
    *  - ("lang", <lang>, count)
    *  - ("fp", <normalized fingerprint>, count)
    * Every stat [[profile]] reports folds from sums of these (means are
    * sum/count; shares are ratios of summed group counts), so per-batch
    * partials merge without rescanning text. dup_doc_share is WHY the
    * partials carry fingerprint-LEVEL counts, not a per-batch dup share:
    * a doc duplicated across two batches is invisible to both batches'
    * own shares but its fingerprint counts sum to 2 in the merge.
    * Partial size is O(distinct fingerprints in the batch) — the one
    * non-constant term, and the irreducible one. Counts ride in DOUBLE
    * (exact to 2^53 — beyond any corpus this engine will meet). */
  def profilePartial(docs: DataFrame, idCol: String, textCol: String,
                     langCol: String): DataFrame = {
    val base = docs.where(col(textCol).isNotNull)
      .select(col(langCol).as("_lang"),
        TextAnalysis.wsTokenCount(col(textCol)).as("_tok"),
        round(TextAnalysis.qualityScore(col(textCol)), 6).as("_q"),
        TextAnalysis.fingerprint(col(textCol)).as("_fp"))
    val core = base.agg(count(lit(1)).cast("double").as("_n"),
        coalesce(sum(col("_tok")), lit(0L)).cast("double").as("_t"),
        coalesce(sum(col("_q")), lit(0.0)).as("_q"))
      .select(explode(array(
        struct(lit("core").as("kind"), lit("n_docs").as("key"), col("_n").as("value")),
        struct(lit("core").as("kind"), lit("sum_ws_tokens").as("key"), col("_t").as("value")),
        struct(lit("core").as("kind"), lit("sum_quality").as("key"), col("_q").as("value")))).as("_s"))
      .select(col("_s.kind").as("kind"), col("_s.key").as("key"), col("_s.value").as("value"))
    val lang = base.groupBy(col("_lang").as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("lang").as("kind"), col("key"), col("value"))
    val fp = base.groupBy(col("_fp").as("key"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("fp").as("kind"), col("key"), col("value"))
    core.unionByName(lang).unionByName(fp)
  }

  /** Persist one batch's [[profilePartial]] under `dir/batch_id=N` —
    * OVERWRITE per batch id, so an at-least-once replay rewrites
    * identical rows (the commitIngestBatch stance). */
  def writePartial(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, dir: String, batchId: Long): Unit =
    profilePartial(docs, idCol, textCol, langCol)
      .write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")

  /** Fold every persisted partial under `dir` into the same
    * (stat, value) report as [[profile]] — WITHOUT rescanning any text.
    * Counts, totals and shares are exactly the full-scan numbers;
    * mean_quality can differ in the last ulps (double summation order),
    * which [[profile]]'s own partition-order dependence already admits. */
  def profileMerged(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame = {
    val p = spark.read.parquet(dir)
    def emit(name: String, v: Column): Column =
      struct(lit(name).as("stat"), (round(v.cast("double"), 6) + lit(0.0)).as("value"))
    val core = p.where(col("kind") === "core")
      .agg(coalesce(sum(when(col("key") === "n_docs", col("value"))), lit(0.0)).as("_n"),
        coalesce(sum(when(col("key") === "sum_ws_tokens", col("value"))), lit(0.0)).as("_t"),
        coalesce(sum(when(col("key") === "sum_quality", col("value"))), lit(0.0)).as("_q"))
      .select(explode(array(
        emit("n_docs", col("_n")),
        emit("total_ws_tokens", col("_t")),
        emit("mean_ws_tokens", col("_t") / col("_n")),
        emit("mean_quality", col("_q") / col("_n")))).as("_s"))
      .select(col("_s.stat").as("stat"), col("_s.value").as("value"))
    // re-key the group counts, summing across batches, then reduce the
    // way profile's own keyed relations do (null lang = a group for the
    // share arithmetic but not a language for n_langs, matching
    // countDistinct's null stance)
    val lang = p.where(col("kind") === "lang")
      .groupBy("key").agg(sum(col("value")).as("_c"))
      .agg(count(when(col("key").isNotNull, lit(1))).as("_nl"),
        max(col("_c")).as("_m"), sum(col("_c")).as("_n"))
      .select(explode(array(
        emit("n_langs", col("_nl")),
        emit("top_lang_share", col("_m") / col("_n")))).as("_s"))
      .select(col("_s.stat").as("stat"), col("_s.value").as("value"))
    val fp = p.where(col("kind") === "fp")
      .groupBy("key").agg(sum(col("value")).as("_c"))
      .agg(coalesce(sum(when(col("_c") >= 2.0, col("_c"))), lit(0.0)).as("_d"),
        sum(col("_c")).as("_n"))
      .select(emit("dup_doc_share", col("_d") / col("_n")).as("_s"))
      .select(col("_s.stat").as("stat"), col("_s.value").as("value"))
    core.unionByName(lang).unionByName(fp).orderBy("stat")
  }
}
