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
}
