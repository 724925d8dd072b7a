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
  * aggregates — the caller pays one action, and every branch is either a
  * scan-level aggregate or a fingerprint/lang-keyed count, nothing
  * wider. */
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
    def one(name: String, v: Column, df: DataFrame): DataFrame =
      df.agg(v.cast("double").as("_v"))
        .select(lit(name).as("stat"),
          (round(col("_v"), 6) + lit(0.0)).as("value"))
    val nTotal = base.agg(count(lit(1)).as("_n"))
    val langCounts = base.groupBy("_lang").agg(count(lit(1)).as("_c"))
    val fpCounts = base.groupBy("_fp").agg(count(lit(1)).as("_c"))
    one("n_docs", count(lit(1)), base)
      .unionByName(one("total_ws_tokens", sum(col("_tok")), base))
      .unionByName(one("mean_ws_tokens", avg(col("_tok")), base))
      .unionByName(one("mean_quality", avg(col("_q")), base))
      .unionByName(one("n_langs", countDistinct(col("_lang")), base))
      .unionByName(
        langCounts.agg(max(col("_c")).as("_m")).crossJoin(broadcast(nTotal))
          .select(lit("top_lang_share").as("stat"),
            (round(col("_m").cast("double") / col("_n"), 6) + lit(0.0)).as("value")))
      .unionByName(
        fpCounts.where(col("_c") >= 2).agg(coalesce(sum(col("_c")), lit(0L)).as("_d"))
          .crossJoin(broadcast(nTotal))
          .select(lit("dup_doc_share").as("stat"),
            (round(col("_d").cast("double") / col("_n"), 6) + lit(0.0)).as("value")))
      .orderBy("stat")
  }
}
