package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the queries whose
  * shape matters at 100 TB, so regressions in broadcast/pushdown/partial-agg
  * are visible. Usage: runMain graft.Explain [sfDir] [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q10_knn_cosine", "q13_knn_filtered", "q14_knn_batch", "q1_agg", "q22_bm25", "q29_minhash_lsh", "q62_indexed_bm25", "q63_asof_join", "q65_decontaminate", "q68_tfidf_keywords", "q77_rrf", "q78_contamination", "q80_pack_sequences", "q82_image_neardup", "q85_triangles", "q91_heavy_hitters", "q92_source_divergence", "q94_dup_spans", "q95_dsir_weights", "q98_indexed_dedup", "q104_training_pipeline", "q106_adaptive_quality", "q109_connected_components", "q132_url_dedup", "q134_lm_perplexity", "q135_pipeline_lm")
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
