package graft

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** The r14 quality-score kernel must be BIT-identical to the column-algebra
  * form it replaced — the q25/q104/q106/q108/q111/q139 oracles replay that
  * exact double arithmetic in SQL. */
class QualityKernelSpec extends SparkSpec {

  test("kernel == legacy column algebra, bitwise, on corpus + edge cases") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text"))
    val edges = Seq(
      "",                       // empty: every ratio branch
      " \t\n\r\f\u000B ",       // whitespace only: kept chars, zero tokens
      "!!! ??? ;;; :::",        // punctuation only
      "the the the the",        // all stopwords
      "a",                      // single 1-char stopword
      "that that it for of",    // stopword lengths 1-4 boundary
      "thát thatx theee",  // near-stopwords must NOT hit
      "naïve café über ÀÉÎ", // accented Latin
      "中文分词 一二三",       // CJK token chars
      "mixed 中文 and ASCII 99_under",  // mixed classes + underscore
      "x" * 501,                // length clamp past 500
      "word " * 200,            // exactly repetitive
      "a\u0001b \u0007bell",    // control chars: punct class
      "ABC DEF GHI",            // uppercase input (lowercase path)
      "𝕏 𝕐 surrogate pairs 😀", // non-BMP
      null.asInstanceOf[String] // null text stays null on both sides
    ).toDF("text")
    val both = corpus.unionByName(edges)
      .select(
        TextAnalysis.qualityScore(col("text")).as("k"),
        round(TextAnalysis.qualityScoreLegacy(col("text")), 6).as("l"))
    val bad = both.where(!(col("k") <=> col("l"))).count()
    assert(bad === 0L, "kernel diverged from the legacy column algebra")
    assert(both.count() > 100)
  }

  test("md5Hash32/60 kernels == the conv(substring(md5)) chains, bitwise") {
    import spark.implicits._
    val toks = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(explode(graft.operators.Bm25.tokenize(col("text"))).as("t"))
      .limit(20000)
      .unionByName(Seq("", "a", "naïve", "中文", "𝕏😀").toDF("t"))
    val cmp = toks.select(
      TextAnalysis.md5Hash32(col("t")).as("k32"),
      conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10)
        .cast("long").as("l32"),
      TextAnalysis.md5Hash60(col("t")).as("k60"),
      conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("l60"))
    assert(cmp.where(col("k32") =!= col("l32") || col("k60") =!= col("l60"))
      .count() === 0L)
  }
}
