package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * These extend the reference's text handling (its tokenizer at
  * hybrid_search.py:71-75 is the only text op it has) with the standard
  * corpus-curation battery: language ID, quality scoring, token counting,
  * fingerprinting. All pure `functions._` column algebra — codegen'd,
  * shuffle-free per row, pushdown-friendly.
  */
object TextAnalysis {

  /** Word tokens, reference tokenizer semantics (lowercase, `\w+`). */
  def tokens(c: Column): Column = Bm25Tokens.tokens(c)

  /** Explicit whitespace class used everywhere instead of `\s`: Java and
    * RE2 disagree on what `\s` matches (`\x0B`, Unicode classes), so both
    * the Spark regex and the DuckDB oracle spell the class out. */
  val WsClass = "[ \\t\\n\\r\\f\\x0B]"

  /** Whitespace token count — the cheap `len(text.split())` estimate. */
  def wsTokenCount(c: Column): Column =
    size(filter(split(c, WsClass + "+"), t => t =!= lit("")))

  /** BPE-ish subword count estimate: word chars grouped ~4 per token plus
    * one token per non-space punctuation run (a public rule-of-thumb
    * approximation of byte-pair tokenizers — NOT a real BPE). */
  def bpeishTokenCount(c: Column): Column = {
    val wordChars = length(regexp_replace(c, "[^A-Za-z0-9]", ""))
    val punctRuns = size(filter(split(c, "[A-Za-z0-9 \\t\\n\\r\\f\\x0B]+"), t => t =!= lit("")))
    ceil(wordChars.cast("double") / 4.0).cast("long") + punctRuns.cast("long")
  }

  /** Per-language stopword marker lists for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: langid here is a partition-local scoring
    * pass, not a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un", "una", "en", "por"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Language-ID: per-language stopword hit-rate, argmax with
    * (rate desc, lang asc) tiebreak; no hits at all => "unk".
    * Returns (idCol, predicted_lang, hit_rate). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sw = stopwords.toSeq.flatMap { case (l, ws) => ws.map((l, _)) }
      .toDF("lang", "term")
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), size(col("_toks")).as("_n"), explode(col("_toks")).as("term"))
    val hits = toks.join(broadcast(sw), "term")
      .groupBy(col(idCol), col("lang"), col("_n"))
      .agg(count(lit(1)).as("_hits"))
      .withColumn("_rate", col("_hits").cast("double") / col("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(desc("_rate"), col("lang"))
    val best = hits.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col(idCol), col("lang").as("predicted_lang"),
        round(col("_rate"), 6).as("hit_rate"))
    docs.select(col(idCol)).join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("predicted_lang"), lit("unk")).as("predicted_lang"),
        coalesce(col("hit_rate"), lit(0.0)).as("hit_rate"))
  }

  /** Heuristic quality score in [0,1] from length, punctuation ratio,
    * stopword ratio, mean word length — the standard cheap pre-filter for
    * corpus curation. r14: ONE per-row kernel ([[QualityScoreExpr]])
    * replacing three regex passes + three interpreted higher-order
    * lambdas per row; bit-identical to the column-algebra form
    * ([[qualityScoreLegacy]], kept for the differential spec), with the
    * same trailing round(…, 6). */
  def qualityScore(textCol: Column): Column =
    round(Bridge.column(QualityScoreExpr(Bridge.expression(textCol))), 6)

  /** Pre-r14 column-algebra body of [[qualityScore]] — retained ONLY as
    * the differential-test oracle for the kernel (QualityKernelSpec
    * asserts bitwise equality over the corpus and edge cases). */
  private[graft] def qualityScoreLegacy(textCol: Column): Column = {
    val nChars = length(textCol).cast("double")
    val toks = tokens(textCol)
    val nToks = size(toks).cast("double")
    val meanWordLen = when(nToks > 0,
      aggregate(transform(toks, t => length(t)), lit(0),
        (acc, x) => acc + x).cast("double") / nToks).otherwise(0.0)
    val punct = length(regexp_replace(textCol, "[A-Za-z0-9 \\t\\n\\r\\f\\x0B]", "")).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(1.0)
    val sw = array(stopwords("en").map(lit): _*)
    val swHits = size(filter(toks, t => array_contains(sw, t))).cast("double")
    val swRatio = when(nToks > 0, swHits / nToks).otherwise(0.0)
    // component scores, each clamped to [0,1]
    val lenScore = least(nChars / 500.0, lit(1.0))
    val wordLenScore = lit(1.0) - least(abs(meanWordLen - 5.0) / 5.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio * 4.0, lit(1.0))
    val swScore = least(swRatio * 4.0, lit(1.0))
    round(lenScore * 0.3 + wordLenScore * 0.2 + punctScore * 0.3 + swScore * 0.2, 6)
  }

  /** Canonical document fingerprint: md5 of whitespace/case-normalized
    * text. Identical fingerprint == exact near-duplicate modulo spacing. */
  def fingerprint(textCol: Column): Column =
    md5(trim(regexp_replace(lower(textCol), WsClass + "+", " ")).cast("binary"))

  /** Token n-gram shingles (arrays of n-token strings joined by space).
    *
    * The token array is bound as a lambda variable (via a one-element
    * transform) so it is evaluated once per ROW — referencing the
    * tokenizer subtree directly inside the inner lambda would re-run the
    * whole split/filter per shingle (O(tokens^2) per document; measured
    * 12s -> 2s on the sf0.1 corpus). */
  def shingles(textCol: Column, n: Int): Column =
    element_at(
      transform(array(tokens(textCol)), tk => {
        val count = size(tk) - (n - 1)
        when(count > 0,
          transform(sequence(lit(0), count - 1),
            i => concat_ws(" ", slice(tk, i + 1, lit(n)))))
          .otherwise(array().cast("array<string>"))
      }), 1)

  /** 64-bit hash keys of token n-grams, one per start position (order
    * preserved, NO distinct) — the [[TokenNgramKeys64]] kernel: hash each
    * token once with xxhash64, combine each window with the builtin
    * varargs xxhash64 chain, all in one primitive loop per row. No n-gram
    * string ever materializes (the r13 profile showed the 1M-doc dedup
    * rungs CPU-bound on exactly the `concat_ws` + hash build this
    * replaces), and no per-element interpreted lambdas either (a
    * higher-order-function version measured ~15% SLOWER than the string
    * build on a matched-floor interleaved A/B). */
  def tokenNgramKeys64(tk: Column, n: Int): Column =
    Bridge.column(TokenNgramKeys64(Bridge.expression(tk), n))

  /** Whole per-document minhash signature as `array<long>` — the
    * [[MinhashSignatureExpr]] kernel. The signature domain is the
    * mod-`sigMod` fold `acc * sigMul + md5Hash32(token)` over each window
    * (see [[NgramHashKernels]]) — replayed exactly by an ANSI-SQL oracle
    * (md5 per token, then pure BIGINT arithmetic; every intermediate
    * stays below 2^52 for sigMod ~2^31, sigMul ~2^20). Windowless
    * documents get the all-`sigMod` sentinel; null text stays null. */
  def minhashSignature(textCol: Column, n: Int, sigMul: Long, sigMod: Long,
                       a: Seq[Long], b: Seq[Long]): Column =
    Bridge.column(MinhashSignatureExpr(Bridge.expression(tokens(textCol)),
      n, sigMul, sigMod, a, b))

  /** Overlapping token-window chunks for embedding pipelines: windows of
    * `size` tokens advancing by `stride` (stride < size = overlap), last
    * partial window kept. Returns array<struct<chunk_idx int, chunk
    * string>>; explode for one row per chunk. Same once-per-row token
    * binding as [[shingles]]. */
  def chunks(textCol: Column, windowSize: Int, stride: Int): Column = {
    require(windowSize > 0 && stride > 0, "windowSize and stride must be positive")
    element_at(
      transform(array(tokens(textCol)), tk => {
        // number of windows: 1 + ceil(max(n - windowSize, 0) / stride)
        val extra = greatest(size(tk) - lit(windowSize), lit(0))
        val cnt = lit(1) + ceil(extra.cast("double") / stride).cast("int")
        transform(sequence(lit(0), cnt - 1), i =>
          struct(i.cast("int").as("chunk_idx"),
            concat_ws(" ", slice(tk, i * stride + 1, lit(windowSize))).as("chunk")))
      }), 1)
  }

  // ------------------------------------------------- repetition signals

  /** Trimmed non-empty lines of a document (split on `\n`). */
  private def lines(textCol: Column): Column =
    filter(transform(split(textCol, "\n"), l => trim(l)), l => l =!= lit(""))

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", table A1
    * repetition filters — public paper, no reference-repo counterpart):
    *
    *  - `dup_line_frac`: fraction of lines that are duplicates of an
    *    earlier line (1 - distinct/total).
    *  - `dup_trigram_frac`: same over token 3-gram shingles.
    *  - `top_bigram` / `top_bigram_frac`: the most frequent token 2-gram
    *    (count desc, bigram asc tie-break) and the fraction of document
    *    characters its occurrences cover (count * len / n_chars).
    *
    * Line/trigram fractions are pure per-row column algebra (zero
    * shuffles); the bigram mode is one explode + doc-keyed partial-agg
    * shuffle — no pairwise work, safe at any corpus scale.
    */
  /** Gopher duplicate-line fraction as a per-row expression (1 - distinct
    * lines / lines) — shared by [[repetitionSignals]] and the pipeline's
    * zero-shuffle repetition gate. */
  def dupLineFrac(textCol: Column): Column = {
    val ls = lines(textCol)
    when(size(ls) > 0,
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
      .otherwise(0.0)
  }

  /** Gopher duplicate-trigram fraction as a per-row expression. r14: the
    * distinct/total ratio is computed over [[tokenNgramKeys64]] window
    * hashes — no trigram string is built per window, no per-element
    * lambda; counts (hence the double ratio) identical to the string form
    * modulo ~2^-64 key collisions (the q74 oracle stays at string level,
    * the ngramJaccard stance). */
  def dupTrigramFrac(textCol: Column): Column = {
    val tri = tokenNgramKeys64(tokens(textCol), 3)
    when(size(tri) > 0,
      lit(1.0) - size(array_distinct(tri)).cast("double") / size(tri))
      .otherwise(0.0)
  }

  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(
      col(idCol),
      length(col(textCol)).cast("double").as("_nc"),
      dupLineFrac(col(textCol)).as("dup_line_frac"),
      dupTrigramFrac(col(textCol)).as("dup_trigram_frac"),
      shingles(col(textCol), 2).as("_bi"))
    val counts = base
      .select(col(idCol), col("_nc"), explode(col("_bi")).as("bigram"))
      .groupBy(col(idCol), col("_nc"), col("bigram"))
      .agg(count(lit(1)).as("_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(desc("_cnt"), col("bigram"))
    val top = counts.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col(idCol), col("bigram").as("top_bigram"),
        (col("_cnt") * length(col("bigram")).cast("double") / col("_nc"))
          .as("top_bigram_frac"))
    base.select(col(idCol), col("dup_line_frac"), col("dup_trigram_frac"))
      .join(top, Seq(idCol), "left")
      .select(col(idCol),
        round(col("dup_line_frac"), 6).as("dup_line_frac"),
        round(col("dup_trigram_frac"), 6).as("dup_trigram_frac"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        round(coalesce(col("top_bigram_frac"), lit(0.0)), 6).as("top_bigram_frac"))
  }

  // ------------------------------------------------------------------ PII

  /** PII patterns written to parse identically under Java regex (Spark)
    * and RE2 (DuckDB oracle): explicit classes, greedy quantifiers, no
    * `\b` / lookaround (RE2 lacks lookaround; `\b` semantics drift). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))

  /** Replace emails, IPv4s, and phone numbers with typed placeholders.
    * Order matters: emails first (their local/domain parts contain dots
    * and digits that the narrower patterns could clip), then IPs, then
    * phones. Pure codegen'd regexp_replace chain — per-row, shuffle-free. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** 32-bit integer hash of a string via md5 prefix — chosen (over
    * xxhash/murmur) because every SQL engine in the oracle loop computes
    * the identical value: parse the first 8 hex chars as a long. r14: a
    * direct kernel ([[Md5Hash32Expr]]) — value-identical, but no 32-char
    * hex string is materialized and re-parsed per call. */
  def md5Hash32(c: Column): Column =
    Bridge.column(Md5Hash32Expr(Bridge.expression(c)))

  /** 60-bit hash (15 hex chars — keeps the value inside a signed int64);
    * same kernel treatment ([[Md5Hash60Expr]]). */
  def md5Hash60(c: Column): Column =
    Bridge.column(Md5Hash60Expr(Bridge.expression(c)))

  /** Register the curation scalar surface as SQL functions on a LIVE
    * session (the [[vector.registerSql]] twin; GraftExtensions registers
    * the same names at session construction): fingerprint, quality_score,
    * canonical_url, bpe_token_count — so a SQL-only user reaches the
    * curation primitives without the DataFrame API. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graft.Bridge
    val reg = spark.sessionState.functionRegistry
    def regCol(name: String, f: Column => Column): Unit =
      reg.createOrReplaceTempFunction(name,
        es => Bridge.convertedExpression(f(Bridge.column(es.head))), "built-in")
    regCol("fingerprint", fingerprint)
    regCol("quality_score", qualityScore)
    regCol("canonical_url", graft.operators.Dedup.canonicalizeUrl)
    reg.createOrReplaceTempFunction("bpe_token_count",
      es => BpeTokenCount(es.head, Bpe.fixture), "built-in")
  }
}

/** Shared tokenizer (kept separate so Bm25 and TextAnalysis agree). */
private[graft] object Bm25Tokens {
  /** Split class for BOTH document and query tokenization: anything not a
    * word char, accented Latin, or CJK. Query-side Scala code must use the
    * same class — a narrower (ASCII-only) query split would break non-ASCII
    * terms into pieces that never match the postings. */
  val SplitClass = "[^a-z0-9_\\u00c0-\\u024f\\u4e00-\\u9fff]+"

  def tokens(c: Column): Column =
    filter(split(lower(c), SplitClass), t => t =!= lit(""))

  /** Driver-side twin of [[tokens]] for query strings. */
  def tokenize(text: String): Seq[String] =
    SplitClass.r.split(text.toLowerCase(java.util.Locale.ROOT)).toSeq
      .filter(_.nonEmpty)
}
