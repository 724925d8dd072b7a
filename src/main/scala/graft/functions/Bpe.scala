package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real greedy byte-pair-encoding token counting over a merges table in
  * GPT-2's published `merges.txt` format (one "a b" pair per line, rank =
  * line order, `#`-prefixed header ignored — the format released with
  * Radford et al. 2019's public tokenizer). Token budgets drive
  * `budgetSample`, `packSequences` and the corpus profile; the whitespace
  * and rule-of-thumb counts ([[TextAnalysis.wsTokenCount]] /
  * `bpeishTokenCount`) remain the cheap defaults, and this is the exact
  * subword path for when the budget has to be denominated in REAL
  * tokenizer tokens.
  *
  * Simplifications vs the full GPT-2 stack, on purpose: symbols are
  * Unicode characters, not bytes (no byte-to-unicode remap table), and
  * pre-tokenization is the engine's standard `lower()` +
  * `[^a-z0-9_]+` word split (the same convention every text operator and
  * SQL oracle here shares) instead of GPT-2's contraction regex. The
  * MERGE LOOP is the real thing: repeatedly find the lowest-rank adjacent
  * pair and fuse all its occurrences left-to-right, until no pair is in
  * the table.
  *
  * Scale shape: the model is plan-serialized (broadcast with the task
  * binary — merges tables are ~50k lines, far under a megabyte), scoring
  * is one codegen'd expression per row with no shuffle, and a
  * per-JVM memo caches word→count because corpus word frequency is
  * Zipfian (the cache hit-rate approaches 1 at scale). */
object Bpe {

  /** GPT-2's byte→unicode map (the published `bytes_to_unicode`
    * construction from Radford et al. 2019's released tokenizer code):
    * the three printable ranges `!..~`, `¡..¬`, `®..ÿ` map to
    * themselves; the remaining 68 byte values are assigned
    * `U+0100 + n` in ascending byte order — so every byte gets a
    * DISTINCT printable codepoint (space → Ġ, newline → Ċ, tab → ĉ)
    * and merge rules over arbitrary UTF-8 stay printable one-liners in
    * `merges.txt`. */
  lazy val byteToUnicode: Array[Char] = {
    val out = new Array[Char](256)
    val keep = (('!'.toInt to '~'.toInt) ++ ('¡'.toInt to '¬'.toInt) ++
      ('®'.toInt to 'ÿ'.toInt)).toSet
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** GPT-2's published pre-tokenization regex (contractions, optionally
    * space-prefixed letter/number/punctuation runs, then whitespace with
    * the keep-the-last-space-for-the-next-word lookahead).
    * UNICODE_CHARACTER_CLASS makes Java's `\s` match the same Unicode
    * whitespace set as the reference Python `regex` module. */
  private val Gpt2Pretok = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Split raw text with the GPT-2 pre-tokenizer (no lowercasing — the
    * byte-level path is case-preserving, unlike the engine word
    * convention). */
  def gpt2PreTokenize(text: String): Array[String] = {
    val m = Gpt2Pretok.matcher(text)
    val out = Array.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One pre-token's initial symbol string: UTF-8 bytes, each mapped
    * through [[byteToUnicode]] — the string BPE merges then run on
    * (each char = one initial symbol, [[BpeModel.tokenizeWord]]'s
    * contract). */
  def toByteSymbols(preToken: String): String = {
    val bytes = preToken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToUnicode(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** Ranked merge table. Construct via [[fromLines]]/[[fromResource]].
    * `byteLevel = true` is the published GPT-2 tokenization contract:
    * pre-tokenize with [[gpt2PreTokenize]] (case-preserving, spaces ride
    * the following word), remap each pre-token's UTF-8 bytes through
    * [[byteToUnicode]], THEN run the merge loop — the mode a published
    * `merges.txt` (whose rules are written over Ġ-prefixed byte symbols)
    * assumes. The default keeps the engine's word convention
    * (lowercase + `[^a-z0-9_]+` split, symbols = characters). */
  final case class BpeModel(merges: IndexedSeq[(String, String)],
                            byteLevel: Boolean = false) {
    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + " " + b, Integer.valueOf(i))
      }
      m
    }

    /** word→token-count memo; concurrent because one plan-referenced
      * model instance serves every task thread in the JVM. Cleared
      * wholesale past a size cap: the long-tail words that would evict
      * an LRU are exactly the ones not worth remembering. */
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    private val MemoCap = 1 << 16

    /** GPT-2 greedy merge of one word: lowest-rank adjacent pair, fuse
      * ALL its occurrences left-to-right (non-overlapping), repeat. */
    def tokenizeWord(word: String): Array[String] = {
      var syms: Array[String] = word.toCharArray.map(String.valueOf)
      var done = syms.length <= 1
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get(syms(i) + " " + syms(i + 1))
          if (r != null && r.intValue() < best) best = r.intValue()
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = merges(best)
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          if (syms.length <= 1) done = true
        }
      }
      syms
    }

    private def wordTokenCount(w: String): Int = {
      val hit = memo.get(w)
      if (hit != null) return hit.intValue()
      val n = tokenizeWord(w).length
      if (memo.size >= MemoCap) memo.clear()
      memo.put(w, Integer.valueOf(n))
      n
    }

    /** Subword token count of a full text: under the default word mode,
      * lowercase + the engine-wide `[^a-z0-9_]+` split, sum per-word
      * counts; under `byteLevel`, the GPT-2 pre-tokenize → byte-remap →
      * merge pipeline. Public (not just expression-internal) so
      * generated code can call it. */
    def countTokens(text: String): Long = {
      if (text == null) return 0L
      if (byteLevel) {
        val pts = gpt2PreTokenize(text)
        var total = 0L
        var i = 0
        while (i < pts.length) { total += wordTokenCount(toByteSymbols(pts(i))); i += 1 }
        total
      } else {
        val words = text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9_]+")
        var total = 0L
        var i = 0
        while (i < words.length) {
          if (words(i).nonEmpty) total += wordTokenCount(words(i))
          i += 1
        }
        total
      }
    }

    /** Full byte-level tokenization of a text — the token STRINGS in
      * mapped-symbol space (what a published tokenizer's vocab lookup
      * would see), for spec assertions and debugging. Byte-level mode
      * only. */
    def tokenizeByteLevel(text: String): Array[String] = {
      require(byteLevel, "tokenizeByteLevel requires a byteLevel model")
      gpt2PreTokenize(text).flatMap(pt => tokenizeWord(toByteSymbols(pt)))
    }
  }

  /** Parse GPT-2 `merges.txt` lines: rank = order, `#`/blank skipped.
    * `byteLevel = true` for a vocabulary written over byte symbols (the
    * published-file convention — pass it when loading a real GPT-2-family
    * `merges.txt`). */
  def fromLines(lines: Iterator[String], byteLevel: Boolean = false): BpeModel =
    BpeModel(lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val p = l.split(" ")
        require(p.length == 2, s"bad merges line (want 'a b'): '$l'")
        (p(0), p(1))
      }.toIndexedSeq, byteLevel)

  /** Load a merges table bundled on the classpath. */
  def fromResource(name: String, byteLevel: Boolean = false): BpeModel = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    require(in != null, s"merges resource not found on classpath: $name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try fromLines(src.getLines(), byteLevel) finally src.close()
  }

  /** Load a merges.txt from any Hadoop-visible path (a user-supplied
    * published vocabulary — pass `byteLevel = true` for GPT-2-family
    * files, whose rules are written over [[byteToUnicode]] symbols). */
  def fromFile(spark: org.apache.spark.sql.SparkSession, path: String,
               byteLevel: Boolean = false): BpeModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try fromLines(src.getLines(), byteLevel) finally src.close()
  }

  /** The small test/oracle fixture shipped with the repo (44 hand-ranked
    * merges over the test vocabulary; deliberately contains no
    * identical-symbol pair, see [[graft.queries.QueriesText]]'s q118
    * oracle note). */
  lazy val fixture: BpeModel = fromResource("graft/bpe_merges.txt")

  /** Byte-level test/oracle fixture: 22 hand-ranked merges written over
    * GPT-2 byte symbols (Ġ-prefixed words, one multibyte `Ã ©` rule for
    * the UTF-8 path), no identical-symbol pair — the q144 oracle
    * replays it in SQL under the q118 double-replace proof. */
  lazy val byteFixture: BpeModel =
    fromResource("graft/bpe_merges_byte.txt", byteLevel = true)

  /** Persist a merge table in the interchange `merges.txt` format
    * [[fromFile]] reads — so a [[train]]ed vocabulary is a reusable
    * artifact across jobs (train once on the corpus, tokenize everywhere),
    * exactly how published vocabularies ship. Driver-side single-file
    * write (merge tables are vocab-sized, ~50k lines at the largest). */
  def saveMerges(spark: org.apache.spark.sql.SparkSession, model: BpeModel,
                 path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true)
    try {
      val w = new java.io.OutputStreamWriter(out, "UTF-8")
      w.write("#version: 0.2\n")
      model.merges.foreach { case (a, b) => w.write(s"$a $b\n") }
      w.flush()
    } finally out.close()
  }

  /** Column function: exact BPE token count of a string column. */
  def tokenCount(model: BpeModel)(c: Column): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(c), model))

  /** A trained merge table plus the pair count each rule had when it was
    * learned (the count is part of the training certificate: the q120
    * oracle re-derives rank, rule AND count independently in SQL). */
  final case class TrainedBpe(merges: IndexedSeq[(String, String, Long)]) {
    def model: BpeModel = BpeModel(merges.map { case (a, b, _) => (a, b) })
  }

  /** Learn a BPE merge table from a corpus (Sennrich et al., ACL'16 —
    * the algorithm behind GPT-2's published vocabulary; trainer shape
    * follows the public HuggingFace-tokenizers/subword-nmt design):
    * repeatedly take the highest-count adjacent symbol pair across the
    * word-frequency table and fuse it everywhere.
    *
    * Scale shape — the part Spark owns: the ONLY corpus-sized work is
    * one distributed word-count pass (explode + word-keyed partial
    * aggregation); the merge loop then runs over the VOCABULARY-sized
    * (word, count) table, which is how every production BPE trainer
    * works — corpus scans per merge would be numMerges full passes.
    * The vocabulary is capped to the `maxWords` most frequent words
    * (count desc, word asc — a deterministic total order) via a single
    * TakeOrdered, which both bounds the driver collect and matches the
    * frequency-truncation every public trainer applies; tail-of-Zipf
    * words contribute ~nothing to pair statistics. The driver loop
    * keeps an inverted pair->words index so each merge touches only
    * the words containing it (incremental pair-count maintenance, not
    * a vocab rescan per merge).
    *
    * Determinism contract (shared with the q120 SQL oracle): pair
    * counts are per adjacent POSITION weighted by word frequency; the
    * winner is (count desc, then the "a b" pair string asc — for the
    * `[a-z0-9_]` symbol alphabet the space separator sorts below every
    * symbol byte, so string order equals (a, b) tuple order); fusing is
    * greedy left-to-right non-overlapping, exactly [[BpeModel.tokenizeWord]]'s
    * step. `skipIdenticalPairs` excludes rules pairing a symbol with
    * itself from CANDIDACY (their positions are still counted for
    * nothing — they simply never win): that is the subset a SQL replay
    * can fuse exactly with string replace (see the q118 oracle note),
    * and q120 trains under it; the default trains the full algorithm,
    * identical-symbol rules included, covered by hand in the spec. */
  def train(docs: org.apache.spark.sql.DataFrame, textCol: String,
            numMerges: Int, maxWords: Int = 1 << 20,
            minPairCount: Long = 1L,
            skipIdenticalPairs: Boolean = false): TrainedBpe = {
    import org.apache.spark.sql.functions._
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    require(maxWords > 0, s"maxWords must be positive: $maxWords")
    val vocab: Array[(String, Long)] = docs
      .select(explode(split(lower(col(textCol)), "[^a-z0-9_]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val syms: Array[Array[String]] =
      vocab.map(_._1.toCharArray.map(String.valueOf))
    val wcnt: Array[Long] = vocab.map(_._2)
    // pair -> total positional count; pair -> word ids that contained it
    // at SOME point (append-only: stale or duplicate entries are safe
    // because re-fusing a word without the pair is a net zero on the
    // counts — cheaper than exact membership at 10^6-word vocab)
    val pc = new java.util.HashMap[String, Long]()
    val pw = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    def addWord(wi: Int, sign: Long): Unit = {
      val s = syms(wi)
      var i = 0
      while (i < s.length - 1) {
        val k = s(i) + " " + s(i + 1)
        val n = pc.getOrDefault(k, 0L) + sign * wcnt(wi)
        if (n <= 0L) { pc.remove(k); pw.remove(k) }
        else {
          pc.put(k, n)
          if (sign > 0)
            pw.computeIfAbsent(k,
              _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += wi
        }
        i += 1
      }
    }
    var wi = 0
    while (wi < syms.length) { addWord(wi, 1L); wi += 1 }

    val out = IndexedSeq.newBuilder[(String, String, Long)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      var bestK: String = null
      var bestN = 0L
      pc.forEach { (k, n) =>
        val eligible = !skipIdenticalPairs || {
          val sp = k.indexOf(' ')
          k.substring(0, sp) != k.substring(sp + 1)
        }
        if (eligible && n >= minPairCount &&
            (n > bestN || (n == bestN && (bestK == null || k.compareTo(bestK) < 0)))) {
          bestK = k; bestN = n
        }
      }
      if (bestK == null) exhausted = true
      else {
        val sp = bestK.indexOf(' ')
        val a = bestK.substring(0, sp)
        val b = bestK.substring(sp + 1)
        out += ((a, b, bestN))
        val affected = pw.get(bestK)
        // fuse greedily left-to-right in every word containing the pair,
        // maintaining the pair statistics incrementally; the fuse loop is
        // a no-op (and the -1/+1 accounting a net zero) for a stale or
        // duplicate entry, so the append-only index needs no dedup
        var ai = 0
        while (ai < affected.length) {
          val w = affected(ai)
          addWord(w, -1L)
          val s = syms(w)
          val nb = Array.newBuilder[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
              nb += (a + b); j += 2
            } else { nb += s(j); j += 1 }
          }
          syms(w) = nb.result()
          addWord(w, 1L)
          ai += 1
        }
        made += 1
      }
    }
    TrainedBpe(out.result())
  }
}

/** Codegen expression for [[Bpe.BpeModel.countTokens]]: the model rides
  * as a plan reference object (serialized once per stage, shared by all
  * task threads), and the generated code is a direct method call — the
  * expression stays inside WholeStageCodegen rather than falling back to
  * interpreted eval like a Scala UDF would. */
case class BpeTokenCount(child: Expression, model: Bpe.BpeModel)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_token_count requires STRING, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    model.countTokens(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model,
      classOf[Bpe.BpeModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.countTokens($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
