package graft

import graft.functions.TextAnalysis
import graft.operators.{Bm25, Dedup}
import org.apache.spark.sql.functions._

/** Round-5 text-quality battery: Gopher repetition signals, PII
  * detection/redaction, corpus-level paragraph dedup, n-gram-overlap
  * contamination, reciprocal-rank fusion. */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  test("NgramLm: hand-computed smoothed bigram log-probs and perplexity") {
    import graft.operators.NgramLm
    // train "a b a c": pairs (a,b),(b,a),(a,c); ctx a=2, b=1; vocab {a,b,c}
    val train = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val lm = NgramLm.fit(train, "text", alpha = 0.5)
    assert(lm.vocabSize === 3L)
    val got = NgramLm.crossEntropy(Seq(
        (10L, "a b"),     // seen pair:   ln((1+.5)/(2+1.5))
        (11L, "c c"),     // unseen ctx:  ln(.5/(0+1.5))
        (12L, "a b a c"), // the training doc itself
        (13L, "solo")     // one token -> absent
      ).toDF("doc_id", "text"), lm, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def close(a: Double, b: Double) = assert(math.abs(a - b) < 1e-12, s"$a != $b")
    assert(got(10L)._1 === 1L)
    close(got(10L)._2, math.log(1.5 / 3.5))
    close(got(11L)._2, math.log(0.5 / 1.5))
    val wantTrain = (math.log(1.5 / 3.5) + math.log(1.5 / 2.5) + math.log(1.5 / 3.5)) / 3
    assert(got(12L)._1 === 3L)
    close(got(12L)._2, wantTrain)
    close(got(12L)._3, math.exp(-wantTrain))
    assert(!got.contains(13L))
    // the training slice itself scores lower perplexity than garble
    assert(got(12L)._3 < got(11L)._3)
  }

  test("repetitionSignals: duplicate lines, duplicate trigrams, top bigram") {
    // "a b a b a b": trigrams = [aba, bab, aba, bab] -> dup 0.5;
    // bigrams = [a b]x3 + [b a]x2 -> top "a b", frac = 3*3/11
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "x\nx\ny"),
      (3L, "one")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1).getDouble(1) == 0.0)                     // one line, no dups
    assert(r(1).getDouble(2) == 0.5)                     // dup_trigram_frac
    assert(r(1).getString(3) == "a b")
    assert(math.abs(r(1).getDouble(4) - 9.0 / 11.0) < 1e-6)
    assert(math.abs(r(2).getDouble(1) - (1.0 - 2.0 / 3.0)) < 1e-6) // x,x,y
    assert(r(3).getDouble(2) == 0.0)                     // <3 tokens
    assert(r(3).getString(3) == "")                      // <2 tokens
    assert(r(3).getDouble(4) == 0.0)
  }

  test("PII counts and redaction") {
    val df = Seq(
      (1L, "mail a.b-c@ex-1.org and x@y.io, ip 10.0.255.7, call 212-555-0187"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        TextAnalysis.emailCount(col("text")).as("e"),
        TextAnalysis.ipv4Count(col("text")).as("i"),
        TextAnalysis.phoneCount(col("text")).as("p"),
        TextAnalysis.redactPii(col("text")).as("red"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1).getInt(1) == 2 && r(1).getInt(2) == 1 && r(1).getInt(3) == 1)
    assert(r(1).getString(4) == "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>")
    assert(r(2).getInt(1) == 0 && r(2).getInt(2) == 0 && r(2).getInt(3) == 0)
    assert(r(2).getString(4) == "no pii here")
  }

  test("duplicatedParagraphs finds cross-document boilerplate") {
    val docs = Seq(
      (1L, "unique one\nshared footer"),
      (2L, "unique two\nshared footer"),
      (3L, "shared footer\nshared footer"),   // twice within one doc
      (4L, "only here")).toDF("doc_id", "text")
    val r = Dedup.duplicatedParagraphs(docs, "doc_id", "text", minDocs = 2)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("para") == "shared footer")
    assert(row.getAs[Long]("n_total") == 4)
    assert(row.getAs[Long]("n_docs") == 3)
    assert(row.getAs[Long]("first_doc") == 1L)
  }

  test("contaminationOverlap: contained eval doc scores 1, disjoint scores 0") {
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val evalSet = Seq(
      (10L, "quick brown fox jumps"),     // all 2 trigrams in train
      (11L, "totally different words entirely"),
      (12L, "xy")).toDF("doc_id", "text") // too short for trigrams
    val r = Dedup.contaminationOverlap(train, evalSet, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(10).getAs[Double]("overlap_frac") == 1.0)
    assert(r(10).getAs[Long]("n_shingles") == 2 && r(10).getAs[Long]("n_matched") == 2)
    assert(r(11).getAs[Double]("overlap_frac") == 0.0)
    assert(r(12).getAs[Long]("n_shingles") == 0 && r(12).getAs[Double]("overlap_frac") == 0.0)
  }

  test("rrfFuse: score is sum of reciprocal ranks, missing side contributes 0") {
    val vec = Seq((100L, 0.1), (200L, 0.2), (300L, 0.3)).toDF("doc_id", "dist")
    val kw = Seq((200L, 9.0), (400L, 5.0)).toDF("doc_id", "score")
    val r = Bm25.rrfFuse(vec, kw, k = 10).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("rrf_score")).toMap
    assert(math.abs(r(200L) - (1.0 / 62 + 1.0 / 61)) < 1e-12) // vec rank 2, kw rank 1
    assert(math.abs(r(100L) - 1.0 / 61) < 1e-12)
    assert(math.abs(r(400L) - 1.0 / 62) < 1e-12)
    assert(math.abs(r(300L) - 1.0 / 63) < 1e-12)
    // fused ordering: 200 first (two lists beat any single-list score here)
    val top = Bm25.rrfFuse(vec, kw, k = 1).collect().head.getLong(0)
    assert(top == 200L)
  }

  test("quality classifier: separable seeds, deterministic scoring, model round-trip") {
    import graft.operators.{ModelStore, QualityClassifier}
    val pos = (1 to 30).map(i =>
      s"education curriculum learning school lesson chapter knowledge $i")
      .toDF("text")
    val neg = (1 to 30).map(i =>
      s"casino jackpot bonus winner click subscribe free spins $i")
      .toDF("text")
    val m = QualityClassifier.train(pos, neg, "text", buckets = 256, regParam = 0.1)
    val probes = Seq(
      (1L, "a lesson about curriculum and learning in school"),
      (2L, "click for free casino bonus spins jackpot"),
      (3L, ""))                                        // token-less
      .toDF("id", "text")
    val got = QualityClassifier.score(probes, m, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._2 > 0.5, s"positive-domain probe scored ${got(1L)._2}")
    assert(got(2L)._2 < 0.5, s"negative-domain probe scored ${got(2L)._2}")
    assert(got(1L)._2 > got(2L)._2)
    // token-less docs are present and score exactly sigmoid(intercept)
    assert(got(3L)._1 === 0L)
    assert(math.abs(got(3L)._2 - 1.0 / (1.0 + math.exp(-m.intercept))) < 1e-12)
    // ModelStore round-trip is exact
    val dir = java.nio.file.Files.createTempDirectory("graft-lr").toString
    ModelStore.saveLr(spark, m, dir)
    val re = ModelStore.loadLr(spark, dir)
    assert(re.intercept === m.intercept)
    assert(re.weights.toSeq === m.weights.toSeq)
  }

  test("corpus profile: closed-form stats on a tiny fixture") {
    import graft.operators.CorpusReport
    val docs = Seq(
      (1L, "one two three", "en"),
      (2L, "one two three", "en"),     // exact dup of 1
      (3L, "vier funf", "de"),
      (4L, null.asInstanceOf[String], "en"))  // null text: excluded
      .toDF("doc_id", "text", "lang")
    val got = CorpusReport.profile(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("n_docs") === 3.0)
    assert(got("total_ws_tokens") === 8.0)
    assert(math.abs(got("mean_ws_tokens") - 8.0 / 3.0) < 1e-6)
    assert(got("n_langs") === 2.0)
    assert(math.abs(got("top_lang_share") - 2.0 / 3.0) < 1e-6)
    assert(math.abs(got("dup_doc_share") - 2.0 / 3.0) < 1e-6)
    assert(got("mean_quality") > 0.0 && got("mean_quality") < 1.0)
    assert(got.keySet.size === 7)
  }

  test("profileMerged over batch partials equals the full-scan profile") {
    import graft.operators.CorpusReport
    val b1 = Seq((1L, "the quick brown fox", "en"),
      (2L, "der schnelle braune fuchs", "de"),
      (3L, "shared duplicate text here", "en")).toDF("doc_id", "text", "lang")
    val b2 = Seq((4L, "shared duplicate text here", "en"), // cross-batch dup
      (5L, "completely different material now", "fr"),
      (6L, null.asInstanceOf[String], "en")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-profpart").toString
    CorpusReport.writePartial(b1, "doc_id", "text", "lang", dir, 0L)
    CorpusReport.writePartial(b2, "doc_id", "text", "lang", dir, 1L)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val merged = toMap(CorpusReport.profileMerged(spark, dir))
    val full = toMap(CorpusReport.profile(
      b1.unionByName(b2), "doc_id", "text", "lang"))
    assert(merged.keySet === full.keySet)
    full.foreach { case (k, v) =>
      if (k == "mean_quality") assert(math.abs(merged(k) - v) < 1e-9, k)
      else assert(merged(k) === v, k)
    }
    // the cross-batch duplicate is visible ONLY because partials carry
    // fingerprint-LEVEL counts: each batch alone has zero duplication
    assert(merged("dup_doc_share") === 0.4) // docs 3 and 4 of 5 non-null
    assert(merged("n_langs") === 3.0)
    // replay idempotence: rewriting a batch's partial changes nothing
    CorpusReport.writePartial(b2, "doc_id", "text", "lang", dir, 1L)
    assert(toMap(CorpusReport.profileMerged(spark, dir)) === merged)
  }

  test("BPE: greedy merge loop matches hand-computed tokenizations") {
    import graft.functions.Bpe
    val m = Bpe.fixture
    assert(m.merges.length === 44)
    // full merges, partial merges, rank priority, and no-merge words —
    // each hand-derived by running the published greedy algorithm: find
    // the LOWEST-RANK adjacent pair, fuse all occurrences, repeat
    assert(m.tokenizeWord("the").toSeq === Seq("the"))
    assert(m.tokenizeWord("stream").toSeq === Seq("stream"))
    assert(m.tokenizeWord("window").toSeq === Seq("window"))
    assert(m.tokenizeWord("data").toSeq === Seq("data"))
    // (e,r) rank 2 beats (o,r) rank 5 -> "or d er", not "ord er"
    assert(m.tokenizeWord("order").toSeq === Seq("or", "d", "er"))
    assert(m.tokenizeWord("query").toSeq === Seq("qu", "er", "y"))
    // (r,o) rank 8 beats (o,w) rank 9 and consumes the shared 'o'
    assert(m.tokenizeWord("row").toSeq === Seq("ro", "w"))
    assert(m.tokenizeWord("small").toSeq === Seq("s", "m", "a", "l", "l"))
    assert(m.tokenizeWord("agg").toSeq === Seq("a", "g", "g"))
    assert(m.tokenizeWord("a").toSeq === Seq("a"))
    assert(m.tokenizeWord("").toSeq === Seq())

    // identical-symbol rules (the GPT-2 merges file has them, the oracle
    // fixture deliberately does not): left-to-right non-overlapping fuse
    val self = Bpe.BpeModel(IndexedSeq(("a", "a")))
    assert(self.tokenizeWord("aaaa").toSeq === Seq("aa", "aa"))
    assert(self.tokenizeWord("aaaaa").toSeq === Seq("aa", "aa", "a"))
    val chain = Bpe.BpeModel(IndexedSeq(("a", "a"), ("aa", "aa")))
    assert(chain.tokenizeWord("aaaa").toSeq === Seq("aaaa"))

    // full-text counting: lowercase + [^a-z0-9_]+ split, punct ignored
    assert(m.countTokens("The ORDER!! query") === 1L + 3L + 3L)
    assert(m.countTokens("") === 0L)
    assert(m.countTokens("   ") === 0L)

    // merges.txt format parsing: header skipped, bad lines loud
    val parsed = Bpe.fromLines(Iterator("#version: 0.2", "", "t h", "th e"))
    assert(parsed.merges === IndexedSeq(("t", "h"), ("th", "e")))
    intercept[IllegalArgumentException] {
      Bpe.fromLines(Iterator("a b c"))
    }
  }

  test("BPE byte level: bytes_to_unicode map, GPT-2 pre-tokenizer, end-to-end merges") {
    import graft.functions.Bpe

    // --- the byte→unicode map: the published construction's invariants —
    // 256 DISTINCT printable codepoints, the three keep-ranges map to
    // themselves, the 68 excluded bytes get U+0100+n in byte order
    val b2u = Bpe.byteToUnicode
    assert(b2u.distinct.length === 256)
    assert(b2u('a'.toInt) === 'a' && b2u('!'.toInt) === '!' && b2u('~'.toInt) === '~')
    assert(b2u(0xC3) === 'Ã' && b2u(0xA9) === '©') // é's UTF-8 bytes keep themselves
    assert(b2u(0) === 'Ā')     // Ā — first excluded byte
    assert(b2u(9) === 'ĉ')     // ĉ — tab
    assert(b2u(10) === 'Ċ')    // Ċ — newline
    assert(b2u(32) === 'Ġ')    // Ġ — space, the leading-space marker
    assert(b2u(127) === 'ġ')   // ġ — DEL, first excluded byte after space

    // --- the published pre-tokenizer regex, hand-traced branch by branch
    assert(Bpe.gpt2PreTokenize("Hello world!").toSeq === Seq("Hello", " world", "!"))
    assert(Bpe.gpt2PreTokenize("don't stop").toSeq === Seq("don", "'t", " stop"))
    assert(Bpe.gpt2PreTokenize("abc123 45").toSeq === Seq("abc", "123", " 45"))
    // multi-space: \s+(?!\S) keeps the LAST space for the next word
    assert(Bpe.gpt2PreTokenize("a  b").toSeq === Seq("a", " ", " b"))
    assert(Bpe.gpt2PreTokenize("hi ").toSeq === Seq("hi", " "))
    assert(Bpe.gpt2PreTokenize("a\nb").toSeq === Seq("a", "\n", "b"))
    // all seven contraction branches
    assert(Bpe.gpt2PreTokenize("I'll we've he's I'm you're they'd can't").toSeq ===
      Seq("I", "'ll", " we", "'ve", " he", "'s", " I", "'m",
        " you", "'re", " they", "'d", " can", "'t"))

    // --- byte-symbol remap of a pre-token (leading space -> Ġ; é -> its
    // two UTF-8 bytes' mapped chars)
    assert(Bpe.toByteSymbols(" world") === "Ġworld")
    assert(Bpe.toByteSymbols("café") === "cafÃ©")

    // --- end-to-end under the byte-level fixture, each hand-run:
    val m = Bpe.byteFixture
    assert(m.byteLevel)
    assert(m.merges.length === 22)
    // " the": Ġ t (0) -> Ġt; h e (1) -> he... no wait: [Ġ,t,h,e] fuses
    // rank 0 first -> [Ġt,h,e], then h e (1) -> [Ġt,he], then Ġt he (2)
    assert(m.tokenizeByteLevel(" the").toSeq === Seq("Ġthe"))
    // word-initial "the" has no Ġ: t h absent, h e (1) -> [t, he]
    assert(m.tokenizeByteLevel("the").toSeq === Seq("t", "he"))
    // " table": Ġ t (0) wins over t a (7) and consumes the t
    assert(m.tokenizeByteLevel("the table").toSeq ===
      Seq("t", "he", "Ġt", "a", "bl", "e"))
    // " row" chains r o (5), ro w (6), Ġ row (15); " rows" leaves the s
    assert(m.tokenizeByteLevel(" row rows").toSeq ===
      Seq("Ġrow", "Ġrow", "s"))
    // case-preserving: "The" keeps the capital T (no lowercasing)
    assert(m.tokenizeByteLevel("The").toSeq === Seq("T", "he"))
    // multibyte merge: Ã © (20) fuses é's two byte symbols
    assert(m.tokenizeByteLevel(" café").toSeq ===
      Seq("Ġ", "c", "a", "f", "Ã©"))
    // " value": l u (16) before v a (17) before va lu (18), valu e (19)
    assert(m.countTokens(" the table value") === 1L + 4L + 2L)
    assert(m.countTokens("") === 0L)

    // --- the codegen column path scores byte-level models too
    import spark.implicits._
    val got = Seq((1L, "the table"), (2L, " row rows"))
      .toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        Bpe.tokenCount(m)(org.apache.spark.sql.functions.col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 6L, 2L -> 3L))

    // --- merges.txt round-trip keeps the byte-level rules verbatim
    val dir = java.nio.file.Files.createTempDirectory("bpe-byte").toString
    Bpe.saveMerges(spark, m.copy(byteLevel = false), s"$dir/merges.txt")
    val back = Bpe.fromFile(spark, s"$dir/merges.txt", byteLevel = true)
    assert(back.merges === m.merges && back.byteLevel)
  }

  test("BPE column expression counts through codegen and matches the driver-side count") {
    import graft.functions.Bpe
    val m = Bpe.fixture
    val docs = Seq(
      (1L, "the spark stream"),
      (2L, "ORDER by query, window!"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Bpe.tokenCount(m)(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(1L) === 3L)             // the + spark + stream, all 1 token
    // order(3: or,d,er) + by(2: no rule) + query(3: qu,er,y) + window(1)
    assert(got(2L) === 3L + 2L + 3L + 1L)
    assert(got(3L) === -1L)            // null text -> null count
    assert(got(4L) === 0L)
    // the expression path equals the driver-side model on real corpus text
    val sample = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val scored = sample.select(col("doc_id"), Bpe.tokenCount(m)(col("text")).as("n"))
    // the expression must ride INSIDE whole-stage codegen (the reference
    // object + direct method call design), not fall back to interpreted
    // eval like a UDF would
    assert(scored.queryExecution.executedPlan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, scored.queryExecution.executedPlan.toString)
    val viaExpr = scored
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.collect().foreach { r =>
      assert(viaExpr(r.getLong(0)) === m.countTokens(r.getString(1)))
    }
  }

  test("BPE training: learned rules, ranks and counts match the hand-run algorithm") {
    import graft.functions.Bpe
    // vocab hug:3, pug:2, hugs:1, pun:1 — every round hand-derived:
    //   (u,g)=6 -> ug; (h,ug)=4 -> hug; (p,ug)=2 -> pug; then three
    //   count-1 rules in "a b"-string tie-break order: (hug,s), (p,u),
    //   (pu,n); then the vocabulary is fully merged -> early stop
    val docs = Seq("hug hug hug", "pug, pug!", "Hugs pun").toDF("text")
    val trained = Bpe.train(docs, "text", numMerges = 10)
    assert(trained.merges === IndexedSeq(
      ("u", "g", 6L), ("h", "ug", 4L), ("p", "ug", 2L),
      ("hug", "s", 1L), ("p", "u", 1L), ("pu", "n", 1L)))
    // minPairCount stops before the count-1 tail
    assert(Bpe.train(docs, "text", numMerges = 10, minPairCount = 2L).merges
      === trained.merges.take(3))
    // the trained table IS a working model for the counting expression
    val m = trained.model
    assert(m.tokenizeWord("hugs").toSeq === Seq("hugs"))
    assert(m.tokenizeWord("bug").toSeq === Seq("b", "ug"))
    assert(m.countTokens("Hugs pug bug") === 1L + 1L + 2L)
    // maxWords truncation: top-2 words by (count desc, word asc) are
    // hug:3, pug:2 -> first rule is (u,g) with count 5, not 6
    val capped = Bpe.train(docs, "text", numMerges = 1, maxWords = 2)
    assert(capped.merges === IndexedSeq(("u", "g", 5L)))
    // trained vocabulary round-trips through the merges.txt interchange
    // format: saveMerges -> fromFile is the same model
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.saveMerges(spark, m, s"$dir/merges.txt")
    val re = Bpe.fromFile(spark, s"$dir/merges.txt")
    assert(re.merges === m.merges)
    assert(re.countTokens("Hugs pug bug") === m.countTokens("Hugs pug bug"))
  }

  test("BPE training: incremental trainer == naive recount-from-scratch on 30 random corpora") {
    import graft.functions.Bpe
    // reference implementation: rescan the whole vocabulary every round —
    // no inverted index, no incremental counts, nothing shared with the
    // production trainer beyond the contract (per-position counting,
    // (count desc, "a b" asc) winner, greedy left-to-right fuse)
    def naive(wordCounts: Seq[(String, Long)], numMerges: Int,
              skipIdentical: Boolean): Seq[(String, String, Long)] = {
      var vocab = wordCounts.map { case (w, c) => (w.toCharArray.map(String.valueOf), c) }
      val out = Seq.newBuilder[(String, String, Long)]
      var done = false
      var made = 0
      while (made < numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((s, c) <- vocab; i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
        val eligible = counts.filterNot { case ((a, b), _) => skipIdentical && a == b }
        if (eligible.isEmpty) done = true
        else {
          val ((a, b), n) = eligible.minBy { case ((x, y), c) => (-c, x + " " + y) }
          out += ((a, b, n))
          vocab = vocab.map { case (s, c) =>
            val nb = Array.newBuilder[String]
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == a && s(j + 1) == b) { nb += (a + b); j += 2 }
              else { nb += s(j); j += 1 }
            }
            (nb.result(), c)
          }
          made += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(4242)
    // 3-letter alphabet: heavy pair sharing, frequent identical-symbol
    // runs (aab, bba, aaaa) — exactly the regime where the incremental
    // index and the double-counting edge cases can drift
    for (trial <- 0 until 30) {
      val words = Seq.fill(20 + rnd.nextInt(40))(
        Seq.fill(1 + rnd.nextInt(7))("abc" (rnd.nextInt(3))).mkString)
      val wc = words.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val docs = words.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
      val skip = trial % 2 == 0
      val got = Bpe.train(docs, "text", numMerges = 6,
        skipIdenticalPairs = skip).merges
      val want = naive(wc, 6, skip)
      assert(got === want, s"trial $trial (skipIdentical=$skip), words=$words")
    }
  }

  test("BPE training: identical-symbol pairs — learned by default, excluded under skipIdenticalPairs") {
    import graft.functions.Bpe
    // aaaa:2, bb:1 -> (a,a) counts PER POSITION (3 per word occurrence),
    // fusing is greedy left-to-right: aaaa -> [aa,aa] -> [aaaa]
    val docs = Seq("aaaa aaaa bb").toDF("text")
    assert(Bpe.train(docs, "text", numMerges = 5).merges === IndexedSeq(
      ("a", "a", 6L), ("aa", "aa", 2L), ("b", "b", 1L)))
    // the SQL-replayable subset (q120's mode): nothing eligible here
    assert(Bpe.train(docs, "text", numMerges = 5,
      skipIdenticalPairs = true).merges.isEmpty)
    // mixed corpus: the identical-symbol winner is skipped, the best
    // DISTINCT pair wins instead ((a,a)=4 skipped; (x,y)=3 learned)
    val mixed = Seq("aaa aaa xy xy xy").toDF("text")
    assert(Bpe.train(mixed, "text", numMerges = 1,
      skipIdenticalPairs = true).merges === IndexedSeq(("x", "y", 3L)))
    assert(Bpe.train(mixed, "text", numMerges = 1).merges
      === IndexedSeq(("a", "a", 4L)))
  }
}
