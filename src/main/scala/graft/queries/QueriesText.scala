package graft.queries

import graft.functions.TextAnalysis
import graft.operators.{Bm25, Dedup, Filter, Knn, NgramLm, Sampling}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text analysis + deduplication coverage (BM25 A2-A5, hybrid J11/F13-F14,
  * plus the LLM-pipeline battery: lang-ID, quality, token counts,
  * fingerprint, exact/minhash/simhash/jaccard dedup).
  *
  * Near-duplicates are synthesized deterministically (the driver corpus has
  * none): each doc_id < 25 also appears as doc_id+100000 with the last 20
  * chars truncated (near-dup, jaccard ~0.9) or duplicated verbatim (exact).
  */
object QueriesText {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** documents plus truncated copies of doc_id<25 (near-duplicates). */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 20, 10))").as("text")))
  }

  /** documents plus verbatim copies of doc_id<25 (exact duplicates). */
  private def exactDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** [[exactDupCorpus]] carrying lang/source — the end-to-end pipeline
    * input (duplicates keep their original's metadata). */
  private def pipelineCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .unionByName(docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"),
          col("lang"), col("source")))
  }

  private val bm25Query = "spark join merge stream"

  /** q66's language mixture weights (en down-weighted, zh hardest). */
  private val mixtureRates =
    Map("en" -> 0.5, "de" -> 0.9, "fr" -> 0.8, "es" -> 1.0, "zh" -> 0.25)
  private val mixtureCaseSql = mixtureRates
    .map { case (k, r) => s"WHEN '$k' THEN ${Sampling.threshold(r)}" }
    .mkString(" ")

  /** q62's persisted-index sidecar, keyed by corpus dir (built once per
    * JVM; see the q62 comment). */
  private val indexedBm25Sidecar = scala.collection.mutable.Map.empty[String, String]
  private val dedupIndexSidecar = scala.collection.mutable.Map.empty[String, String]

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // URL-level dedup (RefinedWeb/CCNet pre-pass): deterministic URL
    // variants planted on the documents table — scheme case, www,
    // trailing slash, fragment, utm params — collapse under
    // Dedup.canonicalizeUrl; survivor = longest text, ties by smallest
    // id. The oracle re-runs the same six rewrites in DuckDB regex.
    "q132_url_dedup" -> ((s, dir) => {
      val urled = t(s, dir, "documents").select(col("doc_id"), col("text"),
        concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://www.")).otherwise(lit("http://")),
          col("source"), lit(".example.com/page/"),
          (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 4 === 0, lit("?utm_source=feed&utm_medium=rss"))
            .when(col("doc_id") % 4 === 1, lit("/"))
            .when(col("doc_id") % 4 === 2, lit("#section-2"))
            .otherwise(lit(""))).as("url"))
      Dedup.dedupByUrl(urled, "url", "doc_id", "text")
        .select(col("doc_id"), col("canonical_url"), col("n_variants"))
        .orderBy("doc_id")
    }),

    // CCNet-style LM quality scoring: an add-alpha bigram LM fitted on
    // the English slice scores every document; low perplexity = close to
    // the reference distribution. The oracle re-derives the pair/context
    // counts, the vocabulary size, the smoothed log-probs and the
    // per-doc mean in SQL — the whole model is re-executed, not trusted.
    "q134_lm_perplexity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = NgramLm.fit(docs.where(col("lang") === "en"), "text")
      NgramLm.crossEntropy(docs, lm, "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"),
          (round(col("avg_logp"), 6) + lit(0.0)).as("avg_logp"),
          (round(col("ppl"), 6) + lit(0.0)).as("ppl"))
        .orderBy("doc_id")
    }),

    // The LM gate composed in the Pipeline plan (the q117 stance):
    // perplexity gate at the corpus median -> exact dedup over the
    // SURVIVORS. Planted +100000 duplicates ride their original's fate
    // through the gate (identical text, identical ppl) and die in the
    // dedup stage. Oracle: the q134 CTE chain scored over the augmented
    // corpus, chained into the q27 fingerprint window.
    "q135_pipeline_lm" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.where(col("doc_id") < 25)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val lm = NgramLm.fit(docs.where(col("lang") === "en"), "text")
      val spec = graft.operators.PipelineSpec(
        lmModel = Some(lm), maxPerplexity = 30.0, exactDedup = true)
      graft.operators.Pipeline.prepare(corpus, "doc_id", "text", spec).data
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // The FULL RefinedWeb-order curation chain as ONE Pipeline plan:
    // URL dedup (pre-pass) -> language gate -> LM perplexity gate ->
    // exact dedup -> per-group token budget. Three planted populations
    // probe stage ORDER: +200000 truncated URL-variants die in the URL
    // stage (their longer originals survive), +100000 verbatim copies
    // ride through every gate identically and die in exact dedup, and
    // the budget cuts the en survivors at 5k whitespace tokens in hash
    // order. The oracle chains all five stages' proven SQL fragments.
    "q139_pipeline_full" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      val urlVar = docs.where(col("doc_id") < 30)
        .select((col("doc_id") + 200000).as("doc_id"),
          substring(col("text"), 1, 40).as("text"), col("lang"), col("source"))
      val dups = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"),
          col("lang"), col("source"))
      val corpus = base.unionByName(urlVar).unionByName(dups)
        .withColumn("url", concat(
          when(col("doc_id") >= 200000, lit("HTTP://")).otherwise(lit("https://www.")),
          col("source"), lit(".ex.com/p/"),
          when(col("doc_id") >= 200000, col("doc_id") - 200000)
            .otherwise(col("doc_id")).cast("string"),
          when(col("doc_id") >= 200000, lit("/")).otherwise(lit(""))))
      val lm = NgramLm.fit(docs.where(col("lang") === "en"), "text")
      val spec = graft.operators.PipelineSpec(
        urlDedupCol = Some("url"), langAllow = Set("en"),
        lmModel = Some(lm), maxPerplexity = 30.0, exactDedup = true,
        mixtureGroupCol = "lang", tokenBudgetPerGroup = Some(5000L))
      graft.operators.Pipeline.prepare(corpus, "doc_id", "text", spec).data
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // A3/F9: term frequencies, top 20 corpus-wide
    "q21_top_terms" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(Bm25.tokenize(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("term")).limit(20)),

    // A2-A5: BM25 scoring, rank by rounded score for cross-engine ties
    "q22_bm25" -> ((s, dir) => {
      val idx = Bm25.buildIndex(t(s, dir, "documents"), "doc_id", "text")
      Bm25.score(idx, bm25Query)
        .withColumn("score", round(col("score"), 6))
        .orderBy(desc("score"), col("doc_id")).limit(10)
    }),

    // A2-A5 through the PERSISTED index sidecar: build -> saveIndex
    // (term-hash-bucketed postings) -> loadIndex -> score, which prunes
    // the postings scan to the query terms' buckets. Hash-checked against
    // the same DuckDB oracle as q22 — persisted-index scoring must be
    // value-identical to scoring a freshly built index.
    // The sidecar is built ONCE per corpus dir and reused across calls —
    // that IS the feature (the reference amortizes its inverted index
    // across queries); rebuilding per call would benchmark the build, not
    // the indexed lookup.
    "q62_indexed_bm25" -> ((s, dir) => {
      val idxDir = indexedBm25Sidecar.synchronized {
        indexedBm25Sidecar.getOrElseUpdate(dir, {
          val d = java.nio.file.Files.createTempDirectory("graft-q62-kwidx").toString
          Bm25.saveIndex(Bm25.buildIndex(t(s, dir, "documents"), "doc_id", "text"), d)
          d
        })
      }
      Bm25.score(Bm25.loadIndex(s, idxDir), bm25Query)
        .withColumn("score", round(col("score"), 6))
        .orderBy(desc("score"), col("doc_id")).limit(10)
    }),

    // J11/F13/F14: weighted vector + keyword fusion
    "q23_hybrid" -> ((s, dir) => {
      val docs = t(s, dir, "documents"); val embs = t(s, dir, "embeddings")
      val queries = embs.where(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val vecCand = Knn.knnJoin(queries, embs, k = 50, metric = "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .select(col("neighbor_id").as("doc_id"), col("dist"))
      val idx = Bm25.buildIndex(docs, "doc_id", "text")
      val kwCand = Bm25.score(idx, bm25Query)
        .withColumn("_r", round(col("score"), 6))
        .orderBy(desc("_r"), col("doc_id")).limit(50).drop("_r")
      Bm25.hybridFuse(vecCand, kwCand, k = 10, alpha = 0.5)
        .select(col("doc_id"), round(col("score"), 6).as("score"),
          round(col("vector_score"), 6).as("vector_score"),
          round(col("keyword_score"), 6).as("keyword_score"))
    }),

    // J11 + P1: FILTERED + weighted hybrid search (reference
    // hybrid_search.py:360-371: filter= + vector_weight=/keyword_weight=).
    // Metadata filter applied to BOTH candidate sides pre-fetch; explicit
    // weights 2:1 fold into alpha = 2/3 (hybrid_search.py:393-396).
    "q58_hybrid_filtered" -> ((s, dir) => {
      val where = Filter.In("source", Seq("src1", "src2", "src3"))
      val docs = t(s, dir, "documents").where(where.compile)
      val embs = t(s, dir, "embeddings")
        .join(docs.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      val queries = t(s, dir, "embeddings").where(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val vecCand = Knn.knnJoin(queries, embs, k = 50, metric = "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .select(col("neighbor_id").as("doc_id"), col("dist"))
      val idx = Bm25.buildIndex(docs, "doc_id", "text")
      val kwCand = Bm25.score(idx, bm25Query)
        .withColumn("_r", round(col("score"), 6))
        .orderBy(desc("_r"), col("doc_id")).limit(50).drop("_r")
      Bm25.hybridFuse(vecCand, kwCand, k = 10, alpha = 2.0 / 3.0)
        .select(col("doc_id"), round(col("score"), 6).as("score"),
          round(col("vector_score"), 6).as("vector_score"),
          round(col("keyword_score"), 6).as("keyword_score"))
    }),

    // Language-ID heuristic
    "q24_langid" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")),

    // Quality scoring
    "q25_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))),

    // SQL interface parity for the curation surface (the q52 stance):
    // a curation predicate + fingerprint computed from pure spark.sql
    // text over the registered scalar functions — proves the SQL-only
    // user reaches the curation primitives. Oracle: q25's quality CTE +
    // q27's fingerprint expression with the same >= 0.5 gate.
    "q142_sql_curation" -> ((s, dir) => {
      TextAnalysis.registerSql(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, fingerprint(text) AS fp,
          |       quality_score(text) AS quality
          |FROM documents_v
          |WHERE quality_score(text) >= 0.5""".stripMargin)
    }),

    // Token counting (whitespace + BPE-ish) per source
    "q26_token_counts" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.wsTokenCount(col("text"))).as("ws_tokens"),
          sum(TextAnalysis.bpeishTokenCount(col("text"))).as("bpeish_tokens"),
          round(avg(col("n_chars")), 4).as("avg_chars"))),

    // EXACT greedy BPE token counting (graft.functions.Bpe) over the
    // bundled merges fixture — the real-subword twin of q26's
    // rule-of-thumb estimate. The oracle replays the whole merge loop in
    // SQL from the same inlined ranked pairs.
    "q118_bpe_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Bpe.tokenCount(graft.functions.Bpe.fixture)(col("text"))
            .as("n_bpe"))
        .orderBy("doc_id")),

    // BYTE-LEVEL GPT-2 tokenization (the published-tokenizer contract —
    // the drop-in mode for real merges.txt files): pre-tokenize with the
    // released GPT-2 regex (case-preserving, each word carries its
    // leading space), remap every pre-token's UTF-8 bytes through
    // bytes_to_unicode (space -> Ġ), then the SAME greedy merge loop
    // over the byte-level fixture. The oracle replays all three stages
    // in SQL — see bpeByteOracleSql for the charset argument that makes
    // the RE2 pre-tokenizer provably equal to the published regex here.
    "q144_bpe_byte_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Bpe.tokenCount(graft.functions.Bpe.byteFixture)(col("text"))
            .as("n_bpe"))
        .orderBy("doc_id")),

    // DISTRIBUTED BPE TOKENIZER TRAINING (Sennrich'16): learn 16 merge
    // rules from the documents corpus — one distributed word-count pass,
    // then the vocab-sized merge loop (graft.functions.Bpe.train).
    // skipIdenticalPairs = true selects the SQL-replayable rule subset
    // (string-replace fusing is only provably greedy-exact for distinct
    // symbols — the q118 oracle stance); the oracle RE-DERIVES every
    // rule, rank and pair count from the raw corpus with 16 unrolled
    // count->argmax->fuse rounds, so nothing is inlined from the model.
    "q120_bpe_train" -> ((s, dir) => {
      import s.implicits._
      val trained = graft.functions.Bpe.train(
        t(s, dir, "documents").select(col("text")), "text",
        numMerges = 16, skipIdenticalPairs = true)
      trained.merges.zipWithIndex
        .map { case ((a, b, n), i) => (i, a, b, a + b, n) }
        .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
        .orderBy("merge_rank")
    }),

    // TRAIN-THEN-TOKENIZE composition: learn the q120 merge table, then
    // count every document's tokens UNDER THE TRAINED TOKENIZER (the
    // codegen tokenCount expression), summed per source — the number a
    // curation pipeline actually budgets with. The oracle counts from
    // the final training vocabulary state instead, so a green row also
    // proves the classic equivalence: greedy rank-order APPLICATION of
    // the learned rules reproduces the TRAINING-time symbol states.
    "q121_bpe_corpus_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val trained = graft.functions.Bpe.train(
        docs.select(col("text")), "text",
        numMerges = 16, skipIdenticalPairs = true)
      docs.groupBy(col("source"))
        .agg(sum(graft.functions.Bpe.tokenCount(trained.model)(col("text")))
          .as("bpe_tokens"))
        .orderBy("source")
    }),

    // Exact dedup via normalized fingerprint
    "q27_dedup_exact" -> ((s, dir) =>
      Dedup.exact(exactDupCorpus(s, dir), "doc_id", "text", minSize = 2)),

    // MinHash signatures (3 sampled hash functions of 32)
    "q28_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(nearDupCorpus(s, dir), "doc_id", "text")
        .select(col("doc_id"), element_at(col("sig"), 1).as("m0"),
          element_at(col("sig"), 16).as("m15"),
          element_at(col("sig"), 32).as("m31"))),

    // MinHash + LSH banding + exact-jaccard verification
    "q29_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(nearDupCorpus(s, dir), "doc_id", "text",
        numHashes = 32, bands = 8, shingleN = 3, threshold = 0.5)),

    // SimHash 60-bit sketches
    "q30_simhash" -> ((s, dir) =>
      Dedup.simhash(t(s, dir, "documents"), "doc_id", "text")),

    // Exact n-gram Jaccard similarity join (oracle for the LSH path)
    "q31_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(nearDupCorpus(s, dir), "doc_id", "text",
        shingleN = 3, threshold = 0.5)),

    // Embedding-space near-duplicate pairs (cosine >= 0.4 — tuned to the
    // corpus so the join returns a meaningful set). Runs the IVF-cell
    // blocked plan; the all-pairs oracle below is identical by the
    // triangle-inequality argument in Dedup.embeddingNearDupBlocked.
    // trainFraction: centroids train on half the corpus — the blocking
    // stays lossless for ANY centroids, so the oracle is unaffected
    // r14: the blocking model comes from the per-dir cache q103 already
    // uses (identical inputs -> identical centroids; lossless regardless),
    // so steady-state runs measure the blocked join, not a KMeans refit.
    "q56_embedding_neardup" -> ((s, dir) => {
      val m = QueriesVector.nearDupModelCache.synchronized {
        QueriesVector.nearDupModelCache.getOrElseUpdate(dir,
          Dedup.trainNearDupModel(t(s, dir, "embeddings"), "vec_id", "embedding",
            trainFraction = 0.5))
      }
      Dedup.embeddingNearDupBlocked(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, model = Some(m))
    }),

    // Duplicate clusters: pairs (exact n-gram Jaccard) -> connected
    // components via min-label propagation. The 3-way corpus (originals +
    // truncated + verbatim copies of doc_id<25) makes genuinely transitive
    // classes {d, d+100000, d+200000}; the oracle recomputes components
    // with a recursive CTE.
    "q71_dup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val dup = docs.where(col("doc_id") < 25)
      val corpus = docs
        .unionByName(dup.select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 20, 10))").as("text")))
        .unionByName(dup.select((col("doc_id") + 200000).as("doc_id"), col("text")))
      Dedup.duplicateClusters(
        Dedup.ngramJaccard(corpus, "doc_id", "text", threshold = 0.5))
    }),

    // Quality-aware survivor selection: whitespace-doubled copies of
    // doc_id<25 share the original's normalized fingerprint (so they land
    // in the same exact-dup cluster) but are LONGER — score = raw length
    // makes the padded copy survive, proving the policy really differs
    // from q27's min-id keeper.
    "q90_survivor_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.where(col("doc_id") < 25)
          .select((col("doc_id") + 100000).as("doc_id"),
            expr("replace(text, ' ', '  ')").as("text")))
      val fp = corpus.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      val clusters = fp.join(
          fp.groupBy("fp").agg(min(col("doc_id")).as("cluster_id"),
            count(lit(1)).as("n")).where(col("n") >= 2),
          Seq("fp"))
        .select(col("doc_id"), col("cluster_id"))
      Dedup.survivorByScore(
          corpus.withColumn("score", length(col("text")).cast("long")),
          clusters, "doc_id", "score")
        .select(col("doc_id"), col("score"))
    }),

    // Exact heavy hitters via Count-Min candidate prefilter: terms whose
    // count clears 0.2% of total token mass (relative threshold keeps the
    // result size sf-stable). Exact counts — the CMS pass only bounds
    // which keys reach the shuffle, and its totalCount doubles as the
    // stream length, so no separate counting pass.
    "q91_heavy_hitters" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(Bm25.tokenize(col("text"))).as("term"))
      val sketch = graft.operators.Sampling.frequencySketch(toks, "term")
      graft.operators.Sampling.heavyHitters(toks, "term", sketch,
          math.max(1L, sketch.totalCount() / 500))
        .select(col("term"), col("cnt"))
    }),

    // Mixture drift: KL(source || corpus) over token distributions.
    // Rounded to 4 decimals (not 6): the per-source sum spans thousands of
    // ln() terms whose partial-aggregation order differs from DuckDB's
    // sequential sum.
    "q92_source_divergence" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(Bm25.tokenize(col("text"))).as("term"))
      graft.operators.Sampling.klDivergence(toks, "source", "term")
        .select(col("source"), (round(col("kl"), 4) + lit(0.0)).as("kl"))
    }),

    // Incremental ingest dedup: the batch mixes truncated near-copies of
    // doc_id<30 (duplicate the corpus -> dropped) with 20 synthetic docs
    // whose shingles exist nowhere in the corpus (-> survive). Survivors
    // are whatever exact cross-corpus Jaccard says is below 0.5.
    "q93_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = docs.where(col("doc_id") < 30)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 20, 10))").as("text"))
        .unionByName(docs.where(col("doc_id") < 20)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(lit("qqx"), col("doc_id"), lit(" freshdoc qqx"),
              col("doc_id"), lit(" freshdoc")).as("text")))
      Dedup.dedupAgainstCorpus(docs, batch, "doc_id", "text")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    }),

    // Benchmark decontamination: train = the full documents table, eval =
    // truncated copies of doc_id<25 (a synthetic benchmark whose items
    // leaked into training). Exact cross-corpus n-gram Jaccard with the
    // eval shingles broadcast — the train corpus is scanned once and
    // never shuffled. DedupSpec covers the LSH-prescreened variant.
    "q65_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val evalSet = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 20, 10))").as("text"))
      Dedup.decontaminate(docs, evalSet, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
    }),

    // Top-3 TF-IDF keywords per document (document fingerprint for search
    // / clustering): df is one term-keyed partial-agg shuffle, joined back
    // on the same partitioning — no full-vocabulary broadcast
    "q68_tfidf_keywords" -> ((s, dir) =>
      Bm25.tfidfKeywords(
        Bm25.buildIndex(t(s, dir, "documents"), "doc_id", "text"), topK = 3)),

    // Data-mixture construction: deterministic per-language downsampling
    // (hash-threshold Bernoulli — a pure per-row filter, zero shuffles)
    "q66_mixture_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        "lang", "doc_id", mixtureRates)),

    // Fixed-size per-source draw: the 10 lowest-(hash, id) docs per source
    // — reproducible "random" subsets for eval set construction
    "q67_quota_sample" -> ((s, dir) =>
      Sampling.quotaSample(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", quota = 10)),

    // Token-budget mixture draw: fill a 20k-char budget per language in
    // deterministic hash order (mixtures are specified in tokens/bytes,
    // not doc counts)
    "q73_budget_sample" -> ((s, dir) =>
      Sampling.budgetSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "doc_id", "n_chars", budget = 20000L)),

    // Document chunking (pre-embedding windows: 32 tokens, stride 24)
    "q57_chunking" -> ((s, dir) =>
      t(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"),
          explode(TextAnalysis.chunks(col("text"), windowSize = 32, stride = 24)).as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          md5(col("c.chunk").cast("binary")).as("chunk_md5"),
          size(Bm25.tokenize(col("c.chunk"))).as("n_tokens"))),

    // Gopher-style repetition quality signals. The driver corpus is
    // single-line, so lines are derived deterministically: every
    // " table " occurrence becomes a line break (plain string replace —
    // identical left-to-right non-overlapping semantics in both engines).
    "q74_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(
        t(s, dir, "documents").select(col("doc_id"),
          regexp_replace(col("text"), " table ", "\n").as("text")),
        "doc_id", "text")),

    // Corpus-level paragraph dedup over the exact-dup corpus (originals +
    // verbatim copies of doc_id<25) with the same derived line breaks:
    // shared paragraphs exist by construction.
    "q75_paragraph_dedup" -> ((s, dir) =>
      Dedup.duplicatedParagraphs(
        exactDupCorpus(s, dir).select(col("doc_id"),
          regexp_replace(col("text"), " table ", "\n").as("text")),
        "doc_id", "text", minDocs = 2)),

    // PII detection + redaction. The corpus has no PII, so docs with
    // doc_id % 7 == 0 get a deterministic synthetic suffix carrying one
    // email, one IPv4, and one phone number (pure integer arithmetic —
    // identical in both engines).
    "q76_pii" -> ((s, dir) => {
      val suffix = concat(
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com ip 10."),
        (col("doc_id") % 256).cast("string"), lit(".0."),
        (col("doc_id") % 100).cast("string"), lit(" call "),
        (col("doc_id") % 900 + 100).cast("string"), lit("-555-"),
        (col("doc_id") % 9000 + 1000).cast("string"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), suffix))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          TextAnalysis.emailCount(col("text")).cast("long").as("n_emails"),
          TextAnalysis.ipv4Count(col("text")).cast("long").as("n_ips"),
          TextAnalysis.phoneCount(col("text")).cast("long").as("n_phones"),
          md5(TextAnalysis.redactPii(col("text")).cast("binary")).as("redacted_md5"))
    }),

    // Reciprocal-rank fusion over the same candidate lists as q23 —
    // rank-based hybrid, no score normalization.
    "q77_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents"); val embs = t(s, dir, "embeddings")
      val queries = embs.where(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val vecCand = Knn.knnJoin(queries, embs, k = 50, metric = "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .select(col("neighbor_id").as("doc_id"), col("dist"))
      val kwCand = Bm25.score(Bm25.buildIndex(docs, "doc_id", "text"), bm25Query)
        .withColumn("_r", round(col("score"), 6))
        .orderBy(desc("_r"), col("doc_id")).limit(50).drop("_r")
      Bm25.rrfFuse(vecCand, kwCand, k = 10)
        .select(col("doc_id"), col("vec_rank"), col("kw_rank"),
          round(col("rrf_score"), 6).as("rrf_score"))
    }),

    // N-gram-overlap contamination: eval = truncated copies of doc_id<25
    // (leaked, overlap ~1) + reversed-text copies of doc_id<10 (clean,
    // overlap 0) scored for shingle containment against the train corpus.
    "q78_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val evalSet = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 20, 10))").as("text"))
        .unionByName(docs.where(col("doc_id") < 10)
          .select((col("doc_id") + 300000).as("doc_id"),
            reverse(col("text")).as("text")))
      Dedup.contaminationOverlap(docs, evalSet, "doc_id", "text", shingleN = 3)
    }),

    // Incremental ingest dedup against the PERSISTED index sidecar (the
    // BM25-sidecar pattern applied to dedup): the standing corpus is
    // never re-shingled — the timed query loads the band table partition-
    // pruned by the batch's probe buckets, exact-verifies candidates
    // against the pruned shingle relation, and returns batch survivors.
    // Same batch mix as q93 (truncated near-copies -> dropped; fresh
    // synthetic docs -> survive).
    // Doc-level duplication fraction (Lee'22 decision signal): per doc,
    // the share of its distinct 3-grams that other docs also contain —
    // the number drop rules act on, complementing q94's span localization
    "q107_dup_fraction" -> ((s, dir) =>
      Dedup.dupNgramFraction(nearDupCorpus(s, dir), "doc_id", "text", n = 3)),

    // Adaptive per-language quality gate (FineWeb stance): keep each
    // language's top 60% by quality, cut at the language's own exact
    // nearest-rank 40th percentile — a fixed global floor over-filters
    // languages whose score distribution sits lower.
    "q106_adaptive_quality" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
      graft.operators.Sampling
        .percentileGate(scored, "lang", "quality", keepFraction = 0.6)
        .select(col("doc_id"), col("lang"), col("quality"))
    }),

    // ONE-PASS approximate twin of q106: the cut comes from the mergeable
    // approx_percentile sketch (no per-group sorted window — the 100 TB
    // shape). Groups here are far smaller than the sketch accuracy, so
    // the sketch retains every value and the cut is exact — hash-checked
    // against the SAME nearest-rank window oracle as q106, proving the
    // two gates agree whenever the sketch is in its exact regime.
    "q111_adaptive_quality_approx" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
      graft.operators.Sampling
        .percentileGateApprox(scored, "lang", "quality", keepFraction = 0.6)
        .select(col("doc_id"), col("lang"), col("quality"))
    }),

    // Line-level boilerplate REMOVAL (RefinedWeb/CCNet line dedup): the
    // repair counterpart of q75's detection and q94's span localization —
    // planted footers on every even doc (plus any naturally corpus-wide
    // lines) are stripped; everything else survives in original order.
    "q112_strip_boilerplate" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"),
            lit("\nSubscribe to our newsletter today\nCopyright 2020 Example Corp")))
          .otherwise(col("text")).as("text"))
      Dedup.stripBoilerplate(corpus, "doc_id", "text", minDocs = 3)
        .orderBy("doc_id")
    }),


    // One-call corpus profile (operators.CorpusReport): the curation-run
    // dashboard numbers — doc/token totals, mean heuristic quality,
    // language mix, exact-duplicate share — as a lazy union of aggregates
    // over three corpus scans; the oracle recomputes every stat from the
    // battery's proven token/quality/fingerprint SQL formulas.
    "q116_corpus_profile" -> ((s, dir) =>
      graft.operators.CorpusReport.profile(
        t(s, dir, "documents"), "doc_id", "text", "lang")),

    // End-to-end training-data pipeline: lang gate -> quality floor ->
    // exact dedup -> mixture sample -> shard, as ONE composed plan
    // (operators.Pipeline). Every stage is individually oracle-checked
    // (q24/q25/q27/q66/q79); this query checks their composition.
    "q104_training_pipeline" -> ((s, dir) => {
      val spec = graft.operators.PipelineSpec(
        langAllow = Set("en", "de", "fr"),
        minQuality = 0.65,
        exactDedup = true,
        mixtureRates = Map("en" -> 0.6, "de" -> 0.9),
        numShards = 8)
      graft.operators.Pipeline.prepare(pipelineCorpus(s, dir), "doc_id", "text", spec)
        .data.select(col("doc_id"), col("lang"), col("source"),
          col("shard"), col("seq"))
    }),

    // The pipeline's observe()-based stage audit, itself oracle-checked:
    // per-stage survivor counts AND whitespace-token sums from the
    // metrics nodes of q104's plan must equal DuckDB counting each CTE
    // stage independently — the instrumentation is only trustworthy if
    // the numbers it reports are, and curation budgets are set in
    // tokens, not rows.
    "q108_pipeline_audit" -> ((s, dir) => {
      val spec = graft.operators.PipelineSpec(
        langAllow = Set("en", "de", "fr"),
        minQuality = 0.65,
        exactDedup = true,
        mixtureRates = Map("en" -> 0.6, "de" -> 0.9),
        numShards = 8)
      val res = graft.operators.Pipeline.prepare(
        pipelineCorpus(s, dir), "doc_id", "text", spec, audit = true)
      import s.implicits._
      res.stageMetrics().toDF("stage", "n_rows", "n_tokens")
    }),

    "q98_indexed_dedup" -> ((s, dir) => {
      val ixDir = dedupIndexSidecar.synchronized {
        dedupIndexSidecar.getOrElseUpdate(dir, {
          val d = java.nio.file.Files.createTempDirectory("graft-q98-dedupix").toString
          Dedup.saveDedupIndex(t(s, dir, "documents").select(col("doc_id"), col("text")),
            "doc_id", "text", d)
          d
        })
      }
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = docs.where(col("doc_id") < 30)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 20, 10))").as("text"))
        .unionByName(docs.where(col("doc_id") < 20)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(lit("qqx"), col("doc_id"), lit(" freshdoc qqx"),
              col("doc_id"), lit(" freshdoc")).as("text")))
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", ixDir)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    }),

    // Cross-document duplicate 5-gram SPANS (ExactSubstr shape, Lee et
    // al. '22): which passages are boilerplate, per document — natural
    // corpus, no synthetic injection (the sf generator's word-salad text
    // repeats 5-grams across ~14% of docs).
    "q94_dup_spans" -> ((s, dir) =>
      Dedup.dupNgramSpans(t(s, dir, "documents"), "doc_id", "text", n = 5)),

    // DSIR importance weights: target = the English slice, raw = the full
    // corpus; hashed-unigram bucket LM ratio per doc. Docs whose token
    // distribution looks English-like score high. Round 4 (order-dependent
    // per-doc ln() sum).
    "q95_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Sampling.importanceWeights(
          docs, docs.where(col("lang") === "en"), "doc_id", "text",
          buckets = 1024)
        .select(col("doc_id"), col("n_tokens"),
          (round(col("logw"), 4) + lit(0.0)).as("logw"))
    }),
  )

  // --------------------------------------------------------------- oracles

  /** q118 oracle: replay the greedy BPE merge loop in SQL from the same
    * ranked pairs the Spark expression uses — a recursive CTE whose step
    * (a) finds each live word's lowest-rank adjacent pair via
    * list_position over the inlined merges list (0 = absent in DuckDB,
    * hence the `> 0` filter) and (b) fuses ALL its occurrences with a
    * DOUBLE string replace on the space-joined symbols. One replace pass
    * misses an occurrence whose leading separator the previous match
    * consumed; a second pass gets it, and two passes are provably
    * complete when no merge rule pairs a symbol with itself (distinct
    * symbols cannot overlap), which the fixture guarantees — the Scala
    * implementation handles identical-symbol rules too, the spec covers
    * them by hand. Terminal state per word = the minimum symbol count
    * (counts strictly decrease). */
  private def bpeOracleSql(m: graft.functions.Bpe.BpeModel): String =
    bpeOracleSqlOver(m,
      """  SELECT doc_id, t AS w, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
        |               lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS t
        |        FROM documents)
        |  GROUP BY 1, 2""".stripMargin)

  /** q144 oracle: the q118 merge-loop replay with the BYTE-LEVEL front
    * end — GPT-2 pre-tokenization then the bytes_to_unicode remap. The
    * corpus charset is lowercase letters + single separator spaces (no
    * leading/trailing/double spaces, no other bytes), on which the
    * published GPT-2 regex reduces EXACTLY to ` ?[a-z]+| ?[0-9]+` runs
    * (the contraction / punctuation / lookahead branches can never
    * match), RE2-expressible without the lookahead DuckDB lacks; any
    * future corpus character outside that set would make the two sides
    * tokenize differently and fail the hash LOUDLY rather than silently
    * agree. The remap on this charset is the single printable-range
    * identity plus space → Ġ (U+0120), inlined as one replace. The full
    * regex (contractions, multi-space backtracking, multibyte UTF-8) is
    * covered by hand fixtures in TextQualitySpec. */
  private def bpeByteOracleSql(m: graft.functions.Bpe.BpeModel): String =
    bpeOracleSqlOver(m,
      """  SELECT doc_id, replace(t, ' ', 'Ġ') AS w, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text,
        |               ' ?[a-z]+| ?[0-9]+')) AS t
        |        FROM documents)
        |  GROUP BY 1, 2""".stripMargin)

  private def bpeOracleSqlOver(m: graft.functions.Bpe.BpeModel,
                               wordsCte: String): String = {
    require(m.merges.forall { case (a, b) => a != b },
      "bpe oracle SQL requires a fixture with no identical-symbol merges")
    val pairs = m.merges.map { case (a, b) => s"'$a $b'" }.mkString(", ")
    s"""WITH RECURSIVE words AS (
       |$wordsCte),
       |dw AS (SELECT w FROM words GROUP BY w),
       |it(w, s) AS (
       |  SELECT w, ' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' ' FROM dw
       |  UNION ALL
       |  SELECT w, replace(replace(s, ' ' || pat || ' ', ' ' || rep || ' '),
       |                       ' ' || pat || ' ', ' ' || rep || ' ')
       |  FROM (
       |    SELECT w, s, pat, replace(pat, ' ', '') AS rep FROM (
       |      SELECT w, s,
       |             ml[list_aggregate(list_filter(list_transform(pr,
       |                  p -> list_position(ml, p)), x -> x > 0), 'min')] AS pat
       |      FROM (
       |        SELECT w, s,
       |               list_transform(range(1, len(sy)), i -> sy[i] || ' ' || sy[i + 1]) AS pr,
       |               ml
       |        FROM (SELECT w, s,
       |                     list_filter(string_split(s, ' '), x -> x <> '') AS sy,
       |                     [$pairs] AS ml
       |              FROM it) x0) x1) x2) x3
       |  WHERE pat IS NOT NULL),
       |bpe AS (
       |  SELECT w, min(len(list_filter(string_split(s, ' '), x -> x <> ''))) AS ntok
       |  FROM it GROUP BY w),
       |per_doc AS (
       |  SELECT words.doc_id, CAST(sum(cnt * ntok) AS BIGINT) AS n_bpe
       |  FROM words JOIN bpe USING (w) GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(p.n_bpe, 0) AS BIGINT) AS n_bpe
       |FROM documents d LEFT JOIN per_doc p USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** q120 oracle: re-derive the trained merge table INDEPENDENTLY from
    * the raw corpus — `numMerges` unrolled rounds, each one (a) counting
    * adjacent symbol pairs per POSITION weighted by word frequency over
    * the current vocabulary state (identical-symbol pairs excluded from
    * candidacy, matching the query's skipIdenticalPairs training mode),
    * (b) taking the winner by (count DESC, pair-string ASC — for the
    * `[a-z0-9_]` alphabet the space separator sorts below every symbol
    * byte, so string order equals (lhs, rhs) tuple order, the exact
    * Scala tie-break), and (c) fusing it everywhere with the q118
    * DOUBLE-replace on space-joined symbols (provably complete and
    * greedy-left-to-right when the two symbols differ — which (a)
    * guarantees here). A round whose vocabulary has no eligible pair
    * contributes no row and leaves the state untouched (LEFT JOIN on the
    * empty winner), mirroring the trainer's early stop. Every CTE is
    * MATERIALIZED: each w_i is referenced twice (directly and through
    * b_i), so inlining would double the plan per round — 2^numMerges
    * scans of the base table by round numMerges.
    *
    * [[bpeTrainRoundsCte]] is the shared state machine (w_i carries the
    * word key so downstream oracles can join token counts back to
    * documents); q120 selects the learned rules, q121 instead counts
    * tokens from the FINAL vocabulary state w_N — which checks the
    * classic training-state == rank-order-application equivalence, since
    * the Spark side scores with Bpe.tokenCount over the trained model. */
  private def bpeTrainRoundsCte(numMerges: Int): String = {
    val rounds = (1 to numMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT pa AS pair, sum(cnt) AS c FROM (
         |    SELECT cnt, unnest(list_filter(list_transform(range(1, len(sy)),
         |             j -> CASE WHEN sy[j] <> sy[j + 1]
         |                  THEN sy[j] || ' ' || sy[j + 1] END),
         |           x -> x IS NOT NULL)) AS pa
         |    FROM (SELECT cnt, list_filter(string_split(s, ' '), x -> x <> '') AS sy
         |          FROM w${i - 1}))
         |  GROUP BY 1),
         |b$i AS MATERIALIZED (SELECT pair, c FROM p$i ORDER BY c DESC, pair ASC LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT w, cnt, CASE WHEN b.pair IS NULL THEN s ELSE
         |    replace(replace(s, ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
         |                       ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ')
         |  END AS s
         |  FROM w${i - 1} LEFT JOIN b$i b ON true)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT w, cnt,
       |         ' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' ' AS s
       |  FROM (SELECT t AS w, count(*) AS cnt
       |        FROM (SELECT unnest(list_filter(regexp_split_to_array(
       |                     lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS t
       |              FROM documents)
       |        GROUP BY 1)),
       |$rounds""".stripMargin
  }

  private def bpeTrainOracleSql(numMerges: Int): String = {
    val union = (1 to numMerges).map(i =>
      s"SELECT ${i - 1} AS merge_rank, pair, c FROM b$i").mkString("\nUNION ALL\n")
    s"""WITH ${bpeTrainRoundsCte(numMerges)},
       |learned AS (
       |$union)
       |SELECT CAST(merge_rank AS INT) AS merge_rank,
       |       split_part(pair, ' ', 1) AS lhs,
       |       split_part(pair, ' ', 2) AS rhs,
       |       replace(pair, ' ', '') AS merged,
       |       CAST(c AS BIGINT) AS cnt
       |FROM learned ORDER BY merge_rank""".stripMargin
  }

  /** q121 oracle: per-word token counts are the symbol counts of the
    * final training state w_N; summed per doc via each doc's word
    * occurrence counts, then per source. */
  private def bpeCorpusTokensOracleSql(numMerges: Int): String =
    s"""WITH ${bpeTrainRoundsCte(numMerges)},
       |tok AS (
       |  SELECT w, len(list_filter(string_split(s, ' '), x -> x <> '')) AS ntok
       |  FROM w$numMerges),
       |docw AS (
       |  SELECT doc_id, t AS w, count(*) AS c
       |  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
       |               lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS t
       |        FROM documents)
       |  GROUP BY 1, 2),
       |per_doc AS (
       |  SELECT docw.doc_id, sum(c * ntok) AS n
       |  FROM docw JOIN tok USING (w) GROUP BY 1)
       |SELECT d.source, CAST(sum(coalesce(p.n, 0)) AS BIGINT) AS bpe_tokens
       |FROM documents d LEFT JOIN per_doc p USING (doc_id)
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Whitespace-token sum fragment for the q108 audit oracle (explicit
    * class, BIGINT cast — same stance as q26). */
  private val wsTokSumSql =
    """CAST(coalesce(sum(len(list_filter(regexp_split_to_array(text, '[ \t\n\r\f\x0B]+'), x -> x <> ''))), 0) AS BIGINT)"""

  private val tokCte =
    """toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
      |         '[^a-z0-9_]+'), x -> x <> '') AS tk
      |  FROM corpus)""".stripMargin

  private val nearDupCorpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |         substr(text, 1, greatest(length(text) - 20, 10)) AS text
      |  FROM documents WHERE doc_id < 25)""".stripMargin

  private val exactDupCorpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text
      |  FROM documents WHERE doc_id < 25)""".stripMargin

  /** TextAnalysis.qualityScore replayed in SQL over a `corpus(doc_id,
    * text)` CTE — shared by q25 and the SQL-surface parity check q142. */
  private val qualityScoreCte =
    """t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS tk,
      |    length(text) * 1.0 AS n_chars,
      |    length(regexp_replace(text, '[A-Za-z0-9 \t\n\r\f\x0B]', '', 'g')) * 1.0 AS punct
      |  FROM corpus),
      |c AS (
      |  SELECT doc_id, n_chars, punct, len(tk) * 1.0 AS n_toks,
      |    CASE WHEN len(tk) > 0
      |         THEN list_sum(list_transform(tk, x -> length(x))) * 1.0 / len(tk)
      |         ELSE 0.0 END AS mwl,
      |    len(list_filter(tk, x -> list_contains(
      |      ['the','a','of','and','to','in','is','that','it','for'], x))) * 1.0 AS sw
      |  FROM t),
      |qscore AS (
      |  SELECT doc_id, round(
      |      least(n_chars / 500.0, 1.0) * 0.3
      |    + (1.0 - least(abs(mwl - 5.0) / 5.0, 1.0)) * 0.2
      |    + (1.0 - least((CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 1.0 END) * 4.0, 1.0)) * 0.3
      |    + least((CASE WHEN n_toks > 0 THEN sw / n_toks ELSE 0.0 END) * 4.0, 1.0) * 0.2, 6) AS quality
      |  FROM c)""".stripMargin

  private val shingleCte =
    """sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
      |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
      |           ELSE [] END) AS shingle
      |  FROM toks)""".stripMargin

  private val jaccardVerify =
    """sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT c.id_a, c.id_b, count(*) AS n_inter
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      |  GROUP BY c.id_a, c.id_b),
      |jac AS (
      |  SELECT i.id_a, i.id_b,
      |         i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter) AS jaccard
      |  FROM inter i
      |  JOIN sizes sa ON sa.doc_id = i.id_a
      |  JOIN sizes sb ON sb.doc_id = i.id_b)
      |SELECT id_a, id_b, round(jaccard, 6) AS jaccard
      |FROM jac WHERE jaccard >= 0.5""".stripMargin

  /** 32 minhash permutation rows "(i, a, b)" matching Dedup.minhashA/B. */
  private val permValues: String = (0 until 32)
    .map(i => s"(${i}, ${Dedup.minhashA(i)}, ${Dedup.minhashB(i)})")
    .mkString(", ")

  /** Signature-domain hash of each distinct shingle, replaying the
    * engine's PER-TOKEN fold (Dedup.MinhashTokenA / MinhashP — the engine
    * never builds the shingle string; the oracle recovers the tokens by
    * splitting the joined shingle, which is lossless because the token
    * split class admits no spaces). Every intermediate stays below 2^63,
    * so plain BIGINT arithmetic matches the engine exactly. */
  private val shingleHashCte =
    s"""h AS (
       |  SELECT doc_id,
       |         ((((t[1] % ${Dedup.MinhashP}) * ${Dedup.MinhashTokenA} + t[2]) % ${Dedup.MinhashP})
       |           * ${Dedup.MinhashTokenA} + t[3]) % ${Dedup.MinhashP} AS hv
       |  FROM (SELECT doc_id, list_transform(string_split(shingle, ' '),
       |               x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS t
       |        FROM sh))""".stripMargin

  private val bm25Cte =
    s"""doclen AS (SELECT doc_id, len(tk) AS doc_len FROM toks),
       |stats AS (SELECT count(*) AS n, avg(doc_len) AS avg_len FROM doclen),
       |tf AS (
       |  SELECT doc_id, unnest(tk) AS term FROM toks),
       |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term),
       |dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfc GROUP BY term),
       |q(term, q_mult) AS (VALUES ('spark', 1), ('join', 1), ('merge', 1), ('stream', 1)),
       |scores AS (
       |  SELECT tfc.doc_id,
       |    sum(q.q_mult * ln(1.0 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
       |        (tfc.tf * 2.5) / (tfc.tf + 1.5 * (0.25 + 0.75 * dl.doc_len / s.avg_len))) AS score
       |  FROM tfc JOIN q USING (term) JOIN dfc USING (term)
       |  JOIN doclen dl USING (doc_id) CROSS JOIN stats s
       |  GROUP BY tfc.doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q139_pipeline_full" ->
      """WITH docs0 AS (SELECT doc_id, text, lang, source FROM documents),
        |corpus AS (
        |  SELECT doc_id, text, lang, source FROM docs0
        |  UNION ALL
        |  SELECT doc_id + 200000, substr(text, 1, 40), lang, source
        |  FROM docs0 WHERE doc_id < 30
        |  UNION ALL
        |  SELECT doc_id + 100000, text, lang, source FROM docs0 WHERE doc_id < 25),
        |urled AS (
        |  SELECT doc_id, text, lang,
        |    (CASE WHEN doc_id >= 200000 THEN 'HTTP://' ELSE 'https://www.' END)
        |      || source || '.ex.com/p/'
        |      || CAST(CASE WHEN doc_id >= 200000 THEN doc_id - 200000
        |                   ELSE doc_id END AS VARCHAR)
        |      || (CASE WHEN doc_id >= 200000 THEN '/' ELSE '' END) AS url
        |  FROM corpus),
        |canon AS (
        |  SELECT doc_id, text, lang,
        |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |           regexp_replace(regexp_replace(lower(url),
        |             '^https?://', ''), '^www\.', ''), '#.*$', ''),
        |           '[?&](utm_[a-z_]*|fbclid|gclid)=[^&]*', '', 'g'),
        |           '/index\.html$', ''), '/$', '') AS curl
        |  FROM urled),
        |u AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |           row_number() OVER (PARTITION BY curl
        |             ORDER BY length(text) DESC, doc_id) AS rk
        |    FROM canon) WHERE rk = 1),
        |l AS (SELECT doc_id, text, lang FROM u WHERE lang = 'en'),
        |ttok AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |                     x -> x <> '') AS ts
        |  FROM docs0 WHERE lang = 'en'),
        |tpos AS (SELECT doc_id, generate_subscripts(ts, 1) AS i, unnest(ts) AS w FROM ttok),
        |tpairs AS (
        |  SELECT a.w AS w1, b.w AS w2
        |  FROM tpos a JOIN tpos b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |big AS (SELECT w1, w2, count(*) AS cb FROM tpairs GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) AS cc FROM tpairs GROUP BY 1),
        |voc AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM tpos),
        |stok AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |                     x -> x <> '') AS ts
        |  FROM l),
        |spos AS (SELECT doc_id, generate_subscripts(ts, 1) AS i, unnest(ts) AS w FROM stok),
        |spairs AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM spos a JOIN spos b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |scored AS (
        |  SELECT p.doc_id,
        |         ln((coalesce(big.cb, 0) + 0.5) / (coalesce(ctx.cc, 0) + 0.5 * voc.v)) AS lp
        |  FROM spairs p
        |  LEFT JOIN big ON big.w1 = p.w1 AND big.w2 = p.w2
        |  LEFT JOIN ctx ON ctx.w1 = p.w1
        |  CROSS JOIN voc),
        |agg AS (SELECT doc_id, avg(lp) AS avg_logp FROM scored GROUP BY doc_id),
        |lm AS (
        |  SELECT l.doc_id, l.text, l.lang
        |  FROM l JOIN agg ON agg.doc_id = l.doc_id
        |  WHERE round(exp(-agg.avg_logp), 6) <= 30.0),
        |dd AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |      min(doc_id) OVER (PARTITION BY
        |        md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')))
        |      ) AS keeper
        |    FROM lm) WHERE doc_id = keeper),
        |h AS (
        |  SELECT doc_id, text, lang,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS hv,
        |         len(list_filter(regexp_split_to_array(text, '[ \t\n\r\f\x0B]+'),
        |             x -> x <> '')) AS wtok
        |  FROM dd),
        |c AS (
        |  SELECT doc_id, text, wtok,
        |         sum(wtok) OVER (PARTITION BY lang ORDER BY hv, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
        |FROM c WHERE cum - wtok < 5000""".stripMargin,

    "q134_lm_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |                     x -> x <> '') AS ts
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, lang, generate_subscripts(ts, 1) AS i, unnest(ts) AS w
        |  FROM tok),
        |pairs AS (
        |  SELECT a.doc_id, a.lang, a.w AS w1, b.w AS w2
        |  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |tpairs AS (SELECT w1, w2 FROM pairs WHERE lang = 'en'),
        |big AS (SELECT w1, w2, count(*) AS cb FROM tpairs GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) AS cc FROM tpairs GROUP BY 1),
        |voc AS (
        |  SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
        |  FROM pos WHERE lang = 'en'),
        |scored AS (
        |  SELECT p.doc_id,
        |         ln((coalesce(big.cb, 0) + 0.5) / (coalesce(ctx.cc, 0) + 0.5 * voc.v)) AS lp
        |  FROM pairs p
        |  LEFT JOIN big ON big.w1 = p.w1 AND big.w2 = p.w2
        |  LEFT JOIN ctx ON ctx.w1 = p.w1
        |  CROSS JOIN voc),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS avg_logp
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, round(avg_logp, 6) + 0.0 AS avg_logp,
        |       round(exp(-avg_logp), 6) + 0.0 AS ppl
        |FROM agg""".stripMargin,

    "q135_pipeline_lm" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25),
        |ttok AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |                     x -> x <> '') AS ts
        |  FROM documents WHERE lang = 'en'),
        |tpos AS (SELECT doc_id, generate_subscripts(ts, 1) AS i, unnest(ts) AS w FROM ttok),
        |tpairs AS (
        |  SELECT a.w AS w1, b.w AS w2
        |  FROM tpos a JOIN tpos b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |big AS (SELECT w1, w2, count(*) AS cb FROM tpairs GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) AS cc FROM tpairs GROUP BY 1),
        |voc AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM tpos),
        |stok AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |                     x -> x <> '') AS ts
        |  FROM corpus),
        |spos AS (SELECT doc_id, generate_subscripts(ts, 1) AS i, unnest(ts) AS w FROM stok),
        |spairs AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM spos a JOIN spos b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |scored AS (
        |  SELECT p.doc_id,
        |         ln((coalesce(big.cb, 0) + 0.5) / (coalesce(ctx.cc, 0) + 0.5 * voc.v)) AS lp
        |  FROM spairs p
        |  LEFT JOIN big ON big.w1 = p.w1 AND big.w2 = p.w2
        |  LEFT JOIN ctx ON ctx.w1 = p.w1
        |  CROSS JOIN voc),
        |agg AS (SELECT doc_id, avg(lp) AS avg_logp FROM scored GROUP BY doc_id),
        |surv AS (
        |  SELECT c.doc_id, c.text
        |  FROM corpus c JOIN agg ON agg.doc_id = c.doc_id
        |  WHERE round(exp(-agg.avg_logp), 6) <= 30.0),
        |dedup AS (
        |  SELECT doc_id, text,
        |         min(doc_id) OVER (PARTITION BY
        |           md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')))
        |         ) AS keeper
        |  FROM surv)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
        |FROM dedup WHERE doc_id = keeper""".stripMargin,

    "q132_url_dedup" ->
      """WITH urled AS (
        |  SELECT doc_id, text,
        |         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://www.' ELSE 'http://' END)
        |           || source || '.example.com/page/' || CAST(doc_id % 40 AS VARCHAR)
        |           || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_medium=rss'
        |                    WHEN doc_id % 4 = 1 THEN '/'
        |                    WHEN doc_id % 4 = 2 THEN '#section-2'
        |                    ELSE '' END) AS url
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id, text,
        |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |           regexp_replace(regexp_replace(lower(url),
        |             '^https?://', ''), '^www\.', ''), '#.*$', ''),
        |           '[?&](utm_[a-z_]*|fbclid|gclid)=[^&]*', '', 'g'),
        |           '/index\.html$', ''), '/$', '') AS canonical_url
        |  FROM urled),
        |ranked AS (
        |  SELECT doc_id, canonical_url,
        |         count(*) OVER (PARTITION BY canonical_url) AS n_variants,
        |         row_number() OVER (PARTITION BY canonical_url
        |           ORDER BY length(text) DESC, doc_id) AS rk
        |  FROM canon)
        |SELECT doc_id, canonical_url, CAST(n_variants AS BIGINT) AS n_variants
        |FROM ranked WHERE rk = 1""".stripMargin,

    "q21_top_terms" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        |tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
        |        '[^a-z0-9_]+'), x -> x <> '')) AS term FROM corpus)
        |SELECT term, count(*) AS n FROM tok GROUP BY term
        |ORDER BY n DESC, term LIMIT 20""".stripMargin,

    "q22_bm25" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$tokCte,
         |$bm25Cte
         |SELECT doc_id, round(score, 6) AS score FROM (
         |  SELECT doc_id, round(score, 6) AS score,
         |         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
         |  FROM scores) WHERE rn <= 10""".stripMargin,

    // identical oracle to q22: the persisted-index path must produce the
    // same scores as a fresh in-memory index
    "q62_indexed_bm25" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$tokCte,
         |$bm25Cte
         |SELECT doc_id, round(score, 6) AS score FROM (
         |  SELECT doc_id, round(score, 6) AS score,
         |         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
         |  FROM scores) WHERE rn <= 10""".stripMargin,

    "q23_hybrid" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$tokCte,
         |$bm25Cte,
         |kw50 AS (
         |  SELECT doc_id, score FROM (
         |    SELECT doc_id, score,
         |           row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
         |    FROM scores) WHERE rn <= 50),
         |q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vdist AS (
         |  SELECT c.vec_id AS doc_id,
         |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
         |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
         |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
         |                  CAST(unnest(q0.qv) AS DOUBLE) AS y)) AS dist
         |  FROM embeddings c, q0),
         |v50 AS (
         |  SELECT doc_id, dist FROM (
         |    SELECT doc_id, dist, row_number() OVER (ORDER BY dist, doc_id) AS rn
         |    FROM vdist) WHERE rn <= 50),
         |vmax AS (SELECT max(dist) AS m FROM v50),
         |kmax AS (SELECT max(score) AS m FROM kw50),
         |vnorm AS (SELECT doc_id, CASE WHEN vmax.m > 0 THEN 1.0 - dist/vmax.m ELSE 1.0 END AS vector_score
         |          FROM v50, vmax),
         |knorm AS (SELECT doc_id, CASE WHEN kmax.m > 0 THEN score/kmax.m ELSE 0.0 END AS keyword_score
         |          FROM kw50, kmax),
         |fused AS (
         |  SELECT coalesce(v.doc_id, k.doc_id) AS doc_id,
         |         coalesce(v.vector_score, 0.0) AS vector_score,
         |         coalesce(k.keyword_score, 0.0) AS keyword_score,
         |         0.5 * coalesce(v.vector_score, 0.0) + 0.5 * coalesce(k.keyword_score, 0.0) AS score
         |  FROM vnorm v FULL OUTER JOIN knorm k ON v.doc_id = k.doc_id)
         |SELECT doc_id, round(score, 6) AS score, round(vector_score, 6) AS vector_score,
         |       round(keyword_score, 6) AS keyword_score
         |FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM fused)
         |WHERE rn <= 10""".stripMargin,

    // q23 with a source filter on BOTH candidate sides and weights 2:1
    // (alpha = 2/3); the vector corpus is the embeddings of filtered docs.
    "q58_hybrid_filtered" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |                WHERE source IN ('src1', 'src2', 'src3')),
         |$tokCte,
         |$bm25Cte,
         |kw50 AS (
         |  SELECT doc_id, score FROM (
         |    SELECT doc_id, score,
         |           row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
         |    FROM scores) WHERE rn <= 50),
         |q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vdist AS (
         |  SELECT c.vec_id AS doc_id,
         |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
         |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
         |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
         |                  CAST(unnest(q0.qv) AS DOUBLE) AS y)) AS dist
         |  FROM embeddings c JOIN corpus ON c.vec_id = corpus.doc_id, q0),
         |v50 AS (
         |  SELECT doc_id, dist FROM (
         |    SELECT doc_id, dist, row_number() OVER (ORDER BY dist, doc_id) AS rn
         |    FROM vdist) WHERE rn <= 50),
         |vmax AS (SELECT max(dist) AS m FROM v50),
         |kmax AS (SELECT max(score) AS m FROM kw50),
         |vnorm AS (SELECT doc_id, CASE WHEN vmax.m > 0 THEN 1.0 - dist/vmax.m ELSE 1.0 END AS vector_score
         |          FROM v50, vmax),
         |knorm AS (SELECT doc_id, CASE WHEN kmax.m > 0 THEN score/kmax.m ELSE 0.0 END AS keyword_score
         |          FROM kw50, kmax),
         |fused AS (
         |  SELECT coalesce(v.doc_id, k.doc_id) AS doc_id,
         |         coalesce(v.vector_score, 0.0) AS vector_score,
         |         coalesce(k.keyword_score, 0.0) AS keyword_score,
         |         (2.0/3.0) * coalesce(v.vector_score, 0.0)
         |           + (1.0 - 2.0/3.0) * coalesce(k.keyword_score, 0.0) AS score
         |  FROM vnorm v FULL OUTER JOIN knorm k ON v.doc_id = k.doc_id)
         |SELECT doc_id, round(score, 6) AS score, round(vector_score, 6) AS vector_score,
         |       round(keyword_score, 6) AS keyword_score
         |FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM fused)
         |WHERE rn <= 10""".stripMargin,

    "q24_langid" -> {
      val swValues = TextAnalysis.stopwords.toSeq.sortBy(_._1).flatMap { case (l, ws) =>
        ws.map(w => s"('$l', '$w')")
      }.mkString(", ")
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$tokCte,
         |sw(lang, term) AS (VALUES $swValues),
         |tok AS (SELECT doc_id, len(tk) AS n, unnest(tk) AS term FROM toks),
         |hits AS (
         |  SELECT t.doc_id, s.lang, t.n, count(*) AS h
         |  FROM tok t JOIN sw s ON t.term = s.term
         |  GROUP BY t.doc_id, s.lang, t.n),
         |best AS (
         |  SELECT doc_id, lang, h * 1.0 / n AS rate,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY h * 1.0 / n DESC, lang) AS rn
         |  FROM hits)
         |SELECT d.doc_id,
         |       coalesce(b.lang, 'unk') AS predicted_lang,
         |       coalesce(round(b.rate, 6), 0.0) AS hit_rate
         |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""".stripMargin
    },

    "q25_quality" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$qualityScoreCte
         |SELECT doc_id, quality FROM qscore""".stripMargin,

    "q142_sql_curation" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$qualityScoreCte
         |SELECT q.doc_id,
         |       md5(trim(regexp_replace(lower(d.text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS fp,
         |       q.quality
         |FROM qscore q JOIN documents d ON d.doc_id = q.doc_id
         |WHERE q.quality >= 0.5""".stripMargin,

    // Explicit whitespace class (Java vs RE2 `\s` drift) and BIGINT casts:
    // a raw DuckDB sum(BIGINT) is HUGEINT, which the driver's fetch path
    // types differently from Spark's int64.
    "q26_token_counts" ->
      """SELECT source,
        |  CAST(sum(len(list_filter(regexp_split_to_array(text, '[ \t\n\r\f\x0B]+'), x -> x <> ''))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(CAST(ceil(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) / 4.0) AS BIGINT)
        |      + len(list_filter(regexp_split_to_array(text, '[A-Za-z0-9 \t\n\r\f\x0B]+'), x -> x <> ''))) AS BIGINT) AS bpeish_tokens,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY source""".stripMargin,

    "q118_bpe_tokens" -> bpeOracleSql(graft.functions.Bpe.fixture),
    "q144_bpe_byte_tokens" -> bpeByteOracleSql(graft.functions.Bpe.byteFixture),

    "q120_bpe_train" -> bpeTrainOracleSql(16),

    "q121_bpe_corpus_tokens" -> bpeCorpusTokensOracleSql(16),

    "q27_dedup_exact" ->
      s"""WITH $exactDupCorpusSql
         |SELECT md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS fingerprint,
         |       count(*) AS n_dups, min(doc_id) AS keeper_id
         |FROM corpus GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    "q68_tfidf_keywords" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$tokCte,
         |tf AS (SELECT doc_id, unnest(tk) AS term FROM toks),
         |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term),
         |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
         |stats AS (SELECT count(*) AS n FROM corpus),
         |scored AS (
         |  SELECT tfc.doc_id, tfc.term,
         |         round(tfc.tf * ln((s.n + 1.0) / (dfc.df + 1.0)), 6) AS tfidf
         |  FROM tfc JOIN dfc USING (term) CROSS JOIN stats s),
         |r AS (
         |  SELECT doc_id, term, tfidf,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY tfidf DESC, term) AS rank
         |  FROM scored)
         |SELECT doc_id, rank, term, tfidf FROM r WHERE rank <= 3""".stripMargin,

    "q66_mixture_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT <
         |  CASE lang $mixtureCaseSql ELSE ${Sampling.threshold(1.0)} END""".stripMargin,

    "q73_budget_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS hv
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_chars,
        |         sum(n_chars) OVER (PARTITION BY lang ORDER BY hv, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h)
        |SELECT doc_id, lang, n_chars FROM c WHERE cum - n_chars < 20000""".stripMargin,

    "q67_quota_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS hv
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
        |  FROM h)
        |SELECT doc_id, source FROM r WHERE rn <= 10""".stripMargin,

    "q71_dup_clusters" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         substr(text, 1, greatest(length(text) - 20, 10)) AS text
        |  FROM documents WHERE doc_id < 25
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id, text
        |  FROM documents WHERE doc_id < 25),
        |toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM corpus),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
        |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |           ELSE [] END) AS shingle
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT i.id_a, i.id_b
        |  FROM inter i
        |  JOIN sizes sa ON sa.doc_id = i.id_a
        |  JOIN sizes sb ON sb.doc_id = i.id_b
        |  WHERE i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter) >= 0.5),
        |eb AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL
        |  SELECT id_b, id_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT a, b FROM eb
        |  UNION
        |  SELECT rr.node, e.b FROM reach rr JOIN eb e ON e.a = rr.r)
        |SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |FROM reach GROUP BY node""".stripMargin,

    "q90_survivor_select" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, replace(text, ' ', '  ') AS text
        |  FROM documents WHERE doc_id < 25),
        |f AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS score,
        |         md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'))) AS fp
        |  FROM corpus),
        |cl AS (SELECT fp, min(doc_id) AS cluster_id, count(*) AS n
        |       FROM f GROUP BY fp),
        |tagged AS (
        |  SELECT f.doc_id, f.score,
        |         CASE WHEN cl.n >= 2 THEN cl.cluster_id ELSE f.doc_id END AS ck
        |  FROM f JOIN cl USING (fp)),
        |r AS (
        |  SELECT doc_id, score, ck,
        |         row_number() OVER (PARTITION BY ck
        |           ORDER BY score DESC, doc_id) AS rn
        |  FROM tagged)
        |SELECT doc_id, score FROM r WHERE rn = 1""".stripMargin,

    "q91_heavy_hitters" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        |tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
        |        '[^a-z0-9_]+'), x -> x <> '')) AS term FROM corpus),
        |tot AS (SELECT greatest(1, count(*) // 500) AS t FROM tok)
        |SELECT term, count(*) AS cnt FROM tok, tot
        |GROUP BY term, tot.t HAVING count(*) >= tot.t""".stripMargin,

    "q92_source_divergence" ->
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '')) AS term FROM documents),
        |c AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(c) AS BIGINT) AS ng FROM c GROUP BY 1),
        |t AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM c GROUP BY 1),
        |n AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM g)
        |SELECT c.source,
        |       round(sum((c.c / g.ng) * ln((c.c / g.ng) / (t.ct / n.n))), 4)
        |         + 0.0 AS kl
        |FROM c JOIN g USING (source) JOIN t USING (term) CROSS JOIN n
        |GROUP BY c.source""".stripMargin,

    "q93_incremental_dedup" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        |batch AS (
        |  SELECT doc_id + 100000 AS doc_id,
        |         substr(text, 1, greatest(length(text) - 20, 10)) AS text
        |  FROM documents WHERE doc_id < 30
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id,
        |         'qqx' || doc_id || ' freshdoc qqx' || doc_id || ' freshdoc' AS text
        |  FROM documents WHERE doc_id < 20),
        |tk_t AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM corpus),
        |tk_e AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM batch),
        |sh_t AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
        |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |           ELSE [] END) AS shingle
        |  FROM tk_t),
        |sh_e AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
        |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |           ELSE [] END) AS shingle
        |  FROM tk_e),
        |sizes_t AS (SELECT doc_id, count(*) AS n FROM sh_t GROUP BY doc_id),
        |sizes_e AS (SELECT doc_id, count(*) AS n FROM sh_e GROUP BY doc_id),
        |inter AS (
        |  SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS n_inter
        |  FROM sh_t t JOIN sh_e e ON t.shingle = e.shingle
        |  GROUP BY 1, 2),
        |dup AS (
        |  SELECT DISTINCT i.eval_id AS doc_id
        |  FROM inter i
        |  JOIN sizes_t st ON st.doc_id = i.train_id
        |  JOIN sizes_e se ON se.doc_id = i.eval_id
        |  WHERE i.n_inter * 1.0 / (st.n + se.n - i.n_inter) >= 0.5)
        |SELECT b.doc_id, CAST(length(b.text) AS BIGINT) AS n_chars
        |FROM batch b WHERE b.doc_id NOT IN (SELECT doc_id FROM dup)""".stripMargin,

    "q65_decontaminate" ->
      """WITH evaldocs AS (
        |  SELECT doc_id + 100000 AS doc_id,
        |         substr(text, 1, greatest(length(text) - 20, 10)) AS text
        |  FROM documents WHERE doc_id < 25),
        |tk_t AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM documents),
        |tk_e AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM evaldocs),
        |sh_t AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
        |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |           ELSE [] END) AS shingle
        |  FROM tk_t),
        |sh_e AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
        |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |           ELSE [] END) AS shingle
        |  FROM tk_e),
        |sizes_t AS (SELECT doc_id, count(*) AS n FROM sh_t GROUP BY doc_id),
        |sizes_e AS (SELECT doc_id, count(*) AS n FROM sh_e GROUP BY doc_id),
        |inter AS (
        |  SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS n_inter
        |  FROM sh_t t JOIN sh_e e ON t.shingle = e.shingle
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT i.train_id, i.eval_id,
        |         i.n_inter * 1.0 / (st.n + se.n - i.n_inter) AS jaccard
        |  FROM inter i
        |  JOIN sizes_t st ON st.doc_id = i.train_id
        |  JOIN sizes_e se ON se.doc_id = i.eval_id)
        |SELECT train_id, eval_id, round(jaccard, 6) AS jaccard
        |FROM jac WHERE jaccard >= 0.5""".stripMargin,

    "q28_minhash_sig" ->
      s"""WITH $nearDupCorpusSql,
         |$tokCte,
         |$shingleCte,
         |$shingleHashCte,
         |sig AS (
         |  SELECT doc_id,
         |    min((${Dedup.minhashA(0)} * hv + ${Dedup.minhashB(0)}) % ${Dedup.MinhashP}) AS m0,
         |    min((${Dedup.minhashA(15)} * hv + ${Dedup.minhashB(15)}) % ${Dedup.MinhashP}) AS m15,
         |    min((${Dedup.minhashA(31)} * hv + ${Dedup.minhashB(31)}) % ${Dedup.MinhashP}) AS m31
         |  FROM h GROUP BY doc_id)
         |SELECT c.doc_id,
         |       coalesce(s.m0, ${Dedup.MinhashP}) AS m0,
         |       coalesce(s.m15, ${Dedup.MinhashP}) AS m15,
         |       coalesce(s.m31, ${Dedup.MinhashP}) AS m31
         |FROM (SELECT DISTINCT doc_id FROM corpus) c LEFT JOIN sig s USING (doc_id)""".stripMargin,

    "q29_minhash_lsh" ->
      s"""WITH $nearDupCorpusSql,
         |$tokCte,
         |$shingleCte,
         |$shingleHashCte,
         |perms(i, a, b) AS (VALUES $permValues),
         |mins AS (
         |  SELECT h.doc_id, p.i, min((p.a * h.hv + p.b) % ${Dedup.MinhashP}) AS m
         |  FROM h CROSS JOIN perms p GROUP BY h.doc_id, p.i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(m::VARCHAR, ',' ORDER BY i) AS band_sig
         |  FROM mins GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
         |$jaccardVerify""".stripMargin,

    "q30_simhash" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '')) AS token
        |  FROM corpus),
        |tfh AS (
        |  SELECT doc_id, token, count(*) AS tf,
        |         ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
        |  FROM toks GROUP BY doc_id, token),
        |bits AS (
        |  SELECT doc_id, t.b, sum(tf * (((h >> t.b) & 1) * 2 - 1)) AS s
        |  FROM tfh CROSS JOIN range(60) t(b) GROUP BY doc_id, t.b)
        |SELECT doc_id,
        |       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,

    "q57_chunking" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id < 100),
        |counted AS (
        |  SELECT doc_id, tk,
        |         1 + CAST(ceil(greatest(len(tk) - 32, 0) / 24.0) AS INT) AS n_chunks
        |  FROM toks),
        |chunks AS (
        |  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |         array_to_string(list_slice(tk, i * 24 + 1, i * 24 + 32), ' ') AS chunk
        |  FROM counted, LATERAL (SELECT unnest(range(0, n_chunks)) AS i))
        |SELECT doc_id, chunk_idx, md5(chunk) AS chunk_md5,
        |       len(list_filter(regexp_split_to_array(lower(chunk), '[^a-z0-9_]+'),
        |           x -> x <> '')) AS n_tokens
        |FROM chunks""".stripMargin,

    "q56_embedding_neardup" ->
      """WITH p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    (SELECT 1.0 - (CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
        |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END)
        |     FROM (SELECT CAST(unnest(a.embedding) AS DOUBLE) AS x,
        |                  CAST(unnest(b.embedding) AS DOUBLE) AS y)) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(sim, 6) AS cosine_sim
        |FROM p WHERE sim >= 0.4""".stripMargin,

    "q31_ngram_jaccard" ->
      s"""WITH $nearDupCorpusSql,
         |$tokCte,
         |$shingleCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |$jaccardVerify""".stripMargin,

    // Derived multi-line corpus (every " table " becomes a line break);
    // trigram/bigram shingles mirror the Spark shingles() definition.
    "q74_repetition" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, replace(text, ' table ', chr(10)) AS text FROM documents),
         |$tokCte,
         |ls AS (
         |  SELECT doc_id, list_filter(list_transform(string_split(text, chr(10)),
         |         x -> trim(x)), x -> x <> '') AS l
         |  FROM corpus),
         |tri AS (
         |  SELECT doc_id, CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
         |         i -> array_to_string(list_slice(tk, i, i + 2), ' '))
         |         ELSE [] END AS sh
         |  FROM toks),
         |bi AS (
         |  SELECT doc_id, CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
         |         i -> array_to_string(list_slice(tk, i, i + 1), ' '))
         |         ELSE [] END AS sh
         |  FROM toks),
         |base AS (
         |  SELECT c.doc_id, length(c.text) * 1.0 AS nc,
         |    CASE WHEN len(l.l) > 0
         |         THEN 1.0 - len(list_distinct(l.l)) * 1.0 / len(l.l) ELSE 0.0 END AS dup_line_frac,
         |    CASE WHEN len(t.sh) > 0
         |         THEN 1.0 - len(list_distinct(t.sh)) * 1.0 / len(t.sh) ELSE 0.0 END AS dup_trigram_frac
         |  FROM corpus c JOIN ls l USING (doc_id) JOIN tri t USING (doc_id)),
         |bic AS (SELECT doc_id, unnest(sh) AS bigram FROM bi),
         |bcount AS (SELECT doc_id, bigram, count(*) AS cnt FROM bic GROUP BY 1, 2),
         |btop AS (
         |  SELECT doc_id, bigram, cnt,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bigram) AS rn
         |  FROM bcount)
         |SELECT b.doc_id,
         |       round(b.dup_line_frac, 6) AS dup_line_frac,
         |       round(b.dup_trigram_frac, 6) AS dup_trigram_frac,
         |       coalesce(t.bigram, '') AS top_bigram,
         |       round(coalesce(t.cnt * length(t.bigram) * 1.0 / b.nc, 0.0), 6) AS top_bigram_frac
         |FROM base b LEFT JOIN (SELECT * FROM btop WHERE rn = 1) t USING (doc_id)""".stripMargin,

    "q75_paragraph_dedup" ->
      """WITH corpus0 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25),
        |corpus AS (
        |  SELECT doc_id, replace(text, ' table ', chr(10)) AS text FROM corpus0),
        |paras AS (
        |  SELECT doc_id, unnest(list_filter(list_transform(string_split(text, chr(10)),
        |         x -> trim(x)), x -> x <> '')) AS para
        |  FROM corpus)
        |SELECT md5(para) AS para_md5, min(para) AS para, count(*) AS n_total,
        |       count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
        |FROM paras GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,

    // DuckDB regexp_replace needs the 'g' flag (Spark's replaces all
    // matches by default); counts are computed on the un-redacted text.
    "q76_pii" -> {
      val email = graft.functions.TextAnalysis.EmailRe
      val ip = graft.functions.TextAnalysis.Ipv4Re
      val phone = graft.functions.TextAnalysis.PhoneRe
      s"""WITH synth AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN text
         |      || ' contact user' || doc_id::VARCHAR || '@example.com ip 10.'
         |      || (doc_id % 256)::VARCHAR || '.0.' || (doc_id % 100)::VARCHAR
         |      || ' call ' || (doc_id % 900 + 100)::VARCHAR || '-555-'
         |      || (doc_id % 9000 + 1000)::VARCHAR
         |    ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |      '$email', '<EMAIL>', 'g'),
         |      '$ip', '<IP>', 'g'),
         |      '$phone', '<PHONE>', 'g')) AS redacted_md5
         |FROM synth""".stripMargin
    },

    "q77_rrf" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$tokCte,
         |$bm25Cte,
         |kw AS (
         |  SELECT doc_id, kw_rank FROM (
         |    SELECT doc_id,
         |           row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS kw_rank
         |    FROM scores) WHERE kw_rank <= 50),
         |q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vdist AS (
         |  SELECT c.vec_id AS doc_id,
         |    (SELECT CASE WHEN sum(x*x) = 0 OR sum(y*y) = 0 THEN 1.0
         |            ELSE 1.0 - sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) END
         |     FROM (SELECT CAST(unnest(c.embedding) AS DOUBLE) AS x,
         |                  CAST(unnest(q0.qv) AS DOUBLE) AS y)) AS dist
         |  FROM embeddings c, q0),
         |v AS (
         |  SELECT doc_id, vec_rank FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY dist, doc_id) AS vec_rank
         |    FROM vdist) WHERE vec_rank <= 50),
         |fused AS (
         |  SELECT coalesce(v.doc_id, k.doc_id) AS doc_id,
         |         CAST(v.vec_rank AS INT) AS vec_rank,
         |         CAST(k.kw_rank AS INT) AS kw_rank,
         |         coalesce(CAST(1.0 AS DOUBLE) / (60 + v.vec_rank), 0.0)
         |           + coalesce(CAST(1.0 AS DOUBLE) / (60 + k.kw_rank), 0.0) AS rrf
         |  FROM v FULL OUTER JOIN kw k ON v.doc_id = k.doc_id)
         |SELECT doc_id, vec_rank, kw_rank, round(rrf, 6) AS rrf_score
         |FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM fused)
         |WHERE rn <= 10""".stripMargin,

    "q78_contamination" ->
      """WITH evaldocs AS (
        |  SELECT doc_id + 100000 AS doc_id,
        |         substr(text, 1, greatest(length(text) - 20, 10)) AS text
        |  FROM documents WHERE doc_id < 25
        |  UNION ALL
        |  SELECT doc_id + 300000 AS doc_id, reverse(text) AS text
        |  FROM documents WHERE doc_id < 10),
        |tk_t AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM documents),
        |tk_e AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM evaldocs),
        |sh_t AS (
        |  SELECT DISTINCT
        |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
        |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |           ELSE [] END) AS shingle
        |  FROM tk_t),
        |sh_e AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
        |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |           ELSE [] END) AS shingle
        |  FROM tk_e),
        |agg AS (
        |  SELECT e.doc_id, count(*) AS n_shingles,
        |         CAST(sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
        |  FROM sh_e e LEFT JOIN sh_t t USING (shingle)
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |       coalesce(a.n_shingles, 0) AS n_shingles,
        |       coalesce(a.n_matched, 0) AS n_matched,
        |       round(CASE WHEN a.n_shingles > 0
        |             THEN a.n_matched * 1.0 / a.n_shingles ELSE 0.0 END, 6) AS overlap_frac
        |FROM evaldocs d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // r14: set semantics at STRING level, moved in lockstep with the
    // engine's md5-32 -> xxhash64-window key switch (the engine's 64-bit
    // domain is collision-equivalent to strings at ~2^-64/pair; the old
    // md5-32 domain genuinely differed — ~100 colliding gram pairs
    // existed at sf0.1 and both sides reproduced them by construction)
    "q107_dup_fraction" ->
      s"""WITH $nearDupCorpusSql,
         |$tokCte,
         |$shingleCte,
         |hh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |cnt AS (SELECT shingle, count(*) AS nd FROM hh GROUP BY shingle),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         |         CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM hh JOIN cnt USING (shingle) GROUP BY doc_id)
         |SELECT doc_id, n_ngrams, n_dup,
         |       round(n_dup * 1.0 / n_ngrams, 6) AS dup_frac
         |FROM agg""".stripMargin,

    "q106_adaptive_quality" ->
      """WITH corpus AS (SELECT doc_id, text, lang FROM documents),
        |tq AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS tk,
        |    length(text) * 1.0 AS n_chars,
        |    length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) * 1.0 AS punct
        |  FROM corpus),
        |cq AS (
        |  SELECT doc_id, n_chars, punct, len(tk) * 1.0 AS n_toks,
        |    CASE WHEN len(tk) > 0
        |         THEN list_sum(list_transform(tk, x -> length(x))) * 1.0 / len(tk)
        |         ELSE 0.0 END AS mwl,
        |    len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for'], x))) * 1.0 AS sw
        |  FROM tq),
        |qs AS (
        |  SELECT doc_id, round(
        |      least(n_chars / 500.0, 1.0) * 0.3
        |    + (1.0 - least(abs(mwl - 5.0) / 5.0, 1.0)) * 0.2
        |    + (1.0 - least((CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 1.0 END) * 4.0, 1.0)) * 0.3
        |    + least((CASE WHEN n_toks > 0 THEN sw / n_toks ELSE 0.0 END) * 4.0, 1.0) * 0.2, 6) AS quality
        |  FROM cq),
        |j AS (SELECT c.doc_id, c.lang, q.quality
        |      FROM corpus c JOIN qs q USING (doc_id)),
        |r AS (SELECT lang, quality,
        |        row_number() OVER (PARTITION BY lang ORDER BY quality) AS rn,
        |        count(*) OVER (PARTITION BY lang) AS n
        |      FROM j),
        |thr AS (SELECT lang, quality AS cut FROM r
        |        WHERE rn = CAST(ceil(0.4 * n) AS BIGINT))
        |SELECT j.doc_id, j.lang, j.quality
        |FROM j JOIN thr USING (lang) WHERE j.quality >= thr.cut""".stripMargin,

    "q111_adaptive_quality_approx" ->
      """WITH corpus AS (SELECT doc_id, text, lang FROM documents),
        |tq AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS tk,
        |    length(text) * 1.0 AS n_chars,
        |    length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) * 1.0 AS punct
        |  FROM corpus),
        |cq AS (
        |  SELECT doc_id, n_chars, punct, len(tk) * 1.0 AS n_toks,
        |    CASE WHEN len(tk) > 0
        |         THEN list_sum(list_transform(tk, x -> length(x))) * 1.0 / len(tk)
        |         ELSE 0.0 END AS mwl,
        |    len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for'], x))) * 1.0 AS sw
        |  FROM tq),
        |qs AS (
        |  SELECT doc_id, round(
        |      least(n_chars / 500.0, 1.0) * 0.3
        |    + (1.0 - least(abs(mwl - 5.0) / 5.0, 1.0)) * 0.2
        |    + (1.0 - least((CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 1.0 END) * 4.0, 1.0)) * 0.3
        |    + least((CASE WHEN n_toks > 0 THEN sw / n_toks ELSE 0.0 END) * 4.0, 1.0) * 0.2, 6) AS quality
        |  FROM cq),
        |j AS (SELECT c.doc_id, c.lang, q.quality
        |      FROM corpus c JOIN qs q USING (doc_id)),
        |r AS (SELECT lang, quality,
        |        row_number() OVER (PARTITION BY lang ORDER BY quality) AS rn,
        |        count(*) OVER (PARTITION BY lang) AS n
        |      FROM j),
        |thr AS (SELECT lang, quality AS cut FROM r
        |        WHERE rn = CAST(ceil(0.4 * n) AS BIGINT))
        |SELECT j.doc_id, j.lang, j.quality
        |FROM j JOIN thr USING (lang) WHERE j.quality >= thr.cut""".stripMargin,

    "q112_strip_boilerplate" ->
      """WITH corpus AS (
        |  SELECT doc_id, CASE WHEN doc_id % 2 = 0
        |    THEN text || chr(10) || 'Subscribe to our newsletter today'
        |              || chr(10) || 'Copyright 2020 Example Corp'
        |    ELSE text END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
        |ln AS (SELECT doc_id, unnest(range(1, len(parts) + 1)) AS pos, parts FROM t),
        |l2 AS (SELECT doc_id, pos, parts[pos] AS line FROM ln),
        |boiler AS (
        |  SELECT trim(line) AS tl FROM l2 WHERE trim(line) <> ''
        |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
        |kept AS (
        |  SELECT doc_id, pos, line FROM l2
        |  WHERE trim(line) = '' OR trim(line) NOT IN (SELECT tl FROM boiler)),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, coalesce(a.text, '') AS text
        |FROM corpus c LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q116_corpus_profile" ->
      """WITH corpus AS (SELECT doc_id, lang, text FROM documents WHERE text IS NOT NULL),
        |tq AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS tk,
        |    length(text) * 1.0 AS n_chars,
        |    length(regexp_replace(text, '[A-Za-z0-9 \t\n\r\f\x0B]', '', 'g')) * 1.0 AS punct
        |  FROM corpus),
        |cq AS (
        |  SELECT doc_id, n_chars, punct, len(tk) * 1.0 AS n_toks,
        |    CASE WHEN len(tk) > 0
        |         THEN list_sum(list_transform(tk, x -> length(x))) * 1.0 / len(tk)
        |         ELSE 0.0 END AS mwl,
        |    len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for'], x))) * 1.0 AS sw
        |  FROM tq),
        |qs AS (
        |  SELECT doc_id, round(
        |      least(n_chars / 500.0, 1.0) * 0.3
        |    + (1.0 - least(abs(mwl - 5.0) / 5.0, 1.0)) * 0.2
        |    + (1.0 - least((CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 1.0 END) * 4.0, 1.0)) * 0.3
        |    + least((CASE WHEN n_toks > 0 THEN sw / n_toks ELSE 0.0 END) * 4.0, 1.0) * 0.2, 6) AS q
        |  FROM cq),
        |tok AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(text, '[ \t\n\r\f\x0B]+'), x -> x <> '')) AS tok,
        |    md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'))) AS fp
        |  FROM corpus),
        |n AS (SELECT count(*) * 1.0 AS n FROM corpus),
        |stats AS (
        |  SELECT 'n_docs' AS stat, count(*) * 1.0 AS value FROM corpus
        |  UNION ALL SELECT 'total_ws_tokens', sum(tok) * 1.0 FROM tok
        |  UNION ALL SELECT 'mean_ws_tokens', avg(tok) FROM tok
        |  UNION ALL SELECT 'mean_quality', avg(q) FROM qs
        |  UNION ALL SELECT 'n_langs', count(DISTINCT lang) * 1.0 FROM corpus
        |  UNION ALL SELECT 'top_lang_share',
        |    (SELECT max(c) FROM (SELECT count(*) AS c FROM corpus GROUP BY lang)) / n.n
        |    FROM n
        |  UNION ALL SELECT 'dup_doc_share',
        |    coalesce((SELECT sum(c) FROM (
        |        SELECT count(*) AS c FROM tok GROUP BY fp) WHERE c >= 2), 0) / n.n
        |    FROM n)
        |SELECT stat, round(value, 6) + 0.0 AS value FROM stats
        |ORDER BY stat""".stripMargin,

    "q108_pipeline_audit" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text, lang, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text, lang, source FROM documents WHERE doc_id < 25),
         |lf AS (SELECT * FROM corpus WHERE lang IN ('de','en','fr')),
         |tq AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS tk,
         |    length(text) * 1.0 AS n_chars,
         |    length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) * 1.0 AS punct
         |  FROM lf),
         |cq AS (
         |  SELECT doc_id, n_chars, punct, len(tk) * 1.0 AS n_toks,
         |    CASE WHEN len(tk) > 0
         |         THEN list_sum(list_transform(tk, x -> length(x))) * 1.0 / len(tk)
         |         ELSE 0.0 END AS mwl,
         |    len(list_filter(tk, x -> list_contains(
         |      ['the','a','of','and','to','in','is','that','it','for'], x))) * 1.0 AS sw
         |  FROM tq),
         |qs AS (
         |  SELECT doc_id, round(
         |      least(n_chars / 500.0, 1.0) * 0.3
         |    + (1.0 - least(abs(mwl - 5.0) / 5.0, 1.0)) * 0.2
         |    + (1.0 - least((CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 1.0 END) * 4.0, 1.0)) * 0.3
         |    + least((CASE WHEN n_toks > 0 THEN sw / n_toks ELSE 0.0 END) * 4.0, 1.0) * 0.2, 6) AS quality
         |  FROM cq),
         |qf AS (SELECT lf.* FROM lf JOIN qs USING (doc_id) WHERE qs.quality >= 0.65),
         |sv AS (SELECT * FROM (
         |  SELECT *, min(doc_id) OVER (PARTITION BY
         |    md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))) AS k
         |  FROM qf) WHERE doc_id = k),
         |mx AS (SELECT * FROM sv
         |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT <
         |    CASE lang WHEN 'en' THEN ${Sampling.threshold(0.6)}
         |              WHEN 'de' THEN ${Sampling.threshold(0.9)}
         |              ELSE ${Sampling.threshold(1.0)} END)
         |SELECT 'input' AS stage, CAST((SELECT count(*) FROM corpus) AS BIGINT) AS n_rows,
         |       (SELECT $wsTokSumSql FROM corpus) AS n_tokens
         |UNION ALL SELECT 'lang', CAST((SELECT count(*) FROM lf) AS BIGINT),
         |       (SELECT $wsTokSumSql FROM lf)
         |UNION ALL SELECT 'quality', CAST((SELECT count(*) FROM qf) AS BIGINT),
         |       (SELECT $wsTokSumSql FROM qf)
         |UNION ALL SELECT 'exact_dedup', CAST((SELECT count(*) FROM sv) AS BIGINT),
         |       (SELECT $wsTokSumSql FROM sv)
         |UNION ALL SELECT 'mixture', CAST((SELECT count(*) FROM mx) AS BIGINT),
         |       (SELECT $wsTokSumSql FROM mx)""".stripMargin,

    "q104_training_pipeline" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text, lang, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text, lang, source FROM documents WHERE doc_id < 25),
         |lf AS (SELECT * FROM corpus WHERE lang IN ('de','en','fr')),
         |tq AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS tk,
         |    length(text) * 1.0 AS n_chars,
         |    length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')) * 1.0 AS punct
         |  FROM lf),
         |cq AS (
         |  SELECT doc_id, n_chars, punct, len(tk) * 1.0 AS n_toks,
         |    CASE WHEN len(tk) > 0
         |         THEN list_sum(list_transform(tk, x -> length(x))) * 1.0 / len(tk)
         |         ELSE 0.0 END AS mwl,
         |    len(list_filter(tk, x -> list_contains(
         |      ['the','a','of','and','to','in','is','that','it','for'], x))) * 1.0 AS sw
         |  FROM tq),
         |qs AS (
         |  SELECT doc_id, round(
         |      least(n_chars / 500.0, 1.0) * 0.3
         |    + (1.0 - least(abs(mwl - 5.0) / 5.0, 1.0)) * 0.2
         |    + (1.0 - least((CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 1.0 END) * 4.0, 1.0)) * 0.3
         |    + least((CASE WHEN n_toks > 0 THEN sw / n_toks ELSE 0.0 END) * 4.0, 1.0) * 0.2, 6) AS quality
         |  FROM cq),
         |qf AS (SELECT lf.* FROM lf JOIN qs USING (doc_id) WHERE qs.quality >= 0.65),
         |sv AS (SELECT * FROM (
         |  SELECT *, min(doc_id) OVER (PARTITION BY
         |    md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))) AS k
         |  FROM qf) WHERE doc_id = k),
         |mx AS (SELECT * FROM sv
         |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT <
         |    CASE lang WHEN 'en' THEN ${Sampling.threshold(0.6)}
         |              WHEN 'de' THEN ${Sampling.threshold(0.9)}
         |              ELSE ${Sampling.threshold(1.0)} END),
         |h AS (SELECT doc_id, lang, source,
         |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS hv FROM mx)
         |SELECT doc_id, lang, source, CAST(hv % 8 AS INT) AS shard,
         |  row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1 AS seq
         |FROM h""".stripMargin,

    "q98_indexed_dedup" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |batch AS (
         |  SELECT doc_id + 100000 AS doc_id,
         |         substr(text, 1, greatest(length(text) - 20, 10)) AS text
         |  FROM documents WHERE doc_id < 30
         |  UNION ALL
         |  SELECT doc_id + 200000 AS doc_id,
         |         'qqx' || doc_id || ' freshdoc qqx' || doc_id || ' freshdoc' AS text
         |  FROM documents WHERE doc_id < 20),
         |tk_c AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
         |         '[^a-z0-9_]+'), x -> x <> '') AS tk
         |  FROM corpus),
         |tk_b AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
         |         '[^a-z0-9_]+'), x -> x <> '') AS tk
         |  FROM batch),
         |shs_c AS (
         |  SELECT doc_id,
         |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
         |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
         |           ELSE [] END) AS shingle
         |  FROM tk_c),
         |shs_b AS (
         |  SELECT doc_id,
         |    unnest(CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
         |           i -> array_to_string(list_slice(tk, i, i + 2), ' '))
         |           ELSE [] END) AS shingle
         |  FROM tk_b),
         |h_c AS (SELECT DISTINCT doc_id,
         |               ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM shs_c),
         |h_b AS (SELECT DISTINCT doc_id,
         |               ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM shs_b),
         |n_c AS (SELECT doc_id, count(*) AS n FROM h_c GROUP BY doc_id),
         |n_b AS (SELECT doc_id, count(*) AS n FROM h_b GROUP BY doc_id),
         |perms(i, a, b) AS (VALUES $permValues),
         |min_c AS (
         |  SELECT h_c.doc_id, p.i, min((p.a * h_c.h + p.b) % ${Dedup.MinhashP}) AS m
         |  FROM h_c CROSS JOIN perms p GROUP BY h_c.doc_id, p.i),
         |min_b AS (
         |  SELECT h_b.doc_id, p.i, min((p.a * h_b.h + p.b) % ${Dedup.MinhashP}) AS m
         |  FROM h_b CROSS JOIN perms p GROUP BY h_b.doc_id, p.i),
         |bands_c AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(m::VARCHAR, ',' ORDER BY i) AS band_sig
         |  FROM min_c GROUP BY doc_id, i // 4),
         |bands_b AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(m::VARCHAR, ',' ORDER BY i) AS band_sig
         |  FROM min_b GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT c.doc_id AS cdoc, b.doc_id AS bdoc
         |  FROM bands_c c JOIN bands_b b
         |    ON c.band = b.band AND c.band_sig = b.band_sig),
         |inter AS (
         |  SELECT cand.cdoc, cand.bdoc, count(*) AS ni
         |  FROM cand
         |  JOIN h_c ON h_c.doc_id = cand.cdoc
         |  JOIN h_b ON h_b.doc_id = cand.bdoc AND h_b.h = h_c.h
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT DISTINCT i.bdoc AS doc_id
         |  FROM inter i
         |  JOIN n_c ON n_c.doc_id = i.cdoc
         |  JOIN n_b ON n_b.doc_id = i.bdoc
         |  WHERE i.ni * 1.0 / (n_c.n + n_b.n - i.ni) >= 0.5)
         |SELECT b.doc_id, CAST(length(b.text) AS BIGINT) AS n_chars
         |FROM batch b LEFT JOIN dup USING (doc_id)
         |WHERE dup.doc_id IS NULL""".stripMargin,

    "q94_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |         '[^a-z0-9_]+'), x -> x <> '') AS tk
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id,
        |         CAST(unnest(range(1, len(tk) - 3)) AS INT) AS start,
        |         md5(unnest(list_transform(range(1, len(tk) - 3),
        |             i -> array_to_string(list_slice(tk, i, i + 4), ' ')))) AS key
        |  FROM toks WHERE len(tk) >= 5),
        |dupk AS (
        |  SELECT key FROM (
        |    SELECT key, count(DISTINCT doc_id) AS nd FROM ng GROUP BY key)
        |  WHERE nd >= 2),
        |hits AS (SELECT DISTINCT doc_id, start FROM ng JOIN dupk USING (key)),
        |marked AS (
        |  SELECT doc_id, start,
        |         CASE WHEN max(start + 4) OVER (PARTITION BY doc_id ORDER BY start
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |              OR start > max(start + 4) OVER (PARTITION BY doc_id ORDER BY start
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
        |         THEN 1 ELSE 0 END AS new_isl
        |  FROM hits),
        |isl AS (
        |  SELECT doc_id, start,
        |         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        |  FROM marked),
        |spans AS (
        |  SELECT doc_id, g, min(start) AS s, max(start) + 4 AS e
        |  FROM isl GROUP BY 1, 2),
        |summ AS (
        |  SELECT doc_id, count(*) AS n_spans,
        |         CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
        |  FROM spans GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS total_tokens FROM toks)
        |SELECT summ.doc_id, n_spans, dup_tokens, total_tokens,
        |       round(dup_tokens * 1.0 / total_tokens, 6) AS dup_frac
        |FROM summ JOIN tot USING (doc_id)""".stripMargin,

    "q95_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(list_filter(regexp_split_to_array(
        |         lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS t
        |  FROM documents),
        |b AS (SELECT doc_id, lang,
        |             ('0x' || substr(md5(t), 1, 8))::BIGINT % 1024 AS b
        |      FROM toks),
        |db AS (SELECT doc_id, b, count(*) AS c FROM b GROUP BY 1, 2),
        |cr AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM db GROUP BY b),
        |ct AS (SELECT b, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY b),
        |tr AS (SELECT CAST(sum(cr) AS BIGINT) AS tr FROM cr),
        |tt AS (SELECT CAST(sum(ct) AS BIGINT) AS tt FROM ct),
        |lr AS (
        |  SELECT cr.b,
        |         ln((coalesce(ct.ct, 0) + 1.0) / (tt.tt + 1024)) -
        |         ln((cr.cr + 1.0) / (tr.tr + 1024)) AS lr
        |  FROM cr LEFT JOIN ct USING (b) CROSS JOIN tr CROSS JOIN tt)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |       round(sum(c * lr), 4) + 0.0 AS logw
        |FROM db JOIN lr USING (b) GROUP BY doc_id""".stripMargin,
  )
}
