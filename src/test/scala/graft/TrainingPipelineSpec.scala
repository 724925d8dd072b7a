package graft

import graft.functions.TextAnalysis
import graft.operators.{Pipeline, PipelineSpec, Sampling}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end pipeline must be EXACTLY the composition of its
  * individually oracle-checked stages — no drift between the one-plan
  * path and chaining the operators by hand. */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("pipeline equals manual stage chaining") {
    val spec = PipelineSpec(langAllow = Set("en", "de"), minQuality = 0.65,
      exactDedup = true, mixtureRates = Map("en" -> 0.6), numShards = 4)
    val got = Pipeline.prepare(docs, "doc_id", "text", spec).data
      .select("doc_id", "shard", "seq").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val lf = docs.where(col("text").isNotNull && col("lang").isin("de", "en"))
    val qf = lf.where(round(TextAnalysis.qualityScore(col("text")), 6) >= 0.65)
    val w = Window.partitionBy(TextAnalysis.fingerprint(col("text")))
    val sv = qf.withColumn("_k", min(col("doc_id")).over(w))
      .where(col("_k") === col("doc_id")).drop("_k")
    val mx = Sampling.stratifiedSample(sv, "lang", "doc_id", Map("en" -> 0.6))
    val want = Sampling.shuffleShards(mx, "doc_id", 4)
      .select("doc_id", "shard", "seq").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    assert(got === want)
    assert(got.nonEmpty)
  }

  test("token-budget stage equals the standalone budgetSample draw") {
    import graft.operators.Sampling
    import graft.functions.TextAnalysis
    val spec = PipelineSpec(mixtureGroupCol = "lang",
      tokenBudgetPerGroup = Some(2000L))
    val res = Pipeline.prepare(docs, "doc_id", "text", spec, audit = true)
    val got = res.data.select("doc_id").collect().map(_.getLong(0)).toSet
    val weighted = docs.where(col("text").isNotNull)
      .withColumn("_wtok", TextAnalysis.wsTokenCount(col("text")).cast("long"))
    val want = Sampling.budgetSample(weighted, "lang", "doc_id", "_wtok", 2000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < docs.count())
    // the helper weight column never leaks into the result
    assert(!res.data.columns.contains("_wtok"))
    assert(res.stageCounts().toMap.apply("token_budget") === got.size.toLong)
    // per-group token totals land within one crossing doc of the budget
    val totals = res.data
      .withColumn("_wtok", TextAnalysis.wsTokenCount(col("text")).cast("long"))
      .groupBy("lang").agg(sum("_wtok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (g, t) => assert(t >= math.min(2000L, 1L), s"$g: $t") }
  }

  test("URL-dedup stage equals the standalone dedupByUrl survivor set") {
    import graft.operators.Dedup
    val urled = docs.limit(60).withColumn("url",
      concat(lit("https://www.site"), col("doc_id") % 2, lit(".com/p/"),
        (col("doc_id") % 10).cast("string"),
        when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit(""))))
    val spec = PipelineSpec(urlDedupCol = Some("url"))
    val res = Pipeline.prepare(urled, "doc_id", "text", spec, audit = true)
    val got = res.data.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = Dedup.dedupByUrl(urled, "url", "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < 60)
    // metadata columns (url) survive the semi-join stage
    assert(res.data.columns.contains("url"))
    assert(res.stageCounts().toMap.apply("url_dedup") === got.size.toLong)
    // null-URL rows pass through (no URL evidence), never silently drop
    val withNulls = urled.unionByName(docs.where(col("doc_id") >= 400)
      .limit(5).withColumn("url", lit(null).cast("string")))
    val gotN = Pipeline.prepare(withNulls, "doc_id", "text", spec).data
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nullIds = withNulls.where(col("url").isNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nullIds.subsetOf(gotN) && gotN === got ++ nullIds)
  }

  test("LM gate equals manual crossEntropy filter; sidecar round-trips") {
    import graft.operators.NgramLm
    val lm = NgramLm.fit(docs.where(col("lang") === "en"), "text")
    val spec = PipelineSpec(lmModel = Some(lm), maxPerplexity = 30.0)
    val got = Pipeline.prepare(docs, "doc_id", "text", spec, audit = true)
    val gotIds = got.data.select("doc_id").collect().map(_.getLong(0)).toSet

    val wantIds = NgramLm.crossEntropy(docs, lm, "doc_id", "text")
      .where(round(col("ppl"), 6) <= 30.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds === wantIds)
    // the gate genuinely cuts, and the audit shows the lm_quality stage
    assert(gotIds.nonEmpty && gotIds.size < docs.count())
    val stages = got.stageCounts().toMap
    assert(stages("lm_quality") === gotIds.size.toLong)

    // persisted LM scores identically after reload
    val dir = java.nio.file.Files.createTempDirectory("lm-sidecar").toString + "/lm"
    NgramLm.save(lm, dir)
    assert(NgramLm.exists(spark, dir))
    val re = NgramLm.load(spark, dir)
    assert(re.vocabSize === lm.vocabSize && re.alpha === lm.alpha)
    val reIds = NgramLm.crossEntropy(docs, re, "doc_id", "text")
      .where(round(col("ppl"), 6) <= 30.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reIds === wantIds)
  }

  test("audit counts come from one pass, in stage order, monotone") {
    val spec = PipelineSpec(langAllow = Set("en"), minQuality = 0.65,
      exactDedup = true, mixtureRates = Map("en" -> 0.5), numShards = 2)
    val res = Pipeline.prepare(docs, "doc_id", "text", spec, audit = true)
    val counts = res.stageCounts()
    assert(counts.map(_._1) ===
      Seq("input", "lang", "quality", "exact_dedup", "mixture"))
    assert(counts.head._2 === docs.count()) // corpus has no null texts
    val vals = counts.map(_._2)
    assert(vals.zip(vals.tail).forall { case (a, b) => b <= a },
      s"stage counts must shrink: $counts")
    assert(vals.last > 0)
    // identical survivors with and without the metrics nodes
    val plain = Pipeline.prepare(docs, "doc_id", "text", spec).data
    assert(res.data.select("doc_id").collect().map(_.getLong(0)).toSet ===
      plain.select("doc_id").collect().map(_.getLong(0)).toSet)
    // audit-off result has no observation to read
    intercept[IllegalArgumentException] {
      Pipeline.prepare(docs, "doc_id", "text", spec).stageCounts()
    }
  }

  test("audit token sums equal standalone recomputation per stage") {
    val spec = PipelineSpec(langAllow = Set("en"), minQuality = 0.65,
      exactDedup = true, mixtureRates = Map("en" -> 0.5))
    val res = Pipeline.prepare(docs, "doc_id", "text", spec, audit = true)
    val metrics = res.stageMetrics()
    assert(metrics.map(_._1) ===
      Seq("input", "lang", "quality", "exact_dedup", "mixture"))
    def toks(df: org.apache.spark.sql.DataFrame): Long =
      df.select(coalesce(sum(TextAnalysis.wsTokenCount(col("text")).cast("long")),
        lit(0L))).head().getLong(0)
    // replay each gate standalone and sum its survivors' tokens
    var cur = docs.where(col("text").isNotNull)
    val expect = scala.collection.mutable.ArrayBuffer[Long](toks(cur))
    cur = cur.where(col("lang").isin("en"))
    expect += toks(cur)
    cur = cur.where(round(TextAnalysis.qualityScore(col("text")), 6) >= 0.65)
    expect += toks(cur)
    val w = Window.partitionBy(TextAnalysis.fingerprint(col("text")))
    cur = cur.withColumn("_k", min(col("doc_id")).over(w))
      .where(col("_k") === col("doc_id")).drop("_k")
    expect += toks(cur)
    cur = Sampling.stratifiedSample(cur, "lang", "doc_id", Map("en" -> 0.5))
    expect += toks(cur)
    assert(metrics.map(_._3) === expect.toSeq)
    assert(expect.head > 0L)
    // the rows view is byte-identical to the (rows, tokens) view
    assert(res.stageCounts() === metrics.map(m => m._1 -> m._2))
  }

  test("adaptive quality stage equals the standalone percentileGate") {
    val spec = PipelineSpec(adaptiveQualityKeep = Some(0.6))
    val got = Pipeline.prepare(docs, "doc_id", "text", spec, audit = true)
    assert(got.stageCounts().map(_._1) === Seq("input", "adaptive_quality"))
    val ids = got.data.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = Sampling.percentileGate(
        docs.select(col("doc_id"), col("lang"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("q")),
        "lang", "q", 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === want, s"got=${ids.size} want=${want.size} " +
      s"onlyGot=${(ids -- want).toSeq.sorted.take(5)} " +
      s"onlyWant=${(want -- ids).toSeq.sorted.take(5)}")
    // every language keeps at least 60% of its docs (ties keep more)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptPerLang = got.data.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (l, n) =>
      assert(keptPerLang.getOrElse(l, 0L) >= math.ceil(n * 0.6).toLong, l)
    }
  }

  test("repetition gate drops planted repetitive docs, zero-shuffle") {
    val planted = docs.limit(20)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .unionByName(Seq(
        (9001L, Array.fill(30)("buy now click here").mkString("\n"), "en", "web"),
        (9002L, Array.fill(40)("spam spam spam").mkString(" "), "en", "web"))
        .toDF("doc_id", "text", "lang", "source"))
    val res = Pipeline.prepare(planted, "doc_id", "text",
      PipelineSpec(maxDupLineFrac = 0.3, maxDupTrigramFrac = 0.5), audit = true)
    val ids = res.data.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9001L), "duplicate-line doc must drop")
    assert(!ids.contains(9002L), "duplicate-trigram doc must drop")
    assert(ids.size === 20, "natural corpus docs all survive")
    assert(res.stageCounts() === Seq("input" -> 22L, "repetition" -> 20L))
    // per-row gate: scan + filter, no exchange anywhere (the planted
    // frame above carries a limit()'s exchange, so check on the raw docs)
    assert(graft.operators.Scale.countShuffles(
      Pipeline.prepare(docs, "doc_id", "text",
        PipelineSpec(maxDupLineFrac = 0.3, maxDupTrigramFrac = 0.5)).data) === 0)
  }

  test("writeShards exports shard dirs with rows in shuffle order") {
    val spec = PipelineSpec(langAllow = Set("en"), numShards = 4)
    val res = Pipeline.prepare(docs, "doc_id", "text", spec)
    val out = java.nio.file.Files.createTempDirectory("graft-export").toString
    Pipeline.writeShards(res.data, out)
    val back = spark.read.parquet(out)
    assert(back.count() === res.data.count())
    assert(back.select("shard").distinct().count() === 4)
    // within each shard directory, file order IS seq order
    for (sh <- 0 until 4) {
      val seqs = spark.read.parquet(s"$out/shard=$sh")
        .select("seq").collect().map(_.getLong(0))
      assert(seqs.toSeq === seqs.sorted.toSeq, s"shard $sh out of order")
      assert(seqs.toSet === (0L until seqs.length).toSet, s"shard $sh not dense")
    }
    // a prepare() without shards fails loudly
    intercept[IllegalArgumentException] {
      Pipeline.writeShards(
        Pipeline.prepare(docs, "doc_id", "text", PipelineSpec()).data, out)
    }
    // JSONL export: same rows, same shard layout, physical LINE order in
    // each file is seq order (training loaders stream lines)
    val outJ = java.nio.file.Files.createTempDirectory("graft-export-jsonl").toString
    Pipeline.writeShards(res.data, outJ, format = "json")
    val backJ = spark.read.json(outJ)
    assert(backJ.count() === res.data.count())
    assert(backJ.select("doc_id").collect().map(_.getLong(0)).toSet ===
      back.select("doc_id").collect().map(_.getLong(0)).toSet)
    for (sh <- 0 until 4) {
      val files = new java.io.File(s"$outJ/shard=$sh").listFiles()
        .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      val lines = files.sortBy(_.getName).flatMap(f =>
        scala.io.Source.fromFile(f).getLines())
      val seqs = lines.map(l => """"seq":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
      assert(seqs.toSeq === seqs.sorted.toSeq, s"jsonl shard $sh out of order")
    }
    intercept[IllegalArgumentException] {
      Pipeline.writeShards(res.data, outJ, format = "csvx")
    }
  }

  test("near-dup and decontamination stages drop the planted rows") {
    val base = docs.where(col("doc_id") < 50)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // planted near-dups: truncated copies of docs 0-2 at higher ids
    val withDup = base.unionByName(base.where(col("doc_id") < 3)
      .select((col("doc_id") + 5000).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 15, 10))").as("text"),
        col("lang"), col("source")))
    // eval set contaminated by doc 10 verbatim
    val eval = base.where(col("doc_id") === 10).select(col("doc_id"), col("text"))
    val res = Pipeline.prepare(withDup, "doc_id", "text",
      PipelineSpec(nearDupThreshold = Some(0.5),
        decontaminateAgainst = Some(eval)),
      audit = true)
    val ids = res.data.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(10L), "contaminated doc must drop")
    assert(ids.intersect(Set(5000L, 5001L, 5002L)).isEmpty,
      "planted near-dups must lose to their lower-id originals")
    assert(Set(0L, 1L, 2L).subsetOf(ids), "originals survive their clusters")
    assert(res.stageCounts().map(_._1) ===
      Seq("input", "near_dedup", "decontaminate"))
  }

  test("index-backed near-dedup stage equals the in-memory batch-vs-corpus dedup") {
    import graft.operators.Dedup
    val standing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (2L, "spark partitions shuffle broadcast join exchange plan quality"),
      (3L, "completely unrelated standing corpus document with rare words"))
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeidx").toString
    Dedup.saveDedupIndex(standing, "id", "text", dir)
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog tonight"),  // near-dup of 1
      (102L, "fresh unique sentence with brand new words entirely"),
      (103L, "spark partitions shuffle broadcast join exchange plan"), // near-dup of 2
      (104L, "another genuinely novel document nothing like the corpus"))
      .toDF("id", "text")
    val spec = PipelineSpec(nearDupIndexDir = Some(dir),
      nearDupThreshold = Some(0.5))
    val res = Pipeline.prepare(batch, "id", "text", spec, audit = true)
    val got = res.data.select("id").collect().map(_.getLong(0)).toSet
    // in-memory equivalent: LSH+exact-verify the batch AGAINST the
    // standing corpus (decontaminate), drop matched batch docs
    val dup = Dedup.decontaminate(batch, standing, "id", "text", threshold = 0.5)
      .select("train_id").collect().map(_.getLong(0)).toSet
    val expected = Set(101L, 102L, 103L, 104L) -- dup
    assert(got === expected)
    assert(got === Set(102L, 104L), "planted near-dups must be dropped")
    assert(res.stageCounts() === Seq("input" -> 4L, "near_dedup_index" -> 2L))
  }

  test("boilerplate stage strips shared lines, drops emptied docs, keeps metadata") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "keep me\nSHARED FOOTER", "en"),
      (2L, "SHARED FOOTER\nalso kept", "de"),
      (3L, "SHARED FOOTER", "en"),               // emptied -> dropped
      (4L, "free text no footer", "fr"))
      .toDF("id", "text", "lang")
    val spec = PipelineSpec(stripBoilerplateMinDocs = Some(3))
    val res = Pipeline.prepare(docs, "id", "text", spec, audit = true)
    val got = res.data.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("text"), r.getAs[String]("lang")))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "keep me", "en"), (2L, "also kept", "de"),
      (4L, "free text no footer", "fr")))
    assert(res.data.columns.toSeq === Seq("id", "text", "lang"),
      "stage must preserve column order and metadata columns")
    assert(res.stageCounts() === Seq("input" -> 4L, "boilerplate" -> 3L))
    // equals the standalone operator modulo the emptied-doc drop
    val standalone = Dedup.stripBoilerplate(docs, "id", "text", minDocs = 3)
      .where(col("text") =!= "").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("text"))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq === standalone.toSeq)
  }

  test("learned classifier stage gates by score, row-local, audited") {
    import graft.operators.QualityClassifier
    val pos = (1 to 25).map(i => s"education curriculum learning chapter $i").toDF("text")
    val neg = (1 to 25).map(i => s"casino jackpot bonus free spins click $i").toDF("text")
    val m = QualityClassifier.train(pos, neg, "text", buckets = 256)
    val docs = Seq(
      (1L, "a curriculum chapter about learning"),
      (2L, "free casino spins jackpot bonus"),
      (3L, "education chapter on learning curriculum"))
      .toDF("id", "text")
    val spec = PipelineSpec(qualityModel = Some(m), minClassifierScore = 0.5)
    val res = Pipeline.prepare(docs, "id", "text", spec, audit = true)
    val ids = res.data.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L), "negative-domain doc must be gated")
    assert(res.stageCounts() === Seq("input" -> 3L, "classifier" -> 2L))
    // the stage equals the standalone score + ROUNDED threshold (the
    // stage compares round(score, 6), the minQuality determinism stance)
    val standalone = QualityClassifier.score(docs, m, "id", "text")
      .where(round(col("score"), 6) >= 0.5).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === standalone)
  }
}
