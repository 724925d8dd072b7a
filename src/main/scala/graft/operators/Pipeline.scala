package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Observation}

/** Declarative spec for the standard training-data preparation pipeline:
  * language gate -> quality floor -> PII redaction -> exact dedup ->
  * near-dedup -> decontamination -> mixture sampling -> shard assignment.
  * Every knob delegates to an operator that is individually
  * oracle-checked (q24/q25/q27/q29/q65/q66/q76/q79); the pipeline is
  * their single-plan composition. Stages left at their defaults are
  * compiled OUT of the plan entirely (no pass-through operators).
  *
  * The reference prepares corpora by chaining these steps imperatively
  * per collection; here the whole chain is one Catalyst plan, so column
  * pruning and predicate pushdown work ACROSS stages and 100 TB flows
  * through without materializing intermediates. */
final case class PipelineSpec(
    /** Keep only these language codes (empty = no language gate). */
    langAllow: Set[String] = Set.empty,
    /** URL-level dedup pre-pass (RefinedWeb/CCNet: run BEFORE content
      * gates — most crawl duplicates are URL variants and should never
      * reach the expensive stages): keep the longest doc per
      * [[Dedup.canonicalizeUrl]] of this column. Within-batch in the
      * ingest stream (the exactDedup stance — cross-batch near-dups fall
      * to the index probe). */
    urlDedupCol: Option[String] = None,
    /** Column the language gate reads. */
    langCol: String = "lang",
    /** Keep docs whose heuristic quality score clears this floor. The
      * score is compared ROUNDED to 1e-6 so a float ulp can never flip
      * membership between engines or replays. */
    minQuality: Double = 0.0,
    /** Instead of (or after) the fixed floor: keep each language's top
      * fraction by quality, cut at the language's own nearest-rank
      * percentile — the FineWeb-style adaptive gate for corpora whose
      * score distributions differ per language. */
    adaptiveQualityKeep: Option[Double] = None,
    /** LEARNED quality gate (FineWeb-Edu/DCLM): keep docs whose
      * QualityClassifier score clears [[minClassifierScore]]. Scoring is
      * per-doc with the weights broadcast — row-local, so unlike the
      * adaptive gate this stage is ingest-stream-safe. */
    qualityModel: Option[QualityClassifier.LrModel] = None,
    /** Floor for [[qualityModel]]'s sigmoid score. */
    minClassifierScore: Double = 0.5,
    /** LM quality gate (CCNet): keep docs whose bigram-LM perplexity
      * under this model clears [[maxPerplexity]]. The model is fitted
      * ONCE on a trusted slice ([[NgramLm.fit]]) and its count tables
      * join in distributed — nothing broadcasts. Per-doc scoring against
      * standing tables, so the gate is ingest-stream-safe like
      * [[qualityModel]]. Docs with < 2 tokens carry no LM evidence and
      * are dropped by the gate. */
    lmModel: Option[NgramLm.BigramLm] = None,
    /** Ceiling for [[lmModel]]'s perplexity (compared rounded to 1e-6,
      * the minQuality stance). */
    maxPerplexity: Double = Double.PositiveInfinity,
    /** Gopher repetition gates: drop docs whose duplicate-line /
      * duplicate-trigram fraction exceeds these caps. Pure per-row
      * column algebra — no shuffle. */
    maxDupLineFrac: Double = 1.0,
    maxDupTrigramFrac: Double = 1.0,
    /** Replace emails/IPv4s/phones with placeholder tags. */
    redactPii: Boolean = false,
    /** Strip lines whose trimmed form appears in >= this many DISTINCT
      * docs (nav/cookie/footer boilerplate — Dedup.stripBoilerplate, the
      * RefinedWeb line-dedup REPAIR pass). Runs after PII redaction and
      * before dedup, so fingerprints see the cleaned text. Docs emptied
      * by the strip are dropped (nothing left to train on). */
    stripBoilerplateMinDocs: Option[Int] = None,
    /** Keep the smallest id per normalized-text fingerprint. */
    exactDedup: Boolean = false,
    /** MinHash near-dup threshold: banded LSH pairs -> connected
      * components -> smallest id per cluster survives. */
    nearDupThreshold: Option[Double] = None,
    /** INDEX-BACKED near-dedup: drop docs that near-duplicate anything in
      * the persisted dedup sidecar at this path (Dedup.dedupAgainstIndex),
      * instead of re-LSHing the whole corpus per run. The scale path for
      * REPEATED preparation of a growing corpus: the standing corpus's
      * signatures live in the bucket-partitioned sidecar, so each run
      * shingles only the input and reads only probed buckets. Verification
      * threshold comes from [[nearDupThreshold]] (default 0.5); when this
      * is set the in-memory clustering stage is skipped. Note the stage
      * dedups against the INDEX corpus, not within the input — pair it
      * with exactDedup/nearDupThreshold for intra-input duplicates. */
    nearDupIndexDir: Option[String] = None,
    /** Drop docs that near-duplicate any doc of this eval corpus. */
    decontaminateAgainst: Option[DataFrame] = None,
    /** Per-group keep rates for deterministic mixture sampling. */
    mixtureRates: Map[String, Double] = Map.empty,
    mixtureDefaultRate: Double = 1.0,
    /** Column the mixture rates key on (language, source, ...). */
    mixtureGroupCol: String = "lang",
    /** Per-group whitespace-token budget (applied after mixture): each
      * [[mixtureGroupCol]] group keeps docs in deterministic hash order
      * until its budget is exhausted ([[Sampling.budgetSample]] — the
      * crossing doc is kept, so budgets are met-or-slightly-exceeded,
      * never undershot). Corpus-global (per-group running sums) —
      * cleared in the ingest stream like the other global knobs. */
    tokenBudgetPerGroup: Option[Long] = None,
    /** Assign shuffle-shard + in-shard position (0 = skip). */
    numShards: Int = 0)

/** The prepared corpus plus, when auditing, per-stage survivor counts. */
final class PipelineResult private[operators] (
    val data: DataFrame, stages: Seq[(String, Observation)],
    /** Star-mode hot-bucket degradation recorded while prepare() drove
      * its eager dedup stages (near-dup LSH, index probes, the
      * decontamination prescreen): op -> exact (buckets linearized, rows
      * inside them). Empty = every banded pass was exact all-pairs — the
      * assertion a curation run makes in data instead of grepping the
      * per-bucket WARN out of executor logs. */
    val hotBucketDegradation: Map[String, Dedup.HotBucketStats] = Map.empty) {

  /** Per-stage surviving row counts, collected by observe() nodes INSIDE
    * the pipeline plan — one pass total, never a count() job per stage
    * (at 100 TB the audit is free; re-scanning per stage is not).
    * Populated by the first action on [[data]]; runs a no-op write if no
    * action has materialized the plan yet. Requires prepare(audit=true). */
  def stageCounts(): Seq[(String, Long)] =
    stageMetrics().map { case (n, rows, _) => n -> rows }

  /** (stage, rows, whitespace tokens) per stage, from the SAME
    * single-pass observe() metrics as [[stageCounts]] — curation budgets
    * are set in tokens, so the audit reports the denomination budgets
    * are written in, not just row attrition. Token counts reflect the
    * text AS OF that stage (after any redaction/boilerplate rewrite
    * upstream of it). */
  def stageMetrics(): Seq[(String, Long, Long)] = {
    require(stages.nonEmpty, "pipeline was prepared with audit=false")
    data.write.mode("overwrite").format("noop").save()
    stages.map { case (n, o) =>
      val m = o.get
      (n, m("rows").asInstanceOf[Long], m("tokens").asInstanceOf[Long])
    }
  }
}

object Pipeline {

  /** Run `spec` over `docs`. With `audit=true` every enabled stage gets
    * an observe() checkpoint (exact counts, but metrics nodes pin stage
    * boundaries against cross-stage pushdown); the default plan carries
    * no metrics nodes and fuses freely. Stages needing global state
    * (near-dup connected components, decontamination) are driven eagerly
    * at prepare time — their survivor sets are data, not plan shape. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              spec: PipelineSpec, audit: Boolean = false): PipelineResult = {
    // scope the degradation collector to THIS run: the global registry is
    // JVM-cumulative, so a before/after diff would attribute a concurrent
    // run's hot buckets (the streaming twin makes that real) to this one;
    // the thread-local scope captures only what this prepare() drove
    val ((finalDf, finalStages), hbScoped) = Dedup.withHotBucketScope {
    val obs = scala.collection.mutable.ArrayBuffer[(String, Observation)]()
    // Materialize the survivor stream before every TWO-PASS stage (one
    // that derives a gate relation FROM `cur` and then applies it back:
    // url dedup, classifier/LM gates, adaptive percentile, boilerplate
    // strip, near-dedup, decontamination). Without this each such stage
    // duplicates the whole upstream plan — k chained gates re-execute
    // the input scan and every earlier stage O(k^2) times (q139's single
    // plan carried 75 broadcast joins / 49 exchanges of which ~10 were
    // de-duplicated by exchange reuse; guide §3.3 "materialising an
    // intermediate truncates the plan"). persist() is lazy — single-pass
    // pipelines (q104's lang/quality/dedup/mixture/shard chain) never
    // cache anything — and MEMORY_AND_DISK spills rather than OOMs at
    // scale; the blocks are released by the ContextCleaner when the
    // result frame is dropped, like every other operator-internal
    // persist. Caching beats recompute here BECAUSE the upstream is a
    // whole curation chain, not a bare scan — the dupNgramSpans
    // re-scan-don't-persist argument does not transfer.
    def twoPassInput(df: DataFrame): DataFrame = df.persist()
    def checkpoint(df: DataFrame, stage: String): DataFrame =
      if (!audit) df
      else {
        val o = Observation(s"pipeline_$stage")
        obs += stage -> o
        // rows AND whitespace tokens in the same metrics node: the audit
        // stays one pass however many denominations it reports
        df.observe(o, count(lit(1)).as("rows"),
          coalesce(sum(TextAnalysis.wsTokenCount(col(textCol)).cast("long")),
            lit(0L)).as("tokens"))
      }

    var cur = checkpoint(docs.where(col(textCol).isNotNull), "input")

    spec.urlDedupCol.foreach { u =>
      cur = twoPassInput(cur)
      val keep = Dedup
        .dedupByUrl(cur.select(col(idCol), col(u), col(textCol)), u, idCol, textCol)
        .select(col(idCol))
      // null-URL rows carry no URL evidence: they PASS THROUGH rather
      // than silently vanishing from the semi-join
      cur = checkpoint(
        cur.where(col(u).isNull)
          .unionByName(cur.where(col(u).isNotNull)
            .join(keep, Seq(idCol), "left_semi")), "url_dedup")
    }

    if (spec.langAllow.nonEmpty)
      cur = checkpoint(
        cur.where(col(spec.langCol).isin(spec.langAllow.toSeq.sorted: _*)),
        "lang")

    if (spec.minQuality > 0.0)
      cur = checkpoint(cur.where(
        round(TextAnalysis.qualityScore(col(textCol)), 6) >= spec.minQuality),
        "quality")

    spec.qualityModel.foreach { m =>
      cur = twoPassInput(cur)
      // compared ROUNDED to 1e-6, the minQuality stance: a float ulp at
      // the threshold can never flip membership between engines/replays
      val passing = QualityClassifier
        .score(cur.select(col(idCol), col(textCol)), m, idCol, textCol)
        .where(round(col("score"), 6) >= spec.minClassifierScore)
        .select(col(idCol))
      cur = checkpoint(cur.join(passing, Seq(idCol), "left_semi"), "classifier")
    }

    spec.lmModel.foreach { lm =>
      cur = twoPassInput(cur)
      val passing = NgramLm
        .crossEntropy(cur.select(col(idCol), col(textCol)), lm, idCol, textCol)
        .where(round(col("ppl"), 6) <= spec.maxPerplexity)
        .select(col(idCol))
      cur = checkpoint(cur.join(passing, Seq(idCol), "left_semi"), "lm_quality")
    }

    spec.adaptiveQualityKeep.foreach { keep =>
      cur = twoPassInput(cur)
      val scored = cur.withColumn("_q",
        round(TextAnalysis.qualityScore(col(textCol)), 6))
      cur = checkpoint(
        Sampling.percentileGate(scored, spec.langCol, "_q", keep).drop("_q"),
        "adaptive_quality")
    }

    if (spec.maxDupLineFrac < 1.0 || spec.maxDupTrigramFrac < 1.0)
      cur = checkpoint(cur.where(
        round(TextAnalysis.dupLineFrac(col(textCol)), 6) <= spec.maxDupLineFrac &&
          round(TextAnalysis.dupTrigramFrac(col(textCol)), 6) <= spec.maxDupTrigramFrac),
        "repetition")

    if (spec.redactPii)
      cur = cur.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))

    spec.stripBoilerplateMinDocs.foreach { m =>
      cur = twoPassInput(cur)
      val cleaned = Dedup
        .stripBoilerplate(cur.select(col(idCol), col(textCol)), idCol, textCol, m)
        .withColumnRenamed(textCol, "_cleaned")
      val cols = cur.columns.toSeq
      cur = checkpoint(
        cur.drop(textCol).join(cleaned, Seq(idCol))
          .select(cols.map(c =>
            if (c == textCol) col("_cleaned").as(textCol) else col(c)): _*)
          .where(trim(col(textCol)) =!= ""), "boilerplate")
    }

    if (spec.exactDedup) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(TextAnalysis.fingerprint(col(textCol)))
      cur = checkpoint(
        cur.withColumn("_keep", min(col(idCol)).over(w) === col(idCol))
          .where(col("_keep")).drop("_keep"),
        "exact_dedup")
    }

    spec.nearDupIndexDir match {
      case Some(dir) =>
        cur = checkpoint(
          Dedup.dedupAgainstIndex(cur, idCol, textCol, dir,
            spec.nearDupThreshold.getOrElse(0.5)), "near_dedup_index")
      case None =>
        spec.nearDupThreshold.foreach { t =>
          cur = twoPassInput(cur)
          val clusters = Dedup.duplicateClusters(
            Dedup.minhashLsh(cur, idCol, textCol, threshold = t))
          cur = checkpoint(
            Dedup.dropDuplicatesByCluster(cur, clusters, idCol), "near_dedup")
        }
    }

    spec.decontaminateAgainst.foreach { eval =>
      cur = twoPassInput(cur)
      val contaminated = Dedup.decontaminate(
          cur.select(col(idCol), col(textCol)), eval, idCol, textCol)
        .select(col("train_id").as(idCol)).distinct()
      cur = checkpoint(
        cur.join(contaminated, Seq(idCol), "left_anti"), "decontaminate")
    }

    if (spec.mixtureRates.nonEmpty || spec.mixtureDefaultRate < 1.0)
      cur = checkpoint(
        Sampling.stratifiedSample(cur, spec.mixtureGroupCol, idCol,
          spec.mixtureRates, spec.mixtureDefaultRate),
        "mixture")

    spec.tokenBudgetPerGroup.foreach { b =>
      val weighted = cur.withColumn("_wtok",
        TextAnalysis.wsTokenCount(col(textCol)).cast("long"))
      cur = checkpoint(
        Sampling.budgetSample(weighted, spec.mixtureGroupCol, idCol, "_wtok", b)
          .drop("_wtok"), "token_budget")
    }

    if (spec.numShards > 0)
      cur = Sampling.shuffleShards(cur, idCol, spec.numShards)

    (cur, obs.toSeq)
    }
    new PipelineResult(finalDf, finalStages,
      hbScoped.filter { case (_, s) => s.buckets > 0L })
  }

  /** Write a prepared corpus (a [[prepare]] result with shards assigned)
    * as the training-export layout: one parquet directory per shard
    * (`outDir/shard=K/`), rows inside each shard written in their
    * deterministic shuffle order — the layout a training loader streams
    * sequentially, shard-parallel across readers. Crash-safe swap
    * (Collections.swapWrite). */
  def writeShards(prepared: DataFrame, outDir: String,
                  format: String = "parquet"): Unit = {
    require(prepared.columns.contains("shard") && prepared.columns.contains("seq"),
      "writeShards needs a prepare() result with numShards > 0")
    // format "json" writes JSONL (one object per line, the interchange
    // shape most training loaders read) with the same shard dirs,
    // in-file shuffle order, and crash-safe swap as parquet
    graft.sources.Collections.swapWrite(
      prepared.repartition(col("shard"))
        .sortWithinPartitions(col("shard"), col("seq")),
      outDir, partitionCols = Seq("shard"), format = format)
  }
}
