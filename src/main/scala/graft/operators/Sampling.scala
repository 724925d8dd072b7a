package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling for data-mixture construction: down-weighting
  * over-represented domains/languages and drawing fixed-size per-group
  * subsets, reproducibly — rerunning the pipeline (or re-reading a lost
  * partition) must select the SAME rows, so nothing here uses `rand()`.
  *
  * Randomness comes from a 32-bit md5 hash of the row id's string form.
  * Selection is a comparison of that hash against a precomputed integer
  * threshold — no floating-point on the hot path and bit-identical results
  * in any engine that can evaluate md5 (the DuckDB oracles inline the same
  * thresholds).
  *
  * Scale shapes:
  *  - [[stratifiedSample]] is a pure per-row filter: zero shuffles, maps
  *    over the scan, trivially parallel at any corpus size.
  *  - [[quotaSample]] is one exchange keyed by group + a per-group sort.
  *    For few huge groups (the usual mixture shape: billions of rows,
  *    dozens of domains) pass `prefilterRate` to cut the sorted volume
  *    first: a hash-threshold prefilter keeps exactly the LOWEST-hash rows,
  *    and the quota winners ARE the lowest-hash rows, so the composition is
  *    exact — identical output, not approximate — whenever each group
  *    retains at least min(quota, |group|) survivors. Choose the rate with
  *    margin (e.g. 8 x quota / |group|); SamplingSpec asserts the
  *    equivalence.
  */
object Sampling {

  /** Uniform 32-bit hash of the id's string form (engine-portable: DuckDB
    * computes the identical value as
    * `('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT`). */
  def hash32(idCol: Column): Column =
    TextAnalysis.md5Hash32(idCol.cast("string"))

  /** Integer selection threshold for a keep-rate in [0, 1]: a row is kept
    * iff hash32 < threshold(rate). Exposed so SQL oracles can inline the
    * exact same literal. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    (rate * 4294967296.0).toLong
  }

  /** Deterministic per-group Bernoulli sampling: keep a row iff its id
    * hash clears the group's rate threshold. Groups absent from `rates`
    * use `defaultRate`. A group's sample at rate r is a SUBSET of its
    * sample at any r' > r (nested samples — raising a domain's weight
    * only adds rows, it never reshuffles the ones already selected). */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (k, r)) => when(col(groupCol) === lit(k), lit(threshold(r))).otherwise(acc)
    }
    df.where(hash32(col(idCol)) < thr)
  }

  /** Deterministic per-group BUDGET sampling: take rows in (hash, id)
    * order until the group's cumulative weight (token count, byte size)
    * reaches `budget` — data mixtures are specified in tokens, not doc
    * counts, and this is the greedy draw that fills each domain's token
    * budget reproducibly. The row that crosses the budget is kept
    * (overflow-allowed greedy: every group with any rows contributes at
    * least one). Same shuffle shape as [[quotaSample]] (one exchange by
    * group + per-group sort), and the same exact hash-threshold prefilter
    * applies when a group's total weight dwarfs its budget. */
  def budgetSample(df: DataFrame, groupCol: String, idCol: String,
                   weightCol: String, budget: Long,
                   prefilterRate: Double = 1.0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val pre =
      if (prefilterRate >= 1.0) df
      else df.where(hash32(col(idCol)) < lit(threshold(prefilterRate)))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hash32(col(idCol)).asc, col(idCol).asc)
    pre.withColumn("_cum", sum(col(weightCol)).over(w))
      .where(col("_cum") - col(weightCol) < budget)
      .drop("_cum")
  }

  /** Deterministic fixed-size per-group subset: the `quota` rows with the
    * smallest (hash, id) per group — a reproducible "random" draw whose
    * size is exact (min(quota, |group|) rows per group).
    *
    * `prefilterRate` < 1 inserts the exact hash-threshold prefilter
    * described in the object doc before the window sort. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
                  quota: Int, prefilterRate: Double = 1.0): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    val pre =
      if (prefilterRate >= 1.0) df
      else df.where(hash32(col(idCol)) < lit(threshold(prefilterRate)))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hash32(col(idCol)).asc, col(idCol).asc)
    pre.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= quota)
      .drop("_rn")
  }

  /** Temperature-balanced mixture sampling, the multilingual-pretraining
    * rebalance (XLM-R-style, temperature fixed at tau = 0.5): group g is
    * kept at rate sqrt(N_min / N_g), so post-sample sizes are
    * proportional to sqrt(N_g) — heavy domains are damped, the smallest
    * group is kept whole. Rates are DERIVED FROM THE DATA (one count
    * aggregate), then applied as the same zero-shuffle hash-threshold
    * filter as [[stratifiedSample]].
    *
    * tau is fixed at 0.5 deliberately: sqrt and division are correctly-
    * rounded IEEE ops (identical in every engine), while pow() is libm-
    * dependent — an arbitrary-tau rate could differ in the last ulp
    * across engines and flip a row at the threshold. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val nmin = counts.agg(min(col("_n")).as("_nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col(groupCol),
        sqrt(col("_nmin").cast("double") / col("_n")).as("_rate"))
    df.join(broadcast(rates), groupCol)
      .where(hash32(col(idCol)).cast("double") < col("_rate") * 4294967296.0)
      .drop("_rate")
  }

  // ------------------------------------------------------ corpus assembly

  /** Deterministic corpus shuffle + sharding — the pre-training export
    * step ("globally shuffle the corpus, split into N shard files") made
    * reproducible: `shard = hash32(id) % numShards`, `seq` = rank of
    * (hash, id) within the shard, 0-based. Re-running (or recomputing a
    * lost partition) assigns identical positions, unlike `rand()`-based
    * shuffles.
    *
    * Scale shape: one exchange keyed by shard + a per-shard sort; shards
    * sort independently, so the layout holds at any corpus size. Writing
    * with `partitionBy("shard")` aligns the file layout with the
    * assignment. */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int): DataFrame =
    shuffleShards(df, idCol, numShards, epoch = 0L)

  /** [[shuffleShards]] with an epoch salt: epoch e permutes both shard
    * assignment and in-shard order by hashing (id, e) instead of id —
    * each training epoch gets a fresh deterministic global shuffle
    * WITHOUT rewriting any data (re-derive the layout, stream in the new
    * order). Epoch 0 hashes the bare id, so existing layouts (q79/q80)
    * are byte-identical. */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
                    epoch: Long): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    require(epoch >= 0, s"epoch must be non-negative: $epoch")
    val salted =
      if (epoch == 0L) hash32(col(idCol))
      else hash32(concat(col(idCol).cast("string"), lit(s"#epoch$epoch")))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", salted)
      .withColumn("shard", (col("_h") % numShards).cast("int"))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
  }

  /** Concat-and-chunk sequence packing — the standard LLM pre-training
    * batcher: lay documents out in deterministic shuffle order,
    * concatenate, cut every `seqLen` tokens. Documents crossing a cut are
    * split across training sequences, exactly what the packed-batch
    * loader does, so what matters is each document's absolute token span:
    * this emits `first_seq`/`last_seq`/`offset_in_seq` per document.
    *
    * Packing is PER SHARD (as real pipelines pack per output file), so
    * the running token sum is a per-shard window — never a global
    * single-partition pass. Integer `div`/`%` only: no floating point
    * anywhere, bit-identical across engines. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    numShards: Int, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val w = Window.partitionBy(col("shard")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shuffleShards(df, idCol, numShards)
      .withColumn("_cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("start_tok", col("_cum") - col(tokenCol))
      .withColumn("first_seq", expr(s"start_tok div $seqLen"))
      .withColumn("last_seq", expr(s"(_cum - 1) div $seqLen"))
      .withColumn("offset_in_seq", col("start_tok") % seqLen)
      .drop("_cum")
  }

  /** Exact per-group nearest-rank percentiles: the value at rank
    * `ceil(q * n)` in value order. No interpolation — the result is an
    * actual data value picked by integer rank, so it is bit-identical in
    * any engine (interpolating percentile definitions differ subtly
    * between engines and on float summation order).
    *
    * One exchange keyed by group + per-group sort; each quantile is a
    * rank filter over the same sorted pass, so asking for 10 quantiles
    * costs the same shuffle as asking for one. */
  def percentilesDisc(df: DataFrame, groupCol: String, valueCol: String,
                      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: $qs")
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol))
    df.select(col(groupCol), col(valueCol))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
      // internal name: a quantile column literally called "q" CAPTURES a
      // value column of the same name (withColumn replaces it) and the
      // emitted "value" becomes the quantile literal — rename at the end
      .withColumn("_pq", explode(array(qs.map(lit): _*)))
      .where(col("_rn") === ceil(col("_pq") * col("_n")))
      .select(col(groupCol), col("_pq").as("q"), col(valueCol).as("value"))
  }

  /** Adaptive per-group floor: keep each group's top `keepFraction` of
    * rows by `valueCol`, cutting at the group's exact nearest-rank
    * (1-keepFraction) quantile. Values >= the cut stay, so ties at the
    * cut keep slightly MORE than the fraction — never less. This is the
    * FineWeb-style adaptive quality gate: a fixed global floor
    * over-filters whole groups whose score distribution sits lower (low-
    * resource languages); a per-group percentile adapts the cut to each
    * group's own distribution. One sorted pass per group for the cut
    * ([[percentilesDisc]]); the per-group cut relation is
    * group-cardinality-sized and broadcasts back onto the row stream. */
  def percentileGate(df: DataFrame, groupCol: String, valueCol: String,
                     keepFraction: Double): DataFrame = {
    require(keepFraction > 0.0 && keepFraction < 1.0,
      s"keepFraction must be in (0, 1): $keepFraction")
    // null group keys form their OWN group rather than silently vanishing
    // (a plain equi-join never matches null): coalesce the key to a
    // sentinel on both sides of the threshold join, so e.g. docs with no
    // language tag are gated against their own distribution instead of
    // dropped. The sentinel (a NUL-containing string) cannot collide with
    // any realistic group value.
    val sentinel = "\u0000<null-group>"
    val keyed = df.withColumn("_g",
      coalesce(col(groupCol).cast("string"), lit(sentinel)))
    val thr = percentilesDisc(keyed, "_g", valueCol, Seq(1.0 - keepFraction))
      .select(col("_g"), col("value").as("_thr"))
    keyed.join(broadcast(thr), "_g")
      .where(col(valueCol) >= col("_thr"))
      .drop("_g", "_thr")
  }

  /** One-pass approximate twin of [[percentileGate]] — the 100 TB path
    * when even a per-group sorted pass is the bottleneck. The cut comes
    * from Spark's mergeable `approx_percentile` sketch (Greenwald-Khanna:
    * map-side partial sketches merge associatively), so the whole gate is
    * ONE hash aggregation plus a broadcast join back onto the row stream —
    * no Window, no per-group sort, no rank numbering of the full corpus.
    *
    * `accuracy` bounds the rank error at ~1/accuracy of the group size;
    * groups smaller than `accuracy` are retained whole by the sketch, so
    * the cut VALUE is then exact (the kept set can still differ from
    * [[percentileGate]] by at most the one rank where the two percentile
    * definitions disagree — nearest-rank ceil vs the sketch's smallest-
    * value-at-or-above-rank). Use the exact gate when reproducibility of
    * the precise membership matters (it is the oracle-checked one); use
    * this when the corpus is large enough that a ~1e-4 rank slop on the
    * cut is invisible but a global sort is not. Null group keys form
    * their own group, like the exact gate. */
  def percentileGateApprox(df: DataFrame, groupCol: String, valueCol: String,
                           keepFraction: Double,
                           accuracy: Int = 10000): DataFrame = {
    require(keepFraction > 0.0 && keepFraction < 1.0,
      s"keepFraction must be in (0, 1): $keepFraction")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val sentinel = "\u0000<null-group>"
    val keyed = df.withColumn("_g",
      coalesce(col(groupCol).cast("string"), lit(sentinel)))
    val thr = keyed.groupBy("_g").agg(
      percentile_approx(col(valueCol), lit(1.0 - keepFraction),
        lit(accuracy)).as("_thr"))
    keyed.join(broadcast(thr), "_g")
      .where(col(valueCol) >= col("_thr"))
      .drop("_g", "_thr")
  }

  /** Robust per-group outlier detection via median/MAD: flag rows with
    * |x - median| > k·MAD (median absolute deviation). Both medians are
    * nearest-rank picks ([[percentilesDisc]]), so on integer columns the
    * whole predicate is integer-exact except the final k· comparison —
    * no mean/stddev float accumulation, and robust to the very outliers
    * being hunted (the classic advantage over z-scores). Two group-keyed
    * sorted passes; the tiny per-group (median, MAD) relations broadcast
    * back onto the row stream. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String, k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val med = percentilesDisc(df, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol), col("value").as("_med"))
    val dev = df.select(col(groupCol), col(idCol), col(valueCol))
      .join(broadcast(med), groupCol)
      .withColumn("_dev", abs(col(valueCol) - col("_med")))
    val mad = percentilesDisc(dev, groupCol, "_dev", Seq(0.5))
      .select(col(groupCol), col("value").as("_mad"))
    dev.join(broadcast(mad), groupCol)
      .where(col("_dev") > lit(k) * col("_mad"))
      .select(col(groupCol), col(idCol), col(valueCol),
        col("_med").as("median"), col("_mad").as("mad"))
  }

  /** Per-group distribution drift: KL(P_group || P_corpus) over a term
    * column — the mixture-monitoring metric ("which source's token
    * distribution diverges most from the blend?") that guards a training
    * mix against a source going off-distribution between snapshots.
    *
    * Input is the exploded (group, term) stream. Scale shape: one
    * map-side-combined count keyed by (group, term); corpus term totals
    * aggregate from THOSE counts (|groups| x |vocab| pairs, never the raw
    * stream) and stay partitioned by term for a co-partitioned join back;
    * group totals and the grand total are tiny and broadcast. The raw
    * stream is read exactly once.
    *
    * Returns (group, kl) with kl unrounded; KL >= 0, and 0 iff the group
    * matches the corpus distribution exactly. Every group term appears in
    * the corpus by construction, so q > 0 and the log is always finite. */
  def klDivergence(df: DataFrame, groupCol: String, termCol: String): DataFrame = {
    // Materialized once: g, t and n all derive from c, and without the
    // persist each would re-scan and re-count the raw stream (Catalyst
    // does not reuse the exchange across the three aggregates — the
    // join-side null filters make the subtrees non-canonical).
    val c = df.groupBy(col(groupCol), col(termCol)).agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = c.groupBy(col(groupCol)).agg(sum(col("_c")).as("_ng"))
    val t = c.groupBy(col(termCol)).agg(sum(col("_c")).as("_ct"))
    val n = g.agg(sum(col("_ng")).as("_n"))
    c.join(t, termCol)
      .join(broadcast(g), groupCol)
      .crossJoin(broadcast(n))
      .groupBy(col(groupCol))
      .agg(sum(
        (col("_c") / col("_ng")) *
          log((col("_c") / col("_ng")) / (col("_ct") / col("_n")))
      ).as("kl"))
  }

  /** EXACT frequency heavy hitters without a vocabulary-wide shuffle.
    *
    * Pass 1 folds the value stream into a Count-Min sketch (Cormode &
    * Muthukrishnan '05) — merged per partition, so the driver receives one
    * `O(1/eps)`-sized array, never the counts. Pass 2 re-scans, keeps only
    * rows whose sketch estimate clears `minCount` (a broadcast probe,
    * map-side, zero shuffle), and exact-counts the survivors. CMS only
    * ever OVER-estimates, so every true heavy hitter survives the
    * prefilter — the candidate set is a provable superset and the final
    * `HAVING cnt >= minCount` makes the composition exact, not
    * approximate.
    *
    * Scale shape: the naive `GROUP BY value HAVING count >= T` shuffles
    * the full keyspace — for web-corpus tokens/n-grams that is a
    * billions-of-keys exchange dominated by the long tail that the HAVING
    * then throws away. Here the exchange carries only candidate rows
    * (map-side combine collapses them to one partial per candidate per
    * partition); tail keys never leave the scan. Two scans beat one
    * vocabulary-sized shuffle at any real corpus size. */
  def heavyHitters(df: DataFrame, valueCol: String, minCount: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame =
    heavyHitters(df, valueCol,
      frequencySketch(df, valueCol, eps, confidence, seed), minCount)

  /** One-pass Count-Min sketch of a column — the reusable artifact behind
    * [[heavyHitters]]. Build once per corpus snapshot (its `totalCount`
    * doubles as the stream length, so relative thresholds like "0.2% of
    * token mass" need no extra counting pass), then answer many
    * heavy-hitter queries against it via the overload below. */
  def frequencySketch(df: DataFrame, valueCol: String, eps: Double = 1e-4,
                      confidence: Double = 0.99,
                      seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(valueCol, eps, confidence, seed)

  /** DSIR-style importance weights (Xie et al., NeurIPS '23 "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed-unigram bag is,
    * `logw(doc) = sum_tokens ln(p_target(bucket) / p_raw(bucket))`,
    * with add-one smoothing over `buckets` hash buckets. Selecting the
    * top-weight docs (or Gumbel-resampling on logw) yields a corpus
    * distributionally closer to the target — the standard cheap
    * quality-targeting step before training.
    *
    * Scale shape: tokens never shuffle as strings — each side folds to
    * per-bucket counts (map-side combined, `buckets`-sized output); the
    * bucket log-ratio relation is tiny and BROADCAST back onto the per-doc
    * bucket counts, so the raw corpus is read twice (once for the global
    * bucket LM, once for per-doc counts) and shuffled only as (doc, bucket)
    * partials. The hash is the engine-portable md5-32 ([[hash32]]).
    *
    * Returns (idCol, n_tokens, logw) per raw document with >= 1 token;
    * logw is unrounded (callers round for cross-engine compares). */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val toBuckets = (df: DataFrame) => df
      .select(col(idCol), explode(Bm25.tokenize(col(textCol))).as("_t"))
      .select(col(idCol), (TextAnalysis.md5Hash32(col("_t")) % buckets).as("_b"))
    val docB = toBuckets(raw).groupBy(col(idCol), col("_b"))
      .agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawCnt = docB.groupBy(col("_b")).agg(sum(col("_c")).as("_cr"))
    val tgtCnt = toBuckets(target).groupBy(col("_b")).agg(count(lit(1)).as("_ct"))
    val rawTot = rawCnt.agg(sum(col("_cr")).as("_tr"))
    val tgtTot = tgtCnt.agg(sum(col("_ct")).as("_tt"))
    // every raw bucket gets a ratio; target-absent buckets smooth to 1/(tt+B)
    val ratios = rawCnt.join(tgtCnt, Seq("_b"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("_b"),
        (log((coalesce(col("_ct"), lit(0L)) + lit(1.0)) / (col("_tt") + lit(buckets))) -
          log((col("_cr") + lit(1.0)) / (col("_tr") + lit(buckets)))).as("_lr"))
    docB.join(broadcast(ratios), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).cast("long").as("n_tokens"),
        sum(col("_c") * col("_lr")).as("logw"))
  }

  /** Deterministic stratified train/val/test assignment: split on
    * `hash32(stratum || ':' || id) % 100` so (a) membership is a pure
    * per-row map — zero shuffles, reproducible under re-runs and partition
    * recomputes, (b) proportions hold WITHIN each stratum (hashing the
    * stratum into the key decorrelates strata), and (c) an id's split never
    * changes when other rows arrive — the property rand()-splits lose.
    * `trainPct`/`valPct` are integer percents; the rest is test. */
  def assignSplits(df: DataFrame, idCol: String, strataCol: String,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percents: train=$trainPct val=$valPct")
    val h = hash32(concat(col(strataCol), lit(":"), col(idCol).cast("string"))) % 100
    df.withColumn("split",
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Curriculum export order: rank documents within each group (source,
    * domain) by ascending difficulty, then interleave groups round-robin —
    * position `ord = (rank - 1) * n_groups + group_index`, so training
    * consumes easy documents first while every batch stays source-mixed.
    *
    * The position is COMPUTED, not sorted-for: per-group rank is a window
    * keyed by the group (parallel across groups), and the group index
    * comes from a tiny broadcast relation — there is no global sort or
    * single-partition window anywhere, so the order assignment scales to
    * any corpus size (write with `sortWithinPartitions(ord)` after a range
    * repartition to materialize). `ord` has gaps once short groups
    * exhaust; consumers stream in ord order, so gaps are harmless. */
  def curriculumInterleave(df: DataFrame, idCol: String, groupCol: String,
                           difficultyCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(difficultyCol), col(idCol))
    val groups = df.select(col(groupCol)).distinct()
      .withColumn("_gi", row_number().over(
        Window.orderBy(col(groupCol))).cast("long"))
    val n = groups.agg(count(lit(1)).as("_ng"))
    df.withColumn("_rn", row_number().over(w))
      .join(broadcast(groups), Seq(groupCol))
      .crossJoin(broadcast(n))
      .withColumn("ord", (col("_rn") - 1).cast("long") * col("_ng") + col("_gi"))
      .drop("_rn", "_gi", "_ng")
  }

  /** [[heavyHitters]] against a prebuilt sketch: one scan — broadcast
    * probe prefilter, then the exact candidate-only count. */
  def heavyHitters(df: DataFrame, valueCol: String,
                   sketch: org.apache.spark.util.sketch.CountMinSketch,
                   minCount: Long): DataFrame = {
    require(minCount > 0, s"minCount must be positive: $minCount")
    val bc = df.sparkSession.sparkContext.broadcast(sketch)
    val estimate = udf { (v: String) =>
      if (v == null) 0L else bc.value.estimateCount(v)
    }
    df.where(estimate(col(valueCol)) >= minCount)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }
}
