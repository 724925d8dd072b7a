package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (0L until 2000L)
    .map(i => (i, s"g${i % 4}"))
    .toDF("id", "grp")

  test("stratified sampling is deterministic and respects rate extremes") {
    val rates = Map("g0" -> 0.0, "g1" -> 1.0, "g2" -> 0.5)
    val a = Sampling.stratifiedSample(rows, "grp", "id", rates, defaultRate = 0.25)
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.stratifiedSample(rows, "grp", "id", rates, defaultRate = 0.25)
      .collect().map(_.getLong(0)).sorted
    assert(a sameElements b)
    val byGrp = Sampling.stratifiedSample(rows, "grp", "id", rates, defaultRate = 0.25)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byGrp.contains("g0"))          // rate 0: nothing survives
    assert(byGrp("g1") === 500L)           // rate 1: everything survives
    assert(byGrp("g2") > 150L && byGrp("g2") < 350L)  // ~0.5 of 500
    assert(byGrp("g3") > 50L && byGrp("g3") < 200L)   // default ~0.25 of 500
  }

  test("samples are nested: raising a rate only adds rows") {
    def ids(rate: Double) =
      Sampling.stratifiedSample(rows, "grp", "id", Map.empty, defaultRate = rate)
        .collect().map(_.getLong(0)).toSet
    val s30 = ids(0.3)
    val s60 = ids(0.6)
    assert(s30.subsetOf(s60))
    assert(s60.size > s30.size)
  }

  test("quota sampling draws exactly min(quota, group size) per group") {
    val skewed = rows.where(col("grp") =!= "g3")
      .unionByName(Seq((9001L, "g3"), (9002L, "g3")).toDF("id", "grp"))
    val counts = Sampling.quotaSample(skewed, "grp", "id", quota = 7)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("g0") === 7L)
    assert(counts("g1") === 7L)
    assert(counts("g2") === 7L)
    assert(counts("g3") === 2L)            // group smaller than the quota
  }

  test("budget sampling fills each group's weight budget greedily in hash order") {
    val weighted = rows.withColumn("w", lit(10L) + (col("id") % 5))
    val got = Sampling.budgetSample(weighted, "grp", "id", "w", budget = 100L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val byGrp = got.groupBy(_._1)
    // every group contributes; each group's weight sum crosses 100 only via
    // its LAST row (greedy overflow-allowed), so sum-minus-any-row < 100+max
    byGrp.foreach { case (g, rs) =>
      val total = rs.map(_._3).sum
      assert(total >= 100L, s"group $g under budget: $total")
      assert(total - rs.map(_._3).max < 100L, s"group $g kept a row past the budget")
    }
    // deterministic: second run identical
    val again = Sampling.budgetSample(weighted, "grp", "id", "w", budget = 100L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(got.sorted.toSeq === again.sorted.toSeq)
    // a budget larger than the group total keeps everything
    val all = Sampling.budgetSample(weighted, "grp", "id", "w", budget = 1000000L)
    assert(all.count() === weighted.count())
  }

  test("hash-threshold prefilter leaves the quota draw exactly unchanged") {
    val full = Sampling.quotaSample(rows, "grp", "id", quota = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val pre = Sampling.quotaSample(rows, "grp", "id", quota = 5, prefilterRate = 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pre === full)
  }

  test("shuffleShards: partition of the corpus, dense 0-based seq, deterministic") {
    val s = Sampling.shuffleShards(rows, "id", numShards = 4)
      .select(col("id"), col("shard"), col("seq")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(s.length == rows.count())                     // every row placed once
    assert(s.map(_._2).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    s.groupBy(_._2).foreach { case (_, rs) =>            // seq dense per shard
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq)
    }
    val again = Sampling.shuffleShards(rows, "id", numShards = 4)
      .select(col("id"), col("shard"), col("seq")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(s.sorted.toSeq == again.sorted.toSeq)

    // epoch salt: epoch 0 IS the legacy layout; a later epoch is a fresh
    // deterministic permutation of the same corpus (same membership,
    // dense seqs, different placements) with no data rewrite
    val e0 = Sampling.shuffleShards(rows, "id", numShards = 4, epoch = 0L)
      .select(col("id"), col("shard"), col("seq")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(e0.sorted.toSeq == s.sorted.toSeq)
    val e1 = Sampling.shuffleShards(rows, "id", numShards = 4, epoch = 1L)
      .select(col("id"), col("shard"), col("seq")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(e1.map(_._1).sorted.toSeq == s.map(_._1).sorted.toSeq)
    e1.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq)
    }
    assert(e1.sorted.toSeq != s.sorted.toSeq)
    val e1again = Sampling.shuffleShards(rows, "id", numShards = 4, epoch = 1L)
      .select(col("id"), col("shard"), col("seq")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(e1.sorted.toSeq == e1again.sorted.toSeq)
  }

  test("packSequences: contiguous token spans per shard, correct seq cuts") {
    val weighted = rows.withColumn("w", lit(10L) + (col("id") % 7))
    val p = Sampling.packSequences(weighted, "id", "w", numShards = 2, seqLen = 64)
      .select(col("shard"), col("seq"), col("w"), col("start_tok"),
        col("first_seq"), col("last_seq"), col("offset_in_seq")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    p.groupBy(_._1).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_._2)
      // spans tile the shard's token stream with no gaps or overlaps
      inOrder.foldLeft(0L) { case (expectedStart, (_, _, w, start, fs, ls, off)) =>
        assert(start == expectedStart)
        assert(fs == start / 64 && off == start % 64)
        assert(ls == (start + w - 1) / 64)
        start + w
      }
    }
  }

  test("madOutliers flags only |x - median| > k*MAD") {
    // group g: values 1..9 plus outlier 100 -> median 5 (10 values,
    // ceil(0.5*10)=5th), deviations {0..4, 95} sorted {0,1,1,2,2,3,3,4,4,95}
    // -> MAD 2; k=3 flags |x-5| > 6: only 100
    val df = ((1L to 9L) :+ 100L).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("grp", "id", "v")
    val out = Sampling.madOutliers(df, "grp", "v", "id", k = 3.0).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("v") === 100L)
    assert(out.head.getAs[Long]("median") === 5L)
    assert(out.head.getAs[Long]("mad") === 2L)
  }

  test("temperatureSample keeps the smallest group whole, damps the big one") {
    // groups: small = 100 rows, big = 1600 rows -> rates 1.0 and 0.25
    val df = ((0L until 100L).map(i => ("small", i)) ++
      (100L until 1700L).map(i => ("big", i))).toDF("grp", "id")
    val got = Sampling.temperatureSample(df, "grp", "id")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("small") === 100L)                   // rate 1.0: everything
    assert(got("big") > 250 && got("big") < 550,    // rate sqrt(1/16)=0.25
      s"expected ~400 of 1600 at rate 0.25, got ${got("big")}")
    // deterministic
    val again = Sampling.temperatureSample(df, "grp", "id")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("percentilesDisc picks exact nearest-rank values") {
    val df = (1 to 100).map(i => (if (i <= 40) "a" else "b", i.toLong))
      .toDF("grp", "v")
    val r = Sampling.percentilesDisc(df, "grp", "v", qs = Seq(0.25, 0.5, 1.0))
      .collect().map(x => (x.getString(0), x.getDouble(1)) -> x.getLong(2)).toMap
    // group a = 1..40: ceil(.25*40)=10th -> 10; ceil(.5*40)=20th -> 20; max 40
    assert(r(("a", 0.25)) == 10L && r(("a", 0.5)) == 20L && r(("a", 1.0)) == 40L)
    // group b = 41..100 (n=60): ceil(15)=15th -> 55; 30th -> 70; max 100
    assert(r(("b", 0.25)) == 55L && r(("b", 0.5)) == 70L && r(("b", 1.0)) == 100L)
  }

  test("percentileGate keeps each group's top fraction, ties at the cut stay") {
    // group a: 1..10 — 40th pct cut = 4, keep v >= 4 -> 7 rows (70%... the
    // exact nearest-rank semantics: keep-fraction is a floor, never less)
    // group b: constant value — cut == the value, EVERY row survives
    val df = ((1 to 10).map(i => ("a", i.toLong)) ++
      (1 to 5).map(_ => ("b", 7L))).toDF("grp", "v")
    val kept = Sampling.percentileGate(df, "grp", "v", keepFraction = 0.6)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(kept.count(_._1 == "a") === 7)
    assert(kept.filter(_._1 == "a").map(_._2).toSet === (4L to 10L).toSet)
    assert(kept.count(_._1 == "b") === 5) // all tied at the cut
    // each group's cut adapts: a global 60% floor would behave differently
    val onlyTop = Sampling.percentileGate(df, "grp", "v", keepFraction = 0.2)
      .collect().filter(_.getString(0) == "a").map(_.getLong(1)).toSet
    assert(onlyTop === Set(8L, 9L, 10L)) // cut at ceil(0.8*10)=8th value
  }

  test("klDivergence matches the hand-computed value; 0 for a corpus-shaped group") {
    // group A: 30xx 10xy | group B: 10xx 30xy -> corpus: 40/40.
    // Both groups: KL = .75*ln(.75/.5) + .25*ln(.25/.5)
    val df = (Seq.fill(30)(("A", "x")) ++ Seq.fill(10)(("A", "y")) ++
      Seq.fill(10)(("B", "x")) ++ Seq.fill(30)(("B", "y")))
      .toDF("grp", "term")
    val kl = Sampling.klDivergence(df, "grp", "term")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expected = 0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5)
    assert(math.abs(kl("A") - expected) < 1e-12)
    assert(math.abs(kl("B") - expected) < 1e-12)
    // a group distributed exactly like the corpus has zero divergence
    val uniform = (Seq.fill(6)(("A", "x")) ++ Seq.fill(2)(("A", "y")) ++
      Seq.fill(3)(("B", "x")) ++ Seq.fill(1)(("B", "y")))
      .toDF("grp", "term")
    val kl2 = Sampling.klDivergence(uniform, "grp", "term")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(kl2("A")) < 1e-12 && math.abs(kl2("B")) < 1e-12)
  }

  test("heavyHitters is exactly the groupBy-HAVING answer on a skewed stream") {
    // Zipf-ish: token k appears ~3000/k times; long tail of singletons.
    val values = (1 to 30).flatMap(k => Seq.fill(3000 / k)(s"tok$k")) ++
      (0 until 5000).map(i => s"tail$i")
    val df = values.toDF("v")
    for (minCount <- Seq(1000L, 300L, 101L)) {
      val got = Sampling.heavyHitters(df, "v", minCount)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = df.groupBy("v").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= minCount)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"mismatch at minCount=$minCount")
      assert(got.nonEmpty)
    }
    // a deliberately sloppy sketch still yields exact results — only the
    // candidate-set size (cost), never correctness, depends on eps
    val sloppy = Sampling.heavyHitters(df, "v", 300L, eps = 0.01, confidence = 0.9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("v").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 300L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sloppy === exact)
    // prebuilt sketch: totalCount is the exact stream length (so relative
    // thresholds need no separate count pass) and yields the same answer
    val sk = Sampling.frequencySketch(df, "v")
    assert(sk.totalCount() === values.size.toLong)
    val viaSketch = Sampling.heavyHitters(df, "v", sk, 300L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSketch === exact)
  }

  test("importanceWeights ranks target-like docs above off-target docs") {
    // target speaks {alpha..delta}; off-target docs speak {omega..}; a
    // mixed doc sits between. DSIR log-weights must order them.
    val tgtWords = Seq("alpha", "beta", "gamma", "delta")
    val offWords = Seq("omega", "psi", "chi", "phi")
    val mk = (id: Long, ws: Seq[String]) => (id, Seq.fill(12)(ws).flatten.mkString(" "))
    val raw = Seq(
      mk(1L, tgtWords), mk(2L, offWords),
      (3L, (Seq.fill(6)(tgtWords).flatten ++ Seq.fill(6)(offWords).flatten).mkString(" ")))
      .toDF("id", "text")
    val target = Seq(mk(10L, tgtWords), mk(11L, tgtWords)).toDF("id", "text")
    val w = Sampling.importanceWeights(raw, target, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L))
    // rerun is bit-identical (hash buckets, no rand())
    val w2 = Sampling.importanceWeights(raw, target, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w === w2)
  }

  test("assignSplits: per-stratum proportions, deterministic, exhaustive") {
    val docs = (0L until 3000L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val s = Sampling.assignSplits(docs, "id", "lang")
    assert(s.count() === 3000L)                       // pure map: no row loss
    val byStratum = s.groupBy("lang", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (l <- Seq("lang0", "lang1", "lang2")) {
      val tr = byStratum.getOrElse((l, "train"), 0L)
      assert(tr > 700L && tr < 900L, s"$l train=$tr")  // ~80% of 1000
      assert(byStratum.getOrElse((l, "val"), 0L) > 40L)
      assert(byStratum.getOrElse((l, "test"), 0L) > 40L)
    }
    // membership is stable under re-runs and unaffected by other rows
    val subset = Sampling.assignSplits(docs.where(col("id") < 100), "id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = s.where(col("id") < 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(subset === full)
  }

  test("curriculumInterleave: easy-first within groups, round-robin across") {
    val docs = (0L until 120L).map(i => (i, s"s${i % 4}", 1000L - i)).toDF("id", "src", "diff")
    val out = Sampling.curriculumInterleave(docs, "id", "src", "diff")
      .orderBy("ord").collect()
    assert(out.length === 120)
    // equal-size groups: ord is dense 1..120 and the first 4 positions
    // cover all 4 sources with each group's easiest doc
    assert(out.map(_.getAs[Long]("ord")).toSeq === (1L to 120L))
    val firstFour = out.take(4)
    assert(firstFour.map(_.getAs[String]("src")).toSet.size === 4)
    // within each source, difficulty is non-decreasing along ord
    for (src <- Seq("s0", "s1", "s2", "s3")) {
      val diffs = out.filter(_.getAs[String]("src") == src).map(_.getAs[Long]("diff")).toSeq
      assert(diffs === diffs.sorted, s"$src not easy-first")
    }
  }

  test("percentileGate gates null-group rows against their own distribution") {
    val df = Seq(
      ("e1", Some("en"), 1.0), ("e2", Some("en"), 2.0),
      ("e3", Some("en"), 3.0), ("e4", Some("en"), 4.0),
      ("n1", None, 10.0), ("n2", None, 11.0),
      ("n3", None, 12.0), ("n4", None, 13.0)
    ).toDF("id", "grp", "v")
    val kept = Sampling.percentileGate(df, "grp", "v", keepFraction = 0.5)
      .select("id").collect().map(_.getString(0)).toSet
    // nearest-rank cut at the 0.5 quantile of EACH group, including the
    // null group (previously its rows vanished in the equi-join)
    assert(kept === Set("e2", "e3", "e4", "n2", "n3", "n4"))
    // schema is unchanged (no helper columns leak)
    assert(Sampling.percentileGate(df, "grp", "v", 0.5).columns.toSeq ===
      Seq("id", "grp", "v"))
  }

  test("percentileGateApprox: one-pass cut matches the exact gate, no sort window") {
    val rows = for (g <- Seq("a", "b"); i <- 1 to 40)
      yield (s"$g$i", g, (if (g == "a") i else i * 3).toDouble)
    val df = rows.toDF("id", "grp", "v")
    val exact = Sampling.percentileGate(df, "grp", "v", keepFraction = 0.25)
      .select("id").collect().map(_.getString(0)).toSet
    val approx = Sampling.percentileGateApprox(df, "grp", "v", keepFraction = 0.25)
      .select("id").collect().map(_.getString(0)).toSet
    // groups far smaller than the sketch accuracy: the sketch retains all
    // values, and on this all-distinct fixture both percentile definitions
    // pick the same cut value — membership is identical
    assert(approx === exact)
    // 40 rows, keep 0.25: the cut is rank ceil(0.75*40)=30, and >=-cut
    // semantics keep values 30..40 — 11 rows (the documented "ties at the
    // cut keep slightly more, never less" stance)
    assert(approx.count(_.startsWith("a")) === 11)
    // null group keys survive, gated against their own distribution
    val withNull = df.unionByName(
      Seq(("n1", null, 1.0), ("n2", null, 2.0), ("n3", null, 3.0),
        ("n4", null, 4.0)).toDF("id", "grp", "v"))
    val keptNull = Sampling.percentileGateApprox(withNull, "grp", "v", 0.5)
      .where(col("grp").isNull).select("id").collect().map(_.getString(0)).toSet
    assert(keptNull === Set("n2", "n3", "n4"))
    // the scale claim: the approximate gate's plan has NO sort window —
    // the cut is one hash aggregation, the exact gate pays the sorted pass
    def planOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.toString
    assert(!planOf(Sampling.percentileGateApprox(df, "grp", "v", 0.25))
      .contains("Window"))
    assert(planOf(Sampling.percentileGate(df, "grp", "v", 0.25))
      .contains("Window"))
  }
}
