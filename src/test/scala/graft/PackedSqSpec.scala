package graft

import graft.operators.{Ann, PackedSq, Quantization}
import org.apache.spark.sql.functions._

/** The resident SQ8 tier must be ROW-IDENTICAL to the oracle-checked
  * Quantization.sqSearch on the same model at full probe — bit-equal
  * decoded-space distances under every metric, same (dist, id) cut. Plus
  * the packed-tier contracts: append keeps cell routing, remove/compact
  * preserve results, slabs round-trip, footprint is dim bytes/row. */
class PackedSqSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queryDF = embs.where(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
  private lazy val ivf = Ann.trainIvf(embs, "embedding", numCells = 8)
  private lazy val sq = Quantization.trainSq(embs, "embedding")
  private lazy val coded = embs.withColumn("sq_code",
    Quantization.sqEncode(sq)(col("embedding")))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

  test("full probe is row-identical to Quantization.sqSearch for every metric") {
    val pi = PackedSq.packIvfSq(embs, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    try {
      for (metric <- Seq("cosine", "l2", "ip")) {
        val want = rows(Quantization.sqSearch(queryDF, coded, sq, k = 10,
          metric = metric, corpusId = "vec_id"))
        val got = rows(PackedSq.search(pi, queryDF, k = 10,
          nProbe = ivf.numCells, metric = metric))
        assert(got === want, s"metric=$metric")
      }
    } finally pi.unpersist()
  }

  test("pruned probes return a subset ranking; recall climbs with nProbe") {
    val pi = PackedSq.packIvfSq(embs, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    try {
      val full = rows(PackedSq.search(pi, queryDF, k = 10, nProbe = ivf.numCells))
        .map(t => (t._1, t._3)).toSet
      def recall(nProbe: Int): Double = {
        val got = rows(PackedSq.search(pi, queryDF, k = 10, nProbe = nProbe))
          .map(t => (t._1, t._3)).toSet
        (got & full).size.toDouble / full.size
      }
      val r1 = recall(1); val r4 = recall(4)
      assert(r1 <= r4 + 1e-9)
      assert(r4 > 0.5, s"nProbe=4 recall $r4 vs full probe")
      // every pruned result's distance is a genuine decoded-space
      // distance: it appears in the full ranking with the same value
      val fullDists = rows(PackedSq.search(pi, queryDF, k = 2000, nProbe = ivf.numCells))
        .map(t => (t._1, t._3) -> t._4).toMap
      rows(PackedSq.search(pi, queryDF, k = 10, nProbe = 2)).foreach { t =>
        assert(fullDists((t._1, t._3)) === t._4)
      }
    } finally pi.unpersist()
  }

  test("integer-domain ADC matches the exact kernel's neighbors within quantization error") {
    val pi = PackedSq.packIvfSq(embs, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    try {
      val qArr = queryDF.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      for (metric <- Seq("cosine", "l2", "ip")) {
        val exact = PackedSq.searchSq[Long](pi, qArr, k = 10,
          nProbe = ivf.numCells, metric = metric)
        val fast = PackedSq.searchSqInt[Long](pi, qArr, k = 10,
          nProbe = ivf.numCells, metric = metric)
        for (((qid, want), (qid2, got)) <- exact.zip(fast)) {
          assert(qid === qid2)
          // ~15-bit query-side multiplier quantization: distances agree
          // to ~1e-3 relative and the top-10 SETS agree (near-tie order
          // flips are the declared contract, wholesale misses are a bug).
          // l2 compares SQUARED (the sqrt amplifies a tiny dot error
          // without bound as the distance approaches 0 — a self-match's
          // exact 0.0 comes back as sqrt(ε))
          val overlap = (want.map(_._1).toSet & got.map(_._1).toSet).size
          assert(overlap >= 9, s"metric=$metric query $qid: top-10 overlap $overlap")
          want.zip(got).foreach { case ((_, dw), (_, dg)) =>
            val (a, b) = if (metric == "l2") (dw * dw, dg * dg) else (dw, dg)
            assert(math.abs(a - b) <= 2e-3 * math.max(1.0, math.abs(a)),
              s"metric=$metric query $qid: $dw vs $dg")
          }
        }
      }
    } finally pi.unpersist()
  }

  test("append keeps cell routing; remove + compact preserve the ranking") {
    val a = embs.where(col("vec_id") % 2 === 0)
    val b = embs.where(col("vec_id") % 2 === 1)
    val whole = PackedSq.packIvfSq(embs, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    val grown = PackedSq.appendIvfSq(
      PackedSq.packIvfSq(a, ivf, sq, idCol = "vec_id", vecCol = "embedding"),
      b, idCol = "vec_id", vecCol = "embedding")
    try {
      val want = rows(PackedSq.search(whole, queryDF, k = 10, nProbe = ivf.numCells))
      assert(rows(PackedSq.search(grown, queryDF, k = 10, nProbe = ivf.numCells)) === want)
      // append generations zip onto the standing layout (rows-sized, not
      // one-per-cell), and every block stays where the layout map says
      assert(grown.blocks.getNumPartitions === whole.blocks.getNumPartitions)
      assert(grown.blocks.mapPartitionsWithIndex((p, it) =>
        it.map(b => (p, b.cell))).collect().forall { case (p, c) =>
          c >= 0 && c < ivf.numCells && grown.partOf(c) === p })
      val compacted = PackedSq.compactIvfSq(grown)
      try {
        assert(rows(PackedSq.search(compacted, queryDF, k = 10,
          nProbe = ivf.numCells)) === want)
        assert(compacted.blocks.map(_ => 1).sum().toLong <= ivf.numCells)
        // removing rows == packing the complement
        val dead = (0L until 50L).toSet
        val removed = PackedSq.remove(compacted, dead)
        val repacked = PackedSq.packIvfSq(embs.where(col("vec_id") >= 50),
          ivf, sq, idCol = "vec_id", vecCol = "embedding")
        try assert(
          rows(PackedSq.search(removed, queryDF, k = 10, nProbe = ivf.numCells)) ===
            rows(PackedSq.search(repacked, queryDF, k = 10, nProbe = ivf.numCells)))
        finally { removed.unpersist(); repacked.unpersist() }
      } finally compacted.unpersist()
    } finally { whole.unpersist(); grown.unpersist() }
  }

  test("slab sidecar round-trips blocks, both models, and cell routing") {
    val dir = java.nio.file.Files.createTempDirectory("sq-slabs").toString + "/idx"
    val pi = PackedSq.packIvfSq(embs, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    try {
      val want = rows(PackedSq.search(pi, queryDF, k = 10, nProbe = ivf.numCells))
      PackedSq.saveSlabs(pi, dir)
      assert(PackedSq.slabsExist(spark, dir))
      val re = PackedSq.loadSlabs[Long](spark, dir)
      try {
        assert(re.blocks.getNumPartitions === pi.blocks.getNumPartitions)
        assert(re.sq.mins.toSeq === sq.mins.toSeq)
        assert(re.sq.maxs.toSeq === sq.maxs.toSeq)
        assert(rows(PackedSq.search(re, queryDF, k = 10, nProbe = ivf.numCells)) === want)
      } finally re.unpersist()
    } finally pi.unpersist()
  }

  test("footprint is dim bytes per row; ragged corpus fails loud") {
    val pi = PackedSq.packIvfSq(embs, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    try {
      val n = embs.count()
      assert(PackedSq.codeBytes(pi) === n * sq.mins.length)
    } finally pi.unpersist()
    val ragged = embs.limit(10).select(col("vec_id"),
      slice(col("embedding"), 1, 7).as("embedding"))
    val e = intercept[Exception] {
      PackedSq.packIvfSq(ragged, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    }
    assert(e.getMessage.contains("dim") || Option(e.getCause).exists(
      _.getMessage.contains("dim")))
  }

  test("string-id pack serves the same neighbors as the long-id pack") {
    val strCorpus = embs.select(concat(lit("v"), col("vec_id")).as("id"),
      col("embedding"))
    val pi = PackedSq.packIvfSqStr(strCorpus, ivf, sq, vecCol = "embedding")
    val piL = PackedSq.packIvfSq(embs, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    try {
      val qArr = queryDF.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val wantL = PackedSq.searchSq[Long](piL, qArr, k = 10, nProbe = ivf.numCells)
      val gotS = PackedSq.searchSq[String](pi, qArr, k = 10, nProbe = ivf.numCells)
      for (((qidL, nbrsL), (qidS, nbrsS)) <- wantL.zip(gotS)) {
        assert(qidL === qidS)
        // distances are bit-equal regardless of id type; ids match on
        // every entry whose distance is unique (exact ties break by the
        // id ORDER, which legitimately differs between Long and String)
        assert(nbrsS.map(_._2).toSeq === nbrsL.map(_._2).toSeq)
        val tied = nbrsL.groupBy(_._2).filter(_._2.length > 1).keySet
        val wantIds = nbrsL.filterNot(n => tied(n._2)).map(_._1).toSet
        val gotIds = nbrsS.filterNot(n => tied(n._2))
          .map(_._1.stripPrefix("v").toLong).toSet
        assert(gotIds === wantIds)
      }
    } finally { pi.unpersist(); piL.unpersist() }
  }
}
