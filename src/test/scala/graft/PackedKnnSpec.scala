package graft

import graft.operators.{Knn, PackedKnn}
import org.apache.spark.sql.functions._

/** The packed-matrix BLAS search must agree with the oracle-checked
  * composed kNN join: same neighbor sets, distances equal to the double
  * kernel within float32-GEMM tolerance. */
class PackedKnnSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queryDF = embs.where(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
  private lazy val qArr = queryDF.collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    .sortBy(_._1)

  test("packed search matches composed knnJoin on all metrics") {
    val pc = PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding")
    try {
      for (m <- Seq("cosine", "l2", "ip")) {
        val exact = Knn.knnJoin(queryDF, embs, 10, m,
            corpusId = "vec_id", corpusVec = "embedding")
          .collect()
          .map(r => (r.getAs[Long]("query_id"),
            (r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist"))))
          .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(x => (x._2, x._1))).toMap
        val packed = PackedKnn.search(pc, qArr, 10, m).toMap
        assert(packed.keySet === exact.keySet, s"metric $m query ids")
        for ((qid, got) <- packed) {
          val want = exact(qid)
          assert(got.map(_._1).toSeq === want.map(_._1).toSeq,
            s"metric $m query $qid neighbor ids")
          // float32 GEMM tolerance; l2 uses the norm identity, whose
          // cancellation near zero is quadratic — compare squared dists
          val tol = 2e-3
          got.zip(want).foreach { case ((_, dGot), (_, dWant)) =>
            val err = if (m == "l2") math.abs(dGot * dGot - dWant * dWant)
                      else math.abs(dGot - dWant)
            assert(err < tol, s"metric $m query $qid dist $dGot vs $dWant")
          }
        }
      }
    } finally pc.unpersist(blocking = true)
  }

  test("packed search survives empty partitions and k > corpus size") {
    import spark.implicits._
    val tiny = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
      .toDF("id", "vec")
      .repartition(8) // most partitions empty
    val pc = PackedKnn.pack(tiny)
    try {
      val res = PackedKnn.search(pc, Array((100L, Array(1f, 0f))), 10, "cosine")
      assert(res.length === 1)
      val (qid, nbrs) = res.head
      assert(qid === 100L)
      assert(nbrs.map(_._1).toSet === Set(1L, 2L, 3L))
      assert(nbrs.head._1 === 1L) // identical direction first
      assert(math.abs(nbrs.head._2) < 1e-6)
    } finally pc.unpersist(blocking = true)
  }

  private lazy val ivfModel = graft.operators.Ann.trainIvf(embs, "embedding", numCells = 8)

  test("IVF-packed search: all-cells probe equals exact; pruned probe equals ivfSearch") {
    val model = ivfModel
    val pi = PackedKnn.packIvf(embs, model, idCol = "vec_id", vecCol = "embedding")
    try {
      // probing every cell = exact search (modulo float32 dist)
      val all = PackedKnn.searchIvf(pi, qArr, 10, nProbe = model.numCells).toMap
      val exact = Knn.knnJoin(queryDF, embs, 10, "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      for ((qid, nbrs) <- all)
        assert(nbrs.map(_._1).toSeq === exact(qid), s"query $qid all-cells")
      // pruned probe agrees with the composed IVF join on the same model
      val pruned = PackedKnn.searchIvf(pi, qArr, 10, nProbe = 4).toMap
      val composed = graft.operators.Ann.ivfSearch(queryDF, embs, model, 10,
          nProbe = 4, metric = "cosine", corpusId = "vec_id", vecCol = "embedding")
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      for ((qid, nbrs) <- pruned)
        assert(nbrs.map(_._1).toSeq === composed(qid), s"query $qid nProbe=4")
    } finally pi.unpersist(blocking = true)
  }

  test("IVF-packed search launches tasks only on probed partitions") {
    val model = ivfModel
    val one = qArr.take(1) // force the lazy collect BEFORE counting tasks
    val pi = PackedKnn.packIvf(embs, model, idCol = "vec_id", vecCol = "embedding")
    try {
      val taskCount = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskCount.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        PackedKnn.searchIvf(pi, one, 10, nProbe = 2)
        // listener events are async; poll until the count stabilizes
        val deadline = System.nanoTime() + 5_000_000_000L
        while (taskCount.get < 2 && System.nanoTime() < deadline) Thread.sleep(50)
        Thread.sleep(200) // would catch EXTRA (unprobed) tasks arriving
        // 1 query x nProbe=2 -> exactly 2 partitions touched, not numCells
        assert(taskCount.get === 2,
          s"expected 2 tasks (probed cells), saw ${taskCount.get} of ${model.numCells} cells")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally pi.unpersist(blocking = true)
  }

  test("exact distance ties keep the smallest ids (heap tie-break)") {
    import spark.implicits._
    // ids arrive in DESCENDING order within one partition; all three tie
    // at distance 0 under cosine, so top-2 must be {1, 2} by (dist, id)
    val dup = Seq((3L, Array(1f, 0f)), (2L, Array(1f, 0f)), (1L, Array(1f, 0f)),
        (4L, Array(0f, 1f)))
      .toDF("id", "vec").coalesce(1)
    val pc = PackedKnn.pack(dup)
    try {
      val res = PackedKnn.search(pc, Array((9L, Array(1f, 0f))), 2, "cosine")
      assert(res.head._2.map(_._1).toSeq === Seq(1L, 2L))
    } finally pc.unpersist(blocking = true)
  }

  test("append searches old and new rows without repacking the standing blocks") {
    import spark.implicits._
    val base = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("id", "vec")
    val pc = PackedKnn.pack(base)
    val baseBlocks = pc.blocks
    val grown = PackedKnn.append(pc,
      Seq((3L, Array(0.9f, 0.1f))).toDF("id", "vec"))
    try {
      assert(grown.blocks.partitions.length > baseBlocks.partitions.length)
      val res = PackedKnn.search(grown, Array((9L, Array(1f, 0f))), 2, "cosine")
      assert(res.head._2.map(_._1).toSeq === Seq(1L, 3L)) // new row ranked 2nd
      // dim mismatch fails loudly (executor-side check during the pack)
      val ex = intercept[Exception] {
        PackedKnn.append(grown, Seq((4L, Array(1f, 2f, 3f))).toDF("id", "vec"))
      }
      val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
      assert(msgs.exists(_.contains("batch dim")), msgs.mkString(" | "))
    } finally grown.unpersist(blocking = true)
    // the union handle released BOTH generations' persisted blocks
    assert(!baseBlocks.getStorageLevel.useMemory ||
      spark.sparkContext.getPersistentRDDs.values.forall(_.id != baseBlocks.id))
  }

  test("remove prunes hit slabs only; searches equal a repack of the survivors") {
    val pc = PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding")
    val dead = (100L until 110L).toSet
    val pruned = PackedKnn.remove(pc, dead)
    val repacked = PackedKnn.pack(
      embs.where(!col("vec_id").isin(dead.toSeq: _*)),
      idCol = "vec_id", vecCol = "embedding")
    try {
      // removing nothing is the identity (no new RDD, no copy)
      assert(PackedKnn.remove(pruned, Set.empty[Long]) eq pruned)
      for (m <- Seq("cosine", "l2")) {
        val got = PackedKnn.search(pruned, qArr, 10, m).toMap
        val want = PackedKnn.search(repacked, qArr, 10, m).toMap
        assert(got.keySet === want.keySet, s"metric $m")
        for ((qid, nbrs) <- got) {
          assert(nbrs.map(_._1).toSeq === want(qid).map(_._1).toSeq,
            s"metric $m query $qid")
          assert(nbrs.forall(n => !dead.contains(n._1)))
        }
      }
      // row count shrank by exactly the removed ids
      val rows = pruned.blocks.map(_.rows.toLong).reduce(_ + _)
      assert(rows === embs.count() - dead.size)
    } finally {
      pc.unpersist(blocking = true)
      pruned.unpersist(blocking = true)
      repacked.unpersist(blocking = true)
    }
  }

  test("removeIvf keeps the cell layout: pruned probes equal a repack, partitions preserved") {
    val pi = PackedKnn.packIvf(embs, ivfModel, idCol = "vec_id", vecCol = "embedding")
    val dead = (200L until 220L).toSet
    val pruned = PackedKnn.removeIvf(pi, dead)
    val repacked = PackedKnn.packIvf(
      embs.where(!col("vec_id").isin(dead.toSeq: _*)),
      ivfModel, idCol = "vec_id", vecCol = "embedding")
    try {
      assert(pruned.blocks.partitions.length === pi.blocks.partitions.length)
      val got = PackedKnn.searchIvf(pruned, qArr, 10, nProbe = 3).toMap
      val want = PackedKnn.searchIvf(repacked, qArr, 10, nProbe = 3).toMap
      assert(got.keySet === want.keySet)
      for ((qid, nbrs) <- got) {
        assert(nbrs.map(_._1).toSeq === want(qid).map(_._1).toSeq, s"query $qid")
        assert(nbrs.forall(n => !dead.contains(n._1)))
      }
    } finally {
      pi.unpersist(blocking = true)
      pruned.unpersist(blocking = true)
      repacked.unpersist(blocking = true)
    }
  }

  test("appendIvf zips the batch into its cells: partitions preserved, equals repack") {
    import spark.implicits._
    val base = embs.where(col("vec_id") < 400)
    val batch = embs.where(col("vec_id") >= 400)
      .select(col("vec_id"), col("embedding"))
    val pi = PackedKnn.packIvf(base, ivfModel, idCol = "vec_id", vecCol = "embedding")
    val grown = PackedKnn.appendIvf(pi, batch, idCol = "vec_id", vecCol = "embedding")
    val repacked = PackedKnn.packIvf(embs, ivfModel, idCol = "vec_id", vecCol = "embedding")
    try {
      // cell layout intact: same partition count, probe results identical
      assert(grown.blocks.partitions.length === pi.blocks.partitions.length)
      val got = PackedKnn.searchIvf(grown, qArr, 10, nProbe = 3).toMap
      val want = PackedKnn.searchIvf(repacked, qArr, 10, nProbe = 3).toMap
      assert(got.keySet === want.keySet)
      for ((qid, nbrs) <- got)
        assert(nbrs.map(_._1).toSeq === want(qid).map(_._1).toSeq, s"query $qid")
      // dim mismatch fails loudly during the batch pack
      val ex = intercept[Exception] {
        PackedKnn.appendIvf(grown,
          Seq((9999L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding"),
          idCol = "vec_id", vecCol = "embedding")
      }
      val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
      assert(msgs.exists(_.contains("batch dim")), msgs.mkString(" | "))
    } finally {
      grown.unpersist(blocking = true) // releases base + batch generations
      repacked.unpersist(blocking = true)
    }
  }

  test("compact folds append generations into single slabs, searches unchanged") {
    import spark.implicits._
    // flat: five appends multiply the partition count; compact folds it
    val base = PackedKnn.pack(embs.where(col("vec_id") < 250),
      idCol = "vec_id", vecCol = "embedding")
    val grown = (0 until 5).foldLeft(base) { (pc, i) =>
      PackedKnn.append(pc,
        embs.where(col("vec_id") >= 250 + i * 50 && col("vec_id") < 300 + i * 50)
          .select(col("vec_id"), col("embedding")),
        idCol = "vec_id", vecCol = "embedding")
    }
    val compacted = PackedKnn.compact(grown, numPartitions = 2)
    try {
      assert(compacted.blocks.partitions.length === 2)
      assert(compacted.blocks.partitions.length < grown.blocks.partitions.length)
      assert(compacted.blocks.map(_.rows.toLong).reduce(_ + _) === 500L)
      val got = PackedKnn.search(compacted, qArr, 10, "cosine").toMap
      val want = PackedKnn.search(grown, qArr, 10, "cosine").toMap
      for ((qid, nbrs) <- got)
        assert(nbrs.map(_._1).toSeq === want(qid).map(_._1).toSeq, s"query $qid")
    } finally {
      grown.unpersist(blocking = true)
      compacted.unpersist(blocking = true)
    }

    // cell layout: a zip chain leaves multiple blocks per cell; compactIvf
    // merges to one block per cell without moving partitions
    val pi0 = PackedKnn.packIvf(embs.where(col("vec_id") < 400), ivfModel,
      idCol = "vec_id", vecCol = "embedding")
    val pi = PackedKnn.appendIvf(pi0,
      embs.where(col("vec_id") >= 400).select(col("vec_id"), col("embedding")),
      idCol = "vec_id", vecCol = "embedding")
    val piC = PackedKnn.compactIvf(pi)
    try {
      assert(piC.blocks.partitions.length === pi.blocks.partitions.length)
      assert(piC.blocks.mapPartitions(it => Iterator.single(it.size))
        .collect().forall(_ <= 1))
      val got = PackedKnn.searchIvf(piC, qArr, 10, nProbe = 3).toMap
      val want = PackedKnn.searchIvf(pi, qArr, 10, nProbe = 3).toMap
      for ((qid, nbrs) <- got)
        assert(nbrs.map(_._1).toSeq === want(qid).map(_._1).toSeq, s"query $qid")
    } finally {
      pi.unpersist(blocking = true)
      piC.unpersist(blocking = true)
    }
  }

  test("knnGraph equals the broadcast path with self-matches dropped") {
    val pc = PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding")
    try {
      val allQ = embs.select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
      // broadcast-path expectation: k+1 then drop the self-match
      val expected = Knn.knnJoin(allQ, embs, 6, "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq)
        .toMap
        .map { case (qid, nbrs) => qid -> nbrs.filter(_ != qid).take(5) }
      val graph = PackedKnn.knnGraph(pc, 5, "cosine")
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      assert(graph.keySet === expected.keySet)
      for ((qid, nbrs) <- graph) {
        assert(!nbrs.contains(qid), s"self-match for $qid")
        assert(nbrs === expected(qid), s"query $qid")
      }
    } finally pc.unpersist(blocking = true)
  }

  test("same-cell graph: edges stay within cells, counts bounded by cell size") {
    import graft.operators.Ann
    val model = ivfModel
    val pi = PackedKnn.packIvf(embs, model, idCol = "vec_id", vecCol = "embedding")
    try {
      val graph = PackedKnn.knnGraphIvf(pi, 5, "cosine").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      val cells = embs.select(col("vec_id"),
          Ann.cellId(model)(col("embedding")).as("c")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(graph.nonEmpty)
      graph.foreach { case (q, n) =>
        assert(cells(q) === cells(n), s"edge $q->$n crosses cells")
        assert(q !== n, s"self edge $q")
      }
      val cellSizes = cells.values.groupBy(identity).view.mapValues(_.size).toMap
      val perQuery = graph.groupBy(_._1).view.mapValues(_.length).toMap
      for ((q, cnt) <- perQuery)
        assert(cnt === math.min(5, cellSizes(cells(q)) - 1), s"query $q count")
    } finally pi.unpersist(blocking = true)
  }

  private def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
    rdd.dependencies.exists {
      case _: org.apache.spark.ShuffleDependency[_, _, _] => true
      case d => hasShuffle(d.rdd)
    }

  test("splitCell: narrow rebuild, counts conserved, exact at full probe, new-cell routing") {
    val pi = PackedKnn.packIvf(embs, ivfModel, idCol = "vec_id", vecCol = "embedding")
    try {
      val sizes0 = PackedKnn.cellSizes(pi)
      val hot = sizes0.zipWithIndex.maxBy(_._1)._2
      val want = PackedKnn.searchIvf(pi, qArr, 10, nProbe = ivfModel.numCells).toMap
      val split = PackedKnn.splitCell(pi, hot)
      try {
        // one more cell = one more partition; every other cell untouched
        assert(split.model.numCells === ivfModel.numCells + 1)
        assert(split.blocks.getNumPartitions === ivfModel.numCells + 1)
        val sizes1 = PackedKnn.cellSizes(split)
        assert(sizes1.sum === sizes0.sum, "rows lost or duplicated")
        for (c <- sizes0.indices if c != hot)
          assert(sizes1(c) === sizes0(c), s"untouched cell $c changed")
        assert(sizes1(hot) + sizes1(ivfModel.numCells) === sizes0(hot))
        assert(sizes1(hot) < sizes0(hot) && sizes1(ivfModel.numCells) > 0,
          "split moved nothing")
        // the rebuild is narrow — no shuffle between the new blocks and
        // the standing corpus (the original pack's routing shuffle is
        // upstream of pi.blocks and out of scope)
        def shuffleAbove(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
          (rdd.id != pi.blocks.id) && rdd.dependencies.exists {
            case _: org.apache.spark.ShuffleDependency[_, _, _] => true
            case d => shuffleAbove(d.rdd)
          }
        assert(!shuffleAbove(split.blocks), "splitCell introduced a shuffle")
        // full probe is exact regardless of row placement: identical rows,
        // identical kernel => identical (id, dist) sequences
        val got = PackedKnn.searchIvf(split, qArr, 10, nProbe = split.model.numCells).toMap
        assert(got.keySet === want.keySet)
        for ((qid, nbrs) <- got)
          assert(nbrs.toSeq === want(qid).toSeq, s"query $qid")
        // a row that landed in the NEW cell routes there: nProbe=1
        // self-match through partition C
        val movedIds = split.blocks.sparkContext.runJob(split.blocks,
          (it: Iterator[PackedKnn.Block[Long]]) => it.flatMap(_.ids).toArray,
          Seq(ivfModel.numCells)).head
        val probe = movedIds.head
        val pv = embs.where(col("vec_id") === probe)
          .select("embedding").head().getSeq[Float](0).toArray
        val self = PackedKnn.searchIvf(split, Array((probe, pv)), 1, nProbe = 1).head._2
        assert(self.head._1 === probe)
        assert(math.abs(self.head._2) < 1e-6)
      } finally split.unpersist(blocking = true)
    } finally pi.unpersist(blocking = true)
  }

  test("splitHotCells drives every cell under the threshold; append routes into split geometry") {
    val pi = PackedKnn.packIvf(embs.where(col("vec_id") < 1900), ivfModel,
      idCol = "vec_id", vecCol = "embedding")
    try {
      val sizes0 = PackedKnn.cellSizes(pi)
      val threshold = math.max(50L, sizes0.max / 2)
      val (after, splits) = PackedKnn.splitHotCells(pi, maxRows = threshold)
      try {
        assert(splits >= 1, "fixture produced no hot cell")
        val sizes1 = PackedKnn.cellSizes(after)
        assert(sizes1.forall(_ <= threshold),
          s"cells above $threshold remain: ${sizes1.mkString(",")}")
        assert(sizes1.sum === sizes0.sum)
        // appendIvf after splits: the batch packs against the REFINED
        // model (numCells+splits partitions) and zips cleanly
        val grown = PackedKnn.appendIvf(after, embs.where(col("vec_id") >= 1900),
          idCol = "vec_id", vecCol = "embedding")
        assert(grown.blocks.getNumPartitions === after.model.numCells)
        val full = PackedKnn.packIvf(embs, ivfModel, idCol = "vec_id", vecCol = "embedding")
        val want = PackedKnn.searchIvf(full, qArr, 10, nProbe = ivfModel.numCells).toMap
        full.unpersist(blocking = true)
        val got = PackedKnn.searchIvf(grown, qArr, 10,
          nProbe = grown.model.numCells).toMap
        for ((qid, nbrs) <- got)
          assert(nbrs.toSeq === want(qid).toSeq, s"query $qid")
        grown.unpersist(blocking = true)
      } finally after.unpersist(blocking = true)
    } finally pi.unpersist(blocking = true)
  }

  test("splitCell fails loud on out-of-range, empty, and degenerate cells") {
    import spark.implicits._
    // two tight clusters + a manual model whose third centroid is unused
    val rows = (0 until 20).map(i => (i.toLong,
      if (i < 10) Array(0.1f * i, 0f) else Array(10f + 0.1f * i, 0f))) :+
      (99L, Array(5f, 5f))
    val m3 = graft.operators.Ann.IvfModel(Array(
      Array(0.5, 0.0), Array(11.0, 0.0), Array(1000.0, 1000.0)))
    val pi = PackedKnn.packIvf(rows.toDF("id", "vec"), m3)
    try {
      val eRange = intercept[IllegalArgumentException] { PackedKnn.splitCell(pi, 7) }
      assert(eRange.getMessage.contains("out of range"))
      val eEmpty = intercept[IllegalArgumentException] { PackedKnn.splitCell(pi, 2) }
      assert(eEmpty.getMessage.contains("empty"))
    } finally pi.unpersist(blocking = true)
    // a cell of identical rows cannot separate
    val dup = (0 until 12).map(i => (i.toLong, Array(3f, 4f))).toDF("id", "vec")
    val piDup = PackedKnn.packIvf(dup, graft.operators.Ann.IvfModel(Array(Array(3.0, 4.0))))
    try {
      val eDeg = intercept[IllegalArgumentException] { PackedKnn.splitCell(piDup, 0) }
      assert(eDeg.getMessage.contains("degenerate"))
      // and splitHotCells surfaces the bounded-splits guard instead of spinning
      val eHot = intercept[IllegalArgumentException] {
        PackedKnn.splitHotCells(piDup, maxRows = 5)
      }
      assert(eHot.getMessage.contains("degenerate") || eHot.getMessage.contains("maxSplits"))
    } finally piDup.unpersist(blocking = true)
  }

  test("slab-size guard fails loud with an actionable message") {
    // 20M rows x 128 dims = 2.56B floats > Int.MaxValue — the compaction
    // shape that previously died deep in allocation
    val ex = intercept[IllegalArgumentException] {
      PackedKnn.requireSlabFits(20000000L, 128, "compact")
    }
    assert(ex.getMessage.contains("Int.MaxValue"), ex.getMessage)
    assert(ex.getMessage.contains("more partitions"), ex.getMessage)
    PackedKnn.requireSlabFits(1000000L, 128, "compact") // under the limit: fine
  }

  test("knnGraph self-enforces its block grid on an over-partitioned corpus") {
    val pc = PackedKnn.pack(embs.repartition(24),
      idCol = "vec_id", vecCol = "embedding")
    try {
      val budget = math.max(1, math.ceil(math.sqrt(
        2.0 * spark.sparkContext.defaultParallelism)).toInt)
      assert(pc.blocks.getNumPartitions > budget, "fixture must over-partition")
      assert(PackedKnn.graphBlocks(pc, 0).getNumPartitions === budget)
      assert(PackedKnn.graphBlocks(pc, 5).getNumPartitions === 5)
      // results over the coalesced grid equal the broadcast path
      val allQ = embs.select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
      val expected = Knn.knnJoin(allQ, embs, 6, "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
        .map { case (qid, nbrs) => qid -> nbrs.filter(_ != qid).take(5) }
      val graph = PackedKnn.knnGraph(pc, 5, "cosine")
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      assert(graph === expected)
    } finally pc.unpersist(blocking = true)
  }

  test("knnGraphIvf finds cross-generation same-cell edges without compaction") {
    val model = ivfModel
    val pi0 = PackedKnn.packIvf(embs.where(col("vec_id") % 2 === 0), model,
      idCol = "vec_id", vecCol = "embedding")
    val pi = PackedKnn.appendIvf(pi0, embs.where(col("vec_id") % 2 === 1),
      idCol = "vec_id", vecCol = "embedding")
    val fresh = PackedKnn.packIvf(embs, model,
      idCol = "vec_id", vecCol = "embedding")
    try {
      def edges(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"),
          math.rint(r.getAs[Double]("dist") * 1e6) / 1e6))
        .sortBy(t => (t._1, t._2))
        .toSeq
      assert(edges(PackedKnn.knnGraphIvf(pi, 5)) ===
        edges(PackedKnn.knnGraphIvf(fresh, 5)),
        "multi-generation cell partitions must yield the single-generation graph")
    } finally { pi.unpersist(blocking = true); fresh.unpersist(blocking = true) }
  }

  test("knnGraphIvf rim expansion climbs recall toward the exact graph") {
    val model = ivfModel
    val pi = PackedKnn.packIvf(embs, model, idCol = "vec_id", vecCol = "embedding")
    val pc = PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding")
    try {
      def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.collect().map(r => (r.getAs[Long]("query_id"),
          r.getAs[Long]("neighbor_id"))).toSet
      val exact = edges(PackedKnn.knnGraph(pc, 5, "cosine"))
      val g1 = edges(PackedKnn.knnGraphIvf(pi, 5, nProbe = 1))
      val g2 = edges(PackedKnn.knnGraphIvf(pi, 5, nProbe = 2))
      val r1 = (g1 & exact).size.toDouble / exact.size
      val r2 = (g2 & exact).size.toDouble / exact.size
      assert(r1 < 1.0, "fixture must have cross-cell neighbors to recover")
      assert(r2 > r1, s"2-probe recall $r2 must climb above 1-probe $r1")
      // rim edges still respect per-query k and never self-match
      val perQ = PackedKnn.knnGraphIvf(pi, 5, nProbe = 2).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      perQ.foreach { case (q, n) => assert(q !== n) }
      perQ.groupBy(_._1).foreach { case (q, es) =>
        assert(es.length <= 5, s"query $q has ${es.length} edges")
        assert(es.map(_._2).distinct.length === es.length, s"query $q dup edge")
      }
    } finally { pi.unpersist(blocking = true); pc.unpersist(blocking = true) }
  }

  test("slab sidecar round-trips; reopen lineage is shuffle- and scan-free") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-slabs").toString
    val pc = PackedKnn.pack(embs, idCol = "vec_id", vecCol = "embedding")
    try {
      assert(!PackedKnn.slabsExist(spark, s"$tmp/flat"))
      PackedKnn.saveSlabs(pc, s"$tmp/flat")
      assert(PackedKnn.slabsExist(spark, s"$tmp/flat"))
      val re = PackedKnn.loadSlabs[Long](spark, s"$tmp/flat")
      try {
        assert(re.dim === pc.dim)
        assert(re.blocks.getNumPartitions === pc.blocks.getNumPartitions)
        assert(!hasShuffle(re.blocks), "slab reopen must be shuffle-free")
        def res(p: PackedKnn.PackedCorpus[Long]) =
          PackedKnn.search(p, qArr, 10, "cosine")
            .map { case (q, n) => (q, n.toSeq) }.toMap
        assert(res(re) === res(pc))
      } finally re.unpersist(blocking = true)
    } finally pc.unpersist(blocking = true)

    val pi = PackedKnn.packIvf(embs, ivfModel, idCol = "vec_id", vecCol = "embedding")
    try {
      // the fresh IVF pack pays a routing shuffle; the slab reopen must not
      assert(hasShuffle(pi.blocks))
      PackedKnn.saveIvfSlabs(pi, s"$tmp/ivf")
      assert(PackedKnn.ivfSlabsExist(spark, s"$tmp/ivf"))
      val re = PackedKnn.loadIvfSlabs[Long](spark, s"$tmp/ivf")
      try {
        assert(re.blocks.getNumPartitions === ivfModel.numCells,
          "partition i = cell i must survive the sidecar")
        assert(!hasShuffle(re.blocks), "IVF slab reopen must be shuffle-free")
        def res(p: PackedKnn.PackedIvfCorpus[Long]) =
          PackedKnn.searchIvf(p, qArr, 10, nProbe = 4)
            .map { case (q, n) => (q, n.toSeq) }.toMap
        assert(res(re) === res(pi))
      } finally re.unpersist(blocking = true)
    } finally pi.unpersist(blocking = true)
  }

  test("pack rejects a ragged corpus") {
    import spark.implicits._
    val ragged = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f, 2f)))
      .toDF("id", "vec").coalesce(1)
    val ex = intercept[Exception] { PackedKnn.pack(ragged) }
    val messages = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("ragged")), messages.mkString(" | "))
  }

  test("slab sidecar round-trips a zero-partition corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-slabs0").toString
    val empty = new PackedKnn.PackedCorpus[Long](
      spark.sparkContext.emptyRDD[PackedKnn.Block[Long]], 0)
    PackedKnn.saveSlabs(empty, s"$tmp/zero")
    assert(PackedKnn.slabsExist(spark, s"$tmp/zero"))
    val re = PackedKnn.loadSlabs[Long](spark, s"$tmp/zero")
    assert(re.blocks.getNumPartitions === 0)
    val res = PackedKnn.search(re, Array((1L, Array(1f, 0f))), 3, "cosine")
    assert(res.length === 1 && res.head._2.isEmpty,
      "searching an empty reopened corpus yields empty neighbor lists")
  }
}
