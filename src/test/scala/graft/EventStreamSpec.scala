package graft

import graft.streaming.{Events, EventStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val base = 1700000000000L

  private def mkEvents: Seq[EventStream.Event] = Seq(
    EventStream.Event(1, ts(base), 1, "view", 1.0, """{"k": 1}"""),
    EventStream.Event(2, ts(base + 60000), 1, "purchase", 5.0, """{"k": 12}"""),
    EventStream.Event(3, ts(base + 120000), 2, "view", 2.0, """{"k": 12}"""),
    EventStream.Event(4, ts(base + 45 * 60000), 1, "view", 3.0, """{"k": 3}"""), // new session for user 1
    EventStream.Event(5, ts(base + 46 * 60000), 2, "signup", 4.0, """{"k": 12}"""))

  test("streaming subscription filter matches batch semantics") {
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[EventStream.Event] }
    mem.addData(mkEvents: _*)
    val filtered = EventStream.subscribe(mem.toDF(),
      eventTypes = Seq("purchase", "signup"), propsEquals = Map("k" -> "12"))
    val got = EventStream.runToMemory(filtered, "sub_out")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val batch = Events.subscribe(mkEvents.toDF(),
        eventTypes = Seq("purchase", "signup"), propsEquals = Map("k" -> "12"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === batch)
    assert(got === Set(2L, 5L))
  }

  test("watermarked windowed counts aggregate the stream") {
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[EventStream.Event] }
    mem.addData(mkEvents: _*)
    val agg = EventStream.windowedCounts(mem.toDF(), "30 minutes")
    // Complete mode so the memory sink holds current counts without
    // waiting for watermark advancement
    val out = EventStream.runToMemory(agg, "win_out", OutputMode.Complete())
      .collect().map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime,
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"))).toSet
    // windows are aligned to epoch; base % 30min = 20min offset -> window start base-20min
    val w0 = base - (base % (30 * 60000L))
    assert(out.contains((w0, "view", 2L)))
    assert(out.contains((w0, "purchase", 1L)))
    val w1 = w0 + 30 * 60000L
    assert(out.contains((w1, "view", 1L)))
    assert(out.contains((w1, "signup", 1L)))
  }

  test("stateful sessionization opens a new session after the gap") {
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[EventStream.Event] }
    mem.addData(mkEvents: _*)
    val sessions = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
    val out = EventStream.runToMemory(sessions.toDF(), "sess_out", OutputMode.Update())
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"))).toSet
    // user 1: events at 0/1min then 45min -> session 2 with 1 event
    assert(out.contains((1L, 2L, 1L)))
    // user 2: events at 2min and 46min -> session 2 with 1 event
    assert(out.contains((2L, 2L, 1L)))
  }

  test("idle sessions close and retire their state after the gap") {
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[EventStream.Event] }
    val sessions = EventStream.sessionizeMs(mem.toDS(), gapMs = 300)
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("sess_close").outputMode("update").start()
    mem.addData(EventStream.Event(1, ts(base), 1, "view", 1.0, "{}"))
    q.processAllAvailable()
    // a later event advances the watermark past user 1's end + gap,
    // firing its event-time timeout on the following sweep
    mem.addData(EventStream.Event(2, ts(base + 1000), 2, "view", 1.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_close")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Boolean]("closed")))
    assert(out.contains((1L, false))) // open while active
    assert(out.contains((1L, true)),  // closed (and state retired) once idle
      s"expected user 1's session to close after the gap, got ${out.mkString(",")}")
    assert(out.contains((2L, false)))
  }

  test("parquet streaming writer/reader round-trip (S6/S7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[EventStream.Event] }
    mem.addData(mkEvents: _*)
    // streaming writer: append-only parquet + checkpoint (the reference's
    // StreamingBinaryWriter, binary_persistence.py:212-274)
    val q = mem.toDF().writeStream
      .format("parquet")
      .option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable(); q.stop()
    // streaming reader over the written directory
    val streamed = spark.readStream
      .schema(spark.read.parquet(s"$dir/data").schema)
      .parquet(s"$dir/data")
    val out = EventStream.runToMemory(
      EventStream.subscribe(streamed, eventTypes = Seq("view")), "file_round")
    assert(out.select("event_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L, 4L))
  }

  test("replay-on-connect: history tail then only post-connect live events") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    mkEvents.toDF().write.parquet(s"$dir/log")
    val sub = EventStream.subscribeWithReplay(spark, s"$dir/log", n = 3)
    // replay = the 3 most recent historical events, marked as replay
    val replayed = sub.replay.collect()
    assert(replayed.map(_.getAs[Long]("event_id")).toSet === Set(3L, 4L, 5L))
    assert(replayed.forall(_.getAs[String]("phase") === "replay"))
    // append post-connect events to the log; live sees ONLY those
    Seq(EventStream.Event(6, ts(base + 50 * 60000), 3, "view", 9.0, "{}"),
        EventStream.Event(7, ts(base + 51 * 60000), 1, "purchase", 2.0, "{}"))
      .toDF().write.mode("append").parquet(s"$dir/log")
    val live = EventStream.runToMemory(sub.live, "replay_live")
      .collect()
    assert(live.map(_.getAs[Long]("event_id")).toSet === Set(6L, 7L))
    assert(live.forall(_.getAs[String]("phase") === "live"))
    // replay + live cover the filtered log exactly once (no overlap)
    assert(replayed.map(_.getAs[Long]("event_id")).toSet
      .intersect(live.map(_.getAs[Long]("event_id")).toSet).isEmpty)
  }

  test("batch sessionize agrees with the gap definition") {
    val stats = Events.sessionStats(mkEvents.toDF(), gapMinutes = 30)
      .collect().map(r => ((r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")),
        r.getAs[Long]("n_events"))).toMap
    assert(stats((1L, 1L)) === 2)
    assert(stats((1L, 2L)) === 1)
    assert(stats((2L, 1L)) === 1)
    assert(stats((2L, 2L)) === 1)
  }

  test("streaming ingest dedup drops within-watermark duplicates, keeps distinct keys") {
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[EventStream.Event] }
    // event 1 delivered three times (at-least-once source), others once
    mem.addData(
      EventStream.Event(1, ts(base), 1, "view", 1.0, "{}"),
      EventStream.Event(1, ts(base), 1, "view", 1.0, "{}"),
      EventStream.Event(2, ts(base + 1000), 1, "view", 2.0, "{}"),
      EventStream.Event(1, ts(base + 2000), 1, "view", 1.0, "{}"),
      EventStream.Event(3, ts(base + 3000), 2, "view", 3.0, "{}"))
    val deduped = EventStream.dedupByKey(mem.toDF(),
      keyCols = Seq("event_id"), tsCol = "ts", watermark = "10 seconds")
    val got = EventStream.runToMemory(deduped, "dedup_out")
      .groupBy("event_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("streaming knn serves query batches from the resident packed index") {
    import graft.operators.PackedKnn
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
        (3L, Array(0.9f, 0.1f))).toDF("id", "vec")
    val pc = PackedKnn.pack(corpus)
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamknn")
    try {
      val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q = EventStream.knnQueryStream(
        mem.toDF().toDF("query_id", "query_vec"), pc, k = 2,
        outDir = s"$tmp/out", checkpointDir = s"$tmp/ck")
      try {
        mem.addData((100L, Array(1f, 0f)))
        q.processAllAvailable()
        mem.addData((200L, Array(0f, 1f))) // second batch: same resident corpus
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(s"$tmp/out")
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id")))
        .toSet
      assert(got === Set((100L, 1, 1L), (100L, 2, 3L), (200L, 1, 2L), (200L, 2, 3L)))
    } finally pc.unpersist(blocking = true)
  }

  test("streaming graph serving equals the exact scan at full probe + unbounded ef") {
    import graft.operators.{Ann, Knn, PackedGraph, PackedKnn}
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ivf = Ann.trainIvf(embs, "embedding", numCells = 4)
    val pk = PackedKnn.packIvf(embs, ivf, idCol = "vec_id", vecCol = "embedding")
    val pg = PackedGraph.build[Long](pk, degree = 8, efConstruction = 32)
    pk.unpersist()
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamgraph")
    try {
      val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q = EventStream.graphQueryStream(
        mem.toDF().toDF("query_id", "query_vec"), pg, k = 5,
        outDir = s"$tmp/out", checkpointDir = s"$tmp/ck",
        nProbe = 4, ef = 0, metric = "cosine") // exhaustive = the q143 contract
      val qVecs = embs.where(col("vec_id") < 4)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      try {
        mem.addData(qVecs(0), qVecs(1))
        q.processAllAvailable()
        mem.addData(qVecs(2), qVecs(3)) // second batch, same resident graphs
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(s"$tmp/out")
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val queryDF = embs.where(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val want = Knn.knnJoin(queryDF, embs, k = 5, metric = "cosine",
          corpusId = "vec_id", corpusVec = "embedding")
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === want)
      // a null query row is skipped, not fatal (the serving-twin stance);
      // a FRESH MemoryStream — a new checkpoint over the old one would
      // replay every prior addData row into this batch
      val mem3 = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q3 = EventStream.graphQueryStream(
        mem3.toDF().toDF("query_id", "query_vec"), pg, k = 5,
        outDir = s"$tmp/out3", checkpointDir = s"$tmp/ck3", nProbe = 4, ef = 0)
      try {
        mem3.addData((98L, qVecs(0)._2), (99L, null: Array[Float]))
        q3.processAllAvailable()
      } finally q3.stop()
      val got3 = spark.read.parquet(s"$tmp/out3").select("query_id")
        .collect().map(_.getLong(0)).toSet
      assert(got3 === Set(98L))
    } finally pg.unpersist(blocking = true)
  }

  test("streaming graph ingest: CRUD micro-batches maintain the resident graph under the replay guard") {
    import graft.operators.{Ann, Knn, PackedGraph, PackedKnn}
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val allRows = embs.where(col("vec_id") < 260)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val base = embs.where(col("vec_id") < 200)
    val ivf = Ann.trainIvf(base, "embedding", numCells = 4)
    val pk = PackedKnn.packIvf(base, ivf, idCol = "vec_id", vecCol = "embedding")
    val handle = new EventStream.GraphIngestHandle(
      PackedGraph.build[Long](pk, degree = 8, efConstruction = 32))
    pk.unpersist()
    val tmp = java.nio.file.Files.createTempDirectory("graft-graphingest")
    try {
      val mem = { implicit val sqlc = spark.sqlContext
        MemoryStream[(Long, Array[Float], String)] }
      val q = EventStream.graphIngestStream(
        mem.toDF().toDF("id", "vec", "op"), handle,
        checkpointDir = s"$tmp/ck")
      // batch 0: 20 inserts + 5 deletes; batch 1: 5 replacements (upsert
      // of standing ids with DIFFERENT vectors)
      val adds = (200L to 219L).map(i => (i, allRows(i), "upsert"))
      val dels = (0L to 4L).map(i => (i, null: Array[Float], "delete"))
      val repl = (5L to 9L).map(i => (i, allRows(250 + (i - 5)), "upsert"))
      try {
        mem.addData(adds ++ dels: _*)
        q.processAllAvailable()
        mem.addData(repl: _*)
        q.processAllAvailable()
      } finally q.stop()
      assert(handle.lastBatchId === 1L)

      // stream == batch: full probe + unbounded ef over the ingested
      // graph equals the exact scan over the expected final corpus
      val expDf = ((10L until 200L).map(i => (i, allRows(i))) ++
          (200L to 219L).map(i => (i, allRows(i))) ++
          (5L to 9L).map(i => (i, allRows(250 + (i - 5)))))
        .toDF("vec_id", "embedding")
      val queryDF = Seq(100L, 101L, 102L, 103L)
        .map(i => (i, allRows(i))).toDF("query_id", "query_vec")
      def triples(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val want = triples(Knn.knnJoin(queryDF, expDf, k = 5, metric = "cosine",
        corpusId = "vec_id", corpusVec = "embedding"))
      def got() = triples(PackedGraph.search(handle.pg, queryDF,
        k = 5, nProbe = 4, ef = 0, metric = "cosine"))
      assert(got() === want)

      // at-least-once replay: a re-delivered batch id is SKIPPED (its
      // rows are already resident; insertion is not idempotent)
      val replayDf = repl.toDF("id", "vec", "op")
      EventStream.commitGraphIngestBatch(handle, replayDf, 1L, "cosine",
        "id", "vec", "op", 65536)
      assert(handle.lastBatchId === 1L)
      assert(got() === want, "a replayed batch must not mutate the graph")
      // a batch id that JUMPS the horizon (checkpoint newer than the
      // restored graph snapshot) fails loud
      val e = intercept[IllegalArgumentException] {
        EventStream.commitGraphIngestBatch(handle, replayDf, 5L, "cosine",
          "id", "vec", "op", 65536)
      }
      assert(e.getMessage.contains("replay horizon"))
      // the ingest chain folds like any CRUD chain
      assert(handle.pg.generations > 1)
      val folded = PackedGraph.compact(handle.pg)
      handle.pg.unpersist()
      handle.pg = folded
      assert(handle.pg.generations === 1 && got() === want)
    } finally handle.pg.unpersist(blocking = true)
  }

  test("graph snapshot pairs horizon + checkpoint identity: kill/restore resumes without manual bookkeeping") {
    import graft.operators.{Ann, Knn, PackedGraph, PackedKnn}
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val allRows = embs.where(col("vec_id") < 240)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val base = embs.where(col("vec_id") < 200)
    val ivf = Ann.trainIvf(base, "embedding", numCells = 4)
    val pk = PackedKnn.packIvf(base, ivf, idCol = "vec_id", vecCol = "embedding")
    val handle = new EventStream.GraphIngestHandle(
      PackedGraph.build[Long](pk, degree = 8, efConstruction = 32))
    pk.unpersist()
    val tmp = java.nio.file.Files.createTempDirectory("graft-graphsnap")
    try {
      // batch 0 through a real checkpointed stream: the first commit
      // BINDS the checkpoint identity onto the handle
      val mem = { implicit val sqlc = spark.sqlContext
        MemoryStream[(Long, Array[Float], String)] }
      val q = EventStream.graphIngestStream(
        mem.toDF().toDF("id", "vec", "op"), handle,
        checkpointDir = s"$tmp/ck")
      try {
        mem.addData((200L to 219L).map(i => (i, allRows(i), "upsert")): _*)
        q.processAllAvailable()
      } finally q.stop()
      assert(handle.lastBatchId === 0L)
      assert(handle.checkpointId != null,
        "the first commit must bind the checkpoint identity")

      // snapshot the (graph, horizon, checkpoint) TRIPLE, then "kill"
      EventStream.saveGraphSnapshot(handle, s"$tmp/snap")
      handle.pg.unpersist(blocking = true)

      // restore: horizon and identity come back together — no manual
      // bookkeeping; the at-least-once replay of batch 0 is skipped and
      // batch 1 applies
      val restored = EventStream.loadGraphSnapshot(spark, s"$tmp/snap")
      assert(restored.lastBatchId === 0L)
      assert(restored.checkpointId === handle.checkpointId)
      EventStream.bindCheckpoint(restored, s"$tmp/ck") // same checkpoint: fine
      val batch0 = (200L to 219L).map(i => (i, allRows(i), "upsert"))
        .toDF("id", "vec", "op")
      EventStream.commitGraphIngestBatch(restored, batch0, 0L, "cosine",
        "id", "vec", "op", 65536)
      val batch1 = (220L to 229L).map(i => (i, allRows(i), "upsert"))
        .toDF("id", "vec", "op")
      EventStream.commitGraphIngestBatch(restored, batch1, 1L, "cosine",
        "id", "vec", "op", 65536)
      assert(restored.lastBatchId === 1L)
      val expDf = (0L until 230L).map(i => (i, allRows(i)))
        .toDF("vec_id", "embedding")
      val queryDF = Seq(100L, 101L, 102L)
        .map(i => (i, allRows(i))).toDF("query_id", "query_vec")
      def triples(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(triples(PackedGraph.search(restored.pg, queryDF,
          k = 5, nProbe = 4, ef = 0, metric = "cosine")) ===
        triples(Knn.knnJoin(queryDF, expDf, k = 5, metric = "cosine",
          corpusId = "vec_id", corpusVec = "embedding")),
        "resumed ingest must equal the exact scan — no double-applied or lost batch")

      // a FRESH checkpoint (different metadata id) against the restored
      // horizon fails LOUD — its genuinely new batches 0..N would
      // otherwise be skip-eaten as replays
      graft.sources.Collections.writeString(s"$tmp/ck2/metadata",
        """{"id":"00000000-0000-0000-0000-00000000beef"}""")
      val e = intercept[IllegalArgumentException] {
        EventStream.bindCheckpoint(restored, s"$tmp/ck2")
      }
      assert(e.getMessage.contains("checkpoint"))

      // a second save supersedes the first version atomically; reload
      // round-trips the advanced horizon
      EventStream.saveGraphSnapshot(restored, s"$tmp/snap")
      val again = EventStream.loadGraphSnapshot(spark, s"$tmp/snap")
      assert(again.lastBatchId === 1L && again.checkpointId === restored.checkpointId)
      again.pg.unpersist(blocking = true)
      restored.pg.unpersist(blocking = true)
    } finally handle.pg.unpersist(blocking = true)
  }

  test("streaming SQ8 serving equals the batch decoded-space search per micro-batch") {
    import graft.operators.{Ann, PackedSq, Quantization}
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ivf = Ann.trainIvf(embs, "embedding", numCells = 4)
    val sq = Quantization.trainSq(embs, "embedding")
    val pi = PackedSq.packIvfSq(embs, ivf, sq, idCol = "vec_id", vecCol = "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamsq")
    try {
      val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q = EventStream.sqQueryStream(
        mem.toDF().toDF("query_id", "query_vec"), pi, k = 5,
        outDir = s"$tmp/out", checkpointDir = s"$tmp/ck",
        nProbe = 4, metric = "cosine")
      val qVecs = embs.where(col("vec_id") < 4)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      try {
        mem.addData(qVecs(0), qVecs(1))
        q.processAllAvailable()
        mem.addData(qVecs(2), qVecs(3)) // second batch, same resident slabs
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(s"$tmp/out")
        .select("query_id", "rank", "neighbor_id", "dist")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      // full probe == sqSearch row-identity (the q130 contract)
      val coded = embs.withColumn("sq_code", Quantization.sqEncode(sq)(col("embedding")))
      val queryDF = embs.where(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val want = Quantization.sqSearch(queryDF, coded, sq, k = 5, corpusId = "vec_id")
        .select("query_id", "rank", "neighbor_id", "dist")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === want)
      // int-domain twin: the stream serves the integer-ADC kernel's
      // results verbatim (a deployment that opted the byte tier into the
      // int kernel gets the same on its streaming twin)
      val memI = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val qI = EventStream.sqQueryStream(
        memI.toDF().toDF("query_id", "query_vec"), pi, k = 5,
        outDir = s"$tmp/outI", checkpointDir = s"$tmp/ckI",
        nProbe = 4, metric = "cosine", domain = "int")
      try {
        memI.addData(qVecs(0), qVecs(1))
        qI.processAllAvailable()
      } finally qI.stop()
      val gotI = spark.read.parquet(s"$tmp/outI")
        .select("query_id", "rank", "neighbor_id", "dist")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val wantI = PackedSq.searchSqInt[Long](pi,
          qVecs.take(2), k = 5, nProbe = 4, metric = "cosine")
        .flatMap { case (qid, nbrs) => nbrs.zipWithIndex.map {
          case ((nid, d), pos) => (qid, pos + 1, nid, d) } }.toSet
      assert(gotI === wantI)
      // oversized micro-batch: the contract cap fails the stream loudly
      val q2 = EventStream.sqQueryStream(
        mem.toDF().toDF("query_id", "query_vec"), pi, k = 5,
        outDir = s"$tmp/out2", checkpointDir = s"$tmp/ck2", maxQueryRows = 1)
      try {
        mem.addData(qVecs(0), qVecs(1))
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
        }
        assert(ex.getMessage.contains("maxQueryRows") ||
          Option(ex.getCause).exists(_.getMessage.contains("maxQueryRows")))
      } finally q2.stop()
    } finally pi.unpersist(blocking = true)
  }

  test("streaming PQ-code serving equals the batch IVF-PQ funnel per micro-batch") {
    import graft.operators.{Ann, PackedPq, Quantization}
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ivf = Ann.trainIvf(embs, "embedding", numCells = 4)
    val pq = Quantization.trainPq(embs, "embedding", numSubspaces = 8, numCentroids = 16)
    val pi = PackedPq.packIvfPq(embs, ivf, pq, idCol = "vec_id", vecCol = "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-streampq")
    try {
      val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q = EventStream.pqQueryStream(
        mem.toDF().toDF("query_id", "query_vec"), pi, embs, k = 5,
        outDir = s"$tmp/out", checkpointDir = s"$tmp/ck",
        nProbe = 2, fetchK = 20, metric = "l2",
        corpusId = "vec_id", vecCol = "embedding")
      val qVecs = embs.where(col("vec_id") < 4)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      try {
        mem.addData(qVecs(0), qVecs(1))
        q.processAllAvailable()
        mem.addData(qVecs(2), qVecs(3)) // second batch, same resident codes
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(s"$tmp/out")
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // the batch path on the same models — row-identical by the q122 contract
      val queryDF = embs.where(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val want = Ann.ivfPqSearch(queryDF, embs, ivf, pq, k = 5, nProbe = 2,
          fetchK = 20, metric = "l2", corpusId = "vec_id", vecCol = "embedding")
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === want)
      // oversized micro-batch: the contract cap fails the stream loudly
      val q2 = EventStream.pqQueryStream(
        mem.toDF().toDF("query_id", "query_vec"), pi, embs, k = 5,
        outDir = s"$tmp/out2", checkpointDir = s"$tmp/ck2",
        metric = "l2", corpusId = "vec_id", vecCol = "embedding",
        maxQueryRows = 1)
      try {
        mem.addData(qVecs(0), qVecs(1))
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
        }
        assert(ex.getMessage.contains("maxQueryRows") ||
          Option(ex.getCause).exists(_.getMessage.contains("maxQueryRows")))
      } finally q2.stop()
    } finally pi.unpersist(blocking = true)
  }

  test("continuous ingest dedup: index-backed, survivors append across batches") {
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, String)] }
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamdedup")
    val (ixDir, outDir, ckDir) =
      (s"$tmp/ix", s"$tmp/out", s"$tmp/ck")
    graft.operators.Dedup.saveDedupIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "spark partitions shuffle broadcast join exchange plan"))
        .toDF("doc_id", "text"),
      "doc_id", "text", ixDir)

    val q = EventStream.dedupIngestStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", ixDir, outDir, ckDir)
    try {
      // batch 1: a near-copy of corpus doc 1 (dropped) + a fresh doc (kept)
      mem.addData((101L, "the quick brown fox jumps over the lazy dog"),
        (102L, "fresh unique sentence with brand new words entirely"))
      q.processAllAvailable()
      // batch 2: a copy of batch 1's accepted doc — caught ONLY because the
      // index was appended; plus another fresh doc
      mem.addData((201L, "fresh unique sentence with brand new words entirely"),
        (202L, "unrelated corpus of totally different tokens qqq www"))
      q.processAllAvailable()
    } finally q.stop()

    val accepted = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted === Set(102L, 202L))
    // the index now remembers all accepted docs across both batches
    assert(graft.operators.Dedup.readDedupStats(ixDir).nDocs === 4L)
  }

  test("streaming pipeline ingest: row-local gates + durable dedup memory") {
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, String, String)] }
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamprep")
    val (ixDir, outDir, ckDir) = (s"$tmp/ix", s"$tmp/out", s"$tmp/ck")
    graft.operators.Dedup.saveDedupIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog tonight"))
        .toDF("doc_id", "text"),
      "doc_id", "text", ixDir)
    val spec = graft.operators.PipelineSpec(
      langAllow = Set("en"), exactDedup = true)
    val q = EventStream.prepareIngestStream(
      mem.toDF().toDF("doc_id", "text", "lang"), "doc_id", "text",
      spec, ixDir, outDir, ckDir)
    try {
      // batch 1: zh doc (language-gated), near-copy of the corpus doc
      // (index probe drops it), an in-batch exact pair (keeper survives),
      mem.addData(
        (101L, "totally new text in another language entirely here", "zh"),
        (102L, "the quick brown fox jumps over the lazy dog", "en"),
        (103L, "fresh unique sentence with brand new words entirely", "en"),
        (104L, "fresh unique sentence with brand new words entirely", "en"))
      q.processAllAvailable()
      // batch 2: a copy of batch 1's accepted doc — caught ONLY because
      // the index remembers accepted survivors; plus a fresh doc
      mem.addData(
        (201L, "fresh unique sentence with brand new words entirely", "en"),
        (202L, "unrelated corpus of totally different tokens qqq www", "en"))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted === Set(103L, 202L))
    assert(graft.operators.Dedup.readDedupStats(ixDir).nDocs === 3L)
  }

  test("streaming ingest applies the LM gate identically to the batch pipeline") {
    import graft.operators.NgramLm
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, String)] }
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamlm")
    val (ixDir, outDir, ckDir) = (s"$tmp/ix", s"$tmp/out", s"$tmp/ck")
    graft.operators.Dedup.saveDedupIndex(
      Seq((1L, "an utterly unrelated standing corpus document zzz"))
        .toDF("doc_id", "text"), "doc_id", "text", ixDir)
    val lm = NgramLm.fit(Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the lazy dog sleeps under the warm sun")).toDF("doc_id", "text"),
      "text")
    val good = "the quick brown fox sleeps under the sun"
    val bad = "zz qq ww rr tt yy uu ii oo pp"
    // self-calibrating cut: midway between the two batch-scored ppls —
    // the stream must reproduce the batch decision exactly
    val ppl = NgramLm.crossEntropy(
        Seq((1L, good), (2L, bad)).toDF("doc_id", "text"), lm, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    assert(ppl(1L) < ppl(2L))
    val spec = graft.operators.PipelineSpec(
      lmModel = Some(lm), maxPerplexity = (ppl(1L) + ppl(2L)) / 2)
    val q = EventStream.prepareIngestStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      spec, ixDir, outDir, ckDir)
    try {
      mem.addData((101L, good), (102L, bad))
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted === Set(101L))
  }

  test("funnel counts only in-order completions") {
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),   // click BEFORE view: step 2 not reached
      (3L, ts(5), "view"),                          // stops at step 1
      (4L, ts(1), "purchase"))                      // never starts
      .toDF("user_id", "ts", "event_type")
    val got = Events.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("streaming funnel progress matches the batch funnel across batches") {
    def ev(id: Long, u: Long, s: Int, t: String) = EventStream.Event(
      id, java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$s%02d"), u, t, 0.0, "{}")
    // u1 completes across TWO micro-batches; u2's click precedes its view
    val batch1 = Seq(ev(1, 1, 1, "view"), ev(2, 1, 2, "click"),
      ev(3, 2, 1, "click"), ev(4, 2, 2, "view"))
    val batch2 = Seq(ev(5, 1, 3, "purchase"), ev(6, 2, 3, "view"))
    val mem = MemoryStream[EventStream.Event](spark)
    val out = EventStream.funnelProgress(mem.toDS(),
      Seq("view", "click", "purchase")).toDF()
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    // last update per user = final reached level
    val fin = spark.table("funnel_out")
      .groupBy("user_id").agg(max(col("reached")).as("r")) // reached is monotone
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fin === Map(1L -> 3, 2L -> 1))
    // equals the batch op's reachability on the same events
    val batchDf = (batch1 ++ batch2)
      .map(e => (e.user_id, e.ts, e.event_type)).toDF("user_id", "ts", "event_type")
    val batchCounts = Events.funnel(batchDf, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(batchCounts === Map(1 -> 2L, 2 -> 1L, 3 -> 1L))
    // streaming levels imply the same per-step counts
    assert(fin.values.count(_ >= 1) === batchCounts(1))
    assert(fin.values.count(_ >= 2) === batchCounts(2))
    assert(fin.values.count(_ >= 3) === batchCounts(3))
  }

  test("streaming chunked maxP retrieval equals the batch maxP over all chunks") {
    import graft.functions.{Embeddings, TextAnalysis}
    import graft.operators.PackedKnn
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 60)
    val chunks = docs.select(col("doc_id"),
        explode(TextAnalysis.chunks(col("text"), windowSize = 32, stride = 24)).as("c"))
      .select(col("doc_id"),
        Embeddings.mockEmbedding(col("c.chunk"), 16).cast("array<float>").as("emb"))
    val chunkIndex = PackedKnn.pack(chunks, idCol = "doc_id", vecCol = "emb")
    val tmp = java.nio.file.Files.createTempDirectory("graft-maxp")
    try {
      val queries = docs.where(col("doc_id") < 4)
        .select(col("doc_id").as("query_id"),
          Embeddings.mockEmbedding(col("text"), 16).cast("array<float>").as("query_vec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      // batch truth: best (min cosine distance) chunk per (query, doc),
      // docs ranked by (dist, doc_id), top 3
      val chunkRows = chunks.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      def cosDist(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        if (na == 0 || nb == 0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val expected = queries.map { case (qid, qv) =>
        val best = chunkRows.groupBy(_._1).view
          .mapValues(_.map(c => cosDist(qv, c._2)).min).toSeq
          .sortBy { case (doc, d) => (d, doc) }.take(3)
        qid -> best.zipWithIndex
          .map { case ((doc, d), i) => (i + 1, doc, math.rint(d * 1e4) / 1e4) }
      }.toMap

      val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q = EventStream.maxPQueryStream(
        mem.toDF().toDF("query_id", "query_vec"), chunkIndex,
        k = 3, fetchK = chunkRows.length, // full coverage: stream == batch exactly
        outDir = s"$tmp/out", checkpointDir = s"$tmp/ck")
      try {
        mem.addData((queries(0)._1, queries(0)._2), (queries(1)._1, queries(1)._2))
        q.processAllAvailable()
        mem.addData((queries(2)._1, queries(2)._2), (queries(3)._1, queries(3)._2))
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.read.parquet(s"$tmp/out")
        .select("query_id", "rank", "doc_id", "dist").collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e4) / 1e4)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      assert(got.keySet === expected.keySet)
      for ((qid, want) <- expected)
        assert(got(qid) === want, s"query $qid")
    } finally chunkIndex.unpersist(blocking = true)
  }

  test("streaming knn fails loud on an oversized query micro-batch") {
    import graft.operators.PackedKnn
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("id", "vec")
    val pc = PackedKnn.pack(corpus)
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamcap")
    try {
      val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q = EventStream.knnQueryStream(
        mem.toDF().toDF("query_id", "query_vec"), pc, k = 1,
        outDir = s"$tmp/out", checkpointDir = s"$tmp/ck", maxQueryRows = 2)
      try {
        // a source misconfigured to pipe a corpus-sized table in as
        // queries must fail with the contract message, not OOM the driver
        mem.addData((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def chain(t: Throwable): Seq[String] =
          Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
            .map(x => Option(x.getMessage).getOrElse("")).toSeq
        assert(chain(e).exists(_.contains("maxQueryRows")), chain(e).mkString("|"))
      } finally q.stop()

      // under the cap the same plumbing serves normally
      val mem2 = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q2 = EventStream.knnQueryStream(
        mem2.toDF().toDF("query_id", "query_vec"), pc, k = 1,
        outDir = s"$tmp/out2", checkpointDir = s"$tmp/ck2", maxQueryRows = 2)
      try { mem2.addData((7L, Array(1f, 0f))); q2.processAllAvailable() }
      finally q2.stop()
      assert(spark.read.parquet(s"$tmp/out2").count() === 1)

      // maxP twin enforces the same contract
      val mem3 = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Array[Float])] }
      val q3 = EventStream.maxPQueryStream(
        mem3.toDF().toDF("query_id", "query_vec"), pc, k = 1, fetchK = 2,
        outDir = s"$tmp/out3", checkpointDir = s"$tmp/ck3", maxQueryRows = 1)
      try {
        mem3.addData((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
        val e3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q3.processAllAvailable()
        }
        def chain3(t: Throwable): Seq[String] =
          Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
            .map(x => Option(x.getMessage).getOrElse("")).toSeq
        assert(chain3(e3).exists(_.contains("maxQueryRows")))
      } finally q3.stop()
    } finally pc.unpersist(blocking = true)
  }

  test("ingest profile partials fold to the accepted-corpus profile without a rescan") {
    import graft.operators.{CorpusReport, Dedup}
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingestprof")
    val (ixDir, outDir, profDir) = (s"$tmp/ix", s"$tmp/out", s"$tmp/prof")
    Dedup.saveDedupIndex(
      Seq((1L, "seed document with unique words entirely tonight"))
        .toDF("doc_id", "text"),
      "doc_id", "text", ixDir)
    val batches = Seq(
      Seq((100L, "the quick brown fox jumps tonight", "en"),
        (101L, "der schnelle braune fuchs springt", "de")),
      Seq((200L, "completely fresh material appears here now", "en"),
        (201L, "seed document with unique words entirely tonight", "en")), // dropped vs index
      Seq((300L, "yet another novel sentence arrives today", "fr")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      EventStream.commitIngestBatch(rows.toDF("doc_id", "text", "lang"),
        "doc_id", "text", ixDir, outDir, threshold = 0.5, batchId = i.toLong,
        profileDir = Some(profDir))
    }
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val merged = toMap(CorpusReport.profileMerged(spark, profDir))
    val full = toMap(CorpusReport.profile(
      spark.read.parquet(outDir), "doc_id", "text", "lang"))
    assert(merged.keySet === full.keySet)
    full.foreach { case (k, v) =>
      if (k == "mean_quality") assert(math.abs(merged(k) - v) < 1e-9, k)
      else assert(merged(k) === v, k)
    }
    assert(merged("n_docs") === 4.0, "index-dropped doc must not be profiled")
    // a replayed batch overwrites its own partial — no double counting
    EventStream.commitIngestBatch(batches(1).toDF("doc_id", "text", "lang"),
      "doc_id", "text", ixDir, outDir, threshold = 0.5, batchId = 1L,
      profileDir = Some(profDir))
    assert(toMap(CorpusReport.profileMerged(spark, profDir)) === merged)
  }

  test("ingest replay past the marker-retention horizon fails loud") {
    import graft.operators.Dedup
    val tmp = java.nio.file.Files.createTempDirectory("graft-horizon")
    val (ixDir, outDir) = (s"$tmp/ix", s"$tmp/out")
    Dedup.saveDedupIndex(
      Seq((1L, "seed document with some unique words in it tonight"))
        .toDF("doc_id", "text"),
      "doc_id", "text", ixDir)
    def batchOf(id: Long) = Seq((id, s"fresh unique material number $id entirely new words"))
      .toDF("doc_id", "text")
    EventStream.commitIngestBatch(batchOf(100L), "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 0L)
    // the stream advances far past the retention window
    EventStream.commitIngestBatch(batchOf(200L), "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 150L)
    // a replay DEEPER than the retention window (a restored ancient
    // checkpoint): its marker is unknowable, so a silent re-append would
    // permanently drift the index — must fail with the remedy instead
    val e = intercept[IllegalStateException] {
      EventStream.commitIngestBatch(batchOf(300L), "doc_id", "text", ixDir, outDir,
        threshold = 0.5, batchId = 10L)
    }
    assert(e.getMessage.contains("marker-retention") &&
      e.getMessage.contains("rebuild"), e.getMessage)
    // replays INSIDE the window stay idempotent (the normal crash lag)
    EventStream.commitIngestBatch(batchOf(200L), "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 150L)
    assert(spark.read.parquet(outDir).where(col("batch_id") === 150).count() === 1)
  }

  test("ingest commit is idempotent under at-least-once batch replay") {
    import graft.operators.Dedup
    val tmp = java.nio.file.Files.createTempDirectory("graft-replay")
    val (ixDir, outDir) = (s"$tmp/ix", s"$tmp/out")
    Dedup.saveDedupIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog tonight"))
        .toDF("doc_id", "text"),
      "doc_id", "text", ixDir)
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),      // dropped
      (102L, "fresh unique sentence with brand new words entirely")) // kept
      .toDF("doc_id", "text")
    EventStream.commitIngestBatch(batch, "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 7L)
    val once = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(once === Seq(102L))
    assert(Dedup.readDedupStats(ixDir).nDocs === 2L)
    // replay of the SAME micro-batch (foreachBatch at-least-once): the
    // corpus subdir is overwritten, the index append is marker-skipped
    EventStream.commitIngestBatch(batch, "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 7L)
    val twice = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(twice === Seq(102L), "replay must not duplicate accepted rows")
    assert(Dedup.readDedupStats(ixDir).nDocs === 2L,
      "replay must not double-append the index")
    // deepest crash window: index append landed but the marker did not.
    // The replay-stable survivor set (same-id matches excluded) must keep
    // the accepted row rather than dropping it against its own signatures
    val marker = new org.apache.hadoop.fs.Path(s"$ixDir/_committed_batch_7")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false))
    EventStream.commitIngestBatch(batch, "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 7L)
    val deep = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(deep === Seq(102L),
      "post-append replay must not lose the accepted row")
    // the killer case: a batch holding MUTUALLY-near-duplicate docs with
    // distinct ids. Both are admitted (intra-batch dedup is not the index
    // probe's job), both signatures land; a replay whose marker was lost
    // must NOT drop them against each other's ghost signatures (the
    // batch's own ids are excluded from the index probe wholesale)
    val twins = Seq(
      (301L, "identical twin sentence with many shared words here"),
      (302L, "identical twin sentence with many shared words here"))
      .toDF("doc_id", "text")
    EventStream.commitIngestBatch(twins, "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 8L)
    val admitted = spark.read.parquet(outDir)
      .where(col("batch_id") === 8).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted === Set(301L, 302L))
    val marker8 = new org.apache.hadoop.fs.Path(s"$ixDir/_committed_batch_8")
    assert(fs.delete(marker8, false))
    EventStream.commitIngestBatch(twins, "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 8L)
    val afterReplay = spark.read.parquet(outDir)
      .where(col("batch_id") === 8).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(afterReplay === Set(301L, 302L),
      "replayed twins must not vanish against their own ghost signatures")
    // and a LATER batch near-dupping the twins is still caught
    val echo = Seq((401L, "identical twin sentence with many shared words here"))
      .toDF("doc_id", "text")
    EventStream.commitIngestBatch(echo, "doc_id", "text", ixDir, outDir,
      threshold = 0.5, batchId = 9L)
    val echoRows = spark.read.parquet(outDir)
      .where(col("batch_id") === 9).count()
    assert(echoRows === 0L, "a later duplicate of the twins must be dropped")
  }

  test("streaming drift monitor: per-batch KL equals the batch cellDrift sum") {
    import graft.operators.Ann
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = Ann.trainIvf(embs, "embedding", numCells = 8)
    val reference = embs.select(col("embedding"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift")
    val batch1 = embs.where(col("vec_id") % 3 === 0)        // corpus-shaped
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val batch2 = embs.where(col("label") < 2)               // biased slice
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = { implicit val sqlc = spark.sqlContext; MemoryStream[(Long, Seq[Float])] }
    val q = EventStream.driftMonitorStream(
      mem.toDF().toDF("vec_id", "embedding"), model, reference, "embedding",
      s"$tmp/out", s"$tmp/ck")
    try {
      mem.addData(batch1.toSeq: _*); q.processAllAvailable()
      mem.addData(batch2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$tmp/out")
      .select("batch_id", "n_rows", "kl").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set(0, 1))
    assert(out(0)._1 === batch1.length.toLong)
    // a corpus-shaped batch drifts less than a label-biased one
    assert(out(0)._2 < out(1)._2,
      s"corpus-shaped kl ${out(0)._2} must be below biased kl ${out(1)._2}")
    // the streamed number IS the batch operator's: sum of cellDrift
    // contributions with A = the batch, B = the reference
    def batchKl(ids: Set[Long]): Double =
      Ann.cellDrift(embs.where(col("vec_id").isInCollection(ids)), reference,
          model, "embedding")
        .agg(sum(col("kl_contrib"))).head().getDouble(0)
    assert(math.abs(out(1)._2 - batchKl(batch2.map(_._1).toSet)) < 1e-9)
  }
}
