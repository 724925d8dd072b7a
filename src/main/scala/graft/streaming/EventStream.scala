package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming twins of the Events operators — the reference's
  * pub/sub bus (realtime.py:125-318) re-expressed as streaming DataFrames.
  *
  * The reference's broadcaster is a bounded in-process queue with
  * drop-oldest overflow; Structured Streaming replaces that with source
  * offsets + backpressure, and "subscriptions" become streaming filters
  * that scale out instead of fanning out on one thread.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)

  final case class SessionUpdate(user_id: Long, session_id: Long,
                                 n_events: Long, start_ms: Long, end_ms: Long,
                                 closed: Boolean)

  /** Streaming subscription: the same predicate as Events.subscriptionFilter
    * applied to an unbounded stream (E2). */
  def subscribe(stream: DataFrame, eventTypes: Seq[String] = Nil,
                propsEquals: Map[String, String] = Map.empty): DataFrame =
    stream.where(Events.subscriptionFilter(eventTypes, propsEquals))

  /** Watermarked tumbling-window aggregation (the windowed extension the
    * reference lacks — SURVEY §2.8). */
  def windowedCounts(stream: DataFrame, windowDuration: String,
                     watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Custom stateful sessionization via mapGroupsWithState: gap-based
    * sessions per user. State is one small record per live (user) key AND
    * keys RETIRE: an event-time timeout closes a user's session once the
    * watermark passes its last event + gap (emitting it with closed=true)
    * and removes the state — at 100× distinct users the store holds only
    * currently-active users, not every user ever seen. (Event-time, not
    * processing-time: the close is deterministic under replay, and a
    * processing-time timeout makes the engine re-trigger batches forever
    * even with no data.) */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[SessionUpdate] =
    sessionizeMs(events, gapMinutes * 60000L)

  /** Millisecond-gap form (tests exercise the timeout without minute-scale
    * event gaps). */
  def sessionizeMs(events: Dataset[Event], gapMs: Long): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long, Long, Long), SessionUpdate](
        GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[(Long, Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // idle gap elapsed (watermark passed end + gap) with no new
            // events: close and retire the key
            val (sid, n, start, end) = state.get
            state.remove()
            SessionUpdate(userId, sid, n, start, end, closed = true)
          } else {
            // state = (session_id, n_events, start_ms, end_ms)
            var (sid, n, start, end) =
              state.getOption.getOrElse((0L, 0L, Long.MinValue, Long.MinValue))
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (start == Long.MinValue) { sid = 1; n = 1; start = t; end = t }
              else if (t - end > gapMs) { sid += 1; n = 1; start = t; end = t }
              else { n += 1; end = math.max(end, t) }
            }
            state.update((sid, n, start, end))
            // must be strictly past the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(end + gapMs, state.getCurrentWatermarkMs() + 1))
            SessionUpdate(userId, sid, n, start, end, closed = false)
          }
      }
  }

  final case class FunnelUpdate(user_id: Long, reached: Int, step_ts_ms: Long)

  /** Streaming twin of [[Events.funnel]]: per-user ordered-step progress
    * via mapGroupsWithState. State is two numbers per user (highest step
    * reached + its event time); each micro-batch advances greedily over
    * its events in (ts, event_id) order — greedy first-match IS the batch
    * op's earliest-completion semantics, so on an in-order stream the
    * final `reached` levels equal the batch funnel's (the spec asserts
    * it). Late events older than the recorded step time cannot
    * retroactively advance a step — replay through the batch op is the
    * deterministic truth, as with the other streaming twins. */
  def funnelProgress(events: Dataset[Event], steps: Seq[String]): Dataset[FunnelUpdate] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepArr = steps.toArray
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Int, Long), FunnelUpdate](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[(Int, Long)]) =>
          var (reached, lastTs) = state.getOption.getOrElse((0, Long.MinValue))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (reached < stepArr.length && e.event_type == stepArr(reached) &&
                e.ts.getTime > lastTs) {
              reached += 1
              lastTs = e.ts.getTime
            }
          }
          state.update((reached, lastTs))
          FunnelUpdate(userId, reached, lastTs)
      }
  }

  /** A late subscriber's view: the replayed history tail plus the live
    * stream, split at the connect offset. */
  final case class Subscription(replay: DataFrame, live: DataFrame)

  /** Replay-on-connect (realtime.py:155-160: a new subscriber is first
    * sent the last `n` events from the history buffer, then live events).
    *
    * Spark cannot union a batch frame into a stream, so the handoff is an
    * offset split over the persisted event log: `replay` is a batch tail
    * of the log at connect time (<= maxId), `live` is the streaming
    * subscription filtered to events AFTER the connect offset — together
    * they cover the log exactly once. Both sides share the subscription
    * predicate. */
  def subscribeWithReplay(spark: SparkSession, logDir: String, n: Int,
                          eventTypes: Seq[String] = Nil,
                          propsEquals: Map[String, String] = Map.empty): Subscription = {
    val history = spark.read.parquet(logDir)
    val maxId = history.agg(max(col("event_id"))).head().getLong(0)
    val replay = Events.subscribe(history, eventTypes, propsEquals)
      .where(col("event_id") <= maxId)
      .orderBy(desc("ts"), desc("event_id")).limit(n)
      .withColumn("phase", lit("replay"))
    val live = subscribe(
        spark.readStream.schema(history.schema).parquet(logDir),
        eventTypes, propsEquals)
      .where(col("event_id") > maxId)
      .withColumn("phase", lit("live"))
    Subscription(replay, live)
  }

  /** Streaming ingest dedup: drop rows whose key (id, content fingerprint,
    * ...) was already seen — exactly-once semantics over an at-least-once
    * source, or content dedup at the door of a training-data ingest.
    *
    * State is one entry per key WITHIN THE WATERMARK: Spark's
    * dropDuplicatesWithinWatermark evicts a key's state once the watermark
    * passes its event time + delay, so the store is bounded by the key
    * arrival rate x watermark window — not by all keys ever seen (the
    * unbounded-state trap of plain dropDuplicates on a stream). Duplicates
    * farther apart than the watermark delay are the upstream log
    * compactor's job (batch Dedup.exact), not the ingest filter's. */
  def dedupByKey(stream: DataFrame, keyCols: Seq[String], tsCol: String,
                 watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Memory-sink runner for tests/demos: processes all available input
    * synchronously and returns the sink table. */
  def runToMemory(out: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    out.sparkSession.table(name)
  }

  /** Continuous near-dup ingest against a PERSISTED dedup index (the
    * streaming twin of Dedup.dedupAgainstIndex): each micro-batch is
    * LSH-probed against the index's pruned buckets, exact-verified, the
    * survivors written to `outDir` AND appended to the index — so later
    * batches (and later duplicates of THIS batch's docs) are checked
    * against everything accepted so far. [[dedupByKey]] is the exact-key
    * gate bounded by a watermark; this is the content-similarity gate
    * with durable, unbounded memory — the state lives in the index
    * sidecar, not the state store, so a restart resumes checking against
    * the full accepted corpus for free.
    *
    * foreachBatch is the right harness: per batch this is exactly the
    * batch operator (same pruned reads, same broadcast batch side), and
    * the index append is transactional per micro-batch. Near-dups WITHIN
    * one micro-batch are not mutually checked (same as the batch
    * operator); callers needing that run Dedup.minhashLsh on the batch
    * first. */
  /** Continuous similarity serving: a stream of (query_id, query_vec)
    * batches searched against the RESIDENT packed index
    * (operators.PackedKnn), results appended to `outDir` as
    * (query_id, rank, neighbor_id, dist) — the streaming twin of the
    * reference's always-on search server (server.py's /search endpoint),
    * with the corpus resident in executor memory instead of one process.
    *
    * foreachBatch is the right harness here too: per micro-batch this is
    * exactly the batch packed search (query batch to the driver — the
    * operator's "queries are small" contract — one job over the resident
    * blocks, Q*k rows out), so latency is the packed search latency, not
    * a per-query job. The corpus handle outlives the query; mutations are
    * [[graft.operators.PackedKnn.append]]-style new blocks, not state. */
  /** Shared capped collect for the packed-serving foreachBatch sinks: the
    * "queries are small" contract is ENFORCED like Knn.knnJoinFused's —
    * the collect is bounded by a limit, so a misconfigured source (a
    * corpus-sized table piped in as the query stream) fails loudly with
    * the remedy instead of OOMing the driver mid-stream. */
  private def collectQueryBatch(batch: DataFrame, queryId: String,
                                queryVec: String, maxQueryRows: Int,
                                op: String): Array[org.apache.spark.sql.Row] = {
    val rows = batch
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .where(col(queryId).isNotNull && col(queryVec).isNotNull)
      .limit(maxQueryRows + 1)
      .collect()
    require(rows.length <= maxQueryRows,
      s"$op micro-batch exceeds maxQueryRows=$maxQueryRows: the packed " +
        "serving path holds each query micro-batch on the driver. Raise " +
        "maxQueryRows deliberately, shrink the trigger interval, or use " +
        "the distributed batch operators (Knn.knnJoin) for corpus-sized " +
        "query sets.")
    rows
  }

  def knnQueryStream(stream: DataFrame, pc: graft.operators.PackedKnn.PackedCorpus[Long],
                     k: Int, outDir: String, checkpointDir: String,
                     metric: String = "cosine",
                     queryId: String = "query_id",
                     queryVec: String = "query_vec",
                     maxQueryRows: Int = 65536): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val qRows = collectQueryBatch(batch, queryId, queryVec, maxQueryRows,
          "knnQueryStream")
        if (qRows.nonEmpty) {
          val qArr = qRows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          val res = graft.operators.PackedKnn.search(pc, qArr, k, metric)
          val spark = batch.sparkSession
          import spark.implicits._
          res.toSeq
            .flatMap { case (qid, nbrs) =>
              nbrs.zipWithIndex.map { case ((nid, d), i) => (qid, i + 1, nid, d) }
            }
            .toDF(queryId, "rank", "neighbor_id", "dist")
            // idempotent under replay: a micro-batch that re-executes
            // after a crash-before-checkpoint OVERWRITES its own
            // partition directory instead of appending duplicate rows
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
      .start()

  /** Streaming twin of chunk-level maxP retrieval (q105's batch shape —
    * Dai & Callan, SIGIR'19): a stream of (query_id, query_vec) batches
    * searched against a RESIDENT packed index of CHUNK vectors whose ids
    * are the OWNING DOC ids (chunks of one doc share its id — PackedKnn
    * never requires unique ids), so long documents are retrieved by their
    * best chunk. Per micro-batch: one packed search over-fetches `fetchK`
    * chunk hits per query, each doc keeps its BEST (min-distance) chunk,
    * docs rank by (dist, doc_id), top `k` append to `outDir` as
    * (query_id, rank, doc_id, dist) — idempotent per batch like
    * [[knnQueryStream]].
    *
    * Exactness: equals the batch maxP over all chunks whenever the fetchK
    * chunk page covers k distinct docs whose best chunks are all in the
    * page — guaranteed at fetchK >= k * maxChunksPerDoc, and in practice
    * at small multiples of k (the spec asserts stream == batch). */
  def maxPQueryStream(stream: DataFrame,
                      chunkIndex: graft.operators.PackedKnn.PackedCorpus[Long],
                      k: Int, fetchK: Int, outDir: String, checkpointDir: String,
                      metric: String = "cosine",
                      queryId: String = "query_id",
                      queryVec: String = "query_vec",
                      maxQueryRows: Int = 65536): org.apache.spark.sql.streaming.StreamingQuery = {
    require(fetchK >= k, s"fetchK ($fetchK) must be >= k ($k)")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val qRows = collectQueryBatch(batch, queryId, queryVec, maxQueryRows,
          "maxPQueryStream")
        if (qRows.nonEmpty) {
          val qArr = qRows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          val res = graft.operators.PackedKnn.search(chunkIndex, qArr, fetchK, metric)
          val spark = batch.sparkSession
          import spark.implicits._
          res.toSeq
            .flatMap { case (qid, chunkHits) =>
              chunkHits.groupBy(_._1).view
                .mapValues(_.map(_._2).min).toSeq        // best chunk per doc
                .sortBy { case (doc, d) => (d, doc) }
                .take(k).zipWithIndex
                .map { case ((doc, d), i) => (qid, i + 1, doc, d) }
            }
            .toDF(queryId, "rank", "doc_id", "dist")
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
      .start()
  }

  /** Streaming twin of the resident PQ-code serving tier
    * ([[graft.operators.PackedPq.search]], q122/q123's funnel): each
    * micro-batch of (query_id, query_vec) rows is answered by ADC over
    * the resident byte slabs — probed partitions only, m bytes touched
    * per candidate — and the fetchK survivors exactly reranked against
    * the raw `corpus`. Per batch the output is row-identical to the
    * batch [[graft.operators.Ann.ivfPqSearch]] (or its residual twin,
    * depending on how `pi` was packed) on the same models; the spec
    * asserts stream == batch. The query-batch collect is contract-capped
    * inside PackedPq.search (`maxQueryRows`, the knnQueryStream cap
    * pattern) — an oversized micro-batch fails loud, not OOM. Output is
    * idempotent per batch: (query_id, rank, neighbor_id, dist) overwrite
    * their own batch_id partition on replay. */
  def pqQueryStream(stream: DataFrame, pi: graft.operators.PackedPq.PackedPqCorpus[Long],
                    corpus: DataFrame, k: Int, outDir: String, checkpointDir: String,
                    nProbe: Int = 4, fetchK: Int = 50, metric: String = "cosine",
                    queryId: String = "query_id", queryVec: String = "query_vec",
                    corpusId: String = "id", vecCol: String = "vec",
                    maxQueryRows: Int = 65536): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // null query rows are SKIPPED, not fatal — the collectQueryBatch
        // stance of the knn/maxP twins (a malformed row in a live stream
        // must not kill the serving query with an NPE)
        val clean = batch
          .where(col(queryId).isNotNull && col(queryVec).isNotNull)
        // the empty-trigger guard costs one limit(1) job (PackedPq.search
        // fails loud on an empty batch by contract)
        if (clean.limit(1).count() > 0) {
          graft.operators.PackedPq.search(pi, clean, corpus, k, nProbe, fetchK,
              metric, queryId, queryVec, corpusId, vecCol, maxQueryRows)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
      .start()

  /** Streaming serving twin of the resident SQ8 tier
    * ([[graft.operators.PackedSq.search]]): each micro-batch of queries
    * answers from the standing byte slabs — decoded-space distances
    * served directly, no rerank (8 bits/dim is near-exact; route through
    * [[pqQueryStream]] when a funnel is wanted). Same idempotent
    * batch-stamped output and empty-trigger guard as the other serving
    * twins; the query-batch cap lives inside PackedSq.search. */
  def sqQueryStream(stream: DataFrame, pi: graft.operators.PackedSq.PackedSqCorpus[Long],
                    k: Int, outDir: String, checkpointDir: String,
                    nProbe: Int = 4, metric: String = "cosine",
                    queryId: String = "query_id", queryVec: String = "query_vec",
                    maxQueryRows: Int = 65536,
                    /** The [[graft.operators.PackedSq.search]] kernel pick:
                      * a deployment serving the byte tier through the int
                      * kernel gets the same on its streaming twin. */
                    domain: String = "exact"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // same skip-null stance as pqQueryStream
        val clean = batch
          .where(col(queryId).isNotNull && col(queryVec).isNotNull)
        if (clean.limit(1).count() > 0) {
          graft.operators.PackedSq.search(pi, clean, k, nProbe, metric,
              queryId, queryVec, maxQueryRows, domain)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
      .start()

  /** Streaming serving twin of the resident graph-ANN tier
    * ([[graft.operators.PackedGraph.search]]): each micro-batch of
    * queries walks the standing per-cell NSW graphs — ef-bounded
    * best-first walks on probed partitions only, exact float distances
    * (no decode error, no rerank needed). `ef <= 0` walks exhaustively
    * (the q143 contract), making stream == batch == exact; the spec
    * asserts it. Same idempotent batch-stamped output, skip-null stance
    * and empty-trigger guard as the other serving twins; the query-batch
    * cap lives inside PackedGraph.search. */
  def graphQueryStream(stream: DataFrame,
                       pg: graft.operators.PackedGraph.PackedGraphCorpus[Long],
                       k: Int, outDir: String, checkpointDir: String,
                       nProbe: Int = 4, ef: Int = 64, metric: String = "cosine",
                       queryId: String = "query_id", queryVec: String = "query_vec",
                       maxQueryRows: Int = 65536): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // same skip-null stance as pqQueryStream
        val clean = batch
          .where(col(queryId).isNotNull && col(queryVec).isNotNull)
        if (clean.limit(1).count() > 0) {
          graft.operators.PackedGraph.search(pg, clean, k, nProbe, ef, metric,
              queryId, queryVec, maxQueryRows)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
      .start()

  /** Mutable handle on the resident graph tier for [[graphIngestStream]]:
    * the stream swaps in the appended/tombstoned corpus per committed
    * micro-batch, readers (a [[graphQueryStream]] serving twin, tests)
    * always see the newest generation through [[pg]]. `lastBatchId` is
    * the replay horizon — construct with the watermark that matches a
    * restored sidecar snapshot (-1 = the graph reflects no stream
    * batches yet). */
  final class GraphIngestHandle(@volatile var pg: graft.operators.PackedGraph.PackedGraphCorpus[Long],
                                @volatile var lastBatchId: Long = -1L,
                                /** Identity of the CHECKPOINT the horizon
                                  * was established under (the streaming
                                  * metadata's query id) — batch ids are
                                  * only comparable within one checkpoint,
                                  * so a restored horizon paired against a
                                  * FRESH checkpoint (ids restart at 0)
                                  * must fail loud, not silently skip
                                  * batches 0..N as "replays". null until
                                  * the first commit binds it. */
                                @volatile var checkpointId: String = null)

  /** Persist a [[GraphIngestHandle]]'s graph AND replay horizon AND
    * checkpoint identity as ONE versioned snapshot — the pairing the
    * replay contract needs ([[commitGraphIngestBatch]]'s horizon-jump
    * error says "restore the sidecar snapshot paired with this
    * checkpoint"; before this call the operator had to keep the pairing
    * by hand). Crash-safe: the triple writes under a fresh `v<k>/`
    * subdir and the `_current` pointer file swaps in atomically LAST —
    * a crash mid-save leaves the previous snapshot fully intact; the
    * superseded version is deleted only after the swap. */
  def saveGraphSnapshot(handle: GraphIngestHandle, dir: String): Unit = {
    import graft.sources.Collections
    val prev =
      if (Collections.pathExists(s"$dir/_current"))
        Some(Collections.readString(s"$dir/_current").trim)
      else None
    val next = s"v${prev.map(_.stripPrefix("v").toLong + 1L).getOrElse(0L)}"
    graft.operators.PackedGraph.saveSlabs(handle.pg, s"$dir/$next/graph")
    val cp = Option(handle.checkpointId)
      .map(c => s""""$c"""").getOrElse("null")
    Collections.writeString(s"$dir/$next/horizon.json",
      s"""{"lastBatchId": ${handle.lastBatchId}, "checkpointId": $cp}""")
    Collections.writeString(s"$dir/_current", next)
    prev.foreach(p => Collections.deleteIfExists(s"$dir/$p"))
  }

  /** Restore the snapshot [[saveGraphSnapshot]] wrote: graph, horizon,
    * and checkpoint identity come back TOGETHER, so resuming the ingest
    * stream against the same checkpoint needs no manual horizon
    * bookkeeping — and resuming against a different/fresh checkpoint
    * fails loud at the first commit. */
  def loadGraphSnapshot(spark: org.apache.spark.sql.SparkSession,
                        dir: String): GraphIngestHandle = {
    import graft.sources.Collections
    require(Collections.pathExists(s"$dir/_current"),
      s"no graph snapshot at $dir (missing _current pointer)")
    val v = Collections.readString(s"$dir/_current").trim
    val pg = graft.operators.PackedGraph.loadSlabs[Long](spark, s"$dir/$v/graph")
    val raw = Collections.readString(s"$dir/$v/horizon.json")
    val last = """"lastBatchId"\s*:\s*(-?\d+)""".r.findFirstMatchIn(raw)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"torn horizon sidecar at $dir/$v/horizon.json: $raw"))
    val cp = """"checkpointId"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(raw)
      .map(_.group(1)).orNull
    new GraphIngestHandle(pg, last, cp)
  }

  /** The checkpoint's stable identity: the streaming query id Spark
    * records in `checkpointDir/metadata` at first start — unlike the
    * directory path, it CHANGES when a checkpoint is wiped and recreated,
    * which is exactly the event the replay horizon must detect. */
  private def checkpointIdentity(checkpointDir: String): Option[String] = {
    import graft.sources.Collections
    val meta = s"$checkpointDir/metadata"
    if (!Collections.pathExists(meta)) None
    else """"id"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(Collections.readString(meta)).map(_.group(1))
  }

  /** Bind (or verify) the handle's checkpoint identity — called on every
    * commit, cheap (one driver-side sidecar read) and idempotent. A
    * handle restored with a horizon from checkpoint X fed batches from
    * checkpoint Y fails HERE, before the batch-id comparison could
    * misread Y's fresh ids 0..N as replays of X's. */
  private[graft] def bindCheckpoint(handle: GraphIngestHandle,
                                    checkpointDir: String): Unit =
    checkpointIdentity(checkpointDir).foreach { id =>
      if (handle.checkpointId == null) handle.checkpointId = id
      else require(handle.checkpointId == id,
        s"graphIngestStream: this stream's checkpoint (id $id) is not the " +
          s"one the handle's replay horizon (batch ${handle.lastBatchId}) " +
          s"was established under (id ${handle.checkpointId}). Batch ids " +
          "are only comparable within one checkpoint — continuing would " +
          "silently skip this checkpoint's genuinely new batches as " +
          "\"replays\". Restore the snapshot paired with this checkpoint, " +
          "or rebuild the graph from the corpus and start a fresh handle.")
    }

  /** Streaming INGEST twin of the graph tier's CRUD maintenance — the
    * [[dedupIngestStream]] stance applied to the resident index: each
    * micro-batch of (id, vec, op) CRUD rows tombstones its deletes and
    * replaced ids ([[graft.operators.PackedGraph.remove]] — HNSW
    * mark-deleted, dead rows keep routing) and walks its upserts into the
    * standing per-cell graphs ([[graft.operators.PackedGraph.append]] —
    * insertion is the graph's native maintenance op; the batch routes
    * through the SAME coarse model, so probe routing never changes).
    *
    * Replay contract (insertion is NOT idempotent — re-appending a batch
    * would double its rows): a replayed batch id (<= the handle's
    * horizon) is SKIPPED, its rows are already resident; a batch id that
    * JUMPS the horizon (checkpoint newer than the graph snapshot it was
    * paired with) fails loud with the remedy — missed batches cannot be
    * reconstructed from the stream. [[saveGraphSnapshot]] /
    * [[loadGraphSnapshot]] persist and restore the (graph, horizon,
    * checkpoint identity) triple TOGETHER, so a kill/restore needs no
    * manual horizon bookkeeping; the identity check additionally fails
    * loud when a restored horizon meets a FRESH checkpoint whose batch
    * ids restart at 0 (those are new batches, not replays). Batches are driver-sized CRUD deltas
    * (capped like the serving twins' query batches, fail-loud); rows
    * with a null id or vector are skipped like the serving twins' null
    * queries. The handle's chain grows one generation per batch — run
    * [[graft.operators.PackedGraph.compact]] (or the collection's
    * optimize()) on the serving cadence to fold it. */
  def graphIngestStream(stream: DataFrame, handle: GraphIngestHandle,
                        checkpointDir: String, metric: String = "cosine",
                        idCol: String = "id", vecCol: String = "vec",
                        opCol: String = "op",
                        maxBatchRows: Int = 65536): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the checkpoint's metadata exists once the query started, so the
        // identity binds at the first commit and is verified ever after
        bindCheckpoint(handle, checkpointDir)
        commitGraphIngestBatch(handle, batch, batchId, metric,
          idCol, vecCol, opCol, maxBatchRows)
      }
      .start()

  /** One [[graphIngestStream]] micro-batch commit (factored out so the
    * replay spec can drive it directly, the [[commitIngestBatch]]
    * pattern). */
  private[graft] def commitGraphIngestBatch(handle: GraphIngestHandle,
                                            batch: DataFrame, batchId: Long,
                                            metric: String,
                                            idCol: String, vecCol: String,
                                            opCol: String,
                                            maxBatchRows: Int): Unit = {
    import graft.operators.{PackedGraph, PackedKnn}
    if (batchId <= handle.lastBatchId) {
      org.slf4j.LoggerFactory.getLogger(EventStream.getClass).warn(
        s"graphIngestStream: skipping replayed batch $batchId (resident " +
          s"graph horizon ${handle.lastBatchId}) — its rows are already " +
          "in the graph and insertion is not idempotent")
      return
    }
    require(batchId == handle.lastBatchId + 1,
      s"graphIngestStream: batch $batchId jumped the resident graph's " +
        s"replay horizon (${handle.lastBatchId}): the checkpoint is newer " +
        "than the graph snapshot this handle restored, and the skipped " +
        "batches cannot be reconstructed from the stream. Restore the " +
        "sidecar snapshot paired with this checkpoint, or rebuild the " +
        "graph from the corpus and restart the stream with a fresh " +
        "checkpoint.")
    val rows = batch
      .select(col(idCol).cast("long"),
        col(vecCol).cast("array<float>"),
        coalesce(col(opCol).cast("string"), lit("upsert")))
      .where(col(idCol).isNotNull)
      .limit(maxBatchRows + 1)
      .collect()
    require(rows.length <= maxBatchRows,
      s"graphIngestStream micro-batch exceeds maxBatchRows=$maxBatchRows: " +
        "CRUD deltas are driver-sized by contract — bulk (re)builds " +
        "belong to PackedGraph.build over a packed corpus, not the " +
        "ingest stream.")
    if (rows.isEmpty) { handle.lastBatchId = batchId; return }
    val deletes = rows.iterator
      .filter(_.getString(2) == "delete").map(_.getLong(0)).toSet
    // an upsert REPLACES: tombstone any standing row of that id first,
    // then insert the new one (the batch-side packedReplace contract)
    val upserts = rows.filter(r =>
      r.getString(2) != "delete" && !r.isNullAt(1))
    val tombstones = deletes ++ upserts.iterator.map(_.getLong(0))
    val pruned = PackedGraph.remove(handle.pg, tombstones)
    val next =
      if (upserts.isEmpty) pruned
      else {
        val spark = batch.sparkSession
        import spark.implicits._
        val addDf = upserts.toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          .toDF("id", "vec")
        val add = PackedKnn.packIvf(addDf, pruned.model,
          idCol = "id", vecCol = "vec")
        PackedGraph.append(pruned, add, metric)
      }
    handle.pg = next
    handle.lastBatchId = batchId
  }

  /** Streaming twin of [[graft.operators.Ann.cellDrift]] — live
    * embedding-distribution monitoring at the ingest door: each
    * micro-batch of (vec) rows is assigned to the REFERENCE model's cells
    * and its histogram compared to the reference snapshot's with the same
    * add-one-smoothed KL(batch || reference); one (batch_id, n_rows, kl)
    * row appends per NON-EMPTY batch (idle triggers are skipped — an
    * empty histogram has no distribution, and its smoothed uniform would
    * read as spurious drift; note outDir exists only after the first
    * non-empty batch). The reference histogram is computed ONCE at
    * stream start (centroid-sized, lives on the driver); per batch the
    * only distributed work is the one codegen assignment + numCells-sized
    * aggregate. An alerting sink reads the tiny output; a drifting
    * embedder/source shows up as a rising kl series. Idempotent per
    * batch like the other foreachBatch sinks. */
  def driftMonitorStream(stream: DataFrame, model: graft.operators.Ann.IvfModel,
                         reference: DataFrame, vecCol: String,
                         outDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Ann
    val c = model.numCells
    def histogram(df: DataFrame): Array[Long] = {
      val counts = df.where(col(vecCol).isNotNull)
        .select(Ann.cellId(model)(col(vecCol)).as("cell"))
        .groupBy("cell").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      Array.tabulate(c)(i => counts.getOrElse(i, 0L))
    }
    val ref = histogram(reference)
    val refTot = ref.sum
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val h = histogram(batch)
        val tot = h.sum
        // an empty micro-batch (idle trigger) has no distribution: its
        // smoothed all-zero histogram is uniform and KL(uniform || ref)
        // is a large spurious value that would false-fire an alerting
        // sink — skip, like maxPQueryStream's nonEmpty guard
        if (tot > 0) {
          var kl = 0.0
          var i = 0
          while (i < c) {
            val pa = (h(i) + 1.0) / (tot + c)
            val pb = (ref(i) + 1.0) / (refTot + c)
            kl += pa * math.log(pa / pb)
            i += 1
          }
          val spark = batch.sparkSession
          import spark.implicits._
          // batch_id comes back as the partition column on read
          Seq((tot, kl)).toDF("n_rows", "kl")
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
      .start()
  }

  /** Streaming twin of operators.Pipeline — continuous corpus
    * preparation at ingest. Each micro-batch runs the spec's ROW-LOCAL
    * stages exactly as the batch pipeline would (language gate, quality
    * floor, PII redaction, within-batch exact dedup, decontamination
    * against the static eval set, hash-threshold mixture sampling — all
    * deterministic per row, so batch boundaries cannot change the
    * outcome), then probes the PERSISTED dedup index so the batch also
    * dedups against everything previously ACCEPTED. Survivors append to
    * the output corpus and to the index — the pipeline's dedup memory is
    * the durable sidecar, not stream state, so restarts resume against
    * the full accepted corpus. Corpus-GLOBAL stages are out of ingest
    * scope by construction: near-dup clustering is represented by the
    * index probe, and shard/sequence layout (`numShards`) belongs to the
    * export compaction pass — both spec fields are ignored here. */
  def prepareIngestStream(stream: DataFrame, idCol: String, textCol: String,
                          spec: graft.operators.PipelineSpec,
                          indexDir: String, outDir: String,
                          checkpointDir: String,
                          threshold: Double = 0.5,
                          profileDir: Option[String] = None,
                          profileLangCol: String = "lang"): org.apache.spark.sql.streaming.StreamingQuery =
    {
    // only ROW-LOCAL stages run per micro-batch, so batch boundaries
    // cannot change the outcome: corpus-global knobs are cleared —
    // near-dup clustering and the index stage are represented by this
    // stream's own index probe; shard layout belongs to the export pass;
    // adaptiveQualityKeep would cut at each batch's OWN percentile and
    // stripBoilerplateMinDocs counts lines across the whole corpus, so
    // both belong to the export/compaction pass. Warned ONCE at stream
    // construction, not per micro-batch.
    val globalKnobs = Seq(
      spec.nearDupThreshold.map(_ => "nearDupThreshold"),
      spec.nearDupIndexDir.map(_ => "nearDupIndexDir"),
      spec.adaptiveQualityKeep.map(_ => "adaptiveQualityKeep"),
      spec.stripBoilerplateMinDocs.map(_ => "stripBoilerplateMinDocs"),
      spec.tokenBudgetPerGroup.map(_ => "tokenBudgetPerGroup"),
      if (spec.numShards > 0) Some("numShards") else None).flatten
    if (globalKnobs.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(EventStream.getClass).warn(
        s"prepareIngestStream ignores corpus-global pipeline knobs " +
          s"(${globalKnobs.mkString(", ")}): near-dup is the index probe, " +
          "the rest belong to the export/compaction pass")
    val batchSpec = spec.copy(nearDupThreshold = None, nearDupIndexDir = None,
      adaptiveQualityKeep = None, stripBoilerplateMinDocs = None,
      tokenBudgetPerGroup = None, numShards = 0)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val gated = graft.operators.Pipeline.prepare(batch, idCol, textCol,
          batchSpec).data
        commitIngestBatch(gated, idCol, textCol, indexDir, outDir,
          threshold, batchId, profileDir, profileLangCol)
      }
      .start()
    }

  def dedupIngestStream(stream: DataFrame, idCol: String, textCol: String,
                        indexDir: String, outDir: String,
                        checkpointDir: String,
                        threshold: Double = 0.5,
                        profileDir: Option[String] = None,
                        profileLangCol: String = "lang"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitIngestBatch(batch, idCol, textCol, indexDir, outDir,
          threshold, batchId, profileDir, profileLangCol)
      }
      .start()

  /** Shared per-micro-batch commit of the ingest-dedup sinks, shaped for
    * foreachBatch's AT-LEAST-ONCE replay:
    *  1. the survivor set is REPLAY-STABLE: dedupAgainstIndex
    *     dedups against (index MINUS the batch's own ids), so signatures
    *     this very batch already appended (crash between the append and
    *     its marker) cannot drop its docs — not even mutually-near-dup
    *     batch docs with distinct ids, which would otherwise vanish
    *     against each other's ghost signatures on replay;
    *  2. survivors OVERWRITE their own `batch_id=N` subdir of the corpus —
    *     a replayed batch rewrites identical rows instead of appending
    *     duplicates (same stance as [[knnQueryStream]]);
    *  3. the index append runs before the marker lands, so the only
    *     repeatable side effect is a doubled signature append in the
    *     append-to-marker window; doubled rows make near-dup verification
    *     MORE aggressive around those docs, never admit a duplicate, and
    *     compaction does not depend on row uniqueness. */
  private[graft] def commitIngestBatch(batch: DataFrame, idCol: String, textCol: String,
                                indexDir: String, outDir: String,
                                threshold: Double, batchId: Long,
                                profileDir: Option[String] = None,
                                profileLangCol: String = "lang"): Unit = {
    val survivors = graft.operators.Dedup
      .dedupAgainstIndex(batch, idCol, textCol, indexDir, threshold,
        excludeBatchIds = true)
      .persist()
    try {
      survivors.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      // mergeable per-batch profile partial (CorpusReport.profileMerged
      // folds them into the full-corpus report without a text rescan);
      // batch-stamped overwrite keeps it replay-idempotent like the
      // corpus write it mirrors
      profileDir.foreach { pd =>
        graft.operators.CorpusReport.writePartial(
          survivors, idCol, textCol, profileLangCol, pd, batchId)
      }
      // the marker gates ONLY the index append (a re-append is harmless —
      // the probe reads signatures as a set — it just drifts the nDocs
      // stat); it must never gate the corpus write, so a marker that is
      // somehow wrong for this batch can cost at most a duplicate append,
      // never silently swallow a batch's output. checkpointDir, outDir
      // and indexDir are ONE stream instance: resetting the checkpoint
      // while reusing the other two restarts batch ids at 0 and is
      // undefined (batch-stamped dirs would collide) — point a fresh
      // stream at fresh dirs.
      val marker = new org.apache.hadoop.fs.Path(
        s"$indexDir/_committed_batch_$batchId")
      val fs = marker.getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        // a missing marker normally means "first execution of this
        // batch" — but if the batch id sits further behind the stream's
        // high watermark than the marker retention window, the marker
        // was already garbage-collected and "missing" is ambiguous:
        // re-appending would permanently double this batch's index rows
        // and drift nDocs. That only happens when a checkpoint OLDER
        // than the retention window is restored (a live stream's replay
        // lag is the checkpoint lag: one batch) — fail loud with the
        // remedy instead of drifting silently.
        val hw = readIngestWatermark(fs, indexDir)
        if (hw - batchId >= MarkerRetention)
          throw new IllegalStateException(
            s"ingest batch $batchId replayed past the marker-retention " +
              s"horizon (high watermark $hw, retention $MarkerRetention): " +
              "its commit marker was already garbage-collected, so a " +
              "re-append cannot be detected. This happens when a " +
              s"checkpoint more than $MarkerRetention batches old is " +
              "restored — rebuild the dedup index (Dedup.saveDedupIndex " +
              "over the corpus dir) or point the restored stream at a " +
              "fresh indexDir/outDir/checkpoint trio.")
        graft.operators.Dedup.appendDedupIndex(indexDir, survivors, idCol, textCol)
        fs.create(marker, true).close()
      }
      writeIngestWatermark(fs, indexDir, batchId)
      // rolling retention: replays only reach back as far as the
      // checkpoint lag, so markers MarkerRetention batches old are dead
      // (and the watermark guard above makes an out-of-contract deeper
      // restore loud) — one O(1) delete per commit bounds the marker
      // count (a batch-per-minute stream would otherwise grow ~500k
      // root files per year)
      if (batchId >= MarkerRetention)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$indexDir/_committed_batch_${batchId - MarkerRetention}"), false)
    } finally survivors.unpersist()
  }

  /** How many trailing `_committed_batch_N` markers [[commitIngestBatch]]
    * retains. A healthy stream's replay lag is one batch (the checkpoint
    * lag); the window is deliberately generous so only an out-of-contract
    * checkpoint restore can cross it — and the watermark guard makes that
    * crossing loud. */
  private[graft] val MarkerRetention = 100L

  private def watermarkPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/_ingest_high_watermark")

  /** Highest batch id this index has ever committed; -1 before the first
    * commit (legacy indexes without the file behave as "no horizon", so
    * upgrades never trip the guard on their first replayed batch). */
  private def readIngestWatermark(fs: org.apache.hadoop.fs.FileSystem,
                                  indexDir: String): Long = {
    val p = watermarkPath(indexDir)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Monotonic watermark advance (temp + rename — a crash mid-write can
    * never leave a torn file, only the previous watermark). */
  private def writeIngestWatermark(fs: org.apache.hadoop.fs.FileSystem,
                                   indexDir: String, batchId: Long): Unit =
    if (batchId > readIngestWatermark(fs, indexDir)) {
      val tmp = new org.apache.hadoop.fs.Path(
        s"$indexDir/_ingest_high_watermark.tmp")
      val out = fs.create(tmp, true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, watermarkPath(indexDir))) {
        // POSIX rename overwrites; HDFS rename onto an existing file
        // fails — delete-then-rename (the tiny non-atomic window costs
        // at worst one stale watermark, which only DELAYS the guard)
        fs.delete(watermarkPath(indexDir), false)
        fs.rename(tmp, watermarkPath(indexDir))
      }
    }
}
