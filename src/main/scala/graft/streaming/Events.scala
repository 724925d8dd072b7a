package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Change-event semantics (reference realtime.py) + the windowed/sessions
  * analytics the reference lacks, declared as capability extensions
  * (SURVEY §2.8).
  *
  * Every operator here works identically on a batch DataFrame and a
  * Structured Streaming DataFrame — the subscription predicate is a
  * filter, windowed aggregation needs only a watermark added upstream.
  * The driver's events table schema: (event_id, ts, user_id, event_type,
  * value, props:json-string).
  */
object Events {

  /** Schema-adaptive read of a parquet table carrying a `ts` event-time
    * column. The driver's testdata has shipped `ts` as both
    * TIMESTAMP(NANOS) (older generations — Spark's vectorized reader
    * rejects it, so we read nanos-as-long and truncate to µs, matching
    * DuckDB's epoch_us) and TIMESTAMP(MICROS)/TIMESTAMP_NTZ (current).
    * Inspect what is actually on disk and adapt, so the engine reads
    * every generation of the data rather than assuming one. */
  def readTimestamped(s: org.apache.spark.sql.SparkSession, path: String,
                      tsCol: String = "ts"): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path)
    raw.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) surfaced as long nanos: truncate to µs
        raw.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case _ =>
        // TIMESTAMP / TIMESTAMP_NTZ: session TZ is UTC, instant unchanged
        raw.withColumn(tsCol, col(tsCol).cast("timestamp"))
    }
  }

  /** Subscription predicate (realtime.py:92-118): event-type set +
    * metadata (props) equality matches. Missing props key => no match,
    * mirroring Subscription.matches. */
  def subscriptionFilter(eventTypes: Seq[String] = Nil,
                         propsEquals: Map[String, String] = Map.empty): Column = {
    val typeOk =
      if (eventTypes.isEmpty) lit(true)
      else col("event_type").isin(eventTypes: _*)
    val propsOk = propsEquals.map { case (k, v) =>
      get_json_object(col("props"), s"$$.$k") === lit(v)
    }.foldLeft(lit(true))(_ && _)
    typeOk && propsOk
  }

  def subscribe(events: DataFrame, eventTypes: Seq[String] = Nil,
                propsEquals: Map[String, String] = Map.empty): DataFrame =
    events.where(subscriptionFilter(eventTypes, propsEquals))

  /** Tumbling-window aggregation per event type. Works on batch (group by
    * the window expr) and streaming (add withWatermark upstream). */
  def windowedCounts(events: DataFrame, windowDuration: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDuration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization per user: a new session starts when the gap
    * from the previous event exceeds `gapMinutes`. Batch implementation
    * via lag + running sum (both engines in the oracle pair support it);
    * the streaming twin is session_window / flatMapGroupsWithState in
    * [[EventStream]]. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapSec = gapMinutes * 60L
    events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("_prev")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("_new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev", "_new_session")
  }

  /** Session stats: one row per (user, session). */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))

  /** Event-history tail (realtime.py:155-160, 187-190): most recent n. */
  def historyTail(events: DataFrame, n: Int): DataFrame =
    events.orderBy(desc("ts"), desc("event_id")).limit(n)

  /** Ordered conversion funnel: how many users performed `steps` in
    * sequence (each step strictly after the one before — the standard
    * earliest-completion semantics: a user's step-i time is the earliest
    * event of that type after their step-(i-1) time). Returns one row per
    * step: (step, event_type, users).
    *
    * Each step is a per-user min-aggregation gated on the previous
    * step's time — k steps = k groupBy-user passes over the (filtered)
    * event stream, all hash-partitioned by user, no windows over the full
    * history and no per-user event sorting. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached: DataFrame = null
    val stepFrames = steps.zipWithIndex.map { case (st, i) =>
      reached =
        if (i == 0)
          events.where(col(typeCol) === st)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
        else
          events.where(col(typeCol) === st)
            .join(reached.select(col(userCol), col("_t").as("_prev")), userCol)
            .where(col(tsCol) > col("_prev"))
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      reached.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(st).as("event_type"), col("users"))
    }
    stepFrames.reduce(_ unionByName _)
  }
}
