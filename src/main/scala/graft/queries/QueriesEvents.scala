package graft.queries

import graft.streaming.Events
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-stream coverage (SURVEY §2.8): subscription filters, tumbling
  * windows, gap sessionization, history tail — batch twins of the
  * streaming operators (the streaming forms are exercised in the
  * EventStreamSpec with a memory sink). Timestamps are exported as
  * unix microseconds so the ns-parquet -> µs truncation agrees across
  * engines. */
object QueriesEvents {
  /** Schema-adaptive events read — see [[Events.readTimestamped]]: the
    * testdata has shipped `ts` as both TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS); the reader inspects the on-disk type. */
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Events.readTimestamped(s, s"$dir/$name.parquet")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E2/P8 subscription predicate: type set + props metadata equality
    "q42_events_filter" -> ((s, dir) =>
      Events.subscribe(t(s, dir, "events"),
          eventTypes = Seq("purchase", "signup"),
          propsEquals = Map("k" -> "12"))
        .select(col("event_id"), col("event_type"), col("user_id"),
          round(col("value"), 2).as("value"))
        .orderBy("event_id")),

    // Windowed aggregation (capability extension; E-series)
    "q43_events_window" -> ((s, dir) =>
      Events.windowedCounts(t(s, dir, "events"), "1 hour")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"), col("sum_value"))),

    // Gap-based sessionization
    "q44_sessions" -> ((s, dir) =>
      Events.sessionStats(t(s, dir, "events"), gapMinutes = 30)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"))),

    // E3/T6 history tail
    "q45_history_tail" -> ((s, dir) =>
      Events.historyTail(t(s, dir, "events"), 20)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))),

    // Ordered conversion funnel: view -> click -> purchase, earliest-
    // completion semantics (step i = first event of that type strictly
    // after the user's step i-1 time)
    "q86_funnel" -> ((s, dir) =>
      Events.funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))),

    // As-of join (graft.operators.AsOf): label every event with the most
    // recent order the same user placed at or before the event — one
    // shuffle by key via tagged-union + running last(), never the
    // (event x earlier-orders) candidate blowup. Oracle: the equivalent
    // (quadratic, fine at sf0.01) row_number-over-candidates SQL.
    "q63_asof_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      // orders carries TIMESTAMP_NTZ; cast to TIMESTAMP (session TZ is
      // UTC, so the instant is unchanged) to match the events side and
      // satisfy unix_micros
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"),
          col("o_orderkey"))
      graft.operators.AsOf.asofJoin(events, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("o_orderkey", "o_orderdate"),
          rightTieBreak = "o_orderkey")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("asof_orderkey"),
          unix_micros(col("o_orderdate")).as("asof_order_us"))
        .orderBy("event_id")
    }),

    // Native session_window (Spark's own gap-session operator) — must
    // agree with the lag/cumsum formulation in q44
    "q53_session_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("_start"))
        .select(col("user_id"), col("n_events"),
          unix_micros(col("_start")).as("start_us"))),
  )

  val oracles: Map[String, String] = Map(
    "q42_events_filter" ->
      """SELECT event_id, event_type, user_id, round(value, 2) AS value
        |FROM events
        |WHERE event_type IN ('purchase', 'signup')
        |  AND json_extract_string(props, '$.k') = '12'
        |ORDER BY event_id""".stripMargin,

    "q43_events_window" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q44_sessions" ->
      """WITH e AS (
        |  SELECT user_id, ts, epoch_us(ts) // 1000000 AS sec,
        |         lag(epoch_us(ts) // 1000000) OVER
        |           (PARTITION BY user_id ORDER BY ts) AS prev_sec
        |  FROM events),
        |flags AS (
        |  SELECT user_id, ts,
        |         CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM e),
        |sess AS (
        |  SELECT user_id, ts,
        |         sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flags)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       count(*) AS n_events,
        |       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
        |FROM sess GROUP BY user_id, session_seq""".stripMargin,

    "q45_history_tail" ->
      """SELECT event_id, event_type, epoch_us(ts) AS ts_us
        |FROM events ORDER BY ts DESC, event_id DESC LIMIT 20""".stripMargin,

    "q63_asof_join" ->
      """WITH cand AS (
        |  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
        |         row_number() OVER (PARTITION BY e.event_id
        |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT e.event_id, e.user_id, c.o_orderkey AS asof_orderkey,
        |       epoch_us(c.o_orderdate) AS asof_order_us
        |FROM events e
        |LEFT JOIN (SELECT event_id, o_orderkey, o_orderdate FROM cand WHERE rn = 1) c
        |  USING (event_id)
        |ORDER BY e.event_id""".stripMargin,

    // session_window gap semantics == lag/cumsum sessionization: sessions
    // close when the next event is > 30min after the PREVIOUS EVENT
    "q53_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        |  FROM events),
        |flags AS (
        |  SELECT user_id, ts, us,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM e),
        |sess AS (
        |  SELECT user_id, ts, us,
        |         sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT user_id, count(*) AS n_events, min(us) AS start_us
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    "q86_funnel" ->
      """WITH t0 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t1 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN t0 ON t0.user_id = e.user_id AND e.ts > t0.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type, count(*) AS users FROM t0
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM t1
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM t2""".stripMargin,
  )
}
