package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val facts = Seq(
    ("u1", ts("2024-01-01 00:00:00"), 1L, "a"),
    ("u1", ts("2024-01-03 00:00:00"), 2L, "b"),
    ("u1", ts("2024-01-03 00:00:00"), 3L, "c"), // tie on time: id 3 wins
    ("u2", ts("2024-01-05 00:00:00"), 4L, "d"),
    (null, ts("2024-01-01 00:00:00"), 5L, "e")  // null key matches nothing
  ).toDF("k", "t", "fact_id", "payload")

  private val probes = Seq(
    ("u1", ts("2023-12-31 00:00:00"), 100L), // before any fact -> null
    ("u1", ts("2024-01-02 00:00:00"), 101L), // -> fact 1
    ("u1", ts("2024-01-03 00:00:00"), 102L), // at-or-before is inclusive; tie -> 3
    ("u1", ts("2024-01-09 00:00:00"), 103L), // -> latest (3)
    ("u2", ts("2024-01-06 00:00:00"), 104L), // -> 4
    ("u3", ts("2024-01-06 00:00:00"), 105L)  // no facts for key -> null
  ).toDF("k", "t", "probe_id")

  test("asofJoin picks the latest at-or-before fact per probe") {
    val got = AsOf.asofJoin(probes, facts,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
        rightCols = Seq("fact_id", "payload"), rightTieBreak = "fact_id")
      .select(col("probe_id"), col("fact_id"), col("payload"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (100L, -1L, ""), (101L, 1L, "a"), (102L, 3L, "c"),
      (103L, 3L, "c"), (104L, 4L, "d"), (105L, -1L, "")))
  }

  test("asofJoin equals the quadratic candidate formulation on real data") {
    val s = spark
    val events = graft.streaming.Events.readTimestamped(s, s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = s.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"))

    val fast = AsOf.asofJoin(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightCols = Seq("o_orderkey"), rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("o_orderkey"))

    // oracle: explicit candidate join + keep-latest window (fine at sf0.001)
    val cand = events.join(orders,
        events("user_id") === orders("o_custkey") &&
          orders("o_orderdate") <= events("ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .where(col("rn") === 1)
      .select(col("event_id").as("e2"), col("o_orderkey").as("k2"))
    val slow = events.select(col("event_id")).join(cand,
        events("event_id") === cand("e2"), "left")
      .select(col("event_id"), col("k2").as("o_orderkey"))

    assert(fast.count() === events.count())
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("asofJoin plan shuffles each side once, by key — no pair blowup join") {
    val probes = Seq((1L, 10L, 100L)).toDF("pid", "k", "t")
    val facts = Seq((10L, 50L, 7L)).toDF("fk", "ft", "payload")
    val joined = AsOf.asofJoin(probes, facts,
      leftKey = "k", rightKey = "fk", leftTime = "t", rightTime = "ft",
      rightCols = Seq("payload"), rightTieBreak = "payload")
    // one Exchange for the window's key partitioning (+ possibly one for a
    // final presentation sort added by callers — none here); critically,
    // NO join operator at all in the plan: the as-of lookup is a window,
    // so there is no (probe x earlier-facts) candidate relation anywhere
    assert(graft.operators.Scale.countShuffles(joined) === 1)
    val planStr = joined.queryExecution.executedPlan.toString
    assert(!planStr.contains("Join"), s"unexpected join in as-of plan:\n$planStr")
  }

  test("asofJoin never matches a null-time right row (SQL ASOF semantics)") {
    // a null-time fact would sort nulls-first in the window and act as
    // "earlier than everything" — SQL/DuckDB ASOF never matches it
    val nullT = Seq(("u1", Option.empty[java.sql.Timestamp], 9L, "z"))
      .toDF("k", "t", "fact_id", "payload")
    val got = AsOf.asofJoin(probes, facts.unionByName(nullT),
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
        rightCols = Seq("fact_id", "payload"), rightTieBreak = "fact_id")
      .select(col("probe_id"), col("fact_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1)
    // identical to the base expectation: probe 100 (before any fact) stays
    // unmatched instead of matching the null-time row
    assert(got.toSeq === Seq((100L, -1L), (101L, 1L), (102L, 3L),
      (103L, 3L), (104L, 4L), (105L, -1L)))
  }

  test("asofJoin rejects colliding payload column names") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(probes, facts, "k", "k", "t", "t",
        rightCols = Seq("probe_id"), rightTieBreak = "fact_id")
    }
  }
}
