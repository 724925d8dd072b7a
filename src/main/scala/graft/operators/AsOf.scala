package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the same key
  * and the greatest right-time <= left-time (the classic event-to-
  * most-recent-fact lookup a training-data pipeline needs to label events
  * with the state that was current when they happened).
  *
  * Spark has no native ASOF JOIN, and the naive formulation — equi-join on
  * key with a time-range predicate, then keep the latest candidate per left
  * row — materializes every (left row, earlier right row) pair before the
  * window discards all but one. A user with a year of history makes that
  * quadratic; at 100 TB it is the join that never finishes.
  *
  * This operator instead TAGS AND UNIONS the two sides and computes a
  * running `last(right, ignoreNulls)` over (key, time) order:
  *
  *   - one shuffle, by key, of each side exactly once (no pair blowup —
  *     the unioned relation is |left| + |right| rows, ever);
  *   - within each key the window sort interleaves right rows before left
  *     rows at equal times (side 0 < side 1), so "at or before" is
  *     inclusive like DuckDB's ASOF JOIN;
  *   - among right rows tied on time, the LAST in (time, tieBreak) order
  *     wins — i.e. the greatest tieBreak, matching the deterministic
  *     "latest row" convention;
  *   - every left row then carries the most recent right payload seen so
  *     far in its partition's order, or null if none exists (left-outer
  *     semantics).
  *
  * Null-key right rows are dropped (SQL join semantics: null matches
  * nothing); null-key left rows pass through unmatched.
  */
object AsOf {

  /** @param rightCols right-side payload columns carried onto each left row
    *                   (must not collide with left column names — alias the
    *                   right side first if they do)
    * @param rightTieBreak deterministic winner among right rows tied on
    *                   (key, time): the row with the GREATEST value wins
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               rightTieBreak: String): DataFrame = {
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"asofJoin: right payload columns collide with left columns: " +
        s"${collisions.mkString(", ")} — alias the right side first")

    val rPayload = right.select(struct(rightCols.map(col): _*).as("_rrow"))
      .schema.head.dataType
    val ordType = right.schema(rightTieBreak).dataType
    val lhs = left.select(
      col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      lit(null).cast(ordType).as("_ord"),
      struct(left.columns.map(col): _*).as("_lrow"),
      lit(null).cast(rPayload).as("_rrow"))
    val lPayload = lhs.schema.apply("_lrow").dataType
    // null-TIME right rows are dropped too: nulls sort first in the window
    // order, so an unfiltered null-time row would act as "earlier than
    // everything" and become a returnable match — DuckDB/SQL ASOF semantics
    // never match a null-time right row
    val rhs = right.where(col(rightKey).isNotNull && col(rightTime).isNotNull).select(
      col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      col(rightTieBreak).as("_ord"),
      lit(null).cast(lPayload).as("_lrow"),
      struct(rightCols.map(col): _*).as("_rrow"))

    // running last-non-null right payload in (time, side, tieBreak) order:
    // at a left row this is exactly "the latest right row at or before me"
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lhs.unionByName(rhs)
      .withColumn("_match", last(col("_rrow"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.map(c => col(s"_lrow.`$c`").as(c)) ++
        rightCols.map(c => col(s"_match.`$c`").as(c)): _*)
  }
}
