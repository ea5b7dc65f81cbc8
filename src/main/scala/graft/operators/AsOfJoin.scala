package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the LATEST right
  * row with the same key whose time is <= the left row's time (optionally
  * within a tolerance window). The classic "most recent state at event
  * time" join — Spark has no built-in operator for it.
  *
  * Implementation (the 100-TB shape): union the two sides with a side
  * marker and run ONE bounded window — `last(payload, ignoreNulls)` over
  * (key ORDER BY time, side) ROWS UNBOUNDED PRECEDING — then keep only the
  * left rows. That is a single shuffle on the key and O(n log n) per key,
  * with no range cross-product: the naive
  * `left.join(right, key && rTime <= lTime)` materializes every
  * (left, earlier-right) combination — quadratic in the per-key row count —
  * before aggregating it back down, which is exactly the blow-up that kills
  * skewed keys at scale. Running totals stream; cross-products don't.
  *
  * Contract:
  *   - `leftTime` / `rightTime` must be mutually comparable and, when
  *     `tolerance` is set, integral (e.g. unix_micros) so the subtraction
  *     is exact.
  *   - the right side must be UNIQUE per (key, rightTime) — pre-aggregate
  *     duplicates (e.g. `max(id) GROUP BY key, time`) or the tie-winner is
  *     partition-order-dependent. A right row at exactly the left time IS
  *     visible (inclusive <=): the side marker sorts right (0) before
  *     left (1) at equal times.
  *   - payload column names must not collide with left column names.
  *
  * Output: every left row (all its columns), plus the matched payload
  * columns (null when no right row qualifies) and `asof_time` (the matched
  * right row's time, null likewise).
  */
object AsOfJoin {

  def join(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(key.nonEmpty, "as-of join needs at least one equi-key")
    // name-collision guards: the output appends `asof_time` + payload to
    // the left columns (a chained AsOfJoin's left already HAS asof_time —
    // a silent duplicate column breaks every downstream select), and the
    // union stage reserves the _t/_side/_pay/_row working names
    val reservedOut = payload :+ "asof_time"
    val clash = left.columns.toSet.intersect(reservedOut.toSet)
    require(clash.isEmpty,
      s"as-of join output would duplicate left column(s) ${clash.mkString(",")} — " +
        "rename them (e.g. the previous join's asof_time) before chaining")
    val working = Set("_t", "_side", "_pay", "_row", "_match")
    val wclash = (left.columns ++ right.columns).toSet.intersect(working)
    require(wclash.isEmpty,
      s"as-of join reserves working column(s) ${wclash.mkString(",")}")
    val rowStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val payStruct =
      struct(col(rightTime).as("asof_time") +: payload.map(col): _*)
    val rowType = left.select(rowStruct.as("r")).schema("r").dataType
    val payType = right.select(payStruct.as("p")).schema("p").dataType

    val lu = left.select(
      key.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(payType).as("_pay"), rowStruct.as("_row")): _*)
    val ru = right.select(
      key.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(0).as("_side"),
        payStruct.as("_pay"), lit(null).cast(rowType).as("_row")): _*)

    val w = Window
      .partitionBy(key.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lu.unionByName(ru)
      .withColumn("_match", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val bounded = tolerance match {
      case None => matched
      case Some(tol) =>
        matched.withColumn("_match",
          when(col("_t") - col("_match.asof_time") <= tol, col("_match")))
    }

    bounded.select(
      col("_row.*") +:
        col("_match.asof_time").as("asof_time") +:
        payload.map(p => col(s"_match.$p").as(p)): _*)
  }
}
