package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest / most-recent) join — the reference associates an
  * event to the catalog entry whose time is closest within a tolerance
  * (obsplus `associate_merge`, `events/merge.py:211-266`).
  *
  * Implemented with the union-and-carry trick rather than a windowed
  * cross join: tag both sides, union, sort each key group by time, and
  * carry the latest right-side row forward with `last(..., ignoreNulls)`.
  * This is one shuffle on (key, time) — no join explosion, no
  * per-left-row scan of the right side — so it scales to arbitrarily
  * large sides, unlike the BroadcastNestedLoop plan Catalyst would pick
  * for the equivalent theta join.
  */
object AsOf {

  /** Backward as-of join: for each left row, the most recent right row
    * with rightTime <= leftTime and leftTime - rightTime <= tolerance.
    *
    * Left/right must share `keyCol`. Output: left cols (prefixed names
    * preserved by caller's projection) + matched right time/id columns.
    *
    * @param leftTs/rightTs  epoch-ns LongType columns
    * @param rightCarry      right-side columns to surface on matches
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      leftCarry: Seq[String], rightCarry: Seq[String],
      tolerance: Long): DataFrame = {

    val l = left.select(
      col(keyCol).as("_k"), col(leftTs).as("_t"), lit(1).as("_is_left"),
      struct(leftCarry.map(col): _*).as("_lpayload"),
      lit(null).cast("long").as("_rt"),
      struct(rightCarry.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*).as("_rpayload"))
    val r = right.select(
      col(keyCol).as("_k"), col(rightTs).as("_t"), lit(0).as("_is_left"),
      lit(null).cast(l.schema("_lpayload").dataType).as("_lpayload"),
      col(rightTs).as("_rt"),
      struct(rightCarry.map(col): _*).as("_rpayload"))

    // rights sort before lefts at equal times so a same-instant right row
    // is visible to the left row; trailing id keeps ties deterministic
    val win = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_is_left"), col("_rt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_last_rt", last(col("_rt"), ignoreNulls = true).over(win))
      .withColumn("_last_rp", last(when(col("_is_left") === 0, col("_rpayload")),
                                   ignoreNulls = true).over(win))
      .filter(col("_is_left") === 1 && col("_last_rt").isNotNull &&
              col("_t") - col("_last_rt") <= lit(tolerance))
      .select(
        Seq(col("_k").as(keyCol), col("_t").as(leftTs)) ++
        leftCarry.map(c => col(s"_lpayload.$c").as(c)) ++
        rightCarry.map(c => col(s"_last_rp.$c").as(c)) :+
        (col("_t") - col("_last_rt")).as("asof_lag_ns"): _*)
  }

  /** Nearest as-of join: for each left row, the right row with the
    * minimum |leftTime − rightTime| within tolerance (ties → earlier
    * right row). The reference's association semantics
    * (`events/merge.py:253`: `diffs.idxmin()` within 1 s default).
    * Same union-and-carry shuffle, carrying both the previous and the
    * next right row and picking the closer.
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      leftCarry: Seq[String], rightCarry: Seq[String],
      tolerance: Long): DataFrame = {

    val l = left.select(
      col(keyCol).as("_k"), col(leftTs).as("_t"), lit(1).as("_is_left"),
      struct(leftCarry.map(col): _*).as("_lpayload"),
      lit(null).cast("long").as("_rt"),
      struct(rightCarry.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*).as("_rpayload"))
    val r = right.select(
      col(keyCol).as("_k"), col(rightTs).as("_t"), lit(0).as("_is_left"),
      lit(null).cast(l.schema("_lpayload").dataType).as("_lpayload"),
      col(rightTs).as("_rt"),
      struct(rightCarry.map(col): _*).as("_rpayload"))

    val ordered = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_is_left"), col("_rt"))
    val back = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rp = when(col("_is_left") === 0, col("_rpayload"))

    val u = l.unionByName(r)
      .withColumn("_prev_rt", last(col("_rt"), ignoreNulls = true).over(back))
      .withColumn("_prev_rp", last(rp, ignoreNulls = true).over(back))
      .withColumn("_next_rt", first(col("_rt"), ignoreNulls = true).over(fwd))
      .withColumn("_next_rp", first(rp, ignoreNulls = true).over(fwd))
      .filter(col("_is_left") === 1)
      .withColumn("_dp", when(col("_prev_rt").isNotNull,
        col("_t") - col("_prev_rt")))
      .withColumn("_dn", when(col("_next_rt").isNotNull,
        col("_next_rt") - col("_t")))
      .withColumn("_use_prev",
        col("_dp").isNotNull && (col("_dn").isNull || col("_dp") <= col("_dn")))
      .withColumn("_d", when(col("_use_prev"), col("_dp")).otherwise(col("_dn")))
      .filter(col("_d").isNotNull && col("_d") <= lit(tolerance))

    u.select(
      Seq(col("_k").as(keyCol), col("_t").as(leftTs)) ++
      leftCarry.map(c => col(s"_lpayload.$c").as(c)) ++
      rightCarry.map(c => when(col("_use_prev"), col(s"_prev_rp.$c"))
        .otherwise(col(s"_next_rp.$c")).as(c)) :+
      col("_d").as("asof_abs_diff_ns"): _*)
  }
}
