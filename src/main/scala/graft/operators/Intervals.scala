package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics over (key*, starttime, endtime) tables — the
  * reference's signature ordered-sequence algorithms re-expressed as
  * window specs (obsplus `wavebank.py:380-577`).
  *
  * All times are LongType epoch-ns. All of these are single-shuffle
  * plans: one `Window.partitionBy(keys).orderBy(start, end)` pass, no
  * self-joins — the running-max trick replaces the quadratic
  * "compare every pair of segments" formulation, which is what makes
  * the approach viable on a 100 TB archive (shuffle is O(n), state per
  * key is O(1)).
  */
object Intervals {

  private def w(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*).orderBy(col("starttime"), col("endtime"))

  /** Per-key [min(start), max(end)] span — obsplus `get_availability`
    * (`wavebank.py:390-395`). One partial-aggregated groupBy; no join.
    */
  def availability(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min("starttime").as("starttime"),
           max("endtime").as("endtime"),
           count(lit(1)).as("n_segments"))

  /** Gap detection — obsplus `_get_gap_dfs` (`wavebank.py:442-469`).
    *
    * Within each key group ordered by (start, end): the running maximum
    * of endtime handles overlapping segments; a gap opens where that
    * running max + minGap is still before the next segment's start.
    * Emits one row per gap: (keys, gap_start, gap_end, gap_ns).
    */
  def gaps(df: DataFrame, keys: Seq[String], minGap: Long): DataFrame = {
    val win = w(keys)
    val runmax = max(col("endtime"))
      .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val nextStart = lead(col("starttime"), 1).over(win)
    df.select(keys.map(col) :+ runmax.as("gap_start") :+ nextStart.as("next_start"): _*)
      .filter(col("next_start").isNotNull &&
              col("gap_start") + lit(minGap) < col("next_start"))
      .select(keys.map(col) :+ col("gap_start") :+
              col("next_start").as("gap_end") :+
              (col("next_start") - col("gap_start")).as("gap_ns"): _*)
  }

  /** Contiguous spans (inverse of gaps) — obsplus `get_segments_df`
    * (`wavebank.py:523-577`), done directly by sessionization: flag a
    * new session where the previous running-max end + tol is before the
    * current start, cumulative-sum the flags into a session id, then
    * aggregate each session.
    */
  def segments(df: DataFrame, keys: Seq[String], tol: Long): DataFrame = {
    val win = w(keys)
    val prevRunmax = max(col("endtime"))
      .over(win.rowsBetween(Window.unboundedPreceding, -1))
    val newSession = when(prevRunmax.isNull ||
                          prevRunmax + lit(tol) < col("starttime"), 1L).otherwise(0L)
    val sess = df
      .withColumn("new_session", newSession)
      .withColumn("session_id",
        sum(col("new_session"))
          .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy((keys :+ "session_id").map(col): _*)
      .agg(min("starttime").as("seg_start"),
           max("endtime").as("seg_end"),
           count(lit(1)).as("n_members"))
  }

  /** Uptime = availability span minus total gap time — obsplus
    * `get_uptime_df` (`wavebank.py:487-521`). The reference joins an
    * availability frame to gap totals; here both derive from ONE window
    * pass: the running-max/lead columns feed a groupBy on the same
    * keys, which reuses the window's hash partitioning — a single
    * shuffle end to end, no join, gapless keys naturally total 0.
    */
  def uptime(df: DataFrame, keys: Seq[String], minGap: Long): DataFrame = {
    val win = w(keys)
    val runmax = max(col("endtime"))
      .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val nextStart = lead(col("starttime"), 1).over(win)
    val gapNs = when(col("_next").isNotNull &&
        col("_runmax") + lit(minGap) < col("_next"),
      col("_next") - col("_runmax")).otherwise(0L)
    df.withColumn("_runmax", runmax)
      .withColumn("_next", nextStart)
      .groupBy(keys.map(col): _*)
      .agg(min("starttime").as("starttime"),
           max("endtime").as("endtime"),
           count(lit(1)).as("n_segments"),
           sum(gapNs).as("gap_total_ns"))
      .withColumn("duration_ns", col("endtime") - col("starttime"))
      .withColumn("uptime_ns", col("duration_ns") - col("gap_total_ns"))
      .withColumn("availability_frac",
        round(col("uptime_ns").cast("double") / col("duration_ns").cast("double"), 6))
  }

  /** Merge overlapping/adjacent intervals into their union — obsplus'
    * gap-group coalescing (`utils/waveforms.py:341-359`): sessionize,
    * then keep only the merged bounds.
    */
  def coalesceIntervals(df: DataFrame, keys: Seq[String], tol: Long = 0L): DataFrame =
    segments(df, keys, tol)
      .select((keys.map(col) :+ col("seg_start").as("starttime")
        :+ col("seg_end").as("endtime")): _*)

  /** Interval-overlap predicate with buffer — obsplus
    * `_filter_starttime_endtime` (`utils/pd.py:434-443`) and the ±1 s
    * WaveBank buffer (`wavebank.py:173`): keep rows whose
    * [starttime, endtime] intersects [t1 - buffer, t2 + buffer].
    * Null endtimes (the reference's NaT sentinel) never match.
    * Both bounds push down to parquet min/max stats.
    */
  def overlaps(t1: Long, t2: Long, buffer: Long = 0L): Column =
    col("endtime").isNotNull &&
      !(col("endtime") < lit(t1 - buffer) || col("starttime") > lit(t2 + buffer))
}
