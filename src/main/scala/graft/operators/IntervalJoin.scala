package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bulk interval (range) join — the reference's
  * `_filter_index_to_bulk` (obsplus `utils/waveforms.py:567-608`,
  * drivers `wavebank.py:581-614`): match a table of point/interval rows
  * against a table of (key, t1, t2) requests.
  *
  * Physical strategy at scale:
  *   - The equi part (key match) hash-partitions both sides, so the
  *     range predicate only runs within co-partitioned groups — never a
  *     full cartesian.
  *   - When the request side is small (the common bulk-query case) we
  *     broadcast it, making the join a map-side operation with zero
  *     shuffle of the big fact side.
  *   - For two huge sides, pre-bucketing both by time band (bandNs)
  *     turns the range join into an equi join on (key, band); a row
  *     joins its own and neighbouring bands. `bandedPoints` implements
  *     that path.
  *
  * The request side's key columns are renamed internally before the
  * join and dropped after: request keys equal the fact keys by
  * construction, so the output carries each key ONCE (unambiguous),
  * and a request table derived from the fact table (self-join lineage)
  * resolves cleanly instead of tripping ambiguous-attribute
  * disambiguation.
  */
object IntervalJoin {

  private def renameKeys(requests: DataFrame, keyCols: Seq[String]): DataFrame =
    keyCols.foldLeft(requests)((df, k) => df.withColumnRenamed(k, s"__req_$k"))

  /** Points `ts` joined to requests [t1, t2] (inclusive) on equal keys.
    * Request side is broadcast when `broadcastRequests`.
    */
  def pointsInRanges(
      points: DataFrame, requests: DataFrame,
      keyCols: Seq[String], tsCol: String,
      t1Col: String = "t1", t2Col: String = "t2",
      broadcastRequests: Boolean = true): DataFrame = {
    val renamed = renameKeys(requests, keyCols)
    val reqs = if (broadcastRequests) broadcast(renamed) else renamed
    val cond = keyCols.map(k => points(k) === reqs(s"__req_$k"))
      .foldLeft(points(tsCol) >= reqs(t1Col) && points(tsCol) <= reqs(t2Col))(_ && _)
    points.join(reqs, cond).drop(keyCols.map(k => s"__req_$k"): _*)
  }

  /** Interval-vs-interval overlap join (strict overlap with buffer),
    * the WaveBank bulk-waveform semantics.
    */
  def overlapping(
      segments: DataFrame, requests: DataFrame,
      keyCols: Seq[String],
      startCol: String = "starttime", endCol: String = "endtime",
      t1Col: String = "t1", t2Col: String = "t2",
      buffer: Long = 0L,
      broadcastRequests: Boolean = true): DataFrame = {
    val renamed = renameKeys(requests, keyCols)
    val reqs = if (broadcastRequests) broadcast(renamed) else renamed
    val overlap =
      !(segments(endCol) < reqs(t1Col) - lit(buffer) ||
        segments(startCol) > reqs(t2Col) + lit(buffer))
    val cond = keyCols.map(k => segments(k) === reqs(s"__req_$k"))
      .foldLeft(overlap)(_ && _)
    segments.join(reqs, cond).drop(keyCols.map(k => s"__req_$k"): _*)
  }

  /** Scale path for huge×huge: explode each request across the time
    * bands it covers, then equi-join on (keys, band) before applying
    * the exact range predicate as a residual. Shuffle is hash on
    * (keys, band) — no nested loop anywhere.
    */
  def bandedPoints(
      points: DataFrame, requests: DataFrame,
      keyCols: Seq[String], tsCol: String,
      bandNs: Long,
      t1Col: String = "t1", t2Col: String = "t2"): DataFrame = {
    val p = points.withColumn("_band", floor(col(tsCol) / lit(bandNs)))
    val r = renameKeys(requests, keyCols).withColumn("_band",
      explode(sequence(floor(col(t1Col) / lit(bandNs)),
                       floor(col(t2Col) / lit(bandNs)))))
    val cond = (keyCols.map(k => p(k) === r(s"__req_$k")) :+ (p("_band") === r("_band")))
      .reduce(_ && _) && p(tsCol) >= r(t1Col) && p(tsCol) <= r(t2Col)
    p.join(r, cond).drop("_band").drop(keyCols.map(k => s"__req_$k"): _*)
  }
}
