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
    * the WaveBank bulk-waveform semantics. At most one side broadcasts:
    * `broadcastRequests` hints the request side (the historical
    * default), `broadcastSegments` hints the fact side instead — the
    * symmetric choice a planner makes when the request side outgrew
    * its budget but the (time-pruned) index side still fits. Neither →
    * un-hinted, the planner's own range-join machinery picks.
    */
  def overlapping(
      segments: DataFrame, requests: DataFrame,
      keyCols: Seq[String],
      startCol: String = "starttime", endCol: String = "endtime",
      t1Col: String = "t1", t2Col: String = "t2",
      buffer: Long = 0L,
      broadcastRequests: Boolean = true,
      broadcastSegments: Boolean = false): DataFrame = {
    require(!(broadcastRequests && broadcastSegments),
      "broadcast at most one side of the overlap join")
    val renamed = renameKeys(requests, keyCols)
    val reqs = if (broadcastRequests) broadcast(renamed) else renamed
    val segs = if (broadcastSegments) broadcast(segments) else segments
    val overlap =
      !(segs(endCol) < reqs(t1Col) - lit(buffer) ||
        segs(startCol) > reqs(t2Col) + lit(buffer))
    val cond = keyCols.map(k => segs(k) === reqs(s"__req_$k"))
      .foldLeft(overlap)(_ && _)
    segs.join(reqs, cond).drop(keyCols.map(k => s"__req_$k"): _*)
  }

  /** Scale path for huge×huge: explode each request across the time
    * bands it covers, then equi-join on (keys, band) before applying
    * the exact range predicate as a residual. Shuffle is hash on
    * (keys, band) — no nested loop anywhere.
    *
    * `bandNs <= 0` (the default) derives the width from the data via
    * [[autoBandNs]]; band width is a pure physical knob — any width
    * produces identical results (the residual predicate is exact),
    * only the shuffle volume and per-band candidate count move.
    */
  def bandedPoints(
      points: DataFrame, requests: DataFrame,
      keyCols: Seq[String], tsCol: String,
      bandNs: Long = 0L,
      t1Col: String = "t1", t2Col: String = "t2"): DataFrame = {
    val width = if (bandNs > 0L) bandNs else autoBandNs(requests, t1Col, t2Col)
    val p = points.withColumn("_band", floor(col(tsCol) / lit(width)))
    val r = renameKeys(requests, keyCols).withColumn("_band",
      explode(sequence(floor(col(t1Col) / lit(width)),
                       floor(col(t2Col) / lit(width)))))
    val cond = (keyCols.map(k => p(k) === r(s"__req_$k")) :+ (p("_band") === r("_band")))
      .reduce(_ && _) && p(tsCol) >= r(t1Col) && p(tsCol) <= r(t2Col)
    p.join(r, cond).drop("_band").drop(keyCols.map(k => s"__req_$k"): _*)
  }

  /** Hard ceiling on how many bands one request may explode into under
    * the AUTO width: bounds the per-request `sequence()` length (Spark
    * arrays cap at ~2.1e9 elements — an uncapped width of 1 ns under a
    * 60 s outlier request would try 6e10) and the request-side
    * replication factor. A caller-supplied explicit `bandNs` is taken
    * as-is: the caller owns that knob.
    */
  private[graft] val MaxBandsPerRequest = 4096L

  /** Measured auto band width (used when the caller passes none): one
    * scalar aggregate over the REQUEST side — the MEDIAN interval
    * span, floored so the WIDEST request still explodes into at most
    * [[MaxBandsPerRequest]] bands — so a typical request explodes into
    * ≈2 bands and a point's candidate window is ~3 spans wide. The
    * operator-level analog of [[graft.plans.BandedRangeJoinRule]]'s
    * CBO-stats derivation: the planner rule must read ANALYZE TABLE
    * statistics because it cannot run jobs mid-optimization, while an
    * eagerly-invoked operator can afford one tiny agg (single-row
    * collect, request side only, never the fact side) and gets the
    * TRUE typical span instead of an extent/rowcount estimate.
    * Median, not mean: one unfiltered open-ended sentinel interval
    * would stretch a mean by orders of magnitude and silently widen
    * EVERY request's candidate window, while the median ignores the
    * outlier — and the max-span floor keeps that outlier's own band
    * explosion bounded (a point-dominated set with a 0 median plus one
    * wide request would otherwise derive a 1 ns width and blow the
    * sequence; erring wide is the safe direction, erring narrow is a
    * crash). A 10⁷-row width sweep (BASELINE.md, round 7) measured the
    * typical-span width AT the optimum: cost is flat from 1× to 2× the
    * span, +19% at 0.5× (the old fixed default), and diverges steeply
    * below (15× at span/12, where band replication dominates).
    */
  private[graft] def autoBandNs(requests: DataFrame,
                                t1Col: String, t2Col: String): Long = {
    // key on the canonicalized plan's SEMANTIC HASH, not the plan
    // itself: a LocalRelation-backed frame embeds its rows in the
    // plan, and a map retaining up to 32 such plans would pin their
    // data in driver memory. A hash collision merely reuses another
    // frame's width — a physical knob; results stay exact either way.
    val key = (requests.queryExecution.analyzed.canonicalized
      .semanticHash(), t1Col, t2Col)
    memoLock.synchronized(Option(widthMemo.get(key))) match {
      case Some(w) => w
      case None =>
        val w = measureBandNs(requests, t1Col, t2Col)
        memoLock.synchronized { widthMemo.put(key, w); () }
        // publish for BandedRangeJoinRule's stats-absent fallback (the
        // planner rule cannot run this measurement itself — see there)
        requests.sparkSession.conf
          .set("spark.graft.rangeJoin.bandWidth.measured", w.toString)
        w
    }
  }

  /** Memo of measured widths keyed by the request frame's canonicalized
    * semantic hash (+ bound columns): an iterative caller re-deriving
    * the width for the same requests frame — or a trivially re-aliased
    * copy of it — pays the single-row agg once, not per call. Bounded
    * LRU (32 entries of (Int, String, String) → Long — no plan or data
    * retention).
    */
  private val memoLock = new Object
  private val widthMemo =
    new java.util.LinkedHashMap[(Any, String, String), java.lang.Long](
      16, 0.75f, true) {
      override protected def removeEldestEntry(
          e: java.util.Map.Entry[(Any, String, String), java.lang.Long])
          : Boolean = size > 32
    }

  /** Times the measurement actually ran (spec observability). */
  private[graft] val measureCount = new java.util.concurrent.atomic.AtomicLong

  private def measureBandNs(requests: DataFrame,
                            t1Col: String, t2Col: String): Long = {
    measureCount.incrementAndGet()
    val spanExpr = s"cast($t2Col as double) - cast($t1Col as double)"
    val r = requests.agg(
      expr(s"approx_percentile($spanExpr, 0.5)"),
      expr(s"max($spanExpr)")).head()
    val med = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    val max = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
    math.max(1L, math.max(math.round(med),
      math.ceil(max / MaxBandsPerRequest).toLong))
  }
}
