package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming interval analytics — the continuous complement of the
  * batch [[graft.operators.Intervals]] family: segment summaries
  * arriving on a stream (a live archive's index feed) are monitored
  * for coverage gaps as they land, instead of waiting for the nightly
  * batch sweep over the whole index (the reference's `get_gaps_df` is
  * batch-only, obsplus `wavebank.py:442-469`).
  *
  * Semantics are IDENTICAL to [[graft.operators.Intervals.gaps]] for
  * data within the watermark horizon: per key, order by (starttime,
  * endtime), keep the running max of endtime, emit a gap where that
  * max + minGap is still before the next segment's start. The
  * streaming reformulation buffers only the segments the watermark has
  * not yet sealed (arrivals can still be reordered among them), and
  * finalizes the sealed prefix IN ORDER each time the watermark
  * advances — so out-of-order arrival inside the watermark never
  * changes the output, and the emitted gap set equals the batch
  * operator's on the sealed prefix. Segments later than the watermark
  * are handled best-effort (buffered and folded in at the next
  * finalization), the standard structured-streaming lateness contract.
  *
  * State per key after finalization is ONE (runMax, hasPrev) pair —
  * O(1) bytes, persisting across idle periods so a station that goes
  * silent for days still yields its gap when it resumes (exactly the
  * batch semantics). The buffer itself is watermark-bounded. Keys are
  * NSLC channels: bounded by the physical network, not the data
  * volume.
  */
object StreamingIntervals {

  case class GapRow(key: String, gap_start: Long, gap_end: Long, gap_ns: Long)

  /** Watermark-finalized state: the sealed prefix collapses to
    * (runMax, hasPrev); `buf` holds only unsealed (start, end) pairs.
    */
  case class GapState(runMax: Long, hasPrev: Boolean, buf: Seq[(Long, Long)])

  /** Append-mode gap stream over (key, starttime, endtime) rows;
    * event time is `startCol` (epoch-ns long). Output: (keyCol,
    * gap_start, gap_end, gap_ns) — the batch `Intervals.gaps` columns.
    */
  def gapStream(stream: DataFrame, keyCol: String, startCol: String,
                endCol: String, minGap: Long, watermark: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(
        col(keyCol).cast("string").as("key"),
        col(startCol).cast("long").as("starttime"),
        col(endCol).cast("long").as("endtime"),
        timestamp_micros(expr(s"$startCol div 1000")).as("_ts"))
      .withWatermark("_ts", watermark)
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GapState, GapRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state) =>
          val st = state.getOption.getOrElse(GapState(Long.MinValue, false, Nil))
          val buf = st.buf ++ rows.map(r => (r._2, r._3))
          // the watermark seals every event time strictly below it:
          // no admissible arrival can precede the cut, so the prefix
          // below it is safe to order and finalize. Strict <, in ns of
          // the µs-truncated event time — a late-but-admissible row AT
          // the watermark still lands in the pending side.
          val cut = state.getCurrentWatermarkMs() * 1_000_000L
          val (ready, pending) = buf.partition(_._1 < cut)
          var runMax = st.runMax
          var hasPrev = st.hasPrev
          val out = Seq.newBuilder[GapRow]
          ready.sorted.foreach { case (s0, e0) =>
            if (hasPrev && runMax + minGap < s0)
              out += GapRow(key, runMax, s0, s0 - runMax)
            runMax = math.max(runMax, e0)
            hasPrev = true
          }
          state.update(GapState(runMax, hasPrev, pending))
          // re-finalize when the watermark next advances past the
          // pending buffer; a drained key keeps only the O(1) summary
          // and needs no timer until new data arrives
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.result().iterator
      }
      .toDF()
      .withColumnRenamed("key", keyCol)
  }

  case class SegRow(key: String, session_id: Long, seg_start: Long,
                    seg_end: Long, n_members: Long)

  /** Watermark-finalized open span: `sid` numbers sessions 1..k in
    * sealed start order — identical to the batch cumulative-flag-sum
    * session id, because finalization processes rows in exactly the
    * order the batch window does.
    */
  case class SegState(sid: Long, segStart: Long, runMax: Long, n: Long,
                      hasOpen: Boolean, buf: Seq[(Long, Long)])

  /** Streaming contiguous-span maintenance — the inversion of
    * [[gapStream]] and the live counterpart of
    * [[graft.operators.Intervals.segments]] (obsplus `get_segments_df`,
    * `wavebank.py:523-577`): (key, starttime, endtime) rows arriving on
    * a stream coalesce into maximal spans where each row starts within
    * `tol` of the running max end; a span is emitted (Append mode) as
    * soon as it is provably CLOSED. Two closure paths, both exact:
    *
    *   - a sealed row opens a later session (the batch rule), or
    *   - the WATERMARK passes `runMax + tol`: every admissible future
    *     arrival has event time at or above the watermark, so nothing
    *     can extend the span any more — segments reach the sink with
    *     bounded latency (watermark delay + tol past their end) instead
    *     of waiting for the station's next transmission, which for a
    *     dead station is never.
    *
    * Same sealed-prefix machinery as [[gapStream]]: the buffer holds
    * only unsealed rows (reorder-safe inside the watermark), the sealed
    * prefix finalizes in (starttime, endtime) order, and emitted spans
    * — including their batch-identical `session_id` — match
    * `Intervals.segments` on the sealed prefix. State per key after
    * finalization is one (sid, segStart, runMax, n) summary: O(1)
    * bytes; the buffer is watermark-bounded. Rows later than the
    * watermark are folded in best-effort at the next finalization (they
    * may perturb session numbering — the standard lateness contract;
    * re-run the batch operator for authoritative reprocessing).
    */
  def segmentStream(stream: DataFrame, keyCol: String, startCol: String,
                    endCol: String, tol: Long, watermark: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(
        col(keyCol).cast("string").as("key"),
        col(startCol).cast("long").as("starttime"),
        col(endCol).cast("long").as("endtime"),
        timestamp_micros(expr(s"$startCol div 1000")).as("_ts"))
      .withWatermark("_ts", watermark)
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SegState, SegRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state) =>
          val st = state.getOption
            .getOrElse(SegState(0L, 0L, Long.MinValue, 0L, false, Nil))
          val buf = st.buf ++ rows.map(r => (r._2, r._3))
          val cut = state.getCurrentWatermarkMs() * 1_000_000L
          val (ready, pending) = buf.partition(_._1 < cut)
          var sid = st.sid; var segStart = st.segStart
          var runMax = st.runMax; var n = st.n; var hasOpen = st.hasOpen
          val out = Seq.newBuilder[SegRow]
          ready.sorted.foreach { case (s0, e0) =>
            if (hasOpen && runMax + tol >= s0) {
              runMax = math.max(runMax, e0); n += 1
            } else {
              if (hasOpen) out += SegRow(key, sid, segStart, runMax, n)
              sid += 1; segStart = s0; runMax = e0; n = 1; hasOpen = true
            }
          }
          // watermark closure: every pending row starts at/after the
          // cut, so cut > runMax + tol proves no admissible row —
          // buffered OR future — can extend the open span
          if (hasOpen && cut > runMax + tol) {
            out += SegRow(key, sid, segStart, runMax, n)
            hasOpen = false; n = 0; runMax = Long.MinValue; segStart = 0L
          }
          state.update(SegState(sid, segStart, runMax, n, hasOpen, pending))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          else if (hasOpen)
            // wake when the watermark can prove closure; must be
            // strictly ahead of the current watermark
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              (runMax + tol) / 1_000_000L + 1))
          out.result().iterator
      }
      .toDF()
      .withColumnRenamed("key", keyCol)
  }
}
