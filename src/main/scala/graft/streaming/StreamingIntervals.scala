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
}
