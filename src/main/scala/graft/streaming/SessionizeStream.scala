package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the live counterpart of
  * `Intervals.segments`: contiguous activity spans per key, emitted
  * when a gap exceeds the tolerance. Custom per-key state via
  * `flatMapGroupsWithState` (SURVEY §2.9): state is one open session
  * (O(1) per key), closed sessions are appended downstream.
  *
  * Event-time ordering within a micro-batch is handled by sorting the
  * batch's events per key. Cross-batch late data: an event within
  * tolerance of the open session merges (extending either bound); an
  * event older than the open session's reach is emitted immediately as
  * its own late singleton session — bounded state cannot re-open
  * history (use the batch sessionizer for full reprocessing).
  */
object SessionizeStream {

  case class Point(key: String, ts: Long)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class ClosedSession(key: String, seg_start: Long, seg_end: Long, n_members: Long)

  def sessionize(points: Dataset[Point], tolNs: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[ClosedSession] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (key: String, it: Iterator[Point], state: GroupState[OpenSession]) =>
          val sorted = it.map(_.ts).toArray.sorted
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          sorted.foreach { t =>
            open match {
              // late event far before the open session: emit it as its
              // own (late) closed session — with one open session of
              // state we cannot re-open history, and silently absorbing
              // it would corrupt the open session's bounds
              case Some(s) if t < s.start - tolNs =>
                closed += ClosedSession(key, t, t, 1)
              case Some(s) if t <= s.end + tolNs =>
                open = Some(OpenSession(math.min(s.start, t),
                  math.max(s.end, t), s.n + 1))
              case Some(s) =>
                closed += ClosedSession(key, s.start, s.end, s.n)
                open = Some(OpenSession(t, t, 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }

  /** Flush helper for batch-style use/tests: treat the dataset as one
    * final batch and also emit the still-open sessions.
    */
  def sessionizeBatch(spark: SparkSession, points: Dataset[Point],
                      tolNs: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    points.groupByKey(_.key).flatMapGroups { (key, it) =>
      val sorted = it.map(_.ts).toArray.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      var open: Option[OpenSession] = None
      sorted.foreach { t =>
        open match {
          case Some(s) if t <= s.end + tolNs =>
            open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
          case Some(s) =>
            out += ClosedSession(key, s.start, s.end, s.n)
            open = Some(OpenSession(t, t, 1))
          case None => open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach(s => out += ClosedSession(key, s.start, s.end, s.n))
      out.iterator
    }
  }
}
