package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming catalog validation — the continuous counterpart of
  * [[graft.operators.CatalogValidation.duplicatePicks]] (obsplus
  * `events/validate.py:104`): picks arriving on a stream are checked
  * against per-station state, and a violation row is emitted the
  * moment a second non-rejected P/p/S/s pick lands on the same
  * (event, phase, network, station, location) — the monitoring shape
  * (flag bad picks as an acquisition system produces them) the batch
  * report can't give.
  *
  * State per key is ONE (time, resource_id) pair — the accepted first
  * pick — so state is O(active keys) and a timeout (event-time or
  * processing-time, caller-chosen) bounds it. Late data converges to
  * the batch rule's answer: a pick older than the recorded first
  * REPLACES it and the previously-accepted pick is emitted as the
  * violation, so the surviving pick is always the (time, resource_id)
  * minimum — exactly the batch window's keeper.
  */
object StreamingValidation {

  case class PickEvent(resource_id: String, event_id: String,
                       network: String, station: String, location: String,
                       phase_hint: String, evaluation_status: String,
                       time: Long)
  case class FirstPick(time: Long, resource_id: String)
  case class Violation(entity_id: String, rule: String, event_id: String)

  private val DupPhases = Set("P", "p", "S", "s")

  private def earlier(aT: Long, aId: String, b: FirstPick): Boolean =
    aT < b.time || (aT == b.time && aId < b.resource_id)

  def duplicatePicks(picks: Dataset[PickEvent],
                     timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[Violation] = {
    import picks.sparkSession.implicits._
    picks
      .filter(p => p.evaluation_status == null ||
        p.evaluation_status != "rejected")
      .filter(p => p.phase_hint != null && DupPhases(p.phase_hint))
      .groupByKey(p =>
        (p.event_id, p.phase_hint, p.network, p.station, p.location))
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (key: (String, String, String, String, String),
         it: Iterator[PickEvent], state: GroupState[FirstPick]) =>
          val sorted = it.toArray.sortBy(p => (p.time, p.resource_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Violation]
          var first = state.getOption
          sorted.foreach { p =>
            first match {
              case None =>
                first = Some(FirstPick(p.time, p.resource_id))
              case Some(f) if earlier(p.time, p.resource_id, f) =>
                // late-but-earlier pick: it becomes the keeper, the
                // previously accepted one is the duplicate
                out += Violation(f.resource_id, "check_duplicate_picks", key._1)
                first = Some(FirstPick(p.time, p.resource_id))
              case Some(_) =>
                out += Violation(p.resource_id, "check_duplicate_picks", key._1)
            }
          }
          first.foreach(state.update)
          out.iterator
      }
  }
}
