package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming catalog validation — the continuous counterpart of
  * [[graft.operators.CatalogValidation]] (obsplus `events/validate.py`):
  * picks and amplitudes arriving on a stream are checked against
  * per-key state, and verdicts are emitted the moment they are
  * decidable — the monitoring shape (flag bad picks as an acquisition
  * system produces them) the batch report can't give.
  *
  * Emission semantics, per rule:
  *
  *   - [[duplicatePicks]] (`validate.py:104`): the violation set is
  *     MONOTONE under late data (every pick except each key's minimum
  *     is a duplicate, whatever the arrival order), so it emits plain
  *     append-only [[Violation]] rows that converge exactly to the
  *     batch rule.
  *   - [[sBeforeP]] (`validate.py:148-151`) and [[ampPickLink]]
  *     (`validate.py:260`): a late pick can flip a group's verdict in
  *     BOTH directions, so these emit a [[VerdictChange]] changelog —
  *     the latest row per (rule, entity) is the current verdict, and
  *     the set `{entity | latest.violated}` converges to the batch
  *     report once the stream has delivered the batch's rows.
  *
  * State per key is O(small): one (time, resource_id) pair for
  * duplicates, two min-times for pick order, the per-pick amplitude
  * references for the link rule. A caller-chosen timeout
  * (processing-time or event-time) bounds state for long-running
  * streams: it is re-armed on every invocation and an expired key's
  * state is dropped, so an abandoned (event, station) costs nothing
  * after `timeoutMs` of silence. Event-time timeout requires a
  * watermark on the input stream.
  */
object StreamingValidation {

  case class PickEvent(resource_id: String, event_id: String,
                       network: String, station: String, location: String,
                       phase_hint: String, evaluation_status: String,
                       time: Long)

  /** One amplitude row, pre-flattened like the batch `amplitudes`
    * table: `has_window` ⇔ either time_window bound was set.
    */
  case class AmpEvent(resource_id: String, event_id: String,
                      pick_id: String, evaluation_status: String,
                      reference: Option[Long], has_window: Boolean)

  case class FirstPick(time: Long, resource_id: String)
  case class Violation(entity_id: String, rule: String, event_id: String)

  /** Changelog row: latest per (rule, entity_id) wins. */
  case class VerdictChange(entity_id: String, rule: String,
                           event_id: String, violated: Boolean)

  private val DupPhases = Set("P", "p", "S", "s")

  private def earlier(aT: Long, aId: String, b: FirstPick): Boolean =
    aT < b.time || (aT == b.time && aId < b.resource_id)

  private def active(status: String): Boolean =
    status == null || status != "rejected"

  /** Re-arm the chosen timeout after an update. flatMapGroupsWithState
    * clears the registered timeout on every invocation, so skipping
    * this would mean NO timeout ever fires and per-key state grows
    * unbounded on a long-running stream.
    */
  private def armTimeout(state: GroupState[_], timeout: GroupStateTimeout,
                         timeoutMs: Long): Unit =
    timeout match {
      case t if t == GroupStateTimeout.ProcessingTimeTimeout() =>
        state.setTimeoutDuration(timeoutMs)
      case t if t == GroupStateTimeout.EventTimeTimeout() =>
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeoutMs)
      case _ => ()
    }

  /** `check_duplicate_picks` live: a violation row the moment a second
    * non-rejected P/p/S/s pick lands on the same (event, phase,
    * network, station, location). Late data converges to the batch
    * rule's answer: a pick older than the recorded first REPLACES it
    * and the previously-accepted pick is emitted as the violation, so
    * the surviving pick is always the (time, resource_id) minimum —
    * exactly the batch window's keeper.
    */
  def duplicatePicks(picks: Dataset[PickEvent],
                     timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout(),
                     timeoutMs: Long = 3600000L)
      : Dataset[Violation] = {
    import picks.sparkSession.implicits._
    picks
      .filter(p => active(p.evaluation_status))
      .filter(p => p.phase_hint != null && DupPhases(p.phase_hint))
      .groupByKey(p =>
        (p.event_id, p.phase_hint, p.network, p.station, p.location))
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (key: (String, String, String, String, String),
         it: Iterator[PickEvent], state: GroupState[FirstPick]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
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
                  out += Violation(f.resource_id, "check_duplicate_picks",
                    key._1)
                  first = Some(FirstPick(p.time, p.resource_id))
                case Some(_) =>
                  out += Violation(p.resource_id, "check_duplicate_picks",
                    key._1)
              }
            }
            first.foreach(state.update)
            armTimeout(state, timeout, timeoutMs)
            out.iterator
          }
      }
  }

  /** (minP, minS) per (event, net, sta, loc); verdict = S strictly
    * before P; `reported` = the last emitted verdict (absent = never
    * emitted, treated as not-violated).
    */
  case class PickOrderState(minP: Option[Long], minS: Option[Long],
                            reported: Boolean)

  /** `check_pick_order` part 1 (`validate.py:148-151`) live: a
    * changelog row whenever a group's S-before-P verdict CHANGES.
    * Batch takes min(P time) and min(S time) per station group; both
    * minima only decrease as picks stream in, so a late early P can
    * clear a previously-emitted violation — hence the changelog
    * contract (latest row wins) instead of append-only violations.
    * Entity id matches the batch rule: `event|net.sta.loc`.
    */
  def sBeforeP(picks: Dataset[PickEvent],
               timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout(),
               timeoutMs: Long = 3600000L)
      : Dataset[VerdictChange] = {
    import picks.sparkSession.implicits._
    picks
      .filter(p => active(p.evaluation_status))
      .filter(p => p.phase_hint != null &&
        (p.phase_hint.toUpperCase == "P" || p.phase_hint.toUpperCase == "S"))
      // null station keys never form a group: the reference's pandas
      // groupby drops NaN keys and the batch rule's inner join can
      // never match them — groupByKey would happily group nulls, so
      // filter explicitly to converge to the same verdict set (q77)
      .filter(p => p.network != null && p.station != null &&
        p.location != null)
      .groupByKey(p => (p.event_id, p.network, p.station, p.location))
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (key: (String, String, String, String),
         it: Iterator[PickEvent], state: GroupState[PickOrderState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption
              .getOrElse(PickOrderState(None, None, reported = false))
            var minP = st.minP
            var minS = st.minS
            it.foreach { p =>
              if (p.phase_hint.toUpperCase == "P")
                minP = Some(minP.fold(p.time)(math.min(_, p.time)))
              else
                minS = Some(minS.fold(p.time)(math.min(_, p.time)))
            }
            val violated = (minP, minS) match {
              case (Some(pt), Some(stime)) => stime < pt
              case _ => false
            }
            val out =
              if (violated != st.reported) {
                val entity = s"${key._1}|${key._2}.${key._3}.${key._4}"
                Iterator.single(VerdictChange(entity, "check_s_before_p",
                  key._1, violated))
              } else Iterator.empty
            state.update(PickOrderState(minP, minS, reported = violated))
            armTimeout(state, timeout, timeoutMs)
            out
          }
      }
  }

  /** Envelope for the amplitude↔pick link rule: both streams keyed by
    * (event_id, pick_id).
    */
  private[streaming] case class LinkEvent(event_id: String, pick_id: String,
      isPick: Boolean, pick_time: Long,
      amp_id: String, reference: Option[Long])

  /** amp_id → reference for windowed active amps; pickTime once the
    * linked pick arrived; reportedViolated = amp ids whose last emitted
    * verdict was `violated` (Seq: Set has no Spark encoder).
    */
  case class LinkState(pickTime: Option[Long],
                       amps: Map[String, Option[Long]],
                       reportedViolated: Seq[String])

  /** `check_amp_times_contain_pick_time` (`validate.py:260`) live: a
    * non-rejected amplitude with a time window must carry `reference`
    * equal to its linked pick's time. An amplitude whose pick has not
    * arrived yet is violated AS OF NOW (batch flags dangling pick_ids),
    * and the verdict flips via a changelog row if the pick lands later
    * with a matching time — so at every stream-complete point the
    * latest-verdict set equals the batch report.
    */
  def ampPickLink(amps: Dataset[AmpEvent], picks: Dataset[PickEvent],
                  timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout(),
                  timeoutMs: Long = 3600000L)
      : Dataset[VerdictChange] = {
    import amps.sparkSession.implicits._
    val pickSide = picks
      .map(p => LinkEvent(p.event_id, p.resource_id, isPick = true,
        p.time, amp_id = "", reference = None))
    val ampSide = amps
      .filter(a => active(a.evaluation_status) && a.has_window)
      .map(a => LinkEvent(a.event_id, a.pick_id, isPick = false,
        pick_time = 0L, amp_id = a.resource_id, reference = a.reference))
    pickSide.unionByName(ampSide)
      .groupByKey(e => (e.event_id, e.pick_id))
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (key: (String, String),
         it: Iterator[LinkEvent], state: GroupState[LinkState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption
              .getOrElse(LinkState(None, Map.empty, Nil))
            var pickTime = st.pickTime
            var ampRefs = st.amps
            it.foreach { e =>
              if (e.isPick) pickTime = Some(e.pick_time)
              else ampRefs += (e.amp_id -> e.reference)
            }
            def bad(ref: Option[Long]): Boolean = (ref, pickTime) match {
              case (Some(r), Some(pt)) => r != pt
              case _ => true // null reference or dangling/missing pick
            }
            val prior = st.reportedViolated.toSet
            val nowViolated = ampRefs.collect {
              case (id, ref) if bad(ref) => id
            }.toSet
            val outList =
              (nowViolated -- prior).toVector.map(id =>
                VerdictChange(id, "check_amp_times_contain_pick_time",
                  key._1, violated = true)) ++
              (prior -- nowViolated).toVector.map(id =>
                VerdictChange(id, "check_amp_times_contain_pick_time",
                  key._1, violated = false))
            state.update(LinkState(pickTime, ampRefs, nowViolated.toSeq))
            armTimeout(state, timeout, timeoutMs)
            outList.iterator
          }
      }
  }
}
