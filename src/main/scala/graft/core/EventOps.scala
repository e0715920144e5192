package graft.core

import org.apache.spark.sql.Dataset

/** Catalog-manipulation utilities — obsplus `utils/events.py`:
  * `duplicate_events`:36, `prune_events`:74, `strip_events`:152 — over
  * a full nested event tree.
  *
  * The reference mutates one ObsPy object tree at a time; each
  * operation here is a pure per-event function lifted over
  * `Dataset[FullEvent]` with `.map` — embarrassingly parallel,
  * zero-shuffle, so a 100 TB catalog prunes at scan speed. The pure
  * single-event forms are exposed for direct use and testing.
  */
object EventOps {

  /** The fields the three operations touch, mirroring the ObsPy tree:
    * nested arrivals under origins, status-carrying picks / origins /
    * magnitudes / amplitudes, preferred ids, descriptions. `filter_id`
    * and `method_id`-style attributes are EXTERNAL resources — never
    * renamed by duplication (`utils/events.py:43-45`).
    */
  case class Arrival(resource_id: String, pick_id: String, phase: String)
  case class Origin(resource_id: String, time: Long, latitude: Double,
                    longitude: Double, depth: Double,
                    evaluation_status: Option[String],
                    arrivals: Seq[Arrival])
  case class Magnitude(resource_id: String, mag: Double,
                       magnitude_type: String, origin_id: String,
                       evaluation_status: Option[String])
  case class Pick(resource_id: String, time: Long, seed_id: String,
                  phase_hint: String, evaluation_status: Option[String])
  case class Amplitude(resource_id: String, generic_amplitude: Double,
                       pick_id: String, filter_id: String,
                       evaluation_status: Option[String])
  case class FullEvent(event_id: String,
                       preferred_origin_id: Option[String],
                       preferred_magnitude_id: Option[String],
                       event_descriptions: Seq[String],
                       picks: Seq[Pick], origins: Seq[Origin],
                       magnitudes: Seq[Magnitude],
                       amplitudes: Seq[Amplitude])

  /** `duplicate_events` (`utils/events.py:36`): deep copy with fresh
    * resource ids for every INTERNAL object, rebinding every reference
    * to a renamed id (arrival/amplitude `pick_id`, magnitude
    * `origin_id`, preferred ids). External ids (`filter_id`) are left
    * alone — only ids present in the event's own resource_id set are
    * in the rename map, exactly the reference's two-pass id_map. The
    * generator is injectable; the default derandomizes the
    * reference's UUID generator into a deterministic suffix.
    */
  def duplicateOne(e: FullEvent,
                   rename: String => String = _ + "/dup"): FullEvent = {
    val internal: Set[String] =
      (Seq(e.event_id) ++ e.picks.map(_.resource_id) ++
        e.origins.map(_.resource_id) ++
        e.origins.flatMap(_.arrivals.map(_.resource_id)) ++
        e.magnitudes.map(_.resource_id) ++
        e.amplitudes.map(_.resource_id)).toSet
    def re(id: String): String = if (internal.contains(id)) rename(id) else id
    def reOpt(id: Option[String]): Option[String] = id.map(re)
    e.copy(
      event_id = re(e.event_id),
      preferred_origin_id = reOpt(e.preferred_origin_id),
      preferred_magnitude_id = reOpt(e.preferred_magnitude_id),
      picks = e.picks.map(p => p.copy(resource_id = re(p.resource_id))),
      origins = e.origins.map(o => o.copy(
        resource_id = re(o.resource_id),
        arrivals = o.arrivals.map(a => a.copy(
          resource_id = re(a.resource_id), pick_id = re(a.pick_id))))),
      magnitudes = e.magnitudes.map(m => m.copy(
        resource_id = re(m.resource_id), origin_id = re(m.origin_id))),
      amplitudes = e.amplitudes.map(a => a.copy(
        resource_id = re(a.resource_id), pick_id = re(a.pick_id))))
  }

  private def rejected(status: Option[String]): Boolean =
    status.contains("rejected")

  /** `prune_events` (`utils/events.py:74`): drop every rejected
    * status-carrying object that no non-rejected status-carrying
    * object refers to. Mirrors the reference's edge construction: each
    * object with an `evaluation_status` contributes edges to every
    * resource id it (recursively) contains — including its own, so an
    * unreferenced rejected object's only parent is itself and it is
    * removed. A rejected pick held by a live origin's arrival
    * survives; the event's preferred ids do NOT protect anything
    * (the Event carries no evaluation_status in the reference either).
    */
  def pruneOne(e: FullEvent): FullEvent = {
    // (status-object rid, isRejected, referenced rids incl. self)
    val statusObjs: Seq[(String, Boolean, Seq[String])] =
      e.picks.map(p => (p.resource_id, rejected(p.evaluation_status),
        Seq(p.resource_id))) ++
      e.origins.map(o => (o.resource_id, rejected(o.evaluation_status),
        o.resource_id +: o.arrivals.flatMap(a =>
          Seq(a.resource_id, a.pick_id)))) ++
      e.magnitudes.map(m => (m.resource_id, rejected(m.evaluation_status),
        Seq(m.resource_id, m.origin_id))) ++
      e.amplitudes.map(a => (a.resource_id, rejected(a.evaluation_status),
        Seq(a.resource_id, a.pick_id)))
    val rejectedRids = statusObjs.collect { case (rid, true, _) => rid }.toSet
    // parents of each rejected rid = status objects referencing it
    val parents: Map[String, Seq[Boolean]] = statusObjs
      .flatMap { case (_, isRej, refs) =>
        refs.filter(rejectedRids.contains).map(_ -> isRej) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val drop: Set[String] = rejectedRids.filter(rid =>
      parents.getOrElse(rid, Nil).forall(identity))
    e.copy(
      picks = e.picks.filterNot(p => drop(p.resource_id)),
      origins = e.origins.filterNot(o => drop(o.resource_id)),
      magnitudes = e.magnitudes.filterNot(m => drop(m.resource_id)),
      amplitudes = e.amplitudes.filterNot(a => drop(a.resource_id)))
  }

  /** `strip_events` (`utils/events.py:152`): the nuclear option —
    * drop all derivative data (origins, magnitudes, preferred ids),
    * keep only non-rejected picks, amplitudes whose own AND referenced
    * pick's status pass (the pick check consults the PRE-filter pick
    * list, as the reference's resource-id registry does), and the
    * first event description.
    */
  def stripOne(e: FullEvent,
               rejectStatuses: Set[String] = Set("rejected")): FullEvent = {
    def bad(s: Option[String]): Boolean = s.exists(rejectStatuses.contains)
    val pickStatus: Map[String, Option[String]] =
      e.picks.map(p => p.resource_id -> p.evaluation_status).toMap
    e.copy(
      preferred_origin_id = None,
      preferred_magnitude_id = None,
      event_descriptions = e.event_descriptions.take(1),
      origins = Nil,
      magnitudes = Nil,
      picks = e.picks.filterNot(p => bad(p.evaluation_status)),
      amplitudes = e.amplitudes.filterNot(a =>
        bad(a.evaluation_status) ||
          pickStatus.get(a.pick_id).exists(bad)))
  }

  /** `get_preferred` (`utils/events.py:425-481`): the preferred object
    * when its id resolves; with NO preferred id set, the last of the
    * list; a preferred id that DANGLES also falls back to the last of
    * the list (the reference warns, then takes `whats[-1]`). Only an
    * empty list yields None.
    */
  def preferredOrigin(e: FullEvent): Option[Origin] =
    e.preferred_origin_id match {
      case Some(id) =>
        e.origins.find(_.resource_id == id).orElse(e.origins.lastOption)
      case None => e.origins.lastOption
    }

  def preferredMagnitude(e: FullEvent): Option[Magnitude] =
    e.preferred_magnitude_id match {
      case Some(id) =>
        e.magnitudes.find(_.resource_id == id).orElse(e.magnitudes.lastOption)
      case None => e.magnitudes.lastOption
    }

  /** `bump_creation_version`'s version arithmetic (`utils/events.py:
    * 225-256`): dotted numeric strings bump their last component,
    * absent versions start at "0.0.0". The reference also stamps
    * `creation_time = now`; pass the timestamp in — a distributed
    * operator must not read the clock per row.
    */
  def bumpVersion(version: Option[String]): String = version match {
    case None | Some("") => "0.0.0"
    case Some(v) =>
      val parts = v.split('.')
      require(parts.forall(p => p.nonEmpty && p.forall(_.isDigit)),
        s"not a dotted numeric version: '$v'")
      (parts.dropRight(1) :+ (parts.last.toLong + 1).toString).mkString(".")
  }

  /** Dataset lifts: one narrow map stage each. */
  def duplicateEvents(ds: Dataset[FullEvent],
                      rename: String => String = _ + "/dup")
      : Dataset[FullEvent] = {
    import ds.sparkSession.implicits._
    ds.map(duplicateOne(_, rename))
  }

  def pruneEvents(ds: Dataset[FullEvent]): Dataset[FullEvent] = {
    import ds.sparkSession.implicits._
    ds.map(pruneOne)
  }

  def stripEvents(ds: Dataset[FullEvent],
                  rejectStatuses: Set[String] = Set("rejected"))
      : Dataset[FullEvent] = {
    import ds.sparkSession.implicits._
    ds.map(stripOne(_, rejectStatuses))
  }
}
