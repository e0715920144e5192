package graft

import graft.core.EventOps
import graft.core.EventOps._

/** Mirrors the reference's duplicate/prune/strip cases
  * (`tests/test_utils/test_event_utils.py`): unique new resource ids
  * with rebinding and untouched external ids; orphaned-rejected
  * removal with referenced-rejected retention; strip keeping only
  * passing picks/amplitudes and the first description.
  */
class EventOpsSpec extends SparkSpec {

  private def ev(
      picks: Seq[Pick] = Nil, origins: Seq[Origin] = Nil,
      magnitudes: Seq[Magnitude] = Nil, amplitudes: Seq[Amplitude] = Nil,
      descriptions: Seq[String] = Nil,
      prefOrigin: Option[String] = None,
      prefMag: Option[String] = None): FullEvent =
    FullEvent("ev/1", prefOrigin, prefMag, descriptions,
      picks, origins, magnitudes, amplitudes)

  private val pick = Pick("pk/1", 1000L, "N.S..HHZ", "P", Some(""))
  private val arrival = Arrival("ar/1", "pk/1", "P")
  private val origin = Origin("or/1", 1000L, 45.0, 7.0, 1.2, Some(""),
    Seq(arrival))
  private val mag = Magnitude("mg/1", 2.2, "ML", "or/1", Some(""))
  private val amp = Amplitude("am/1", 3.3, "pk/1", "smi:ext/filter/1", Some(""))

  test("duplicateOne renames every internal id, rebinds references, keeps external ids") {
    val e = ev(Seq(pick), Seq(origin), Seq(mag), Seq(amp),
      prefOrigin = Some("or/1"), prefMag = Some("mg/1"))
    val d = EventOps.duplicateOne(e)
    assert(d.event_id == "ev/1/dup")
    assert(d.picks.head.resource_id == "pk/1/dup")
    assert(d.origins.head.arrivals.head.pick_id == "pk/1/dup")
    assert(d.magnitudes.head.origin_id == "or/1/dup")
    assert(d.amplitudes.head.pick_id == "pk/1/dup")
    assert(d.preferred_origin_id.contains("or/1/dup"))
    assert(d.preferred_magnitude_id.contains("mg/1/dup"))
    // external resource untouched (utils/events.py:43-45)
    assert(d.amplitudes.head.filter_id == "smi:ext/filter/1")
    // all new ids distinct from all old ids
    def allIds(x: FullEvent): Set[String] =
      Set(x.event_id) ++ x.picks.map(_.resource_id) ++
        x.origins.map(_.resource_id) ++
        x.origins.flatMap(_.arrivals.map(_.resource_id)) ++
        x.magnitudes.map(_.resource_id) ++ x.amplitudes.map(_.resource_id)
    assert(allIds(d).intersect(allIds(e)).isEmpty)
    // custom generator
    val d2 = EventOps.duplicateOne(e, id => s"new:$id")
    assert(d2.origins.head.resource_id == "new:or/1")
  }

  test("pruneOne removes orphaned rejected objects only") {
    val rejPick = Pick("pk/rej", 2000L, "N.S..HHN", "S", Some("rejected"))
    // rejected pick referenced by a LIVE origin's arrival -> kept
    val liveOrigin = origin.copy(arrivals =
      Seq(arrival, Arrival("ar/2", "pk/rej", "S")))
    val kept = EventOps.pruneOne(ev(Seq(pick, rejPick), Seq(liveOrigin)))
    assert(kept.picks.map(_.resource_id) == Seq("pk/1", "pk/rej"))
    // same rejected pick referenced only by a REJECTED origin -> gone
    val rejOrigin = liveOrigin.copy(resource_id = "or/rej",
      evaluation_status = Some("rejected"), arrivals = Seq(Arrival("ar/2", "pk/rej", "S")))
    val pruned = EventOps.pruneOne(ev(Seq(pick, rejPick), Seq(rejOrigin)))
    assert(pruned.picks.map(_.resource_id) == Seq("pk/1"))
    // the rejected origin itself is an orphan (only self-parent) -> gone
    assert(pruned.origins.isEmpty)
    // unreferenced rejected magnitude -> gone; live one stays
    val rejMag = Magnitude("mg/rej", 1.0, "ML", "or/1", Some("rejected"))
    val prunedM = EventOps.pruneOne(ev(Seq(pick), Seq(origin), Seq(mag, rejMag)))
    assert(prunedM.magnitudes.map(_.resource_id) == Seq("mg/1"))
    // non-rejected objects never removed
    assert(prunedM.origins.nonEmpty && prunedM.picks.nonEmpty)
  }

  test("stripOne drops derivative data, rejected picks, linked amplitudes, extra descriptions") {
    val rejPick = Pick("pk/rej", 2000L, "N.S..HHN", "S", Some("rejected"))
    val ampOnRej = Amplitude("am/2", 4.4, "pk/rej", "f", Some(""))
    val rejAmp = Amplitude("am/3", 5.5, "pk/1", "f", Some("rejected"))
    val e = ev(Seq(pick, rejPick), Seq(origin), Seq(mag),
      Seq(amp, ampOnRej, rejAmp), Seq("first", "second"),
      prefOrigin = Some("or/1"), prefMag = Some("mg/1"))
    val s = EventOps.stripOne(e)
    assert(s.origins.isEmpty && s.magnitudes.isEmpty)
    assert(s.preferred_origin_id.isEmpty && s.preferred_magnitude_id.isEmpty)
    assert(s.picks.map(_.resource_id) == Seq("pk/1"))
    // rejected amp gone; amp tied to a rejected pick gone (py:211-217)
    assert(s.amplitudes.map(_.resource_id) == Seq("am/1"))
    assert(s.event_descriptions == Seq("first"))
    // custom reject set
    val maybe = pick.copy(resource_id = "pk/m", evaluation_status = Some("preliminary"))
    val s2 = EventOps.stripOne(ev(Seq(pick, maybe)),
      rejectStatuses = Set("rejected", "preliminary"))
    assert(s2.picks.map(_.resource_id) == Seq("pk/1"))
  }

  test("preferredOrigin/Magnitude: id wins, unset and dangling fall back to last") {
    val o2 = origin.copy(resource_id = "or/2")
    val m2 = mag.copy(resource_id = "mg/2")
    val e = ev(Seq(pick), Seq(origin, o2), Seq(mag, m2),
      prefOrigin = Some("or/1"), prefMag = None)
    assert(EventOps.preferredOrigin(e).map(_.resource_id).contains("or/1"))
    // no preferred id -> last of the list (set_preferred_values shape)
    assert(EventOps.preferredMagnitude(e).map(_.resource_id).contains("mg/2"))
    // dangling id warns + falls back to the last element (py:470-476)
    assert(EventOps.preferredOrigin(
      e.copy(preferred_origin_id = Some("or/missing")))
      .map(_.resource_id).contains("or/2"))
    assert(EventOps.preferredMagnitude(
      e.copy(preferred_magnitude_id = Some("mg/missing")))
      .map(_.resource_id).contains("mg/2"))
    // only an empty list yields None
    assert(EventOps.preferredOrigin(ev()).isEmpty)
    assert(EventOps.preferredOrigin(
      ev().copy(preferred_origin_id = Some("or/missing"))).isEmpty)
  }

  test("bumpVersion mirrors the reference's dotted-version arithmetic") {
    assert(EventOps.bumpVersion(None) == "0.0.0")
    assert(EventOps.bumpVersion(Some("")) == "0.0.0")
    assert(EventOps.bumpVersion(Some("0.0.0")) == "0.0.1")
    assert(EventOps.bumpVersion(Some("1.2.9")) == "1.2.10")
    assert(EventOps.bumpVersion(Some("7")) == "8")
    intercept[IllegalArgumentException](EventOps.bumpVersion(Some("1.a")))
  }

  test("Dataset lifts are per-event maps preserving counts") {
    import spark.implicits._
    val events = Seq(
      ev(Seq(pick), Seq(origin), Seq(mag), Seq(amp), Seq("d")),
      ev(Seq(pick.copy(evaluation_status = Some("rejected")))).copy(event_id = "ev/2"))
    val ds = spark.createDataset(events)
    val dup = EventOps.duplicateEvents(ds).collect()
    assert(dup.map(_.event_id).toSet == Set("ev/1/dup", "ev/2/dup"))
    val pruned = EventOps.pruneEvents(ds).collect()
    assert(pruned.find(_.event_id == "ev/2").get.picks.isEmpty)
    assert(pruned.find(_.event_id == "ev/1").get.picks.nonEmpty)
    val stripped = EventOps.stripEvents(ds).collect()
    assert(stripped.forall(_.origins.isEmpty))
  }
}
