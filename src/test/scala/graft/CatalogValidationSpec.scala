package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{CatalogValidation, Validation}

/** Planted-violation unit coverage for the seismology validation rules
  * (obsplus `events/validate.py:29-281`): each rule flags exactly the
  * planted offenders and nothing else. Mirrors the shapes of the
  * reference's `tests/test_events/test_validate.py` cases.
  */
class CatalogValidationSpec extends SparkSpec {

  import spark.implicits._

  // (resource_id, event_id, net, sta, loc, chan, phase, status, time)
  private def pickDf(rows: (String, String, String, String, String,
      String, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("resource_id", "event_id", "network", "station",
      "location", "channel", "phase_hint", "evaluation_status", "time")

  private def ids(df: DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  test("duplicatePicks flags all-but-first same-phase picks per station, skipping rejected") {
    val picks = pickDf(
      ("p1", "e1", "N", "S1", "", "HHZ", "P", "", 100L),
      ("p2", "e1", "N", "S1", "", "HHN", "P", "", 200L), // dup (later)
      ("p3", "e1", "N", "S1", "", "HHE", "P", "rejected", 300L), // rejected: skip
      ("p4", "e1", "N", "S2", "", "HHZ", "P", "", 100L), // other station
      ("p5", "e2", "N", "S1", "", "HHZ", "P", "", 100L), // other event
      ("p6", "e1", "N", "S1", "", "HHZ", "S", "", 400L)) // other phase
    assert(ids(CatalogValidation.duplicatePicks(picks)) == Set("p2"))
  }

  test("sBeforeP flags the station group; ampBeforeP flags early amplitude picks") {
    val picks = pickDf(
      ("p1", "e1", "N", "S1", "", "HHZ", "P", "", 1000L),
      ("s1", "e1", "N", "S1", "", "HHN", "S", "", 500L), // S before P
      ("p2", "e1", "N", "S2", "", "HHZ", "P", "", 1000L),
      ("s2", "e1", "N", "S2", "", "HHN", "S", "", 2000L), // fine
      ("a1", "e1", "N", "S1", "", "HHN", "AML", "", 900L), // amp before P
      ("a2", "e1", "N", "S2", "", "HHN", "IAML", "", 3000L)) // fine
    assert(ids(CatalogValidation.sBeforeP(picks)) == Set("e1|N.S1."))
    assert(ids(CatalogValidation.ampBeforeP(picks)) == Set("a1"))
  }

  test("pOutliers flags P picks beyond the limit from the event median") {
    val base = 1_700_000_000_000_000_000L // epoch ns
    val us = 1000L
    val picks = pickDf(
      ("p1", "e1", "N", "S1", "", "HHZ", "P", "", base),
      ("p2", "e1", "N", "S2", "", "HHZ", "P", "", base + 1000 * us * 1000),
      ("p3", "e1", "N", "S3", "", "HHZ", "P", "", base + 2000 * us * 1000),
      // ~10^12 us past the median with a 6*10^8 us limit:
      ("p4", "e1", "N", "S4", "", "HHZ", "P", "", base + 1_000_000_000L * us * 1000))
    // the median of the four times interpolates between p2 and p3;
    // p1-p3 sit within the limit, only p4 is out
    assert(ids(CatalogValidation.pOutliers(picks, pLimUs = 600_000_000L)) == Set("p4"))
  }

  test("pickRequiredFields and ampsOnZ flag nulls and Z-channel amplitude picks") {
    val picks = pickDf(
      ("p1", "e1", "N", "S1", "", "HHZ", "P", "", 1L),
      ("a1", "e1", "N", "S1", "", "HHZ", "AML", "", 2L), // amp on Z
      ("a2", "e1", "N", "S1", "", "HHN", "IAML", "", 3L), // fine
      ("a3", "e1", "N", "S1", "", "HHZ", "IAML", "rejected", 4L)) // rejected: skip
      .union(Seq((null: String, "e1", null: String, "S1", "", "HHZ",
        "P", "", 5L)).toDF())
    assert(ids(CatalogValidation.pickRequiredFields(picks)) == Set(null: String))
    assert(ids(CatalogValidation.ampsOnZ(picks)) == Set("a1"))
  }

  test("arrivalsPickId, ampLims, ampFilterIds, ampTimesContainPickTime, originFiniteFloats") {
    val picks = pickDf(
      ("p1", "e1", "N", "S1", "", "HHZ", "P", "", 1000L),
      ("p2", "e2", "N", "S1", "", "HHZ", "P", "", 2000L))
    val arrivals = Seq(
      ("r1", "e1", "p1"), // ok
      ("r2", "e1", "p2"), // pick exists but in another event
      ("r3", "e2", "px")) // dangling
      .toDF("resource_id", "event_id", "pick_id")
    assert(ids(CatalogValidation.arrivalsPickId(arrivals, picks)) == Set("r2", "r3"))

    val amps = Seq(
      // (rid, event, pick, amp, filter, reference, tb, te, status)
      ("m1", "e1", "p1", 5.0, "f/ok", 1000L, Some(0.5), Some(1.0), ""), // ok
      ("m2", "e1", "p1", 50.0, "f/ok", 1000L, Some(0.5), Some(1.0), ""), // over limit
      ("m3", "e1", "p1", 5.0, "f/bad", 1000L, Some(0.5), Some(1.0), ""), // bad filter
      ("m4", "e1", "p1", 5.0, "f/ok", 1500L, Some(0.5), Some(1.0), ""), // time mismatch
      ("m5", "e1", "p1", 5.0, "f/ok", 1500L, None, None, ""), // no window: skip
      ("m6", "e1", "px", 5.0, "f/ok", 1000L, Some(0.5), Some(1.0), ""), // dangling pick
      ("m7", "e1", "p1", 5.0, "f/ok", 1500L, Some(0.5), Some(1.0), "rejected"))
      .toDF("resource_id", "event_id", "pick_id", "generic_amplitude",
        "filter_id", "reference", "time_begin", "time_end", "evaluation_status")
    assert(ids(CatalogValidation.ampLims(amps, 40.0)) == Set("m2"))
    assert(ids(CatalogValidation.ampFilterIds(amps, Seq("f/ok"))) == Set("m3"))
    assert(ids(CatalogValidation.ampTimesContainPickTime(amps, picks)) == Set("m4", "m6"))

    val origins = Seq(
      ("o1", "e1", 10.0, 20.0, 5.0),
      ("o2", "e2", Double.NaN, 20.0, 5.0),
      ("o3", "e3", 10.0, Double.PositiveInfinity, 5.0))
      .toDF("resource_id", "event_id", "latitude", "longitude", "depth")
    assert(ids(CatalogValidation.originFiniteFloats(origins,
      Seq("latitude", "longitude", "depth"))) == Set("o2", "o3"))
  }

  test("rules() gates limit rules on their kwargs; report rejects empty rule sets") {
    val picks = pickDf(("p1", "e1", "N", "S1", "", "HHZ", "P", "", 1L))
    val arrivals = Seq(("r1", "e1", "p1")).toDF("resource_id", "event_id", "pick_id")
    val amps = Seq.empty[(String, String, String, Double, String, Long,
        Option[Double], Option[Double], String)]
      .toDF("resource_id", "event_id", "pick_id", "generic_amplitude",
        "filter_id", "reference", "time_begin", "time_end", "evaluation_status")
    val origins = Seq(("o1", "e1", 1.0, 2.0, 3.0))
      .toDF("resource_id", "event_id", "latitude", "longitude", "depth")
    val bare = CatalogValidation.rules(picks, arrivals, amps, origins)
    val full = CatalogValidation.rules(picks, arrivals, amps, origins,
      pLimUs = Some(1L), ampLim = Some(1.0), filterIds = Seq("f"), noZAmps = true)
    assert(full.map(_.name).toSet -- bare.map(_.name).toSet ==
      Set("check_p_lims", "check_amp_lims", "check_amp_filter_ids", "check_amps_on_z"))
    assert(Validation.report(full).columns.toSeq == Seq("entity_id", "rule"))
    intercept[IllegalArgumentException](Validation.report(Nil))
  }
}
