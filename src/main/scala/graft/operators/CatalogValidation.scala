package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's seismology validation rules (obsplus
  * `events/validate.py:29-281`, run through `validate_catalog`:284) as
  * declarative [[Validation.Rule]]s over the flat extraction tables
  * (picks / arrivals / amplitudes / origins — FIXTURES.md §3-6).
  *
  * The reference walks one ObsPy `Event` tree at a time in Python;
  * here every rule is ONE whole-catalog DataFrame plan — a filter, a
  * window, or an equi join keyed by `event_id` — so a 100 TB catalog
  * validates as a handful of shuffles over (event_id, station) keys
  * instead of a per-event driver loop. Rules that merely assert Python
  * *types* (`check_origins`:83's isinstance floats) are enforced
  * statically by the DataFrame schema; their dynamic residue
  * (non-finite values) is what [[originFiniteFloats]] checks.
  *
  * Fixer-validators in the reference (`set_preferred_values`:30,
  * `attach_all_resource_ids`:44, `replace_null_nlsc_codes`:100) are
  * ingest-time normalizations in this engine (preferred-origin
  * resolution in `sources/QuakeMl.scala:107-136`, nullish-NSLC
  * cleanup in `core/Schemas.scala:187`), so they do not reappear as
  * report rules.
  *
  * Violation rows carry `entity_id` = the offending object's
  * `resource_id` (the reference prints seed ids in assert messages;
  * resource ids are the deterministic engine-side equivalent).
  */
object CatalogValidation {

  /** The reference keeps rows whose status differs from "rejected";
    * pandas keeps NaN there, so null must survive the filter too.
    */
  private def active(df: DataFrame): DataFrame =
    df.filter(coalesce(col("evaluation_status"), lit("")) =!= "rejected")

  /** `check_arrivals_pick_id` (`events/validate.py:64`): every arrival
    * must reference a pick that exists in the same event.
    */
  def arrivalsPickId(arrivals: DataFrame, picks: DataFrame): DataFrame = {
    val pickIds = picks.select(col("event_id"), col("resource_id").as("pick_id"))
    arrivals.join(pickIds, Seq("event_id", "pick_id"), "left_anti")
      .select(col("resource_id").as("entity_id"))
  }

  /** `check_arrivals_pick_id`'s pick-side asserts: every pick needs a
    * waveform id (seed components) and a phase hint.
    */
  def pickRequiredFields(picks: DataFrame): DataFrame =
    picks.filter(col("network").isNull || col("station").isNull ||
        col("channel").isNull || col("phase_hint").isNull)
      .select(col("resource_id").as("entity_id"))

  /** `check_duplicate_picks` (`events/validate.py:104`): within an
    * event, at most one non-rejected P/p/S/s pick per
    * network.station.location (NSLC[:-1]). The reference marks
    * all-but-first in pick-list order; list order is not a table
    * property, so first = earliest (time, resource_id).
    */
  def duplicatePicks(picks: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("event_id", "phase_hint", "network", "station", "location")
      .orderBy(col("time").asc, col("resource_id").asc)
    active(picks)
      .filter(col("phase_hint").isin("P", "p", "S", "s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("resource_id").as("entity_id"))
  }

  /** First P/S time per (event, net, sta, loc) — `check_pick_order`
    * groups by NSLC[:3] (`events/validate.py:162`) and takes the
    * single P/S pick (min time when duplicated).
    */
  private def phaseTimes(picks: DataFrame, phase: String, as: String): DataFrame =
    active(picks).filter(upper(col("phase_hint")) === phase)
      .groupBy("event_id", "network", "station", "location")
      .agg(min("time").as(as))

  /** `check_pick_order` part 1 (`events/validate.py:148-151`): an S
    * pick earlier than the P pick on the same station. Entity =
    * event|net.sta.loc (the reference reports the group name).
    */
  def sBeforeP(picks: DataFrame): DataFrame =
    phaseTimes(picks, "P", "p_time")
      .join(phaseTimes(picks, "S", "s_time"),
        Seq("event_id", "network", "station", "location"))
      .filter(col("s_time") < col("p_time"))
      .select(concat_ws("|", col("event_id"),
        concat_ws(".", col("network"), col("station"), col("location")))
        .as("entity_id"))

  /** `check_pick_order` part 2 (`events/validate.py:153-156`):
    * amplitude picks (phase hint ending in AML — covers AML and IAML)
    * earlier than the station's P pick.
    */
  def ampBeforeP(picks: DataFrame): DataFrame =
    active(picks).filter(col("phase_hint").endsWith("AML"))
      .join(phaseTimes(picks, "P", "p_time"),
        Seq("event_id", "network", "station", "location"))
      .filter(col("time") < col("p_time"))
      .select(col("resource_id").as("entity_id"))

  /** `check_p_lims` (`events/validate.py:171`): P picks farther than
    * `pLimUs` µs from the event's median P time. The median runs over
    * µs (not ns) so the double-precision percentile is integer-exact —
    * epoch-ns magnitudes (~1.7e18) exceed double's 2^53 integer range,
    * epoch-µs do not.
    */
  def pOutliers(picks: DataFrame, pLimUs: Long): DataFrame = {
    val p = active(picks).filter(col("phase_hint") === "P")
      .withColumn("t_us", expr("time div 1000"))
    val med = p.groupBy("event_id")
      .agg(expr("percentile(t_us, 0.5)").as("med_us"))
    p.join(med, "event_id")
      .filter(abs(col("t_us").cast("double") - col("med_us")) > pLimUs.toDouble)
      .select(col("resource_id").as("entity_id"))
  }

  /** `check_amp_lims` (`events/validate.py:188`): amplitudes above the
    * physical limit. The reference loops ALL amplitudes (no rejected
    * filter) — so does this.
    */
  def ampLims(amplitudes: DataFrame, ampLim: Double): DataFrame =
    amplitudes.filter(col("generic_amplitude") > ampLim)
      .select(col("resource_id").as("entity_id"))

  /** `check_amp_filter_ids` (`events/validate.py:210`): amplitude
    * filter ids outside the allowed set (null = `str(None)` in the
    * reference = not in the set = violation).
    */
  def ampFilterIds(amplitudes: DataFrame, allowed: Seq[String]): DataFrame =
    amplitudes.filter(!coalesce(col("filter_id"), lit("")).isin(allowed: _*))
      .select(col("resource_id").as("entity_id"))

  /** `check_amps_on_z_component` (`events/validate.py:239`):
    * non-rejected amplitude picks (AML/IAML by default) on a
    * Z-terminated channel.
    */
  def ampsOnZ(picks: DataFrame,
              phaseHints: Seq[String] = Seq("AML", "IAML")): DataFrame =
    active(picks)
      .filter(col("phase_hint").isin(phaseHints: _*) &&
        col("channel").endsWith("Z"))
      .select(col("resource_id").as("entity_id"))

  /** `check_amp_times_contain_pick_time` (`events/validate.py:260`):
    * a non-rejected amplitude with a time window must carry a
    * `reference` equal to its pick's time. Window presence = either
    * window bound set (the tree's `time_window is None` ⇔ both null in
    * the flat table); a dangling pick_id is a violation too (the
    * reference would crash dereferencing it).
    */
  def ampTimesContainPickTime(amplitudes: DataFrame,
                              picks: DataFrame): DataFrame = {
    val pickTimes = picks
      .select(col("event_id"), col("resource_id").as("pick_id"),
        col("time").as("pick_time"))
    active(amplitudes)
      .filter(col("time_begin").isNotNull || col("time_end").isNotNull)
      .join(pickTimes, Seq("event_id", "pick_id"), "left")
      .filter(col("reference").isNull || col("pick_time").isNull ||
        col("reference") =!= col("pick_time"))
      .select(col("resource_id").as("entity_id"))
  }

  /** `check_origins` (`events/validate.py:83`)'s dynamic residue: the
    * isinstance-float asserts are static schema guarantees here; what
    * can still go wrong in a typed column is a non-finite value.
    */
  def originFiniteFloats(origins: DataFrame,
                         floatCols: Seq[String]): DataFrame =
    origins.filter(floatCols.map(c =>
        isnan(col(c)) || col(c) === Double.PositiveInfinity ||
          col(c) === Double.NegativeInfinity)
      .reduce(_ || _))
      .select(col("resource_id").as("entity_id"))

  /** The full `validate_catalog` rule set (`events/validate.py:284`)
    * with the reference's kwargs (`p_lim`, `amp_lim`, `filter_ids`,
    * `no_z_amps`): limit-gated rules only run when their limit is
    * given, mirroring the reference's `if p_lim is not None` guards.
    */
  def rules(picks: DataFrame, arrivals: DataFrame, amplitudes: DataFrame,
            origins: DataFrame,
            originFloatCols: Seq[String] =
              Seq("latitude", "longitude", "depth"),
            pLimUs: Option[Long] = None,
            ampLim: Option[Double] = None,
            filterIds: Seq[String] = Nil,
            noZAmps: Boolean = false): Seq[Validation.Rule] = {
    import Validation.Rule
    Seq(
      Some(Rule("check_arrivals_pick_id", () => arrivalsPickId(arrivals, picks))),
      Some(Rule("check_pick_required_fields", () => pickRequiredFields(picks))),
      Some(Rule("check_duplicate_picks", () => duplicatePicks(picks))),
      Some(Rule("check_s_before_p", () => sBeforeP(picks))),
      Some(Rule("check_amp_before_p", () => ampBeforeP(picks))),
      pLimUs.map(l => Rule("check_p_lims", () => pOutliers(picks, l))),
      ampLim.map(l => Rule("check_amp_lims", () => ampLims(amplitudes, l))),
      if (filterIds.nonEmpty)
        Some(Rule("check_amp_filter_ids", () => ampFilterIds(amplitudes, filterIds)))
      else None,
      if (noZAmps) Some(Rule("check_amps_on_z", () => ampsOnZ(picks))) else None,
      Some(Rule("check_amp_times_contain_pick_time",
        () => ampTimesContainPickTime(amplitudes, picks))),
      Some(Rule("check_origin_floats",
        () => originFiniteFloats(origins, originFloatCols)))
    ).flatten
  }
}
