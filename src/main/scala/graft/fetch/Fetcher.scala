package graft.fetch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** Dataset-aware joins — the Fetcher pillar (obsplus
  * `structures/fetcher.py`): answer "waveforms around each event's
  * reference time" as ONE distributed job instead of a per-event loop
  * (§3.3's single-job reformulation).
  *
  * Reference-time strategies (`fetcher.py:328, 576-628`):
  *   - "origin": each event's origin time × every channel (cross join —
  *     channel table broadcast)
  *   - "p"/"s": first matching-phase pick per event/station, joined to
  *     every channel of that station (broadcast equi join)
  *
  * Custom strategies register via `registerReference`.
  */
class Fetcher(
    spark: SparkSession,
    events: DataFrame,   // event_id, time (ns), ...
    stations: DataFrame, // network, station, location, channel, seed_id, ...
    picks: DataFrame) {  // event_id, station, phase_hint, time (ns)

  type RefStrategy = () => DataFrame // → (event_id, seed_id, ref_time)

  private var strategies: Map[String, RefStrategy] = Map(
    "origin" -> originTimes _,
    "p" -> (() => phaseTimes("P")),
    "s" -> (() => phaseTimes("S")))

  def registerReference(name: String, s: RefStrategy): Unit =
    strategies += name.toLowerCase -> s

  /** Post-fetch transform hook — the `stream_processor` extension
    * point (`fetcher.py:178-197, 491-499`): a user DataFrame→DataFrame
    * applied to every fetch result.
    */
  private var streamProcessor: DataFrame => DataFrame = identity
  def withStreamProcessor(f: DataFrame => DataFrame): this.type = {
    streamProcessor = f; this
  }

  /** origin strategy: events × channels (`fetcher.py:576-595`).
    * Channels dedup first: a station table carries one row per channel
    * EPOCH (the StationXML shape), and without the distinct every
    * extra epoch would emit a duplicate request per event.
    */
  def originTimes(): DataFrame =
    events.select(col("event_id"), col("time").as("ref_time"))
      .crossJoin(broadcast(stations.select(col("seed_id")).distinct()))

  /** p/s strategy: first pick of the phase per (event, station),
    * broadcast onto the station's channels (`fetcher.py:598-628`).
    * Same epoch dedup as [[originTimes]].
    */
  def phaseTimes(phase: String): DataFrame = {
    val firstPick = picks
      .filter(upper(col("phase_hint")) === phase.toUpperCase)
      .groupBy("event_id", "station")
      .agg(min("time").as("ref_time")) // first pick = idxmin on time
    broadcast(firstPick)
      .join(stations.select(col("station"), col("seed_id")).distinct(),
        Seq("station"))
      .select("event_id", "seed_id", "ref_time")
  }

  /** Waveform requests for every (event, channel): window
    * [ref − before, ref + after] — feed to WaveBank.getWaveformsBulk or
    * join against any segment index.
    *
    * When the station table carries start_date/end_date, channels not
    * ACTIVE in the request window are dropped (`_get_bulk_args`,
    * `fetcher.py:501-554`); a null end_date means still-operating and
    * reads as the LARGEDT64 "forever" sentinel (`fetcher.py:525-526`).
    * The activity table is per-channel (tiny) — broadcast.
    */
  def eventRequests(reference: String, beforeNs: Long, afterNs: Long): DataFrame = {
    val base = strategies(reference.toLowerCase)()
      .select(col("event_id"), col("seed_id"),
        (col("ref_time") - beforeNs).as("t1"),
        (col("ref_time") + afterNs).as("t2"))
    if (stations.columns.contains("start_date") &&
        stations.columns.contains("end_date")) {
      // LEFT SEMI, not inner: real inventories carry several epoch rows
      // per channel (StationXML one row per Channel element); "active"
      // means ANY epoch overlaps the window, and an inner join would
      // emit one duplicate request per matching epoch
      val activity = stations.select(col("seed_id").as("_aseed"),
        graft.core.Schemas.timeToStorage(col("start_date")).as("_sd"),
        graft.core.Schemas.timeToStorage(col("end_date"), openEnded = true).as("_ed"))
      base.join(broadcast(activity),
        base("seed_id") === col("_aseed") &&
          !(col("_ed") < base("t1") || col("_sd") > base("t2")),
        "left_semi")
    } else base
  }

  /** One-job event-waveform fetch: requests interval-joined to a
    * segment index on seed_id (+ overlap), keyed output
    * (event_id, seed_id). The reference's per-event Python loop
    * becomes a single shuffle.
    *
    * SKETCH-ASSISTED PLAN CHOICE: the request side is events ×
    * channels, and forcing it broadcast (the historical default, kept
    * when no estimate is given) is only right while it FITS — a
    * months-long catalog crossed with a big inventory explodes the
    * driver-forced broadcast long before AQE can help (a `broadcast()`
    * hint is obeyed, not reconsidered). Pass `requestEstimate` (from
    * [[estimatedRequests]] — a kilobyte sidecar read, no catalog
    * scan) and the fetch broadcasts only while the estimate fits
    * `spark.graft.fetch.broadcastMaxRequests` (default 1,000,000
    * request rows — round 13 lowered it from 2M: at 1.6M requests the
    * forced broadcast measured SLOWER than shuffled locally, so the
    * old default sat past the crossover; see BASELINE's crossover
    * sweep); past it the join runs un-hinted, where the
    * planner's own machinery (RangeJoinStrategy's packed broadcast of
    * whichever side fits, BandedRangeJoinRule's banded SMJ when
    * nothing does) picks the scale path. Estimate quality moves
    * performance, never results — both plans are exact.
    *
    * BOTH-SIDE choice (round 12): `segmentEstimate` (from
    * [[graft.bank.WaveBank.estimatedSegmentCount]] — the index-side
    * sidecar twin) lets the planner broadcast the SEGMENT side when
    * the request side outgrew its budget but the time-windowed index
    * slice still fits `spark.graft.fetch.broadcastMaxSegments`
    * (default 1,000,000, lowered with the request budget) — the months-of-events × thin-index-window
    * shape, where shuffling a huge request table to meet a tiny index
    * is the one wrong plan. Request-side broadcast keeps priority
    * (requests are usually the small side); with neither estimate
    * under budget the join runs un-hinted as before. Before hinting
    * the segment side the index is sliced to the requests' time hull
    * (result-identical; pushed to the scan), so an estimate computed
    * over a thin window can never broadcast a full archive the caller
    * happened to pass.
    */
  def fetchEventSegments(index: DataFrame, reference: String,
                         beforeNs: Long, afterNs: Long,
                         requestEstimate: Option[Long] = None,
                         segmentEstimate: Option[Long] = None): DataFrame = {
    val reqs = eventRequests(reference, beforeNs, afterNs)
    val reqBudget = spark.conf
      .get("spark.graft.fetch.broadcastMaxRequests", "1000000").toLong
    val segBudget = spark.conf
      .get("spark.graft.fetch.broadcastMaxSegments", "1000000").toLong
    val bcastReqs = requestEstimate.forall(_ <= reqBudget)
    val bcastSegs = !bcastReqs && segmentEstimate.exists(_ <= segBudget)
    // the estimate covered a padded time WINDOW, but nothing ties that
    // to the frame the caller passed: a full-archive index next to a
    // thin-window estimate would broadcast the whole archive. Slice the
    // index to the requests' true time hull first — result-identical
    // by construction (a segment outside [min t1, max t2] overlaps no
    // request), one narrow min/max agg over the request side (cheaper
    // than the shuffle the broadcast replaces), and the filter pushes
    // to the parquet scan. Only paid on the segment-broadcast path.
    val idx =
      if (!bcastSegs) index
      else {
        val hull = reqs.agg(min(col("t1")).as("lo"), max(col("t2")).as("hi")).head()
        if (hull.isNullAt(0)) index // no requests: join is empty anyway
        else index.filter(
          col("endtime") >= hull.getLong(0) && col("starttime") <= hull.getLong(1))
      }
    streamProcessor(IntervalJoin.overlapping(idx, reqs,
      keyCols = Seq("seed_id"),
      broadcastRequests = bcastReqs,
      broadcastSegments = bcastSegs))
  }

  /** Sketch-estimated request cardinality for a fetch over events in
    * [t1Ns, t2Ns]: per-day event counts from the EventBank's sketch
    * sidecar (kilobytes, no catalog scan on the consistent path) × the
    * inventory's distinct channel count (a one-row count over the tiny
    * station table). An UPPER bound for every reference strategy:
    * origin expands events × channels exactly; p/s expand first-picks
    * × the picked stations' channels, a subset.
    */
  def estimatedRequests(eventBank: graft.bank.EventBank,
                        t1Ns: Long, t2Ns: Long): Long = {
    val nChannels = stations.select(col("seed_id")).distinct().count()
    eventBank.estimatedEventCount(t1Ns, t2Ns) * nChannels
  }

  /** Sketch-estimated index-side cardinality for the same fetch — the
    * WaveBank sidecar's per-day segment counts over the padded event
    * window (kilobytes, no index scan on the consistent path). The
    * symmetric probe to [[estimatedRequests]]: together they let
    * [[fetchEventSegments]] pick which side of the range join
    * broadcasts from DATA instead of a fixed conf.
    */
  def estimatedSegments(waveBank: graft.bank.WaveBank,
                        t1Ns: Long, t2Ns: Long,
                        beforeNs: Long, afterNs: Long): Long =
    waveBank.estimatedSegmentCount(t1Ns - beforeNs, t2Ns + afterNs)
}
