package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Bank/inventory lifecycle surfaces that were spec-only through round 6,
  * converted to hard oracle rows: each query drives a REAL filesystem
  * round trip (SDS export, StationXML files, CSV fallback, incremental
  * index passes, an EventBank by-id read) whose observable facts DuckDB
  * recomputes arithmetically from the same parquet tables. Any drift in
  * layout, normalization, or the mtime-incremental contract breaks the
  * hash.
  */
object LifecycleQueries {

  private val T0 = 1_600_000_000_000_000_000L // ns epoch, µs/BTIME-grid safe

  val all: Seq[Q] = Seq(

    // ---- SDS archive export (§2.1, was spec-only): deterministic
    //      segments derived from `events` go through putWaveforms into a
    //      real WaveBank, exportSds re-chunks into the SeisComP-style
    //      day-partitioned layout (obsplus `utils/waveforms.py:404-472`),
    //      and the scan reads the partition columns back FROM THE
    //      DIRECTORY LAYOUT — if day derivation, partition clustering, or
    //      payload losslessness drift, the hash breaks.
    Q("q91_sds_export", (s, dir) => {
      import graft.bank.WaveBank
      val segs = Tables.events(s, dir)
        .select((col("user_id") % 4).as("sid"),
          (col("event_id") % 48).as("slot"), col("event_id"))
        .groupBy("sid", "slot").agg((min("event_id") % 64).as("v0"))
        .select(lit("XX").as("network"),
          concat(lit("S"), col("sid")).as("station"),
          lit("").as("location"), lit("BHZ").as("channel"),
          (lit(T0) + col("slot") * lit(3_600_000_000_000L)).as("starttime"),
          lit(1_000_000_000L).as("sampling_period"), // 1 Hz
          transform(sequence(lit(0L), col("v0") + lit(9L)),
            i => ((col("v0") + i) % 32).cast("double")).as("samples"))
      val root = Scratch
        .tempDir("graft-q91").toString
      val bank = new WaveBank(s, root)
      bank.putWaveforms(segs)
      val out = s"$root/sds"
      bank.exportSds(out)
      s.read.parquet(out)
        .groupBy("station", "day")
        .agg(count(lit(1)).as("n_segments"),
          sum(size(col("samples")).cast("long")).as("total_samples"),
          sum(aggregate(col("samples"), lit(0.0), (a, x) => a + x))
            .cast("long").as("checksum"),
          min("starttime").as("t0"))
        .select(col("station"), col("day").cast("long").as("day"),
          col("n_segments"), col("total_samples"), col("checksum"), col("t0"))
    }, Some("""
      WITH base AS (
        SELECT user_id % 4 AS sid, event_id % 48 AS slot,
               MIN(event_id) % 64 AS v0
        FROM events GROUP BY 1, 2),
      seg AS (SELECT sid, slot, v0, v0 + 10 AS len,
                     1600000000000000000 + slot * 3600000000000 AS st
              FROM base)
      SELECT 'S' || CAST(sid AS VARCHAR) AS station,
             st // 86400000000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(SUM(len) AS BIGINT) AS total_samples,
             CAST(SUM(list_sum(list_transform(range(len), i -> (v0 + i) % 32)))
               AS BIGINT) AS checksum,
             MIN(st) AS t0
      FROM seg GROUP BY 1, 2""")),

    // ---- station summary from traces + the aggregation-levels map
    //      (§2.4, were spec-only): `Stations.fromTraces` is the
    //      reference's stream→stations derivation (`stations/pd.py:
    //      111-128`: groupby NSLC, min(start)/max(end) → start/end_date),
    //      then the summary is re-aggregated at the named "station"
    //      level via `groupingColumns` (`constants.py:618`).
    Q("q92_station_summary", (s, dir) => {
      import graft.stations.Stations
      val start = lit(T0) + (col("event_id") % 100) * lit(3_600_000_000_000L)
      val traces = Tables.events(s, dir).select(
        concat(lit("N"), col("user_id") % 2).as("network"),
        concat(lit("S"), col("user_id") % 20).as("station"),
        lit("").as("location"),
        when(col("event_id") % 3 === 0, "BHZ")
          .when(col("event_id") % 3 === 1, "BHN")
          .otherwise("BHE").as("channel"),
        start.as("starttime"),
        (start + (col("event_id") % 5 + 1) * lit(600_000_000_000L))
          .as("endtime"))
      val summary = Stations.fromTraces(traces)
      summary.groupBy(Stations.groupingColumns("station").map(col): _*)
        .agg(count(lit(1)).as("n_channels"),
          min("start_date").as("start_date"),
          max("end_date").as("end_date"))
    }, Some("""
      WITH tr AS (
        SELECT 'N' || (user_id % 2) AS network,
               'S' || (user_id % 20) AS station,
               '' AS location,
               CASE WHEN event_id % 3 = 0 THEN 'BHZ'
                    WHEN event_id % 3 = 1 THEN 'BHN'
                    ELSE 'BHE' END AS channel,
               1600000000000000000 + (event_id % 100) * 3600000000000
                 AS starttime,
               1600000000000000000 + (event_id % 100) * 3600000000000
                 + (event_id % 5 + 1) * 600000000000 AS endtime
        FROM events),
      ch AS (SELECT network, station, location, channel,
                    MIN(starttime) AS start_date, MAX(endtime) AS end_date
             FROM tr GROUP BY 1, 2, 3, 4)
      SELECT network, station, CAST(COUNT(*) AS BIGINT) AS n_channels,
             MIN(start_date) AS start_date, MAX(end_date) AS end_date
      FROM ch GROUP BY 1, 2""")),

    // ---- StationXML file scan (§2.1, was spec-only): bounded channel
    //      specs (≤36) derived from `events` are serialized with
    //      `toStationXml`, written one file per network, and scanned back
    //      through the binaryFile `readChannels` path (obsplus
    //      `stations/pd.py:62-76`) — ISO-ns time formatting, station-
    //      level coordinate fill-in, the open-ended-channel null
    //      end_date, and schema conform all ride the hash.
    Q("q93_stationxml_roundtrip", (s, dir) => {
      import graft.sources.StationXml
      val specs = Tables.events(s, dir)
        .select((col("user_id") % 2).as("net"), (col("user_id") % 12).as("sta"),
          (col("event_id") % 3).as("chan"), col("event_id"))
        .groupBy("net", "sta", "chan").agg((min("event_id") % 96).as("v0"))
        .collect() // bounded: ≤ 12 stations × 3 channels = 36 specs
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val rows = specs.map { case (net, sta, chan, v0) =>
        StationXml.ChannelRow(
          network = s"N$net", station = s"S$sta", location = "",
          channel = chan match { case 0 => "BHZ"; case 1 => "BHN"; case _ => "BHE" },
          latitude = Some(sta / 10.0 - 0.5),
          longitude = Some(v0 / 3.0 - 10.0),
          elevation = Some(100.0 + net),
          depth = None, azimuth = None, dip = None,
          sample_rate = Some(((v0 % 4) + 1) * 20.0),
          start_date = Some(T0 + v0 * 1_000_000_000L),
          // chan 2 stays open-ended: no EndDate attr → null end_date
          end_date = if (chan == 2) None
                     else Some(T0 + (v0 + 86400) * 1_000_000_000L))
      }
      val out = Scratch
        .tempDir("graft-q93").toString
      rows.groupBy(_.network).foreach { case (net, chans) =>
        val w = new java.io.FileWriter(new java.io.File(out, s"$net.xml"))
        try w.write(StationXml.toStationXml(chans.toSeq)) finally w.close()
      }
      StationXml.readChannels(s, out)
        .select("network", "station", "location", "channel", "seed_id",
          "latitude", "longitude", "elevation", "sample_rate",
          "start_date", "end_date")
    }, Some("""
      WITH base AS (
        SELECT user_id % 2 AS net, user_id % 12 AS sta, event_id % 3 AS chan,
               MIN(event_id) % 96 AS v0
        FROM events GROUP BY 1, 2, 3),
      ch AS (SELECT net, sta, chan, v0,
               'N' || CAST(net AS VARCHAR) AS network,
               'S' || CAST(sta AS VARCHAR) AS station,
               '' AS location,
               CASE WHEN chan = 0 THEN 'BHZ'
                    WHEN chan = 1 THEN 'BHN'
                    ELSE 'BHE' END AS channel
             FROM base)
      SELECT network, station, location, channel,
             network || '.' || station || '.' || location || '.' || channel
               AS seed_id,
             CAST(sta AS DOUBLE) / 10.0 - 0.5 AS latitude,
             CAST(v0 AS DOUBLE) / 3.0 - 10.0 AS longitude,
             100.0 + CAST(net AS DOUBLE) AS elevation,
             CAST((v0 % 4) + 1 AS DOUBLE) * 20.0 AS sample_rate,
             1600000000000000000 + v0 * 1000000000 AS start_date,
             CASE WHEN chan = 2 THEN NULL
                  ELSE 1600000000000000000 + (v0 + 86400) * 1000000000 END
               AS end_date
      FROM ch""")),

    // ---- CSV fallback scan + schema conform (§2.1, was spec-only): the
    //      reference's "every to-df entry point falls back to read_csv"
    //      contract (obsplus `events/pd.py:269-276`) — a real CSV write,
    //      the `readAny` CSV branch back, then `conformTo` against a
    //      WIDER schema (missing column → typed null, declared order).
    Q("q94_csv_fallback", (s, dir) => {
      import graft.core.Schemas
      import org.apache.spark.sql.types._
      val out = Scratch
        .tempDir("graft-q94").toString + "/events.csv"
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .coalesce(1)
        .write.option("header", "true").mode("overwrite").csv(out)
      val onDisk = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      Schemas.conformTo(Tables.readAny(s, out, onDisk),
        StructType(onDisk.fields.toSeq :+ StructField("score", DoubleType)))
    }, Some("""
      SELECT event_id, user_id, event_type, value,
             CAST(NULL AS DOUBLE) AS score
      FROM events""")),

    // ---- gap-group coalescing (§2.5, was spec-only): overlapping
    //      deterministic intervals merge into their union via
    //      `coalesceIntervals` (obsplus `utils/waveforms.py:341-359`);
    //      DuckDB replays the islands with the same running-max /
    //      flag-cumsum windows.
    Q("q95_gap_coalesce", (s, dir) => {
      import graft.operators.Intervals
      val start = lit(T0) + (col("event_id") % 150) * lit(60_000_000_000L)
      val iv = Tables.events(s, dir).select(
        (col("user_id") % 50).as("key"),
        start.as("starttime"),
        (start + (col("event_id") % 7 + 1) * lit(12_000_000_000L))
          .as("endtime"))
      Intervals.coalesceIntervals(iv, Seq("key"), tol = 5_000_000_000L)
    }, Some("""
      WITH iv AS (
        SELECT user_id % 50 AS key,
               1600000000000000000 + (event_id % 150) * 60000000000 AS s,
               1600000000000000000 + (event_id % 150) * 60000000000
                 + (event_id % 7 + 1) * 12000000000 AS e
        FROM events),
      o AS (SELECT key, s, e,
              MAX(e) OVER (PARTITION BY key ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
            FROM iv),
      f AS (SELECT key, s, e,
              CASE WHEN prev_max IS NULL OR prev_max + 5000000000 < s
                   THEN 1 ELSE 0 END AS flag FROM o),
      g AS (SELECT key, s, e,
              SUM(flag) OVER (PARTITION BY key ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
            FROM f)
      SELECT key, MIN(s) AS starttime, MAX(e) AS endtime
      FROM g GROUP BY key, grp""")),

    // ---- eventid filter through a real bank (§2.2, was spec-only): a
    //      synthesized catalog goes through putEvents, then getEvents
    //      with an explicit id list (obsplus `get_events(eventid=...)`,
    //      `utils/pd.py:304-312`) — ids that do not exist in the bank
    //      match nothing on either side.
    Q("q96_eventid_filter", (s, dir) => {
      import graft.bank.{EventBank, EventQuery}
      val cat = Tables.eventsUs(s, dir).select(
        concat(lit("smi:local/event/"), col("event_id")).as("event_id"),
        col("ts").as("time"),
        (pmod(col("event_id"), lit(160)).cast("double") - 80.0).as("latitude"),
        (pmod(col("event_id") * 3L, lit(360)).cast("double") - 180.0)
          .as("longitude"),
        lit(5000.0).as("depth"),
        (pmod(col("event_id"), lit(50)).cast("double") / 10.0).as("magnitude"),
        lit(1000L).as("updated"))
      val root = Scratch
        .tempDir("graft-q96").toString
      val bank = new EventBank(s, root)
      bank.putEvents(cat)
      val ids = (0 until 40).map(k => s"smi:local/event/${97 * k + 13}")
      bank.getEvents(EventQuery(eventIds = Some(ids)))
        .select("event_id", "time", "latitude", "longitude", "depth",
          "magnitude", "updated")
    }, Some("""
      SELECT 'smi:local/event/' || event_id AS event_id,
             epoch_ns(ts) AS time,
             CAST(event_id % 160 AS DOUBLE) - CAST(80 AS DOUBLE) AS latitude,
             CAST((event_id * 3) % 360 AS DOUBLE) - CAST(180 AS DOUBLE)
               AS longitude,
             CAST(5000 AS DOUBLE) AS depth,
             CAST(event_id % 50 AS DOUBLE) / CAST(10 AS DOUBLE) AS magnitude,
             CAST(1000 AS BIGINT) AS updated
      FROM events
      WHERE event_id % 97 = 13 AND event_id <= 3796""")),

    // ---- mtime-incremental discovery + index write (§2.1/§2.4, were
    //      spec-only): two putWaveforms batches (each triggers an
    //      incremental index pass — the second must index ONLY the new
    //      files) plus a third explicit updateIndex that must append
    //      NOTHING; count(*) per station makes both re-indexing (rows
    //      double) and missed files (rows short) break the hash. The
    //      mtime watermark contract is obsplus `_unindexed_iterator`
    //      (`bank/core.py:193-210`).
    Q("q97_incremental_index", (s, dir) => {
      import graft.bank.WaveBank
      val segs = Tables.events(s, dir)
        .select((col("user_id") % 4).as("sid"),
          (col("event_id") % 60).as("slot"), col("event_id"))
        .groupBy("sid", "slot").agg((min("event_id") % 20).as("v0"))
        .select(lit("XX").as("network"),
          concat(lit("S"), col("sid")).as("station"),
          lit("").as("location"), lit("BHZ").as("channel"),
          (lit(T0) + col("slot") * lit(3_600_000_000_000L)).as("starttime"),
          lit(1_000_000_000L).as("sampling_period"),
          transform(sequence(lit(0L), col("v0") + lit(4L)),
            i => i.cast("double")).as("samples"))
      val root = Scratch
        .tempDir("graft-q97").toString
      val bank = new WaveBank(s, root)
      val split = T0 + 30L * 3_600_000_000_000L
      bank.putWaveforms(segs.filter(col("starttime") < lit(split)))
      bank.putWaveforms(segs.filter(col("starttime") >= lit(split)))
      bank.updateIndex() // third pass: no new files — must be a no-op
      bank.readIndex()
        .groupBy("station")
        .agg(count(lit(1)).as("n_rows"),
          min("starttime").as("t0"), max("endtime").as("t_end"),
          sum(col("endtime") - col("starttime")).as("total_ns"))
    }, Some("""
      WITH base AS (
        SELECT user_id % 4 AS sid, event_id % 60 AS slot,
               MIN(event_id) % 20 AS v0
        FROM events GROUP BY 1, 2),
      seg AS (SELECT sid, slot, v0 + 5 AS n,
                     1600000000000000000 + slot * 3600000000000 AS st
              FROM base)
      SELECT 'S' || CAST(sid AS VARCHAR) AS station,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(st) AS t0,
             MAX(st + n * 1000000000) AS t_end,
             CAST(SUM(n * 1000000000) AS BIGINT) AS total_ns
      FROM seg GROUP BY 1""")),

    // ---- spatial duplicate-id guard (§2.3, was spec-only): the
    //      reference errors when one station/event id carries different
    //      coordinates (`utils/geodetics.py:115-131`);
    //      `Geo.duplicateCoordIds` returns the offending ids. Ids
    //      < 40 are planted with two distinct coordinate pairs
    //      (varying by event_id div 200, which is independent of the
    //      id class), the rest with exactly one.
    Q("q98_coord_guard", (s, dir) => {
      import graft.functions.Geo
      val k = col("event_id") % 200
      val pts = Tables.events(s, dir).select(
        concat(lit("STA"), k).as("sta_id"),
        when(k < 40 && expr("event_id div 200") % 2 === 0,
          k.cast("double")).otherwise(k.cast("double") + 0.5).as("latitude"),
        (k * 2).cast("double").as("longitude"))
      Geo.duplicateCoordIds(pts, "sta_id", "latitude", "longitude")
    }, Some("""
      WITH pts AS (
        SELECT 'STA' || (event_id % 200) AS sta_id,
               CASE WHEN event_id % 200 < 40 AND (event_id // 200) % 2 = 0
                    THEN CAST(event_id % 200 AS DOUBLE)
                    ELSE CAST(event_id % 200 AS DOUBLE) + 0.5 END AS latitude,
               CAST((event_id % 200) * 2 AS DOUBLE) AS longitude
        FROM events)
      SELECT sta_id,
             CAST(COUNT(DISTINCT (latitude, longitude)) AS BIGINT) AS n_coords
      FROM pts GROUP BY sta_id
      HAVING COUNT(DISTINCT (latitude, longitude)) > 1""")),

    // ---- containment-cache hit + multi-writer staleness (§2.9, was
    //      spec-only): a wide readIndex fills a persisted cache entry;
    //      a contained narrower query must HIT it (phase 'hit',
    //      materialized eagerly before any further write); then a
    //      SECOND WaveBank instance appends overlapping segments and
    //      the SAME wide query re-runs on the first instance — the
    //      store-stamp guard must evict the stale snapshot and return
    //      the appended rows (phase 'refresh') with no manual
    //      clearIndexCache. A stale hit is missing rows; a broken
    //      containment re-filter is extra rows — either breaks the hash.
    Q("q99_cached_index_read", (s, dir) => {
      import graft.bank.WaveBank
      val segs = Tables.events(s, dir)
        .select((col("user_id") % 4).as("sid"),
          (col("event_id") % 48).as("slot"), col("event_id"))
        .groupBy("sid", "slot").agg((min("event_id") % 20).as("v0"))
        .select(lit("XX").as("network"),
          concat(lit("S"), col("sid")).as("station"),
          lit("").as("location"), lit("BHZ").as("channel"),
          (lit(T0) + col("slot") * lit(3_600_000_000_000L)).as("starttime"),
          lit(1_000_000_000L).as("sampling_period"),
          transform(sequence(lit(0L), col("v0") + lit(4L)),
            i => i.cast("double")).as("samples"))
      val root = Scratch
        .tempDir("graft-q99").toString
      val bank = new WaveBank(s, root, indexCacheSize = 2)
      bank.putWaveforms(segs)
      val h = 3_600_000_000_000L
      // fill: wide S1 window, materialized into the persisted entry
      bank.readIndex(station = "S1",
        starttime = Some(T0), endtime = Some(T0 + 48 * h)).count()
      // contained hit — eager: a later eviction must not recompute this
      val hit = bank.readIndex(station = "S1",
          starttime = Some(T0 + 5 * h), endtime = Some(T0 + 20 * h))
        .select(lit("hit").as("phase"), col("station"),
          col("starttime"), col("endtime"))
        .localCheckpoint(true)
      // second WRITER instance appends S1 segments inside the window
      import s.implicits._
      val extra = s.range(10).toDF("slot").select(
        lit("XX").as("network"), lit("S1").as("station"),
        lit("").as("location"), lit("BHZ").as("channel"),
        (lit(T0) + col("slot") * lit(h) + lit(1_800_000_000_000L))
          .as("starttime"),
        lit(1_000_000_000L).as("sampling_period"),
        transform(sequence(lit(0L), col("slot") + lit(2L)),
          i => i.cast("double")).as("samples"))
      new WaveBank(s, root).putWaveforms(extra)
      // same wide query, same instance: stamp guard evicts, fresh read
      val refresh = bank.readIndex(station = "S1",
          starttime = Some(T0), endtime = Some(T0 + 48 * h))
        .select(lit("refresh").as("phase"), col("station"),
          col("starttime"), col("endtime"))
        .localCheckpoint(true)
      // don't leak persisted cache entries into the shared session —
      // both outputs are materialized eagerly above, so unpersisting
      // here cannot change them
      bank.clearIndexCache()
      hit.unionByName(refresh)
    }, Some("""
      WITH base AS (
        SELECT user_id % 4 AS sid, event_id % 48 AS slot,
               MIN(event_id) % 20 AS v0
        FROM events GROUP BY 1, 2),
      s1 AS (SELECT slot, 1600000000000000000 + slot * 3600000000000 AS st,
                    1600000000000000000 + slot * 3600000000000
                      + (v0 + 5) * 1000000000 AS et
             FROM base WHERE sid = 1),
      extra AS (SELECT range AS i,
                       1600000000000000000 + range * 3600000000000
                         + 1800000000000 AS st,
                       1600000000000000000 + range * 3600000000000
                         + 1800000000000 + (range + 3) * 1000000000 AS et
                FROM range(10))
      SELECT 'hit' AS phase, 'S1' AS station, st AS starttime, et AS endtime
      FROM s1
      WHERE et >= 1600000000000000000 + 5 * 3600000000000 - 1000000000
        AND st <= 1600000000000000000 + 20 * 3600000000000 + 1000000000
      UNION ALL
      SELECT 'refresh' AS phase, 'S1' AS station, st, et FROM s1
      UNION ALL
      SELECT 'refresh' AS phase, 'S1' AS station, st, et FROM extra""")),

    // ---- compaction under a live reader (round 8, was spec-only): two
    //      append batches leave the index as overlapping filesets; a
    //      reader plan is RESOLVED before compactIndex runs, then
    //      collected after it — the generation pointer swap must keep
    //      that reader on a complete grace copy while fresh reads see
    //      the re-clustered store. Both phases must equal the same
    //      arithmetic; a compact that loses rows, double-counts, or
    //      leaves the in-flight reader on a deleted dir breaks the hash.
    Q("q108_compact_under_read", (s, dir) => {
      import graft.bank.WaveBank
      val segs = Tables.events(s, dir)
        .select((col("user_id") % 4).as("sid"),
          (col("event_id") % 60).as("slot"), col("event_id"))
        .groupBy("sid", "slot").agg((min("event_id") % 20).as("v0"))
        .select(lit("XX").as("network"),
          concat(lit("S"), col("sid")).as("station"),
          lit("").as("location"), lit("BHZ").as("channel"),
          (lit(T0) + col("slot") * lit(3_600_000_000_000L)).as("starttime"),
          lit(1_000_000_000L).as("sampling_period"),
          transform(sequence(lit(0L), col("v0") + lit(4L)),
            i => i.cast("double")).as("samples"))
      val root = Scratch
        .tempDir("graft-q108").toString
      val bank = new WaveBank(s, root)
      val split = T0 + 30L * 3_600_000_000_000L
      bank.putWaveforms(segs.filter(col("starttime") < lit(split)))
      bank.putWaveforms(segs.filter(col("starttime") >= lit(split)))
      val inFlight = bank.readIndex() // resolved BEFORE the compact
      bank.compactIndex()
      def phase(df: DataFrame, name: String): DataFrame =
        df.groupBy("station")
          .agg(count(lit(1)).as("n_rows"),
            min("starttime").as("t0"), max("endtime").as("t_end"),
            sum(col("endtime") - col("starttime")).as("total_ns"))
          .withColumn("phase", lit(name))
          .select("phase", "station", "n_rows", "t0", "t_end", "total_ns")
      phase(inFlight, "inflight").unionByName(phase(bank.readIndex(), "after"))
    }, Some("""
      WITH base AS (
        SELECT user_id % 4 AS sid, event_id % 60 AS slot,
               MIN(event_id) % 20 AS v0
        FROM events GROUP BY 1, 2),
      seg AS (SELECT sid, slot, v0 + 5 AS n,
                     1600000000000000000 + slot * 3600000000000 AS st
              FROM base),
      agg AS (SELECT 'S' || CAST(sid AS VARCHAR) AS station,
                     CAST(COUNT(*) AS BIGINT) AS n_rows,
                     MIN(st) AS t0,
                     MAX(st + n * 1000000000) AS t_end,
                     CAST(SUM(n * 1000000000) AS BIGINT) AS total_ns
              FROM seg GROUP BY 1)
      SELECT p.phase, agg.* FROM agg
      CROSS JOIN (SELECT 'inflight' AS phase UNION ALL SELECT 'after') p""")),

    // ---- in-place modified-file re-indexing (round 8, was spec-only):
    //      real gsg record files written driver-side (bounded fixture,
    //      60 files), indexed, then a third of them REWRITTEN in place
    //      with more samples and a newer mtime — the acquisition-tool
    //      append pattern. The reference's mtime contract re-indexes
    //      modified files (`bank/core.py:193-210`); the (path, mtime)
    //      dedup must REPLACE their rows (not keep the stale ones, not
    //      duplicate), and untouched files must not re-index. The
    //      per-station totals reflect the post-rewrite sample counts
    //      exactly or the hash breaks.
    Q("q109_modified_file_reindex", (s, dir) => {
      import graft.bank.WaveBank
      import graft.sources.BinarySegmentSource.{Segment, writeFile}
      // bounded driver collect: 2×30 = 60 derivation rows, each one
      // fixture file — the q90/q93 bounded-record-builder pattern
      val specs = Tables.events(s, dir)
        .select((col("user_id") % 2).as("sid"),
          (col("event_id") % 30).as("slot"), col("event_id"))
        .groupBy("sid", "slot").agg((min("event_id") % 20).as("v0"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val root = Scratch
        .tempDir("graft-q109").toString
      val segDir = java.nio.file.Paths.get(s"$root/segments")
      java.nio.file.Files.createDirectories(segDir)
      def write(sid: Long, slot: Long, n: Long): java.nio.file.Path = {
        val p = segDir.resolve(f"f_${sid}_$slot%02d.gsg")
        writeFile(p, Segment("XX", s"S$sid", "", "BHZ",
          T0 + slot * 3_600_000_000_000L, 1_000_000_000L,
          Array.fill(n.toInt)(1.0), ""))
        p
      }
      specs.foreach { case (sid, slot, v0) => write(sid, slot, v0 + 5) }
      val bank = new WaveBank(s, root, segmentFormat = "gsg")
      bank.updateIndex()
      // the tool rewrites slots < 10 in place: same path, +7 samples,
      // newer mtime
      specs.filter(_._2 < 10).foreach { case (sid, slot, v0) =>
        val p = write(sid, slot, v0 + 12)
        require(p.toFile.setLastModified(System.currentTimeMillis() + 5000))
      }
      bank.updateIndex()
      bank.readIndex().groupBy("station")
        .agg(count(lit(1)).as("n_rows"),
          max("endtime").as("t_end"),
          sum(col("endtime") - col("starttime")).as("total_ns"))
    }, Some("""
      WITH base AS (
        SELECT user_id % 2 AS sid, event_id % 30 AS slot,
               MIN(event_id) % 20 AS v0
        FROM events GROUP BY 1, 2),
      seg AS (SELECT sid, slot,
                     v0 + 5 + CASE WHEN slot < 10 THEN 7 ELSE 0 END AS n
              FROM base)
      SELECT 'S' || CAST(sid AS VARCHAR) AS station,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MAX(1600000000000000000 + slot * 3600000000000
                 + n * 1000000000) AS t_end,
             CAST(SUM(n * 1000000000) AS BIGINT) AS total_ns
      FROM seg GROUP BY 1"""))
  )
}
