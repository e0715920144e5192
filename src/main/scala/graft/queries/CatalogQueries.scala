package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{EventOps, Tables}
import graft.operators.{CatalogValidation, Validation}

/** `validate_catalog` end-to-end (obsplus `events/validate.py:284`,
  * rules :64-281): a synthetic pick/arrival/amplitude/origin catalog is
  * derived deterministically from the events table — with planted
  * violations for every rule class (dangling arrival pick ids, null
  * pick fields, duplicate phase picks, S-before-P, amp-before-P,
  * median-P outliers, over-limit amplitudes, unknown filter ids,
  * Z-channel amplitude picks, amplitude/pick time mismatches,
  * non-finite origin floats) — and the full rule report is
  * hash-checked against a DuckDB replay.
  */
object CatalogQueries {

  /** Deterministic catalog synthesis: ~40 picks per catalog event
    * (event_id % 250), arrivals for even ids, amplitudes for the
    * AML/IAML picks, one origin per catalog event. Planted-violation
    * residues are prime moduli so classes overlap freely.
    */
  private def synthCatalog(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val e = Tables.eventsUs(s, dir)
    val eid = col("event_id")
    val cid = concat(lit("smi:local/event/"), (eid % 250).cast("string"))
    val status = when(eid % 13 === 0, "rejected").otherwise("")

    val picks = e.select(
      concat(lit("smi:local/pick/"), eid.cast("string")).as("resource_id"),
      cid.as("event_id"),
      when(eid % 991 === 0, lit(null: String))
        .otherwise(concat(lit("N"), (col("user_id") % 2).cast("string")))
        .as("network"),
      concat(lit("ST"), (col("user_id") % 5).cast("string")).as("station"),
      lit("").as("location"),
      when(eid % 3 === 0, "HHZ").when(eid % 3 === 1, "HHN").otherwise("HHE")
        .as("channel"),
      when(eid % 997 === 0, lit(null: String))
        .when(eid % 5 === 0, "P").when(eid % 5 === 1, "S")
        .when(eid % 5 === 2, "AML").when(eid % 5 === 3, "IAML")
        .otherwise("Pg").as("phase_hint"),
      status.as("evaluation_status"),
      col("ts").as("time"))

    val arrivals = e.filter(eid % 2 === 0).select(
      concat(lit("smi:local/arr/"), eid.cast("string")).as("resource_id"),
      cid.as("event_id"),
      when(eid % 17 === 0,
          concat(lit("smi:local/pick/none/"), eid.cast("string")))
        .otherwise(concat(lit("smi:local/pick/"), eid.cast("string")))
        .as("pick_id"))

    val amplitudes = e.filter(eid % 5 === 2 || eid % 5 === 3).select(
      concat(lit("smi:local/amp/"), eid.cast("string")).as("resource_id"),
      cid.as("event_id"),
      when(eid % 41 === 0, lit("smi:local/pick/missing"))
        .otherwise(concat(lit("smi:local/pick/"), eid.cast("string")))
        .as("pick_id"),
      col("value").as("generic_amplitude"),
      when(eid % 4 === 3, lit("smi:local/filter/bad"))
        .otherwise(concat(lit("smi:local/filter/"), (eid % 3).cast("string")))
        .as("filter_id"),
      when(eid % 19 === 0, col("ts") + 1000000L).otherwise(col("ts"))
        .as("reference"),
      when(eid % 23 === 0, lit(null: java.lang.Double)).otherwise(lit(0.5))
        .as("time_begin"),
      when(eid % 23 === 0, lit(null: java.lang.Double)).otherwise(lit(1.0))
        .as("time_end"),
      status.as("evaluation_status"))

    val origins = e.filter(eid < 250).select(
      concat(lit("smi:local/origin/"), eid.cast("string")).as("resource_id"),
      cid.as("event_id"),
      when(eid % 37 === 0, lit(Double.NaN))
        .otherwise(col("user_id") / 10.0 - 50.0).as("latitude"),
      (col("value") * 3.0 - 150.0).as("longitude"),
      (col("value") * 100.0).as("depth"))

    (picks, arrivals, amplitudes, origins)
  }

  private val allowedFilters =
    Seq("smi:local/filter/0", "smi:local/filter/1", "smi:local/filter/2")

  /** The pick-table synthesis, shared by the q70 and q72 oracles. */
  private val picksCteSql = """
        SELECT 'smi:local/pick/' || event_id AS resource_id,
               'smi:local/event/' || (event_id % 250) AS event_id,
               CASE WHEN event_id % 991 = 0 THEN NULL
                    ELSE 'N' || (user_id % 2) END AS network,
               'ST' || (user_id % 5) AS station,
               '' AS location,
               CASE event_id % 3 WHEN 0 THEN 'HHZ' WHEN 1 THEN 'HHN'
                    ELSE 'HHE' END AS channel,
               CASE WHEN event_id % 997 = 0 THEN NULL
                    ELSE CASE event_id % 5 WHEN 0 THEN 'P' WHEN 1 THEN 'S'
                         WHEN 2 THEN 'AML' WHEN 3 THEN 'IAML'
                         ELSE 'Pg' END END AS phase_hint,
               CASE WHEN event_id % 13 = 0 THEN 'rejected' ELSE '' END
                 AS evaluation_status,
               epoch_ns(ts) AS time
        FROM events"""

  val all: Seq[Q] = Seq(

    Q("q70_catalog_validation", (s, dir) => {
      val (picks, arrivals, amplitudes, origins) = synthCatalog(s, dir)
      Validation.report(CatalogValidation.rules(
        picks, arrivals, amplitudes, origins,
        pLimUs = Some(259200000000L), // 3 days
        ampLim = Some(150.0),
        filterIds = allowedFilters,
        noZAmps = true))
    }, Some(s"""
      WITH picks AS ($picksCteSql),
      arrivals AS (
        SELECT 'smi:local/arr/' || event_id AS resource_id,
               'smi:local/event/' || (event_id % 250) AS event_id,
               CASE WHEN event_id % 17 = 0
                    THEN 'smi:local/pick/none/' || event_id
                    ELSE 'smi:local/pick/' || event_id END AS pick_id
        FROM events WHERE event_id % 2 = 0),
      amplitudes AS (
        SELECT 'smi:local/amp/' || event_id AS resource_id,
               'smi:local/event/' || (event_id % 250) AS event_id,
               CASE WHEN event_id % 41 = 0 THEN 'smi:local/pick/missing'
                    ELSE 'smi:local/pick/' || event_id END AS pick_id,
               value AS generic_amplitude,
               CASE WHEN event_id % 4 = 3 THEN 'smi:local/filter/bad'
                    ELSE 'smi:local/filter/' || (event_id % 3) END AS filter_id,
               CASE WHEN event_id % 19 = 0 THEN epoch_ns(ts) + 1000000
                    ELSE epoch_ns(ts) END AS reference,
               CASE WHEN event_id % 23 = 0 THEN NULL ELSE 0.5 END AS time_begin,
               CASE WHEN event_id % 23 = 0 THEN NULL ELSE 1.0 END AS time_end,
               CASE WHEN event_id % 13 = 0 THEN 'rejected' ELSE '' END
                 AS evaluation_status
        FROM events WHERE event_id % 5 IN (2, 3)),
      origins AS (
        SELECT 'smi:local/origin/' || event_id AS resource_id,
               'smi:local/event/' || (event_id % 250) AS event_id,
               CASE WHEN event_id % 37 = 0 THEN 'NaN'::DOUBLE
                    ELSE user_id / 10.0 - 50.0 END AS latitude,
               value * 3.0 - 150.0 AS longitude,
               value * 100.0 AS depth
        FROM events WHERE event_id < 250),
      active_picks AS (
        SELECT * FROM picks
        WHERE COALESCE(evaluation_status, '') <> 'rejected'),
      active_amps AS (
        SELECT * FROM amplitudes
        WHERE COALESCE(evaluation_status, '') <> 'rejected'),
      pt AS (SELECT event_id, network, station, location,
                    MIN(time) AS p_time
             FROM active_picks WHERE UPPER(phase_hint) = 'P'
             GROUP BY event_id, network, station, location),
      st AS (SELECT event_id, network, station, location,
                    MIN(time) AS s_time
             FROM active_picks WHERE UPPER(phase_hint) = 'S'
             GROUP BY event_id, network, station, location),
      pp AS (SELECT resource_id, event_id, time // 1000 AS t_us
             FROM active_picks WHERE phase_hint = 'P'),
      med AS (SELECT event_id, quantile_cont(t_us, 0.5) AS med_us
              FROM pp GROUP BY event_id)
      SELECT entity_id, rule FROM (
        SELECT a.resource_id AS entity_id,
               'check_arrivals_pick_id' AS rule
        FROM arrivals a
        WHERE NOT EXISTS (SELECT 1 FROM picks p
          WHERE p.event_id = a.event_id AND p.resource_id = a.pick_id)
        UNION ALL
        SELECT resource_id, 'check_pick_required_fields' FROM picks
        WHERE network IS NULL OR station IS NULL
           OR channel IS NULL OR phase_hint IS NULL
        UNION ALL
        SELECT resource_id, 'check_duplicate_picks' FROM (
          SELECT resource_id, row_number() OVER (
            PARTITION BY event_id, phase_hint, network, station, location
            ORDER BY time ASC, resource_id ASC) AS rn
          FROM active_picks WHERE phase_hint IN ('P', 'p', 'S', 's'))
        WHERE rn > 1
        UNION ALL
        SELECT concat_ws('|', pt.event_id,
                 concat_ws('.', pt.network, pt.station, pt.location)),
               'check_s_before_p'
        FROM pt JOIN st ON pt.event_id = st.event_id
          AND pt.network = st.network AND pt.station = st.station
          AND pt.location = st.location
        WHERE st.s_time < pt.p_time
        UNION ALL
        SELECT k.resource_id, 'check_amp_before_p'
        FROM active_picks k JOIN pt ON k.event_id = pt.event_id
          AND k.network = pt.network AND k.station = pt.station
          AND k.location = pt.location
        WHERE k.phase_hint LIKE '%AML' AND k.time < pt.p_time
        UNION ALL
        SELECT pp.resource_id, 'check_p_lims'
        FROM pp JOIN med USING (event_id)
        WHERE ABS(CAST(t_us AS DOUBLE) - med_us) > 259200000000.0
        UNION ALL
        SELECT resource_id, 'check_amp_lims' FROM amplitudes
        WHERE generic_amplitude > 150.0
        UNION ALL
        SELECT resource_id, 'check_amp_filter_ids' FROM amplitudes
        WHERE COALESCE(filter_id, '') NOT IN
          ('smi:local/filter/0', 'smi:local/filter/1', 'smi:local/filter/2')
        UNION ALL
        SELECT resource_id, 'check_amps_on_z' FROM active_picks
        WHERE phase_hint IN ('AML', 'IAML') AND channel LIKE '%Z'
        UNION ALL
        SELECT a.resource_id, 'check_amp_times_contain_pick_time'
        FROM active_amps a LEFT JOIN picks p
          ON p.event_id = a.event_id AND p.resource_id = a.pick_id
        WHERE (a.time_begin IS NOT NULL OR a.time_end IS NOT NULL)
          AND (a.reference IS NULL OR p.time IS NULL
               OR a.reference <> p.time)
        UNION ALL
        SELECT resource_id, 'check_origin_floats' FROM origins
        WHERE isnan(latitude) OR isinf(latitude)
           OR isnan(longitude) OR isinf(longitude)
           OR isnan(depth) OR isinf(depth))""")),

    // ---- duplicate/prune/strip (obsplus utils/events.py:36,74,152)
    //      driver-certified: one synthetic tree per events row (statuses
    //      by prime residues), per-event surviving-object counts after
    //      prune and strip plus duplication rebind checks; the oracle
    //      recomputes every count from the residue arithmetic.
    Q("q71_event_ops", (s, dir) => {
      import s.implicits._
      import EventOps._
      val trees = Tables.eventsUs(s, dir)
        .select("event_id", "ts").as[(Long, Long)]
        .map { case (id, ts) =>
          def st(m: Long): Option[String] =
            if (id % m == 0) Some("rejected") else Some("")
          FullEvent(
            event_id = s"ev/$id",
            preferred_origin_id = Some(s"or/$id"),
            preferred_magnitude_id = None,
            event_descriptions = Seq("d1", "d2"),
            picks = Seq(
              Pick(s"p1/$id", ts, "N.S..HHZ", "P", st(3)),
              Pick(s"p2/$id", ts + 1000, "N.S..HHN", "S", Some(""))),
            origins = Seq(Origin(s"or/$id", ts, 1.0, 2.0, 3.0, st(5),
              Seq(Arrival(s"ar/$id",
                if (id % 4 == 0) s"p1/$id" else s"p2/$id", "P")))),
            magnitudes = Seq(Magnitude(s"mg/$id", 1.0, "ML", s"or/$id", st(7))),
            amplitudes = Seq(
              Amplitude(s"a1/$id", 1.0, s"p2/$id", "f", Some("")),
              Amplitude(s"a2/$id", 2.0, s"p1/$id", "f", st(11))))
        }
      trees.map { e =>
        val d = duplicateOne(e)
        val p = pruneOne(e)
        val st = stripOne(e)
        val dupOk =
          d.magnitudes.head.origin_id == d.origins.head.resource_id &&
            d.amplitudes.head.pick_id == d.picks(1).resource_id &&
            d.origins.head.arrivals.head.pick_id.endsWith("/dup") &&
            d.preferred_origin_id.contains(d.origins.head.resource_id) &&
            // external id untouched
            d.amplitudes.head.filter_id == "f"
        (e.event_id, p.picks.size.toLong, p.origins.size.toLong,
          p.magnitudes.size.toLong, p.amplitudes.size.toLong,
          st.picks.size.toLong, st.amplitudes.size.toLong,
          st.event_descriptions.size.toLong,
          d.event_id, if (dupOk) 1L else 0L)
      }.toDF("event_id", "pruned_picks", "pruned_origins", "pruned_mags",
        "pruned_amps", "strip_picks", "strip_amps", "strip_desc",
        "dup_event_id", "dup_ok")
    }, Some("""
      SELECT 'ev/' || event_id AS event_id,
             -- p1 pruned iff rejected (id%3=0) and EVERY status-object
             -- referencing it is rejected too: itself, a2 (rejected iff
             -- id%11=0), and the origin when its arrival points at p1
             -- (id%4=0; origin rejected iff id%5=0)
             CAST(2 - CASE WHEN event_id % 3 = 0 AND event_id % 11 = 0
                       AND (event_id % 4 <> 0 OR event_id % 5 = 0)
                      THEN 1 ELSE 0 END AS BIGINT) AS pruned_picks,
             -- origin pruned iff rejected (id%5=0) and its magnitude
             -- referrer is rejected too (id%7=0)
             CAST(1 - CASE WHEN event_id % 5 = 0 AND event_id % 7 = 0
                      THEN 1 ELSE 0 END AS BIGINT) AS pruned_origins,
             -- magnitude: nothing references it -> pruned iff rejected
             CAST(1 - CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS pruned_mags,
             -- a2: unreferenced -> pruned iff rejected (id%11=0)
             CAST(2 - CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS pruned_amps,
             -- strip: rejected picks go (p1 iff id%3=0)
             CAST(2 - CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS strip_picks,
             -- a1 survives always; a2 survives iff neither itself nor
             -- its pick p1 is rejected
             CAST(1 + CASE WHEN event_id % 11 <> 0 AND event_id % 3 <> 0
                      THEN 1 ELSE 0 END AS BIGINT) AS strip_amps,
             CAST(1 AS BIGINT) AS strip_desc,
             'ev/' || event_id || '/dup' AS dup_event_id,
             CAST(1 AS BIGINT) AS dup_ok
      FROM events""")),

    // ---- make_origins (obsplus utils/events.py:258-318): every
    //      origin-less catalog event gets a starting origin at its
    //      earliest acceptable P pick, located by an inventory join —
    //      one window + one broadcast join for the whole catalog
    Q("q72_make_origins", (s, dir) => {
      val (picks, _, _, _) = synthCatalog(s, dir)
      val channels = picks.filter(col("network").isNotNull)
        .select("network", "station", "location", "channel").distinct()
        .withColumn("latitude",
          expr("CAST(substring(station, 3) AS INT)") * 3.5 - 10.0)
        .withColumn("longitude",
          expr("CAST(substring(network, 2) AS INT)") * 7.25 + 100.0)
      val originless = picks.select("event_id").distinct()
      graft.operators.Origins.makeOrigins(originless, picks, channels)
    }, Some(s"""
      WITH picks AS ($picksCteSql),
      ok AS (
        SELECT * FROM picks
        WHERE COALESCE(evaluation_status, '') <> 'rejected'
          AND phase_hint IN ('P', 'p')),
      fp AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY event_id
                      ORDER BY time ASC, resource_id ASC) AS rn
          FROM ok)
        WHERE rn = 1),
      chans AS (
        SELECT DISTINCT network, station, location, channel,
               CAST(CAST(substr(station, 3) AS INT) * 3.5 - 10.0 AS DOUBLE)
                 AS latitude,
               CAST(CAST(substr(network, 2) AS INT) * 7.25 + 100.0 AS DOUBLE)
                 AS longitude
        FROM picks WHERE network IS NOT NULL)
      SELECT f.event_id, f.time, c.latitude, c.longitude,
             CAST(1.0 AS DOUBLE) AS depth, CAST(1 AS BIGINT) AS time_fixed
      FROM fp f JOIN chans c USING (network, station, location, channel)""")),

    // ---- the STREAMING S-before-P rule replayed over the same
    //      synthetic catalog and reduced to its final verdict set: the
    //      changelog alternates violated=true/false per entity starting
    //      at true, so the latest verdict is "violated" iff the change
    //      count is odd. Hash-matching the batch oracle proves the
    //      incremental flatMapGroupsWithState stream converges to
    //      exactly the batch rule — q66's cross-engine contract, for
    //      stateful per-key validation instead of windowed aggregation.
    Q("q77_stream_s_before_p", (s, dir) => {
      import s.implicits._
      val changes = graft.streaming.StreamingValidation.sBeforeP(
        replay(s, streamPicks(s, dir))
          .as[graft.streaming.StreamingValidation.PickEvent])
      drainChangelog(s, changes.toDF(), "check_s_before_p")
    }, Some(s"""
      WITH picks AS ($streamPicksCteSql),
      active_picks AS (
        SELECT * FROM picks
        WHERE COALESCE(evaluation_status, '') <> 'rejected'),
      pt AS (SELECT event_id, network, station, location,
                    MIN(time) AS p_time
             FROM active_picks WHERE UPPER(phase_hint) = 'P'
             GROUP BY event_id, network, station, location),
      st AS (SELECT event_id, network, station, location,
                    MIN(time) AS s_time
             FROM active_picks WHERE UPPER(phase_hint) = 'S'
             GROUP BY event_id, network, station, location)
      SELECT concat_ws('|', pt.event_id,
               concat_ws('.', pt.network, pt.station, pt.location))
               AS entity_id,
             'check_s_before_p' AS rule
      FROM pt JOIN st ON pt.event_id = st.event_id
        AND pt.network = st.network AND pt.station = st.station
        AND pt.location = st.location
      WHERE st.s_time < pt.p_time""")),

    // ---- the streaming amplitude↔pick link rule, same contract: amps
    //      and picks replayed as two file streams, dangling links flag
    //      immediately and retract when the pick lands — the final
    //      changelog state must equal the batch report
    Q("q78_stream_amp_pick_link", (s, dir) => {
      import s.implicits._
      val (picks, _, amplitudes, _) = synthCatalog(s, dir)
      val amps = amplitudes.select(
        col("resource_id"), col("event_id"), col("pick_id"),
        col("evaluation_status"), col("reference"),
        (col("time_begin").isNotNull || col("time_end").isNotNull)
          .as("has_window"))
      val changes = graft.streaming.StreamingValidation.ampPickLink(
        replay(s, amps).as[graft.streaming.StreamingValidation.AmpEvent],
        replay(s, picks).as[graft.streaming.StreamingValidation.PickEvent])
      drainChangelog(s, changes.toDF(), "check_amp_times_contain_pick_time")
    }, Some(s"""
      WITH picks AS ($picksCteSql),
      amplitudes AS (
        SELECT 'smi:local/amp/' || event_id AS resource_id,
               'smi:local/event/' || (event_id % 250) AS event_id,
               CASE WHEN event_id % 41 = 0 THEN 'smi:local/pick/missing'
                    ELSE 'smi:local/pick/' || event_id END AS pick_id,
               CASE WHEN event_id % 19 = 0 THEN epoch_ns(ts) + 1000000
                    ELSE epoch_ns(ts) END AS reference,
               CASE WHEN event_id % 23 = 0 THEN NULL ELSE 0.5 END AS time_begin,
               CASE WHEN event_id % 23 = 0 THEN NULL ELSE 1.0 END AS time_end,
               CASE WHEN event_id % 13 = 0 THEN 'rejected' ELSE '' END
                 AS evaluation_status
        FROM events WHERE event_id % 5 IN (2, 3)),
      active_amps AS (
        SELECT * FROM amplitudes
        WHERE COALESCE(evaluation_status, '') <> 'rejected')
      SELECT a.resource_id AS entity_id,
             'check_amp_times_contain_pick_time' AS rule
      FROM active_amps a LEFT JOIN picks p
        ON p.event_id = a.event_id AND p.resource_id = a.pick_id
      WHERE (a.time_begin IS NOT NULL OR a.time_end IS NOT NULL)
        AND (a.reference IS NULL OR p.time IS NULL
             OR a.reference <> p.time)"""))
  )

  /** q77's pick synthesis: same shape as [[synthCatalog]]'s picks but
    * with phases on a `% 7` residue — q70's `% 5` divides the catalog
    * modulus 250, so a catalog event's picks all share one phase and
    * S-before-P can NEVER fire there; 7 ∤ 250 mixes P and S within
    * events and the rule has real work to do.
    */
  private def streamPicks(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsUs(s, dir)
    val eid = col("event_id")
    e.select(
      concat(lit("smi:local/pick/"), eid.cast("string")).as("resource_id"),
      concat(lit("smi:local/event/"), (eid % 250).cast("string")).as("event_id"),
      when(eid % 991 === 0, lit(null: String))
        .otherwise(concat(lit("N"), (col("user_id") % 2).cast("string")))
        .as("network"),
      concat(lit("ST"), (col("user_id") % 5).cast("string")).as("station"),
      lit("").as("location"),
      when(eid % 3 === 0, "HHZ").when(eid % 3 === 1, "HHN").otherwise("HHE")
        .as("channel"),
      when(eid % 997 === 0, lit(null: String))
        .when(eid % 7 === 0, "P").when(eid % 7 === 1, "S")
        .when(eid % 7 === 2, "AML").when(eid % 7 === 3, "IAML")
        .otherwise("Pg").as("phase_hint"),
      when(eid % 13 === 0, "rejected").otherwise("").as("evaluation_status"),
      col("ts").as("time"))
  }

  private def streamPicksCteSql = """
        SELECT 'smi:local/pick/' || event_id AS resource_id,
               'smi:local/event/' || (event_id % 250) AS event_id,
               CASE WHEN event_id % 991 = 0 THEN NULL
                    ELSE 'N' || (user_id % 2) END AS network,
               'ST' || (user_id % 5) AS station,
               '' AS location,
               CASE event_id % 3 WHEN 0 THEN 'HHZ' WHEN 1 THEN 'HHN'
                    ELSE 'HHE' END AS channel,
               CASE WHEN event_id % 997 = 0 THEN NULL
                    ELSE CASE event_id % 7 WHEN 0 THEN 'P' WHEN 1 THEN 'S'
                         WHEN 2 THEN 'AML' WHEN 3 THEN 'IAML'
                         ELSE 'Pg' END END AS phase_hint,
               CASE WHEN event_id % 13 = 0 THEN 'rejected' ELSE '' END
                 AS evaluation_status,
               epoch_ns(ts) AS time
        FROM events"""

  /** Batch frame → temp parquet → AvailableNow file stream: the replay
    * harness that lets the DuckDB oracle certify a streaming operator
    * (same shape as q66).
    */
  private def replay(s: SparkSession, df: DataFrame): DataFrame = {
    val dir = Scratch.tempDir("graft-replay").toString
    df.write.mode("overwrite").parquet(dir)
    s.readStream.schema(s.read.parquet(dir).schema).parquet(dir)
  }

  /** Drain a [[graft.streaming.StreamingValidation.VerdictChange]]
    * changelog to completion and reduce it to the CURRENT violation
    * set: per entity the stream strictly alternates violated=
    * true/false starting at true, so an odd change count means the
    * latest verdict is "violated" — no reliance on sink row order.
    */
  private def drainChangelog(s: SparkSession, changes: DataFrame,
                             rule: String): DataFrame = {
    val sink = "sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = changes.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = s.table(sink)
      .groupBy("entity_id").agg(count(lit(1)).as("n"))
      .filter(pmod(col("n"), lit(2L)) === 1)
      .select(col("entity_id"), lit(rule).as("rule"))
      .localCheckpoint(true)
    s.catalog.dropTempView(sink)
    out
  }
}
