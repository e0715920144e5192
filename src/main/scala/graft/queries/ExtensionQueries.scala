package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** §2.10 extension surfaces under hard oracle signal: the pluggable
  * extractor registry (SkipRow semantics), the extension-method API,
  * and the Fetcher's user-registered reference strategy +
  * stream_processor hook — each driven end to end with DuckDB
  * recomputing the result arithmetically.
  */
object ExtensionQueries {

  val all: Seq[Q] = Seq(

    // ---- extractor registry + SkipRow + the syntax verbs (was
    //      spec-only): user-registered derived columns ride the chain,
    //      two keep-predicates play SkipRow (obsplus
    //      `structures/dfextractor.py:98-189`), and the monkey-patch
    //      replacement verbs (`import graft.syntax._`, obsplus
    //      `events/pd.py:608-661`) filter the result with fnmatch
    //      semantics. Any drift in extractor application order,
    //      keep-predicate conjunction, or the glob rewrite breaks the
    //      hash.
    Q("q102_extractor_registry", (s, dir) => {
      import graft.core.Extractor
      import graft.syntax._
      val ext = Extractor()
        .withColumn("mag_bin", floor(col("value") * 10).cast("long") % 8)
        .withColumn("label",
          concat(col("event_type"), lit(":"), col("user_id") % 5))
        .withKeep(col("value") > 2.0) // SkipRow analog
        .withKeep(col("event_id") % 3 =!= 0)
      ext(Tables.eventsUs(s, dir)
          .select("event_id", "user_id", "event_type", "value"))
        .whereGlob("event_type", "c*")
        .select("event_id", "mag_bin", "label", "value")
    }, Some("""
      SELECT event_id,
             CAST(floor(value * 10) AS BIGINT) % 8 AS mag_bin,
             event_type || ':' || CAST(user_id % 5 AS VARCHAR) AS label,
             value
      FROM events
      WHERE value > CAST(2 AS DOUBLE) AND event_id % 3 <> 0
        AND event_type LIKE 'c%'""")),

    // ---- Fetcher extension points (were spec-only): a USER-REGISTERED
    //      reference strategy (`registerReference`, obsplus
    //      `fetcher.py:555-573`'s time_{name} dispatch) shifts each
    //      quake's reference by (event_id % 4) quarter-days, and the
    //      stream_processor hook (`fetcher.py:178-197`) derives a
    //      duration column and drops sub-5-minute segments before the
    //      per-(event, channel) aggregation. The catalog/inventory/
    //      index derivation is q52's (same 20-channel inventory).
    Q("q103_fetch_extensions", (s, dir) => {
      import graft.fetch.Fetcher
      val ev = Tables.eventsUs(s, dir)
      val seed = concat(lit("NT.S"),
        (col("user_id") % 20).cast("string"), lit("..BHZ"))
      val quakes = ev
        .filter(col("event_type") === "error" && col("event_id") % 97 === 0)
        .select(col("event_id"), col("ts").as("time"))
      val channels = ev.select(seed.as("seed_id")).distinct()
      val index = ev.select(seed.as("seed_id"),
        col("ts").as("starttime"),
        (col("ts") + (col("event_id") % 60 + 1) * lit(60_000_000_000L))
          .as("endtime"))
      val fetcher = new Fetcher(s, quakes, channels, picks = quakes)
      fetcher.registerReference("shifted", () =>
        quakes.crossJoin(broadcast(channels))
          .select(col("event_id"), col("seed_id"),
            (col("time") + (col("event_id") % 4) * lit(21_600_000_000_000L))
              .as("ref_time")))
      fetcher.withStreamProcessor(df => df
        .withColumn("dur_s", expr("(endtime - starttime) div 1000000000"))
        .filter(col("dur_s") >= 300))
      fetcher
        .fetchEventSegments(index, "shifted",
          beforeNs = 21_600_000_000_000L, afterNs = 7_200_000_000_000L)
        .groupBy("event_id", "seed_id")
        .agg(count(lit(1)).as("n_segments"),
          min("starttime").as("first_start"),
          max("endtime").as("last_end"),
          sum("dur_s").as("total_s"))
    }, Some("""
      WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) AS tns, event_type
                  FROM events),
      quakes AS (SELECT event_id, tns AS time FROM ev
                 WHERE event_type = 'error' AND event_id % 97 = 0),
      chans AS (SELECT DISTINCT
                  'NT.S' || CAST(user_id % 20 AS VARCHAR) || '..BHZ' AS seed_id
                FROM ev),
      idx AS (SELECT
                'NT.S' || CAST(user_id % 20 AS VARCHAR) || '..BHZ' AS seed_id,
                tns AS starttime,
                tns + (event_id % 60 + 1) * 60000000000 AS endtime
              FROM ev),
      reqs AS (SELECT q.event_id, c.seed_id,
                q.time + (q.event_id % 4) * 21600000000000
                  - 21600000000000 AS t1,
                q.time + (q.event_id % 4) * 21600000000000
                  + 7200000000000 AS t2
               FROM quakes q CROSS JOIN chans c),
      seg AS (SELECT r.event_id, r.seed_id, i.starttime, i.endtime,
                (i.endtime - i.starttime) // 1000000000 AS dur_s
              FROM reqs r JOIN idx i ON i.seed_id = r.seed_id
                AND NOT (i.endtime < r.t1 OR i.starttime > r.t2)
              WHERE (i.endtime - i.starttime) // 1000000000 >= 300)
      SELECT event_id, seed_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
             MIN(starttime) AS first_start, MAX(endtime) AS last_end,
             CAST(SUM(dur_s) AS BIGINT) AS total_s
      FROM seg GROUP BY 1, 2"""))
  )
}
