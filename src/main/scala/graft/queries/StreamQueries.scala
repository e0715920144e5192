package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.Tables

/** Oracle-checked Structured Streaming: the streaming operators are
  * spec-tested for streaming-only behavior (checkpoint restart,
  * watermark drops), but an end-to-end replay whose OUTPUT hash-matches
  * DuckDB proves the streaming plan computes the same answer as the
  * batch engine — the strongest cross-engine check available to a
  * streaming job.
  */
object StreamQueries {

  private val WindowNs = 21600L * 1000000000L // 6 h, epoch-aligned

  val all: Seq[Q] = Seq(

    // ---- §2.9 end-to-end: events replayed through the file source,
    //      tumbling 6h windows per event_type, complete-mode memory
    //      sink drained by AvailableNow. Spark's window() aligns to
    //      the epoch, so the oracle is integer ns-bucket arithmetic;
    //      both sides see µs-truncated timestamps in EVERY generator
    //      vintage (ns vintage: parquet TIMESTAMP(NANOS) → µs in
    //      DuckDB; µs TIMESTAMP/TIMESTAMP_NTZ vintages are µs-grained
    //      on disk already; timestamp_micros here).
    Q("q66_stream_windows", (s, dir) => {
      val stream = Tables.eventsStream(s, dir)
      val agg = stream
        .withColumn("tss", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("tss"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast("decimal(18,2)")).cast("double")
               .as("sum_value"))
      val sink = "q66_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // materialize, then unregister the sink table — repeated runs in
      // one session must not accumulate complete-mode state tables
      val out = s.table(sink)
        .select(expr("unix_micros(w.start) * 1000").as("window_ns"),
          col("event_type"), col("n_events"), col("sum_value"))
        .localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      -- floor-aligned bucket via positive mod (DuckDB // truncates
      -- toward zero, Spark's window() floors — they differ pre-1970);
      -- Spark's TimeWindowing also drops null timestamps, so mirror it
      SELECT epoch_ns(ts) - ((epoch_ns(ts) % $WindowNs) + $WindowNs) % $WindowNs
               AS window_ns,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2""")),

    // ---- STREAMING gap detection (round 7): the q14 interval frame
    //      replays through the file source range-partitioned by
    //      starttime (event-time-ordered arrival), and
    //      `StreamingIntervals.gapStream` — a watermark-sealed
    //      running-max per key in flatMapGroupsWithState — must emit
    //      EXACTLY the batch q14 gap set (the oracle below is q14's
    //      SQL verbatim). A flush row 8 h past the last event pushes
    //      the final watermark over every real segment so the no-data
    //      batch finalizes them; the flush key itself (single segment)
    //      emits nothing, and the gap TO the flush row stays sealed
    //      behind the watermark by construction.
    Q("q100_stream_gaps", (s, dir) => {
      val iv = WindowQueries.intervalsOf(Tables.eventsUs(s, dir))
        .select(col("user_id"), col("starttime"), col("endtime"))
      // bounded driver agg: one scalar, to place the flush row
      val maxTs = iv.agg(max("starttime")).collect()(0).getLong(0)
      val flushTs = maxTs + 8L * 3600L * 1_000_000_000L
      val flush = s.range(1).select(lit(999999999L).as("user_id"),
        lit(flushTs).as("starttime"), lit(flushTs + 1000L).as("endtime"))
      val tmp = Scratch
        .tempDir("graft-q100").toString
      iv.unionByName(flush)
        .repartitionByRange(8, col("starttime"))
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream
        .schema(s.read.parquet(tmp).schema).parquet(tmp)
      val gaps = graft.streaming.StreamingIntervals.gapStream(
        stream, "user_id", "starttime", "endtime",
        minGap = 43_200_000_000_000L, watermark = "10 seconds")
      val sink = "q100_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = gaps.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink)
        .select(col("user_id").cast("long").as("user_id"),
          col("gap_start"), col("gap_end"), col("gap_ns"))
        .localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some("""
      WITH iv AS (
        SELECT event_id, user_id, event_type, epoch_ns(ts) AS starttime,
               epoch_ns(ts) + CAST(floor(value * 60000000000.0) AS BIGINT)
                 AS endtime
        FROM events),
      g AS (SELECT user_id,
        MAX(endtime) OVER (PARTITION BY user_id ORDER BY starttime, endtime
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gap_start,
        LEAD(starttime) OVER (PARTITION BY user_id ORDER BY starttime, endtime)
          AS next_start
      FROM iv)
      SELECT user_id, gap_start, next_start AS gap_end,
             next_start - gap_start AS gap_ns
      FROM g WHERE next_start IS NOT NULL
        AND gap_start + 43200000000000 < next_start""")),

    // ---- STREAMING sessionization (round 7, was spec-only): event
    //      POINTS per user replay through the file source and
    //      `SessionizeStream.sessionize` (one open session of state
    //      per key) must close EXACTLY the sessions the batch islands
    //      SQL derives. A flush point per key 10 days ahead closes
    //      every real session; the flush singletons themselves stay
    //      open and unemitted.
    Q("q101_stream_sessionize", (s, dir) => {
      import s.implicits._
      import graft.streaming.SessionizeStream
      val tol = 6L * 3600L * 1_000_000_000L // 6 h between events
      val pts = Tables.eventsUs(s, dir)
        .filter(col("ts").isNotNull)
        .select(col("user_id").cast("string").as("key"),
          col("ts").cast("long").as("ts"))
      val maxTs = pts.agg(max("ts")).collect()(0).getLong(0)
      val flush = pts.select("key").distinct()
        .withColumn("ts", lit(maxTs + 10L * 86400L * 1_000_000_000L))
      val tmp = Scratch
        .tempDir("graft-q101").toString
      pts.unionByName(flush)
        .repartitionByRange(8, col("ts"))
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream
        .schema(s.read.parquet(tmp).schema).parquet(tmp)
        .as[SessionizeStream.Point]
      val sessions = SessionizeStream.sessionize(stream, tolNs = tol)
      val sink = "q101_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = sessions.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink)
        .select(col("key").cast("long").as("user_id"),
          col("seg_start"), col("seg_end"), col("n_members"))
        .localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some("""
      WITH p AS (SELECT user_id, epoch_ns(ts) AS t FROM events
                 WHERE ts IS NOT NULL),
      o AS (SELECT user_id, t,
              LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS prev FROM p),
      f AS (SELECT user_id, t,
              CASE WHEN prev IS NULL OR t - prev > 21600000000000
                   THEN 1 ELSE 0 END AS flag FROM o),
      g AS (SELECT user_id, t,
              SUM(flag) OVER (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
            FROM f)
      SELECT user_id, MIN(t) AS seg_start, MAX(t) AS seg_end,
             CAST(COUNT(*) AS BIGINT) AS n_members
      FROM g GROUP BY user_id, grp""")),

    // ---- STREAMING contiguous-span maintenance (round 8): the q15
    //      interval frame replays ordered through the file source and
    //      `StreamingIntervals.segmentStream` must emit EXACTLY the
    //      batch q15 segment set INCLUDING the batch session ids (the
    //      oracle below is q15's SQL verbatim). Spans close either when
    //      a sealed row opens the next session or when the watermark
    //      passes runMax + tol (provably un-extendable) — the single
    //      flush row advances the final watermark far enough that every
    //      real span closes by the second path; the flush row itself
    //      stays behind the watermark, buffered and unemitted.
    Q("q105_stream_segments", (s, dir) => {
      val iv = WindowQueries.intervalsOf(Tables.eventsUs(s, dir))
        .select(col("user_id"), col("starttime"), col("endtime"))
      // bounded driver agg: one scalar, to place the flush row
      val maxTs = iv.agg(max("starttime")).collect()(0).getLong(0)
      val flushTs = maxTs + 10L * 86400L * 1_000_000_000L
      val flush = s.range(1).select(lit(999999999L).as("user_id"),
        lit(flushTs).as("starttime"), lit(flushTs + 1000L).as("endtime"))
      val tmp = Scratch
        .tempDir("graft-q105").toString
      iv.unionByName(flush)
        .repartitionByRange(8, col("starttime"))
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream
        .schema(s.read.parquet(tmp).schema).parquet(tmp)
      val segs = graft.streaming.StreamingIntervals.segmentStream(
        stream, "user_id", "starttime", "endtime",
        tol = 43_200_000_000_000L, watermark = "10 seconds")
      val sink = "q105_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = segs.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink)
        .select(col("user_id").cast("long").as("user_id"),
          col("session_id"), col("seg_start"), col("seg_end"),
          col("n_members"))
        .localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some("""
      WITH iv AS (
        SELECT event_id, user_id, event_type, epoch_ns(ts) AS starttime,
               epoch_ns(ts) + CAST(floor(value * 60000000000.0) AS BIGINT)
                 AS endtime
        FROM events),
      s1 AS (SELECT user_id, starttime, endtime,
        MAX(endtime) OVER (PARTITION BY user_id ORDER BY starttime, endtime
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_runmax
      FROM iv),
      s2 AS (SELECT *, CASE WHEN prev_runmax IS NULL
               OR prev_runmax + 43200000000000 < starttime
               THEN 1 ELSE 0 END AS new_session FROM s1),
      s3 AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY starttime, endtime
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM s2)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(starttime) AS seg_start, MAX(endtime) AS seg_end,
             COUNT(*) AS n_members
      FROM s3 GROUP BY user_id, session_id"""))
  )
}
