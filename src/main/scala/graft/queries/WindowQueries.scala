package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AsOf, IntervalJoin, Intervals, TimeChunks}

/** SURVEY.md §2.5 ordered-sequence operators + §2.3 interval/as-of
  * joins, exercised over the `events` table (ts = epoch-ns long).
  *
  * A synthetic interval table is derived from events:
  * [ts, ts + floor(value·60e9)] — i.e. each event "lasts" value
  * minutes — giving the (key, starttime, endtime) shape the waveform
  * index has in the reference.
  */
object WindowQueries {

  private val MinGap    = 43_200_000_000_000L  // 12 h in ns
  private val AsOfTol   = 172_800_000_000_000L // 48 h
  private val ReqHalf   = 21_600_000_000_000L  // ±6 h bulk-request window
  private val DayNs     = 86_400_000_000_000L
  private val T0        = 1_704_067_200_000_000_000L // 2024-01-01T00:00Z
  private val T1Stop    = 1_706_745_600_000_000_000L // 2024-02-01T00:00Z
  private val W1        = 1_704_844_800_000_000_000L // 2024-01-10
  private val W2        = 1_705_708_800_000_000_000L // 2024-01-20

  /** The q13–q16 interval shape over an arbitrary events-shaped frame
    * (event_id, user_id, event_type, ts ns, value) — shared with
    * tools.ScaleBench, which runs the same bodies at 10⁶–10⁷ rows.
    */
  private[graft] def intervalsOf(e: DataFrame): DataFrame =
    e.select(
      col("event_id"), col("user_id"), col("event_type"),
      col("ts").as("starttime"),
      (col("ts") + floor(col("value") * lit(6.0e10)).cast("long")).as("endtime"))

  private def intervals(s: SparkSession, dir: String): DataFrame =
    intervalsOf(Tables.eventsUs(s, dir))

  /** q14's body: gap detection over the interval shape. */
  private[graft] def gapsOf(e: DataFrame): DataFrame =
    Intervals.gaps(intervalsOf(e), Seq("user_id"), MinGap)

  /** q15's body: sessionized contiguous segments. */
  private[graft] def segmentsOf(e: DataFrame): DataFrame =
    Intervals.segments(intervalsOf(e), Seq("user_id"), MinGap)

  /** q19's (and, with `banded`, q67's) body: ±6 h windows around error
    * events joined to the same user's events — the broadcast interval
    * index vs the banded huge×huge scale path, identical semantics.
    * `bandNs` exposes the banded path's width knob for the ScaleBench
    * sensitivity sweep; 0 = the operator's measured auto width (which
    * resolves to the 12 h median request span here). Width never changes
    * results, only the plan.
    */
  private[graft] def intervalJoinOf(e: DataFrame,
                                    banded: Boolean = false,
                                    bandNs: Long = 0L): DataFrame = {
    val reqs = e.filter(col("event_type") === "error")
      .select(col("event_id").as("req_id"), col("user_id"),
              (col("ts") - lit(ReqHalf)).as("t1"),
              (col("ts") + lit(ReqHalf)).as("t2"))
    val joined =
      if (banded) IntervalJoin.bandedPoints(e, reqs, Seq("user_id"), "ts",
        bandNs = bandNs)
      else IntervalJoin.pointsInRanges(e, reqs, Seq("user_id"), "ts")
    joined.groupBy("req_id")
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
           countDistinct(col("event_type")).as("n_types"))
  }

  private val ivSql = """
    SELECT event_id, user_id, event_type, epoch_ns(ts) AS starttime,
           epoch_ns(ts) + CAST(floor(value * 60000000000.0) AS BIGINT) AS endtime
    FROM events"""

  val all: Seq[Q] = Seq(

    // ---- §2.4 availability: per-key span + segment count
    Q("q13_availability", (s, dir) => {
      Intervals.availability(intervals(s, dir), Seq("user_id", "event_type"))
    }, Some(s"""
      WITH iv AS ($ivSql)
      SELECT user_id, event_type, MIN(starttime) AS starttime,
             MAX(endtime) AS endtime, COUNT(*) AS n_segments
      FROM iv GROUP BY user_id, event_type"""), headline = true),

    // ---- §2.5 gap detection (running max + lead, one window pass)
    Q("q14_gaps", (s, dir) => {
      gapsOf(Tables.eventsUs(s, dir))
    }, Some(s"""
      WITH iv AS ($ivSql),
      g AS (SELECT user_id,
        MAX(endtime) OVER (PARTITION BY user_id ORDER BY starttime, endtime
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gap_start,
        LEAD(starttime) OVER (PARTITION BY user_id ORDER BY starttime, endtime) AS next_start
      FROM iv)
      SELECT user_id, gap_start, next_start AS gap_end,
             next_start - gap_start AS gap_ns
      FROM g WHERE next_start IS NOT NULL AND gap_start + $MinGap < next_start"""),
      headline = true),

    // ---- §2.5 contiguous segments via sessionization (flag + cumsum)
    Q("q15_segments", (s, dir) => {
      segmentsOf(Tables.eventsUs(s, dir))
    }, Some(s"""
      WITH iv AS ($ivSql),
      s1 AS (SELECT user_id, starttime, endtime,
        MAX(endtime) OVER (PARTITION BY user_id ORDER BY starttime, endtime
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_runmax
      FROM iv),
      s2 AS (SELECT *, CASE WHEN prev_runmax IS NULL
               OR prev_runmax + $MinGap < starttime THEN 1 ELSE 0 END AS new_session FROM s1),
      s3 AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY starttime, endtime
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM s2)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(starttime) AS seg_start, MAX(endtime) AS seg_end,
             COUNT(*) AS n_members
      FROM s3 GROUP BY user_id, session_id"""), headline = true),

    // ---- §2.4 uptime: availability ⟗ gap totals, fill 0, ratio
    Q("q16_uptime", (s, dir) => {
      Intervals.uptime(intervals(s, dir), Seq("user_id"), MinGap)
        .select("user_id", "starttime", "endtime", "n_segments",
                "gap_total_ns", "duration_ns", "uptime_ns", "availability_frac")
    }, Some(s"""
      WITH iv AS ($ivSql),
      avail AS (SELECT user_id, MIN(starttime) AS starttime, MAX(endtime) AS endtime,
                       COUNT(*) AS n_segments FROM iv GROUP BY user_id),
      g AS (SELECT user_id,
        MAX(endtime) OVER (PARTITION BY user_id ORDER BY starttime, endtime
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gap_start,
        LEAD(starttime) OVER (PARTITION BY user_id ORDER BY starttime, endtime) AS next_start
      FROM iv),
      gt AS (SELECT user_id, CAST(SUM(next_start - gap_start) AS BIGINT) AS gap_total_ns
             FROM g WHERE next_start IS NOT NULL AND gap_start + $MinGap < next_start
             GROUP BY user_id)
      SELECT a.user_id, a.starttime, a.endtime, a.n_segments,
             COALESCE(gt.gap_total_ns, 0) AS gap_total_ns,
             a.endtime - a.starttime AS duration_ns,
             a.endtime - a.starttime - COALESCE(gt.gap_total_ns, 0) AS uptime_ns,
             ROUND(CAST(a.endtime - a.starttime - COALESCE(gt.gap_total_ns, 0) AS DOUBLE)
                   / CAST(a.endtime - a.starttime AS DOUBLE), 6) AS availability_frac
      FROM avail a LEFT JOIN gt ON a.user_id = gt.user_id""")),

    // ---- §2.5 time chunking: sequence+explode sliding windows
    //      (24 h windows every 12 h → overlapping membership)
    Q("q17_time_chunks", (s, dir) => {
      val ch = TimeChunks.chunks(s, T0, T1Stop, DayNs, DayNs / 2)
      val e = Tables.eventsUs(s, dir)
      TimeChunks.assign(e, ch, "ts")
        .groupBy("chunk_i", "chunk_start")
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
             countDistinct(col("user_id")).as("n_users"))
    }, Some(s"""
      WITH ch AS (SELECT i AS chunk_i, $T0 + i * ${DayNs / 2} AS chunk_start
                  FROM (SELECT UNNEST(generate_series(0, 60)) AS i)),
      e AS (SELECT epoch_ns(ts) AS t, user_id, value FROM events)
      SELECT chunk_i, chunk_start, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             COUNT(DISTINCT user_id) AS n_users
      FROM ch JOIN e ON e.t >= ch.chunk_start AND e.t < ch.chunk_start + $DayNs
      GROUP BY chunk_i, chunk_start""")),

    // ---- §2.3 as-of join: most recent purchase before each signup,
    //      within tolerance (associate_merge semantics)
    Q("q18_asof_join", (s, dir) => {
      val e = Tables.eventsUs(s, dir)
      val signup = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchase = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_event"))
      AsOf.backward(signup, purchase, "user_id", "ts", "ts",
        leftCarry = Seq("event_id"), rightCarry = Seq("purchase_event"),
        tolerance = AsOfTol)
    }, Some(s"""
      WITH u AS (
        SELECT user_id, epoch_ns(ts) AS t, 1 AS is_left, event_id,
               NULL::BIGINT AS rt, NULL::BIGINT AS pe
        FROM events WHERE event_type = 'signup'
        UNION ALL
        SELECT user_id, epoch_ns(ts), 0, NULL, epoch_ns(ts), event_id
        FROM events WHERE event_type = 'purchase'),
      c AS (SELECT *,
        last_value(rt IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, is_left, rt
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_rt,
        last_value(pe IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, is_left, rt
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_pe
      FROM u)
      SELECT user_id, t AS ts, event_id, last_pe AS purchase_event,
             t - last_rt AS asof_lag_ns
      FROM c WHERE is_left = 1 AND last_rt IS NOT NULL
        AND t - last_rt <= $AsOfTol"""), headline = true),

    // ---- §2.3 bulk interval join: ±6 h windows around error events vs
    //      all events of the same user (broadcast request side)
    Q("q19_interval_join", (s, dir) => {
      intervalJoinOf(Tables.eventsUs(s, dir))
    }, Some(s"""
      WITH r AS (SELECT event_id AS req_id, user_id,
                        epoch_ns(ts) - $ReqHalf AS t1, epoch_ns(ts) + $ReqHalf AS t2
                 FROM events WHERE event_type = 'error')
      SELECT r.req_id, COUNT(*) AS n,
             CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             COUNT(DISTINCT e.event_type) AS n_types
      FROM r JOIN events e ON e.user_id = r.user_id
        AND epoch_ns(e.ts) >= r.t1 AND epoch_ns(e.ts) <= r.t2
      GROUP BY r.req_id"""), headline = true),

    // ---- the q19 semantics through the huge×huge scale path: banded
    //      equi join (explode requests across fixed-width time bands,
    //      hash-join on (user_id, band)) instead of the broadcast
    //      interval index — same oracle, so the driver gate pins both
    //      physical strategies to identical results
    Q("q67_banded_interval", (s, dir) => {
      // band ≈ request half-width: ≤3 bands/request
      intervalJoinOf(Tables.eventsUs(s, dir), banded = true)
    }, Some(s"""
      WITH r AS (SELECT event_id AS req_id, user_id,
                        epoch_ns(ts) - $ReqHalf AS t1, epoch_ns(ts) + $ReqHalf AS t2
                 FROM events WHERE event_type = 'error')
      SELECT r.req_id, COUNT(*) AS n,
             CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             COUNT(DISTINCT e.event_type) AS n_types
      FROM r JOIN events e ON e.user_id = r.user_id
        AND epoch_ns(e.ts) >= r.t1 AND epoch_ns(e.ts) <= r.t2
      GROUP BY r.req_id""")),

    // ---- ranking window functions: rank / dense_rank / ntile /
    //      percent_rank per partition (top-5 orders by price within
    //      each priority). percent_rank is (rank-1)/(n-1) — one IEEE
    //      division, engine-exact. Full orderBy tiebreak on o_orderkey.
    Q("q50_ranking_windows", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .filter(col("rnk") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice",
                "rnk", "drnk", "quartile", "pct_rank")
    }, Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk,
             CAST(quartile AS INT) AS quartile, pct_rank
      FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile, percent_rank() OVER w AS pct_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey ASC))
      WHERE rnk <= 5""")),

    // ---- §2.2 interval-overlap predicate with ±1 s buffer and
    //      NaT-exclusion (null endtime never matches)
    Q("q20_overlap_filter", (s, dir) => {
      val iv = Tables.eventsUs(s, dir).select(
        col("event_id"), col("user_id"),
        col("ts").as("starttime"),
        when(col("value") >= 1.0,
             col("ts") + floor(col("value") * lit(6.0e10)).cast("long"))
          .as("endtime"))
      iv.filter(Intervals.overlaps(W1, W2, 1_000_000_000L))
        .select("event_id", "user_id", "starttime", "endtime")
    }, Some(s"""
      WITH iv AS (SELECT event_id, user_id, epoch_ns(ts) AS starttime,
        CASE WHEN value >= 1.0
             THEN epoch_ns(ts) + CAST(floor(value * 60000000000.0) AS BIGINT) END AS endtime
        FROM events)
      SELECT event_id, user_id, starttime, endtime FROM iv
      WHERE endtime IS NOT NULL
        AND NOT (endtime < ${W1} - 1000000000 OR starttime > ${W2} + 1000000000)"""))
  )
}
