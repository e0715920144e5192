package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.core.Tables
import graft.operators.{MergeOps, Validation}

/** Catalog merge, upsert, validation report, hierarchical rollup and
  * JSON extraction — SURVEY.md §2.1 (upsert), §2.3 (identity merge),
  * §2.4 (hierarchical groupby), §2.8 (json), §2.10 (validators).
  */
object MiscQueries {

  val all: Seq[Q] = Seq(

    // ---- identity merge of two derived catalog versions
    Q("q36_identity_merge", (s, dir) => {
      val e = Tables.eventsUs(s, dir)
      val oldCat = e.filter(col("event_id") % 3 =!= 0)
      val newCat = e.filter(col("event_id") % 4 =!= 0)
        .withColumn("value",
          when(col("event_id") % 5 === 0, round(col("value") * 1.1, 6))
            .otherwise(col("value")))
      MergeOps.identityMerge(oldCat, newCat, "event_id", "value")
    }, Some("""
      WITH oldc AS (SELECT event_id, value AS val_old FROM events WHERE event_id % 3 <> 0),
      newc AS (SELECT event_id,
                 CASE WHEN event_id % 5 = 0 THEN ROUND(value * 1.1, 6) ELSE value END AS val_new
               FROM events WHERE event_id % 4 <> 0)
      SELECT COALESCE(oldc.event_id, newc.event_id) AS event_id, val_old, val_new,
        CASE WHEN val_old IS NULL THEN 'new'
             WHEN val_new IS NULL THEN 'rejected'
             WHEN val_old <> val_new THEN 'updated'
             ELSE 'unchanged' END AS status
      FROM oldc FULL OUTER JOIN newc ON oldc.event_id = newc.event_id""")),

    // ---- upsert: newest row per key (read-dedup-write index semantics)
    Q("q37_upsert_latest", (s, dir) => {
      val e = Tables.eventsUs(s, dir).select("event_id", "ts", "value")
      val updates = e.filter(col("event_id") % 7 === 0)
        .withColumn("ts", col("ts") + lit(3_600_000_000_000L))
        .withColumn("value", col("value") + 100.0)
      MergeOps.latestByKey(e.unionByName(updates), "event_id",
        Seq(col("ts"), col("value")))
    }, Some("""
      WITH all_rows AS (
        SELECT event_id, epoch_ns(ts) AS ts, value FROM events
        UNION ALL
        SELECT event_id, epoch_ns(ts) + 3600000000000 AS ts, value + 100.0 AS value
        FROM events WHERE event_id % 7 = 0)
      SELECT event_id, ts, value FROM (
        SELECT *, row_number() OVER (PARTITION BY event_id
                   ORDER BY ts DESC, value DESC) AS rn FROM all_rows)
      WHERE rn = 1"""), headline = true),

    // ---- validation rule report (violations per rule)
    Q("q38_validation", (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val rules = Seq(
        Validation.Rule("negative_balance", () =>
          c.filter(col("c_acctbal") < 0).select(col("c_custkey").as("entity_id"))),
        Validation.Rule("orphan_order", () =>
          o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
            .select(col("o_orderkey").as("entity_id"))),
        Validation.Rule("ship_before_order", () =>
          li.join(o, li("l_orderkey") === o("o_orderkey"))
            .filter(col("l_shipdate") < col("o_orderdate"))
            .select(col("l_orderkey").as("entity_id"))),
        Validation.Rule("bad_quantity", () =>
          li.filter(col("l_quantity") <= 0 || col("l_quantity") > 60)
            .select(col("l_orderkey").as("entity_id"))))
      Validation.summary(rules)
    }, Some("""
      SELECT rule, COUNT(*) AS n_violations FROM (
        SELECT c_custkey AS entity_id, 'negative_balance' AS rule
        FROM customer WHERE c_acctbal < 0
        UNION ALL
        SELECT o_orderkey, 'orphan_order' FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        UNION ALL
        SELECT l_orderkey, 'ship_before_order'
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate < o_orderdate
        UNION ALL
        SELECT l_orderkey, 'bad_quantity' FROM lineitem
        WHERE l_quantity <= 0 OR l_quantity > 60)
      GROUP BY rule""")),

    // ---- hierarchical rollup (region → nation levels, null-filled
    //      supertotals) — the nested-groupby inventory-build shape
    Q("q39_rollup", (s, dir) => {
      val r = Tables.region(s, dir); val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      c.select("c_acctbal", "c_nationkey")
        .join(broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r.select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region"), col("n_name").as("nation"),
                col("c_acctbal"))
        .rollup(col("region"), col("nation"))
        .agg(count(lit(1)).as("n_customers"),
             sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
    }, Some("""
      SELECT r_name AS region, n_name AS nation, COUNT(*) AS n_customers,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)""")),

    // ---- CUBE over (returnflag, linestatus): all four grouping
    //      levels in one pass; grouping_id disambiguates NULL-as-total
    //      from NULL-as-value (Spark and DuckDB share the bitmask
    //      convention: 1 bit per column, set when aggregated over)
    Q("q49_cube", (s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
             count(lit(1)).as("n"),
             sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
             sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    // ---- JSON extraction + re-serialization round trip
    Q("q40_json_extract", (s, dir) => {
      val e = Tables.eventsUs(s, dir)
      e.select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long").as("k"))
        .withColumn("rt", to_json(struct(col("k").cast(IntegerType).as("k"))))
    }, Some("""
      SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             '{"k":' || CAST(json_extract(props, '$.k') AS BIGINT) || '}' AS rt
      FROM events""")),

    // ---- §2.3 association by nearest median (associate_merge,
    //      `events/merge.py:211-266`): each (user, day) error-group
    //      matches the per-(user, type) group whose median time is
    //      nearest, within tolerance
    Q("q41_associate_median", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.eventsUs(s, dir)
        .withColumn("ts_ms", expr("ts div 1000000"))
      val catA = e.groupBy("user_id", "event_type")
        .agg(expr("percentile(ts_ms, 0.5)").as("a_median_ms"))
      val catB = e.filter(col("event_type") === "error")
        .withColumn("day", expr("ts_ms div 86400000"))
        .groupBy("user_id", "day")
        .agg(expr("percentile(ts_ms, 0.5)").as("b_median_ms"))
      val joined = catB.join(broadcast(catA), Seq("user_id"))
        .withColumn("diff_ms", abs(col("b_median_ms") - col("a_median_ms")))
      val w = Window.partitionBy("user_id", "day")
        .orderBy(col("diff_ms").asc, col("event_type").asc)
      joined.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("diff_ms") <= 86400000.0)
        .select("user_id", "day", "b_median_ms", "event_type",
                "a_median_ms", "diff_ms")
    }, Some("""
      WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      catA AS (SELECT user_id, event_type, quantile_cont(ts_ms, 0.5) AS a_median_ms
               FROM e GROUP BY user_id, event_type),
      catB AS (SELECT user_id, ts_ms // 86400000 AS day,
                      quantile_cont(ts_ms, 0.5) AS b_median_ms
               FROM e WHERE event_type = 'error' GROUP BY user_id, day),
      j AS (SELECT catB.user_id, day, b_median_ms, event_type, a_median_ms,
                   ABS(b_median_ms - a_median_ms) AS diff_ms,
                   row_number() OVER (PARTITION BY catB.user_id, day
                     ORDER BY ABS(b_median_ms - a_median_ms) ASC, event_type ASC) AS rn
            FROM catB JOIN catA ON catB.user_id = catA.user_id)
      SELECT user_id, day, b_median_ms, event_type, a_median_ms, diff_ms
      FROM j WHERE rn = 1 AND diff_ms <= 86400000.0""")),

    // ---- skew-safe salted aggregation: two-phase sum, exact decimal
    //      partials → identical to the plain aggregate
    Q("q42_salted_agg", (s, dir) => {
      val e = Tables.eventsUs(s, dir)
      graft.operators.Skew.saltedSum(e, Seq("user_id"),
          col("value").cast("decimal(18,2)"), "sum_value",
          pmod(col("event_id"), lit(16)))
        .withColumn("sum_value", col("sum_value").cast("double"))
    }, Some("""
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             COUNT(*) AS sum_value_n
      FROM events GROUP BY user_id"""), headline = true),

    // ---- station kwarg surface (was spec-only): glob + strict
    //      time/geo bounds and the start_date/end_date aliasing over a
    //      deterministically synthesized channel table. Every bound is
    //      STRICT (obsplus `utils/pd.py:440-470`: min_/max_ and
    //      startafter/endbefore all exclude equality)
    Q("q84_station_filters", (s, dir) => {
      val ch = Tables.customer(s, dir).select(
        concat(lit("N"), pmod(col("c_custkey"), lit(3))).as("network"),
        concat(lit("S"), pmod(col("c_custkey"), lit(40))).as("station"),
        lit("").as("location"),
        when(col("c_custkey") % 3 === 0, "BHZ")
          .when(col("c_custkey") % 3 === 1, "BHN")
          .otherwise("HHZ").as("channel"),
        (col("c_custkey") * 1000L).as("start_date"),
        (col("c_custkey") * 1000L + 5000000L).as("end_date"),
        (pmod(col("c_custkey"), lit(180)).cast("double") - 90.0).as("latitude"),
        (pmod(col("c_custkey") * 7L, lit(360)).cast("double") - 180.0).as("longitude"))
      graft.stations.Stations.getStations(ch, graft.stations.StationQuery(
        network = "N1", channel = "BH?",
        startAfter = Some(100000L), endBefore = Some(900000000L),
        minLatitude = Some(-60.0), maxLongitude = Some(120.0)))
    }, Some("""
      WITH ch AS (
        SELECT 'N' || (c_custkey % 3) AS network,
               'S' || (c_custkey % 40) AS station,
               '' AS location,
               CASE WHEN c_custkey % 3 = 0 THEN 'BHZ'
                    WHEN c_custkey % 3 = 1 THEN 'BHN'
                    ELSE 'HHZ' END AS channel,
               c_custkey * 1000 AS start_date,
               c_custkey * 1000 + 5000000 AS end_date,
               CAST(c_custkey % 180 AS DOUBLE) - CAST(90 AS DOUBLE) AS latitude,
               CAST((c_custkey * 7) % 360 AS DOUBLE) - CAST(180 AS DOUBLE) AS longitude
        FROM customer)
      SELECT * FROM ch
      WHERE network = 'N1' AND regexp_matches(channel, '^BH.$')
        AND start_date > 100000 AND end_date < 900000000
        AND latitude > CAST(-60 AS DOUBLE)
        AND longitude < CAST(120 AS DOUBLE)""")),

    // ---- nullish NSLC normalization + zero-pad + seed id (was
    //      spec-only): the cleanup every bank write/read applies
    //      (`utils/pd.py:33-47`), over codes covering every nullish
    //      token, single digits, whitespace and pass-through cases
    Q("q85_nslc_normalize", (s, dir) => {
      import graft.core.Schemas
      val dirty = Tables.customer(s, dir).select(
        col("c_custkey").as("id"),
        lit("N1").as("network"),
        concat(lit(" S"), pmod(col("c_custkey"), lit(20)), lit(" ")).as("station"),
        when(col("c_custkey") % 7 === 0, "None")
          .when(col("c_custkey") % 7 === 1, "nan")
          .when(col("c_custkey") % 7 === 2, "<NA>")
          .when(col("c_custkey") % 7 === 3, "--")
          .when(col("c_custkey") % 7 === 4,
            pmod(col("c_custkey"), lit(10)).cast("string"))
          .when(col("c_custkey") % 7 === 5, "00")
          .otherwise("  ").as("location"),
        lit("BHZ").as("channel"))
      dirty.select(col("id"), col("location").as("raw_location"),
        Schemas.nslcNormalize(col("network")).as("network"),
        Schemas.nslcNormalize(col("station")).as("station"),
        Schemas.nslcNormalize(col("location")).as("location"),
        Schemas.nslcNormalize(col("channel")).as("channel"))
        .withColumn("seed_id", Schemas.seedId(col("network"),
          col("station"), col("location"), col("channel")))
    }, Some("""
      WITH dirty AS (
        SELECT c_custkey AS id, 'N1' AS network,
               ' S' || (c_custkey % 20) || ' ' AS station,
               CASE WHEN c_custkey % 7 = 0 THEN 'None'
                    WHEN c_custkey % 7 = 1 THEN 'nan'
                    WHEN c_custkey % 7 = 2 THEN '<NA>'
                    WHEN c_custkey % 7 = 3 THEN '--'
                    WHEN c_custkey % 7 = 4 THEN CAST(c_custkey % 10 AS VARCHAR)
                    WHEN c_custkey % 7 = 5 THEN '00'
                    ELSE '  ' END AS location,
               'BHZ' AS channel
        FROM customer),
      norm AS (
        SELECT id, location AS raw_location,
               network, TRIM(station) AS station,
               CASE WHEN TRIM(location) IN ('None','none','null','nan','<NA>','--')
                      OR TRIM(location) = '' THEN ''
                    WHEN regexp_matches(TRIM(location), '^[0-9]$')
                      THEN lpad(TRIM(location), 2, '0')
                    ELSE TRIM(location) END AS location,
               channel
        FROM dirty)
      SELECT id, raw_location, network, station, location, channel,
             network || '.' || station || '.' || location || '.' || channel
               AS seed_id
      FROM norm""")),

    // ---- nested inventory build + flatten round trip (was
    //      spec-only): channels → network/station/channel tree
    //      (collect_list structs, deterministic array_sort) → explode
    //      back with parent context. The oracle is the IDENTITY: the
    //      flattened tree must reproduce the channel table exactly.
    //      Station-level attrs derive from the station id so the
    //      tree build's first(latitude) is deterministic
    Q("q86_inventory_roundtrip", (s, dir) => {
      import graft.stations.Stations
      val ch = Tables.customer(s, dir).select(
        concat(lit("N"), pmod(col("c_custkey"), lit(3))).as("network"),
        concat(lit("S"), pmod(col("c_custkey"), lit(40))).as("station"),
        when(col("c_custkey") % 2 === 0, "").otherwise("00").as("location"),
        when(col("c_custkey") % 3 === 0, "BHZ")
          .when(col("c_custkey") % 3 === 1, "BHN")
          .otherwise("HHZ").as("channel"),
        pmod(col("c_custkey"), lit(40)).cast("double").as("latitude"),
        (pmod(col("c_custkey"), lit(40)) * lit(2)).cast("double").as("longitude"),
        ((pmod(col("c_custkey"), lit(5)) + lit(1)) * lit(20)).cast("double")
          .as("sample_rate"),
        (col("c_custkey") * 1000L).as("start_date"),
        (col("c_custkey") * 1000L + 5000000L).as("end_date"))
        .withColumn("seed_id", graft.core.Schemas.seedId(col("network"),
          col("station"), col("location"), col("channel")))
      Stations.flatten(Stations.toInventory(ch))
    }, Some("""
      SELECT 'N' || (c_custkey % 3) AS network,
             'S' || (c_custkey % 40) AS station,
             CASE WHEN c_custkey % 2 = 0 THEN '' ELSE '00' END AS location,
             CASE WHEN c_custkey % 3 = 0 THEN 'BHZ'
                  WHEN c_custkey % 3 = 1 THEN 'BHN'
                  ELSE 'HHZ' END AS channel,
             'N' || (c_custkey % 3) || '.' || 'S' || (c_custkey % 40) || '.' ||
               (CASE WHEN c_custkey % 2 = 0 THEN '' ELSE '00' END) || '.' ||
               (CASE WHEN c_custkey % 3 = 0 THEN 'BHZ'
                     WHEN c_custkey % 3 = 1 THEN 'BHN'
                     ELSE 'HHZ' END) AS seed_id,
             CAST(c_custkey % 40 AS DOUBLE) AS latitude,
             CAST((c_custkey % 40) * 2 AS DOUBLE) AS longitude,
             CAST((c_custkey % 5 + 1) * 20 AS DOUBLE) AS sample_rate,
             c_custkey * 1000 AS start_date,
             c_custkey * 1000 + 5000000 AS end_date
      FROM customer""")),

    // ---- EventBank kwarg surface through a REAL bank round trip (was
    //      spec-only): put a synthesized catalog, upsert a subset with
    //      newer `updated` stamps, then getEvents with updatedafter +
    //      strict magnitude/latitude bounds + the maxTime NaT guard
    //      (sentinel-stored times must NOT match a maxTime-only query —
    //      `_handle_nat`, utils/bank.py:343-347). The oracle replays
    //      the upsert as a CASE merge
    Q("q87_eventbank_kwargs", (s, dir) => {
      import graft.bank.{EventBank, EventQuery}
      import graft.core.Schemas
      // µs-truncated times: DuckDB reads TIMESTAMP(NANOS) parquet at
      // µs precision, so the oracle's epoch_ns(ts) ends in 000
      val e = Tables.eventsUs(s, dir)
      def synth(src: org.apache.spark.sql.DataFrame, updated: Long,
                magShift: Double) = src.select(
        concat(lit("smi:local/event/"), col("event_id")).as("event_id"),
        when(col("event_id") % 31 === 0, lit(Schemas.SmallDt64))
          .otherwise(col("ts")).as("time"),
        (pmod(col("event_id"), lit(160)).cast("double") - 80.0).as("latitude"),
        (pmod(col("event_id") * 3L, lit(360)).cast("double") - 180.0).as("longitude"),
        lit(5000.0).as("depth"),
        (pmod(col("event_id"), lit(50)).cast("double") / 10.0 + magShift)
          .as("magnitude"),
        lit(updated).as("updated"))
      val root = Scratch
        .tempDir("graft-q87").toString
      val bank = new EventBank(s, root)
      bank.putEvents(synth(e, updated = 1000L, magShift = 0.0))
      bank.putEvents(synth(e.filter(col("event_id") % 7 === 0),
        updated = 2000L, magShift = 0.5))
      bank.getEvents(EventQuery(
        maxTime = Some(4_000_000_000_000_000_000L),
        minMagnitude = Some(1.0), maxLatitude = Some(60.0),
        updatedAfter = Some(1500L)))
        .select("event_id", "time", "latitude", "longitude", "depth",
          "magnitude", "updated")
    }, Some(s"""
      WITH base AS (
        SELECT event_id AS raw_id,
               'smi:local/event/' || event_id AS event_id,
               CASE WHEN event_id % 31 = 0 THEN ${graft.core.Schemas.SmallDt64}
                    ELSE epoch_ns(ts) END AS time,
               CAST(event_id % 160 AS DOUBLE) - CAST(80 AS DOUBLE) AS latitude,
               CAST((event_id * 3) % 360 AS DOUBLE) - CAST(180 AS DOUBLE)
                 AS longitude,
               CAST(5000 AS DOUBLE) AS depth,
               CAST(event_id % 50 AS DOUBLE) / CAST(10 AS DOUBLE) AS magnitude
        FROM events),
      merged AS (
        SELECT event_id, time, latitude, longitude, depth,
               CASE WHEN raw_id % 7 = 0
                    THEN magnitude + CAST(0.5 AS DOUBLE)
                    ELSE magnitude END AS magnitude,
               CAST(CASE WHEN raw_id % 7 = 0 THEN 2000 ELSE 1000 END
                 AS BIGINT) AS updated
        FROM base)
      SELECT event_id, time, latitude, longitude, depth, magnitude, updated
      FROM merged
      WHERE updated > 1500
        AND time < 4000000000000000000 AND time > ${graft.core.Schemas.SmallDt64} + 1
        AND magnitude > CAST(1 AS DOUBLE)
        AND latitude < CAST(60 AS DOUBLE)""")),

    // ---- named dataset bundle end to end (was spec-only): the
    //      reference's by-name dataset contract (obsplus
    //      `datasets/dataset.py:48-120`, `bingham_test.py:20-84`) —
    //      registerAll, load `bingham_test` BY NAME twice (first load
    //      fetches into the cache, second must hit it and re-verify
    //      the sha256 manifest), then query the loaded EventBank with
    //      a strict magnitude bound and join the WaveBank index's
    //      per-event-window facts. The oracle recomputes the bundle's
    //      published deterministic shape arithmetically (5 events ×
    //      6 stations × 3 HH? channels, −10 s…+60 s @ 100 Hz), using
    //      `region`'s fixed r_regionkey 0–4 as the row generator.
    //      Any drift in the fetch-once path, manifest hashing, bank
    //      round trip, or window derivation breaks the hash.
    Q("q89_dataset_bundle", (s, dir) => {
      import graft.bank.{DataBundle, Datasets, EventQuery}
      Datasets.registerAll(s)
      val base = Scratch
        .tempDir("graft-q89-bundles").toString
      DataBundle.load(s, "bingham_test", Some(base)) // fetch
      val bundle = DataBundle.load(s, "bingham_test", Some(base)) // cache hit
      val ev = bundle.eventBank.get
        .getEvents(EventQuery(minMagnitude = Some(1.25)))
        .select(col("event_id"), col("time"),
          round(col("latitude"), 6).as("latitude"),
          round(col("longitude"), 6).as("longitude"),
          col("depth"), col("magnitude"))
      // the index is per RECORD (miniSEED fragments a 7000-sample
      // segment into many records), so window facts must be
      // fragmentation-invariant: assign each record to its event
      // window by interval, then sum durations / span min-max —
      // never count fragments
      val idx = bundle.waveBank.get.readIndex(channel = "HH?")
      ev.join(idx,
          idx("starttime") >= ev("time") - lit(10_000_000_000L) &&
            idx("starttime") < ev("time") + lit(60_000_000_000L))
        .groupBy(ev("event_id"), ev("time"), ev("latitude"),
          ev("longitude"), ev("depth"), ev("magnitude"))
        .agg(sum(expr("(endtime - starttime) div sampling_period"))
            .as("total_samples"),
          countDistinct(col("station")).as("n_sta"),
          countDistinct(col("channel")).as("n_chan"),
          min(col("starttime")).as("win_start"),
          max(col("endtime")).as("win_end"))
    }, Some("""
      WITH i AS (SELECT CAST(r_regionkey AS BIGINT) AS i FROM region),
      r AS (SELECT CAST(20.0 AS DOUBLE) / CAST(111.19 AS DOUBLE) / 2 AS r),
      ev AS (SELECT
        'smi:local/bingham/' || i AS event_id,
        1365552000000000000 + i * 3600000000000 AS time,
        round(CAST(40.53829 AS DOUBLE) + sin(CAST(i AS DOUBLE)) * r, 6)
          AS latitude,
        round(CAST(-112.149506 AS DOUBLE) + cos(CAST(i AS DOUBLE)) * r, 6)
          AS longitude,
        CAST(100.0 AS DOUBLE) + CAST(i AS DOUBLE) * 10 AS depth,
        CAST(1.2 AS DOUBLE) + CAST(i AS DOUBLE) / 10 AS magnitude
       FROM i, r)
      SELECT event_id, time, latitude, longitude, depth, magnitude,
             CAST(126000 AS BIGINT) AS total_samples,
             CAST(6 AS BIGINT) AS n_sta, CAST(3 AS BIGINT) AS n_chan,
             time - 10000000000 AS win_start,
             time + 60000000000 AS win_end
      FROM ev WHERE magnitude > CAST(1.25 AS DOUBLE)"""))
  )
}
