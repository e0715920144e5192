package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.QuakeMl

/** Source-format queries — SURVEY.md §2.1: the QuakeML scan path
  * (obsplus `eventbank.py:392-418`) oracle-checked end-to-end by
  * generating a document per row, parsing it back with the StAX
  * parser, and emitting the extracted fields. If serialization,
  * ns-time ISO formatting, or extraction drift, the DuckDB hash
  * mismatches.
  */
object SourceQueries {

  val all: Seq[Q] = Seq(

    Q("q43_xml_roundtrip", (s, dir) => {
      import s.implicits._
      Tables.eventsUs(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[(Long, Long, Long, String, Double)]
        .map { case (id, ts, uid, typ, v) =>
          val ev = QuakeMl.EventRow(
            event_id = s"smi:local/$id",
            time = Some(ts),
            latitude = Some(uid / 10.0 - 50.0),
            longitude = Some(v * 3.0 - 150.0),
            depth = Some(v * 100.0),
            magnitude = Some(v / 10.0),
            magnitude_type = Some(typ),
            updated = None, author = None, agency_id = None, path = None)
          val xml = QuakeMl.toQuakeMl(ev)
          val back = QuakeMl.parseCatalog(xml.getBytes("UTF-8")).events.head
          (back.event_id, back.time.get, back.latitude.get, back.longitude.get,
            back.depth.get, back.magnitude.get, back.magnitude_type.get)
        }
        .toDF("event_id", "time", "latitude", "longitude", "depth",
          "magnitude", "magnitude_type")
    }, Some("""
      SELECT 'smi:local/' || event_id AS event_id, epoch_ns(ts) AS time,
             user_id / 10.0 - 50.0 AS latitude,
             value * 3.0 - 150.0 AS longitude,
             value * 100.0 AS depth,
             value / 10.0 AS magnitude,
             event_type AS magnitude_type
      FROM events""")),

    // ---- real miniSEED round trip, oracle-checked: deterministic
    //      segments derived from `events` are ENCODED as Steim-2
    //      128-byte records (every segment over 91 samples fragments
    //      into several records), committed through the staged V2
    //      sink, decoded back by the V2 scan, and reduced to
    //      fragmentation-invariant per-station facts. The oracle
    //      computes the same facts from the derivation alone — any
    //      drift in BTIME conversion, rate fields, Steim packing or
    //      reassembly breaks the hash.
    Q("q81_mseed_roundtrip", (s, dir) => {
      val T0 = 1_600_000_000_000_000_000L // on the 100 µs BTIME grid
      val segs = Tables.events(s, dir)
        .select((col("user_id") % 8).cast("string").as("sid"),
          (col("event_id") % 40).as("slot"), col("event_id"))
        .groupBy("sid", "slot").agg((min("event_id") % 100).as("v0"))
        .select(lit("XX").as("network"),
          concat(lit("S"), col("sid")).as("station"),
          lit("").as("location"), lit("BHZ").as("channel"),
          (lit(T0) + col("slot") * lit(10_000_000_000L)).as("starttime"),
          lit(10_000_000L).as("sampling_period"), // 100 Hz
          transform(sequence(lit(0L), col("v0") + lit(49L)),
            i => ((col("v0") + i) % 50).cast("double")).as("samples"))
      val out = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_q81_mseed").getAbsolutePath
      segs.write.format("mseed").mode("overwrite")
        .option("recordLen", "128").save(out)
      s.read.format("mseed").load(out)
        .groupBy("station")
        .agg(sum(col("n_samples").cast("long")).as("total_samples"),
          sum(aggregate(col("samples"), lit(0.0), (a, x) => a + x))
            .cast("long").as("checksum"),
          min(col("starttime")).as("t0"),
          max(col("starttime") +
            col("n_samples").cast("long") * col("sampling_period")).as("t_end"))
    }, Some("""
      WITH base AS (
        SELECT user_id % 8 AS sid, event_id % 40 AS slot,
               MIN(event_id) % 100 AS v0
        FROM events GROUP BY 1, 2),
      seg AS (SELECT sid, slot, v0, v0 + 50 AS len FROM base)
      SELECT 'S' || CAST(sid AS VARCHAR) AS station,
             CAST(SUM(len) AS BIGINT) AS total_samples,
             CAST(SUM(list_sum(list_transform(range(len), i -> (v0 + i) % 50))) AS BIGINT) AS checksum,
             MIN(1600000000000000000 + slot * 10000000000) AS t0,
             MAX(1600000000000000000 + slot * 10000000000 + len * 10000000) AS t_end
      FROM seg GROUP BY 1"""), headline = true))
}
