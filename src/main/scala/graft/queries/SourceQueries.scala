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
      FROM events""")))
}
