package graft.stations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Schemas
import graft.functions.Fnmatch

/** Station-inventory operations — obsplus `stations/get_stations.py`
  * + `utils/stations.py`: filter the channel-level table with the
  * FDSN kwarg surface, and rebuild/flatten the nested
  * network→station→channel hierarchy (the reference's nested groupby
  * inventory build, `utils/stations.py:98-125, 289-326`).
  */
final case class StationQuery(
    network: String = "*", station: String = "*",
    location: String = "*", channel: String = "*",
    startBefore: Option[Long] = None, startAfter: Option[Long] = None,
    endBefore: Option[Long] = None, endAfter: Option[Long] = None,
    minLatitude: Option[Double] = None, maxLatitude: Option[Double] = None,
    minLongitude: Option[Double] = None, maxLongitude: Option[Double] = None)

object Stations {

  /** Grouping-granularity map — the reference's aggregation levels
    * constant (`constants.py:618`: network=1 … channel=4, all=5).
    */
  val AggregationLevels: Map[String, Int] =
    Map("network" -> 1, "station" -> 2, "location" -> 3, "channel" -> 4, "all" -> 5)

  /** Grouping columns for a named aggregation level. */
  def groupingColumns(level: String): Seq[String] = {
    val order = Seq("network", "station", "location", "channel")
    AggregationLevels(level) match {
      case 5 => Seq.empty
      case n => order.take(n)
    }
  }

  /** Channel-level filter. Time kwargs act on start_date/end_date (the
    * reference's start_date/end_date aliasing, `utils/pd.py:440-442`);
    * bounds are strict like every min_/max_ kwarg.
    */
  def getStations(df: DataFrame, q: StationQuery): DataFrame = {
    var out = df
    Seq("network" -> q.network, "station" -> q.station,
        "location" -> q.location, "channel" -> q.channel).foreach {
      case (_, "*") =>
      case (c, pat) if Fnmatch.isLiteral(pat) => out = out.filter(col(c) === pat)
      case (c, pat) => out = out.filter(Fnmatch.matches(col(c), pat))
    }
    q.startBefore.foreach(v => out = out.filter(col("start_date") < v))
    q.startAfter.foreach(v => out = out.filter(col("start_date") > v))
    q.endBefore.foreach(v => out = out.filter(col("end_date") < v))
    q.endAfter.foreach(v => out = out.filter(col("end_date") > v))
    q.minLatitude.foreach(v => out = out.filter(col("latitude") > v))
    q.maxLatitude.foreach(v => out = out.filter(col("latitude") < v))
    q.minLongitude.foreach(v => out = out.filter(col("longitude") > v))
    q.maxLongitude.foreach(v => out = out.filter(col("longitude") < v))
    out
  }

  /** Station summary from a traces/segments table — the reference's
    * stream→stations derivation (obsplus `stations/pd.py:111-128`):
    * group by NSLC, `start_date` = min(starttime), `end_date` =
    * max(endtime), then conform to the stations schema (coordinates
    * are unknowable from traces → null). One partial-aggregated
    * groupBy — no join, no collect.
    */
  def fromTraces(traces: DataFrame): DataFrame = {
    val agg = traces
      .groupBy("network", "station", "location", "channel")
      .agg(min("starttime").as("start_date"),
           max("endtime").as("end_date"))
    Schemas.conformTo(
      agg.withColumn("seed_id", Schemas.seedId(
        col("network"), col("station"), col("location"), col("channel"))),
      Schemas.stations)
  }

  /** The reference's NRL response attachment
    * (`utils/stations.py:53-146, 330`: `_update_nrl_response` keyed by
    * `datalogger_keys`/`sensor_keys`) re-expressed offline: the
    * Nominal Response Library becomes a LOCAL lookup table
    * `(datalogger_keys, sensor_keys, response)` broadcast-joined onto
    * the channel table — no network client, no per-channel lookup
    * loop. Channels without keys keep a null response; with
    * `requireMatch` a keyed channel that resolves no response fails
    * the scan (the reference raises when NRL can't resolve).
    */
  def attachResponses(channels: DataFrame, responses: DataFrame,
                      requireMatch: Boolean = false): DataFrame = {
    val resp = broadcast(responses
      .select(col("datalogger_keys"), col("sensor_keys"), col("response")))
    val joined = channels.join(resp,
      Seq("datalogger_keys", "sensor_keys"), "left")
    if (!requireMatch) joined
    else joined.withColumn("response",
      when(col("datalogger_keys").isNotNull && col("sensor_keys").isNotNull
          && col("response").isNull,
        raise_error(concat(lit("no response for keys: "),
          col("datalogger_keys").cast("string"), lit(" / "),
          col("sensor_keys").cast("string"))))
        .otherwise(col("response")))
  }

  /** Rebuild the nested inventory: one row per network with
    * station structs each holding their channel structs — two
    * `collect_list(struct)` groupBys, deterministic ordering via
    * array_sort on the struct keys. A `response` column (from
    * [[attachResponses]]) rides inside the channel struct.
    */
  def toInventory(channels: DataFrame): DataFrame = {
    val chCols =
      Seq("location", "channel", "seed_id", "sample_rate",
        "start_date", "end_date") ++
        (if (channels.columns.contains("response")) Seq("response") else Nil)
    val stationLevel = channels
      .groupBy("network", "station")
      .agg(
        first("latitude").as("latitude"),
        first("longitude").as("longitude"),
        array_sort(collect_list(struct(chCols.map(col): _*))).as("channels"))
    stationLevel.groupBy("network")
      .agg(array_sort(collect_list(struct(
        col("station"), col("latitude"), col("longitude"),
        col("channels")))).as("stations"))
  }

  /** Flatten a nested inventory back to the channel-level table —
    * explode with parent context carried along (the generator-shaped
    * tree→rows extraction of `dfextractor.py:158-189`).
    */
  def flatten(inventory: DataFrame): DataFrame = {
    val exploded = inventory
      .select(col("network"), explode(col("stations")).as("st"))
      .select(col("network"), col("st.station").as("station"),
        col("st.latitude").as("latitude"), col("st.longitude").as("longitude"),
        explode(col("st.channels")).as("ch"))
    val hasResponse = exploded.select("ch.*").columns.contains("response")
    exploded.select(Seq(col("network"), col("station"),
      col("ch.location").as("location"), col("ch.channel").as("channel"),
      col("ch.seed_id").as("seed_id"),
      col("latitude"), col("longitude"),
      col("ch.sample_rate").as("sample_rate"),
      col("ch.start_date").as("start_date"),
      col("ch.end_date").as("end_date")) ++
      (if (hasResponse) Seq(col("ch.response").as("response")) else Nil): _*)
  }

  /** JSON round trip of the nested inventory (catalog↔JSON analog,
    * obsplus `events/json.py`).
    */
  def toJson(inventory: DataFrame): DataFrame =
    inventory.select(col("network"),
      to_json(struct(col("network"), col("stations"))).as("json"))

  def fromJson(jsonDf: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    jsonDf.select(from_json(col("json"), schema).as("o")).select("o.*")
}

/** [[graft.core.StationClient]] over a channel-level table — the same
  * protocol a remote FDSN adapter would implement, so `getStations`
  * callers can't tell a local table from a data center.
  */
final class StationBank(channels: DataFrame) extends graft.core.StationClient {
  def getStations(q: StationQuery): DataFrame = Stations.getStations(channels, q)
}
