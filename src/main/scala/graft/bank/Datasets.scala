package graft.bank

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's three named test datasets re-expressed as
  * registered [[DataBundle]] specs — the entry-point discovery surface
  * (`datasets/bingham_test.py:20-84`, `datasets/ta_test.py:12-44`,
  * `datasets/crandall_test.py:19-63`) proven end to end: a user asks
  * for a dataset BY NAME, the bundle fetches once into the shared
  * cache, every load hash-verifies the manifest, and the three bank
  * clients come back ready to query.
  *
  * Shape parameters are lifted from the reference's public class
  * constants (names, versions, geometry, windows, channel sets). The
  * fetch hooks are the OFFLINE transport: a deterministic synthesizer
  * writes archives of exactly those shapes through the engine's own
  * sinks (real miniSEED segments, event-bank upsert, station parquet).
  * A deployment holding the real archives registers the same names
  * with a copy-from-local-tree hook instead — the hook is the
  * transport seam, everything else (cache, manifest, versioning,
  * clients) is shared.
  */
object Datasets {

  /** Register bingham_test, ta_test and crandall_test. Idempotent —
    * last registration wins in the [[DataBundle]] registry.
    */
  def registerAll(spark: SparkSession): Unit = {
    DataBundle.register(DataBundle.BundleSpec(
      "bingham_test", "0.1.0", bingham(spark, _)))
    DataBundle.register(DataBundle.BundleSpec(
      "ta_test", "0.0.0", ta(spark, _)))
    DataBundle.register(DataBundle.BundleSpec(
      "crandall_test", "0.0.1", crandall(spark, _)))
  }

  private val NsPerSec = 1_000_000_000L
  /** ~degrees per km (the reference's kilometers2degrees). */
  private def km2deg(km: Double): Double = km / 111.19

  // ---------------------------------------------------------- bingham

  /** Bingham Canyon (`bingham_test.py:20-44`): v0.1.0, events around
    * the pit center (40.53829, -112.149506), stations within 20 km,
    * waveform windows −10 s…+60 s per event, HH[ZNE] 100 Hz first in
    * the reference's channel priorities.
    */
  private def bingham(spark: SparkSession, dir: Path): Unit = {
    val t0 = 1365552000L * NsPerSec // 2013-04-10, the Manefay slide day
    val (lat0, lon0, maxKm) = (40.53829, -112.149506, 20.0)
    val events = eventFrame(spark, n = 5, idPrefix = "bingham",
      t0 = t0, dtNs = 3600L * NsPerSec, lat0 = lat0, lon0 = lon0,
      maxKm = maxKm, depth0 = 100.0, mag0 = 1.2)
    val stations = stationFrame(spark, net = "UU", staPrefix = "BGU",
      nSta = 6, chans = Seq("HHZ", "HHN", "HHE"), lat0 = lat0, lon0 = lon0,
      maxKm = maxKm, startNs = t0 - 86400L * NsPerSec)
    synthBundle(spark, dir, events, stations,
      preSec = 10, postSec = 60, periodNs = 10_000_000L) // 100 Hz
  }

  // --------------------------------------------------------- crandall

  /** Crandall Canyon (`crandall_test.py:19-44`): v0.0.1, collapse days
    * 2007-08-06…10, center (39.462, -111.228), regional stations to
    * 150 km, −10 s…+60 s windows (the reference uses 40 Hz BH
    * channels regionally).
    */
  private def crandall(spark: SparkSession, dir: Path): Unit = {
    val t0 = 1186358400L * NsPerSec // 2007-08-06
    val (lat0, lon0, maxKm) = (39.462, -111.228, 150.0)
    val events = eventFrame(spark, n = 6, idPrefix = "crandall",
      t0 = t0, dtNs = 14400L * NsPerSec, lat0 = lat0, lon0 = lon0,
      maxKm = maxKm / 10, depth0 = 600.0, mag0 = 1.6)
    val stations = stationFrame(spark, net = "TA", staPrefix = "CC0",
      nSta = 8, chans = Seq("BHZ", "BHN", "BHE"), lat0 = lat0, lon0 = lon0,
      maxKm = maxKm, startNs = t0 - 30 * 86400L * NsPerSec)
    synthBundle(spark, dir, events, stations,
      preSec = 10, postSec = 60, periodNs = 25_000_000L) // 40 Hz
  }

  // --------------------------------------------------------------- ta

  /** TA test (`ta_test.py:12-44`): v0.0.0, two Transportable Array
    * stations (M11A, M14A), VH? very-long-period channels (0.1 Hz =
    * 10 s/sample), ten days 2007-02-15…25 archived in the reference's
    * one-hour chunks (`build_archive`, `make_time_chunks`).
    */
  private def ta(spark: SparkSession, dir: Path): Unit = {
    import spark.implicits._
    val start = 1171497600L * NsPerSec // 2007-02-15
    val hours = 10 * 24
    val stations = Seq("M11A", "M14A")
    val chans = Seq("VHZ", "VHN", "VHE")
    val periodNs = 10L * NsPerSec // 0.1 Hz
    val segs = spark.range(hours)
      .select(col("id").as("hour"))
      .crossJoin(stations.toDF("station"))
      .crossJoin(chans.toDF("channel"))
      .select(lit("TA").as("network"), col("station"), lit("").as("location"),
        col("channel"),
        (lit(start) + col("hour") * lit(3600L * NsPerSec)).as("starttime"),
        lit(periodNs).as("sampling_period"),
        transform(sequence(lit(0), lit(359)),
          i => ((i * 7 + length(col("channel")) + col("hour")) % 1000 - 500)
            .cast("double")).as("samples"))
    new WaveBank(spark, s"$dir/waveforms", segmentFormat = "mseed")
      .putWaveforms(segs)
    val chanDf = stations.flatMap(s => chans.map(c => (s, c))).toDF("sta", "cha")
      .select(lit("TA").as("network"), col("sta").as("station"),
        lit("").as("location"), col("cha").as("channel"),
        concat_ws(".", lit("TA"), col("sta"), lit(""), col("cha")).as("seed_id"),
        (lit(34.95) + length(col("sta")).cast("double") / 100).as("latitude"),
        lit(-106.46).as("longitude"),
        lit(start - 365L * 86400L * NsPerSec).as("start_date"),
        lit(null).cast("long").as("end_date"))
    chanDf.write.mode("overwrite").parquet(s"$dir/stations")
  }

  // ---------------------------------------------------------- shared

  /** n deterministic events around (lat0, lon0): times t0 + i·dt, a
    * small ring of epicenters inside `maxKm`.
    */
  private def eventFrame(spark: SparkSession, n: Int, idPrefix: String,
                         t0: Long, dtNs: Long, lat0: Double, lon0: Double,
                         maxKm: Double, depth0: Double,
                         mag0: Double): DataFrame = {
    val r = km2deg(maxKm) / 2
    spark.range(n).select(
      concat(lit(s"smi:local/$idPrefix/"), col("id")).as("event_id"),
      (lit(t0) + col("id") * lit(dtNs)).as("time"),
      (lit(lat0) + sin(col("id").cast("double")) * lit(r)).as("latitude"),
      (lit(lon0) + cos(col("id").cast("double")) * lit(r)).as("longitude"),
      (lit(depth0) + col("id").cast("double") * 10).as("depth"),
      (lit(mag0) + col("id").cast("double") / 10).as("magnitude"),
      lit("ML").as("magnitude_type"),
      (lit(t0) + col("id") * lit(dtNs)).as("updated"))
  }

  /** nSta stations on a deterministic ring inside `maxKm`, one channel
    * row per (station, channel).
    */
  private def stationFrame(spark: SparkSession, net: String,
                           staPrefix: String, nSta: Int, chans: Seq[String],
                           lat0: Double, lon0: Double, maxKm: Double,
                           startNs: Long): DataFrame = {
    import spark.implicits._
    val r = km2deg(maxKm) * 0.8
    spark.range(nSta).select(col("id"))
      .crossJoin(chans.toDF("channel"))
      .select(lit(net).as("network"),
        concat(lit(staPrefix), col("id") + 1).as("station"),
        lit("").as("location"), col("channel"),
        concat_ws(".", lit(net), concat(lit(staPrefix), col("id") + 1),
          lit(""), col("channel")).as("seed_id"),
        (lit(lat0) + sin(col("id").cast("double") + 0.5) * lit(r)).as("latitude"),
        (lit(lon0) + cos(col("id").cast("double") + 0.5) * lit(r)).as("longitude"),
        lit(startNs).as("start_date"),
        lit(null).cast("long").as("end_date"))
  }

  /** Write the three bundle sides: real-miniSEED waveform windows of
    * (−preSec…+postSec) around every event on every station channel —
    * the reference's per-event download restriction — plus the event
    * bank and the station parquet.
    */
  private def synthBundle(spark: SparkSession, dir: Path, events: DataFrame,
                          stations: DataFrame, preSec: Int, postSec: Int,
                          periodNs: Long): Unit = {
    val n = ((preSec + postSec).toLong * NsPerSec / periodNs).toInt
    val segs = events.select(col("event_id"), col("time"))
      .crossJoin(stations.select("network", "station", "location", "channel"))
      .select(col("network"), col("station"), col("location"), col("channel"),
        // second-aligned so every rate stays on the 100 µs BTIME grid
        ((col("time") - lit(preSec.toLong * NsPerSec))
          - (col("time") % lit(NsPerSec))).as("starttime"),
        lit(periodNs).as("sampling_period"),
        transform(sequence(lit(0), lit(n - 1)),
          i => ((i * 7 + length(col("station")) * 13 +
            length(col("event_id"))) % 1000 - 500).cast("double"))
          .as("samples"))
    new WaveBank(spark, s"$dir/waveforms", segmentFormat = "mseed")
      .putWaveforms(segs)
    new EventBank(spark, s"$dir/events").putEvents(events)
    stations.write.mode("overwrite").parquet(s"$dir/stations")
  }
}
