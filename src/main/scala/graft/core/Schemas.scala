package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed output schemas + conformance — the reference's central dtype
  * dictionaries (obsplus `constants.py:45-302`) and the
  * `cast_dtypes`/`order_columns` enforcement (`utils/pd.py:152-235`):
  * missing columns are created null, wrong dtypes are coerced, required
  * columns come first and extras sort to the end.
  *
  * Times are LongType epoch-ns (the reference's int64-ns convention);
  * human-facing µs views derive via `nsToTimestamp`.
  */
object Schemas {

  /** Nullish NSLC spellings normalized to "" (obsplus
    * `utils/misc.py:325-376`, `constants.py:461`).
    */
  val NullishCodes: Seq[String] = Seq("None", "none", "null", "nan", "<NA>", "--")

  val waveformIndex: StructType = StructType(Seq(
    StructField("network", StringType),
    StructField("station", StringType),
    StructField("location", StringType),
    StructField("channel", StringType),
    StructField("starttime", LongType),
    StructField("endtime", LongType),
    StructField("sampling_period", LongType),
    StructField("path", StringType)))

  val eventSummary: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("time", LongType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("depth", DoubleType),
    StructField("magnitude", DoubleType),
    StructField("magnitude_type", StringType),
    // latest magnitude per type (events/pd.py:166-175, MAGNITUDE_COLUMN
    // types constants.py:493-497): last list element of that type
    StructField("local_magnitude", DoubleType),
    StructField("moment_magnitude", DoubleType),
    StructField("duration_magnitude", DoubleType),
    // origin-quality / creation-info block of EVENT_DTYPES
    // (constants.py:81-109, extraction events/pd.py:74-165)
    StructField("event_description", StringType),
    StructField("associated_phase_count", LongType),
    StructField("azimuthal_gap", DoubleType),
    StructField("horizontal_uncertainty", DoubleType),
    StructField("vertical_uncertainty", DoubleType),
    StructField("p_phase_count", LongType),
    StructField("s_phase_count", LongType),
    StructField("p_pick_count", LongType),
    StructField("s_pick_count", LongType),
    StructField("standard_error", DoubleType),
    StructField("used_phase_count", LongType),
    StructField("station_count", LongType),
    StructField("creation_time", LongType),
    StructField("version", StringType),
    StructField("updated", LongType),
    StructField("author", StringType),
    StructField("agency_id", StringType),
    StructField("path", StringType)))

  val picks: StructType = StructType(Seq(
    StructField("resource_id", StringType),
    StructField("event_id", StringType),
    StructField("time", LongType),
    StructField("seed_id", StringType),
    StructField("network", StringType),
    StructField("station", StringType),
    StructField("location", StringType),
    StructField("channel", StringType),
    StructField("phase_hint", StringType),
    StructField("onset", StringType),
    StructField("polarity", StringType),
    StructField("evaluation_status", StringType)))

  val stations: StructType = StructType(Seq(
    StructField("network", StringType),
    StructField("station", StringType),
    StructField("location", StringType),
    StructField("channel", StringType),
    StructField("seed_id", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("elevation", DoubleType),
    StructField("sample_rate", DoubleType),
    StructField("start_date", LongType),
    StructField("end_date", LongType)))

  /** Magnitudes table (obsplus `constants.py:239-261`). */
  val magnitudes: StructType = StructType(Seq(
    StructField("resource_id", StringType),
    StructField("event_id", StringType),
    StructField("magnitude", DoubleType),
    StructField("magnitude_type", StringType),
    StructField("origin_id", StringType),
    StructField("station_count", LongType),
    StructField("azimuthal_gap", DoubleType)))

  /** Amplitudes table (obsplus `constants.py:172-206`) — includes the
    * columns the validation rules consult (`filter_id`, the
    * time-window triple, `evaluation_status`); sources that don't
    * carry them conform with nulls.
    */
  val amplitudes: StructType = StructType(Seq(
    StructField("resource_id", StringType),
    StructField("event_id", StringType),
    StructField("generic_amplitude", DoubleType),
    StructField("amplitude_type", StringType),
    StructField("unit", StringType),
    StructField("period", DoubleType),
    StructField("snr", DoubleType),
    StructField("pick_id", StringType),
    StructField("filter_id", StringType),
    StructField("reference", LongType),
    StructField("time_begin", DoubleType),
    StructField("time_end", DoubleType),
    StructField("evaluation_status", StringType)))

  /** Station magnitudes table (obsplus `constants.py:209-236`):
    * per-station magnitude estimates with their amplitude/origin links
    * and NSLC.
    */
  val stationMagnitudes: StructType = StructType(Seq(
    StructField("resource_id", StringType),
    StructField("event_id", StringType),
    StructField("magnitude", DoubleType),
    StructField("station_magnitude_type", StringType),
    StructField("origin_id", StringType),
    StructField("amplitude_id", StringType),
    StructField("network", StringType),
    StructField("station", StringType),
    StructField("location", StringType),
    StructField("channel", StringType),
    StructField("seed_id", StringType)))

  /** Arrivals table (obsplus `constants.py:264-291`). */
  val arrivals: StructType = StructType(Seq(
    StructField("resource_id", StringType),
    StructField("event_id", StringType),
    StructField("origin_id", StringType),
    StructField("pick_id", StringType),
    StructField("phase", StringType),
    StructField("azimuth", DoubleType),
    StructField("distance", DoubleType),
    StructField("time_residual", DoubleType),
    StructField("time_weight", DoubleType)))

  val gaps: StructType = StructType(Seq(
    StructField("network", StringType),
    StructField("station", StringType),
    StructField("location", StringType),
    StructField("channel", StringType),
    StructField("gap_start", LongType),
    StructField("gap_end", LongType),
    StructField("gap_ns", LongType)))

  /** Custom logical casts applied during conform, keyed by column name
    * — the reference's OPS_DTYPE_FUNCS (`utils/pd.py:51-67`): NSLC
    * codes normalize + zero-pad, longitudes wrap into [-180, 180).
    */
  val defaultLogicalCasts: Map[String, Column => Column] = Map(
    "network" -> nslcNormalize _,
    "station" -> nslcNormalize _,
    "location" -> nslcNormalize _,
    "channel" -> nslcNormalize _,
    "longitude" -> ((c: Column) =>
      c - lit(360.0) * floor((c + lit(180.0)) / lit(360.0))))

  /** Conform `df` to `schema`: required columns first (created null if
    * absent, cast if mistyped, logical casts applied), extra columns
    * appended sorted by name.
    */
  def conformTo(df: DataFrame, schema: StructType,
                logicalCasts: Map[String, Column => Column] = defaultLogicalCasts)
      : DataFrame = {
    val present = df.columns.toSet
    val required = schema.fields.map { f =>
      if (present(f.name)) {
        val cast = col(f.name).cast(f.dataType)
        logicalCasts.get(f.name).fold(cast)(fn => fn(cast)).as(f.name)
      } else lit(null).cast(f.dataType).as(f.name)
    }
    val extras = df.columns.filterNot(schema.fieldNames.contains).sorted.map(col)
    df.select(required ++ extras: _*)
  }

  /** NSLC code normalization: nullish → "", integers zero-padded to two
    * chars (the reference turns numeric location codes into "01";
    * `_int_column_to_str`, `utils/pd.py:33-47`).
    */
  def nslcNormalize(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(s.isNull || s.isin(NullishCodes: _*), "")
      .when(s.rlike("^[0-9]$"), lpad(s, 2, "0"))
      .otherwise(s)
  }

  /** Scala-side mirror of [[nslcNormalize]] for driver-side code paths
    * (request building must normalize the same way the index did).
    */
  def nslcNormalizeString(s: String): String = {
    val t = if (s == null) "" else s.trim
    if (t.isEmpty || NullishCodes.contains(t)) ""
    else if (t.length == 1 && t.charAt(0).isDigit) "0" + t
    else t
  }

  /** seed_id = network.station.location.channel (obsplus
    * `get_seed_id_series`, `utils/pd.py:278-333`).
    */
  def seedId(net: Column, sta: Column, loc: Column, cha: Column): Column =
    concat_ws(".", net, sta, loc, cha)

  /** Split a seed_id back into NSLC columns. */
  def splitSeedId(seed: Column): Seq[(String, Column)] = {
    val parts = split(seed, "\\.")
    Seq("network" -> parts.getItem(0), "station" -> parts.getItem(1),
        "location" -> parts.getItem(2), "channel" -> parts.getItem(3))
  }

  /** ns long column → µs timestamp view (human-facing). Integer `div`
    * — double division would lose ns precision at 1.7e18.
    */
  def nsToTimestamp(colName: String): Column =
    timestamp_micros(expr(s"$colName div 1000"))

  /** NaT / ±∞ storage sentinels for epoch-ns time columns — the
    * reference's SMALLDT64/LARGEDT64 (`constants.py:342-343`: INT64
    * min + 5e9 / max − 5e9 ns). Null times round-trip through storage
    * as sentinels (`_time_cols_to_ints`/`_ints_to_time_columns`,
    * `utils/pd.py:123-149`) so min/max parquet stats and strict
    * compares keep working; an open-ended `end_date` reads as
    * [[LargeDt64]] "forever" (`fetcher.py:525-526`).
    */
  val SmallDt64: Long = Long.MinValue + 5_000_000_000L
  val LargeDt64: Long = Long.MaxValue - 5_000_000_000L

  /** Null → sentinel, for writing a time column to storage. */
  def timeToStorage(c: Column, openEnded: Boolean = false): Column =
    coalesce(c, lit(if (openEnded) LargeDt64 else SmallDt64))

  /** Sentinel → null, restoring on read (either sentinel). */
  def timeFromStorage(c: Column): Column =
    when(c === SmallDt64 || c === LargeDt64, lit(null).cast("long")).otherwise(c)
}
