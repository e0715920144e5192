package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geodesic helpers — the reference's `SpatialCalculator` /
  * `map_longitudes` / circular-search machinery (obsplus
  * `utils/geodetics.py:160-245`, `events/get_events.py:50-145`).
  *
  * Distances/azimuths are composed from built-in trig `Column`s so the
  * whole computation stays inside whole-stage codegen — no UDF in the
  * hot path. Haversine on the mean-Earth sphere (R = 6371008.8 m) is
  * the engine's distance kernel; the reference's WGS84 Vincenty differs
  * by <0.5 % which callers can correct with a geodesic UDF where
  * survey-grade accuracy matters.
  */
object Geo {

  val EarthRadiusM = 6371008.8
  /** Mean degree length used by `kilometers2degrees` (obspy parity). */
  val KmPerDeg = 111.19492664455873 // 2*pi*R/360 / 1000

  /** Great-circle distance in meters (haversine). */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1) / 2.0
    val dlon = radians(lon2 - lon1) / 2.0
    val a = pow(sin(dlat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon), 2.0)
    lit(2.0 * EarthRadiusM) * asin(sqrt(a))
  }

  /** Initial bearing (azimuth) in degrees [0, 360). */
  def initialBearingDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlon = radians(lon2 - lon1)
    val y = sin(dlon) * cos(radians(lat2))
    val x = cos(radians(lat1)) * sin(radians(lat2)) -
      sin(radians(lat1)) * cos(radians(lat2)) * cos(dlon)
    val deg = degrees(atan2(y, x))
    deg - lit(360.0) * floor(deg / 360.0)
  }

  /** Wrap any longitude into [-180, 180) — obsplus `map_longitudes`
    * (`utils/geodetics.py:223-245`): ((lon+180) mod 360) - 180 with
    * floored modulo, exact for the double grid used.
    */
  def wrapLongitude(lon: Column): Column =
    lon - lit(360.0) * floor((lon + lit(180.0)) / lit(360.0))

  def kilometers2degrees(km: Double): Double = km / KmPerDeg

  /** Bounding-box predicate with the reference's dateline rewrite
    * (obsplus `utils/bank.py:349-363`): if the wrapped min longitude
    * exceeds the max, the box crosses ±180 and the longitude condition
    * becomes an OR of the two half-boxes. Lat/lon bounds push down to
    * parquet min/max stats either way.
    */
  def bboxPredicate(latCol: Column, lonCol: Column,
                    minLat: Double, maxLat: Double,
                    minLon: Double, maxLon: Double): Column = {
    val latOk = latCol >= lit(minLat) && latCol <= lit(maxLat)
    val lonOk =
      if (minLon > maxLon) lonCol >= lit(minLon) || lonCol <= lit(maxLon)
      else lonCol >= lit(minLon) && lonCol <= lit(maxLon)
    latOk && lonOk
  }

  /** Coarse bounding box for a radius search: latitude half-width =
    * 1.2× the radius in degrees; longitude half-width additionally
    * widened by 1/cos(closest-to-pole latitude in the box) — a fixed
    * factor under-covers beyond ~33° latitude. Returns None for the
    * longitude bounds when they would wrap the whole globe (box spans a
    * pole or the radius covers every longitude) — the caller must then
    * skip the longitude constraint entirely rather than emit a wrapped
    * box that selects the circle's complement.
    */
  def radiusBbox(lat0: Double, lon0: Double, maxM: Double)
      : (Double, Double, Option[(Double, Double)]) = {
    val degR = kilometers2degrees(maxM / 1000.0) * 1.2
    val minLat = math.max(lat0 - degR, -90.0)
    val maxLat = math.min(lat0 + degR, 90.0)
    val worstLat = math.min(math.max(math.abs(lat0) + degR, 0.0), 89.0)
    val lonHalf = degR / math.cos(math.toRadians(worstLat))
    val lonBounds =
      if (maxLat >= 90.0 || minLat <= -90.0 || lonHalf >= 180.0) None
      else Some((wrapLonScalar(lon0 - lonHalf), wrapLonScalar(lon0 + lonHalf)))
    (minLat, maxLat, lonBounds)
  }

  /** Circular (radius) search — obsplus `get_events.py:50-145`: a
    * coarse bounding box (see [[radiusBbox]]) prefilters (cheap,
    * pushdown-friendly), then the exact distance refines with STRICT
    * inequalities minM < d < maxM. Returns df with `dist_m` appended.
    */
  def radiusSearch(df: DataFrame, latCol: String, lonCol: String,
                   lat0: Double, lon0: Double,
                   minM: Double, maxM: Double): DataFrame = {
    val (minLat, maxLat, lonBounds) = radiusBbox(lat0, lon0, maxM)
    val latOk = col(latCol) >= lit(minLat) && col(latCol) <= lit(maxLat)
    val coarse = lonBounds match {
      case Some((lo, hi)) =>
        df.filter(latOk && (
          if (lo > hi) col(lonCol) >= lit(lo) || col(lonCol) <= lit(hi)
          else col(lonCol) >= lit(lo) && col(lonCol) <= lit(hi)))
      case None => df.filter(latOk)
    }
    coarse
      .withColumn("dist_m",
        haversineMeters(col(latCol), col(lonCol), lit(lat0), lit(lon0)))
      .filter(col("dist_m") > lit(minM) && col("dist_m") < lit(maxM))
  }

  def wrapLonScalar(lon: Double): Double =
    lon - 360.0 * math.floor((lon + 180.0) / 360.0)

  /** Duplicate-id coordinate guard — the reference errors when the same
    * station/event id appears with different coordinates
    * (`geodetics.py:115-131`). Returns the offending ids.
    */
  def duplicateCoordIds(df: DataFrame, idCol: String,
                        latCol: String, lonCol: String): DataFrame =
    df.groupBy(col(idCol))
      .agg(countDistinct(col(latCol), col(lonCol)).as("n_coords"))
      .filter(col("n_coords") > 1)

  /** WGS84 inverse geodesic (Vincenty) — survey-grade distance for the
    * reference's `gps2dist_azimuth` parity (`geodetics.py:9-10` WGS84
    * A/F). Scala UDF (iterative; not expressible as builtin columns);
    * prefer `haversineMeters` on hot paths, this where the ~0.3%
    * spheroid correction matters.
    */
  val vincentyMeters: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (lat1: Double, lon1: Double, lat2: Double, lon2: Double) =>
        vincentyScalar(lat1, lon1, lat2, lon2))

  def vincentyScalar(lat1: Double, lon1: Double,
                     lat2: Double, lon2: Double): Double = {
    val a = 6378137.0; val f = 1.0 / 298.257223563; val b = (1 - f) * a
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    val u1 = math.atan((1 - f) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1 - f) * math.tan(math.toRadians(lat2)))
    val ell = math.toRadians(lon2 - lon1)
    val (su1, cu1) = (math.sin(u1), math.cos(u1))
    val (su2, cu2) = (math.sin(u2), math.cos(u2))
    var lambda = ell; var iter = 0
    var cosSqAlpha = 0.0; var sinSigma = 0.0; var cosSigma = 0.0
    var sigma = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 200 && !converged) {
      val sl = math.sin(lambda); val cl = math.cos(lambda)
      sinSigma = math.sqrt(math.pow(cu2 * sl, 2) +
        math.pow(cu1 * su2 - su1 * cu2 * cl, 2))
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = su1 * su2 + cu1 * cu2 * cl
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cu1 * cu2 * sl / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0.0) 0.0
        else cosSigma - 2 * su1 * su2 / cosSqAlpha
      val c = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
      val prev = lambda
      lambda = ell + (1 - c) * f * sinAlpha * (sigma + c * sinSigma *
        (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - prev) < 1e-12) converged = true
      iter += 1
    }
    val uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    val bigA = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val dSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 * (cosSigma *
      (-1 + 2 * cos2SigmaM * cos2SigmaM) - bigB / 6 * cos2SigmaM *
      (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    b * bigA * (sigma - dSigma)
  }
}
