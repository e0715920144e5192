package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Geo

/** SURVEY.md §2.3 geodesic cross join + §2.2 circular search /
  * dateline rewrite / longitude wrap, on coordinates synthesized
  * deterministically from integer keys (the test tables carry no
  * lat/lon; identical integer arithmetic runs on the oracle side).
  */
object GeoQueries {

  // deterministic pseudo-coordinates
  private def stations(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(
      col("s_suppkey").as("station_id"),
      ((col("s_suppkey") * 7919) % 17000 / lit(100.0) - 85.0).as("lat1"),
      ((col("s_suppkey") * 104729) % 36000 / lit(100.0) - 180.0).as("lon1"))

  private def points(s: SparkSession, dir: String, maxKey: Int): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") <= maxKey)
      .select(
        col("c_custkey").as("point_id"),
        ((col("c_custkey") * 4409) % 17000 / lit(100.0) - 85.0).as("lat2"),
        ((col("c_custkey") * 9973) % 36000 / lit(100.0) - 180.0).as("lon2"))

  private val stSql = """
    SELECT s_suppkey AS station_id,
           ((s_suppkey * 7919) % 17000) / 100.0 - 85.0 AS lat1,
           ((s_suppkey * 104729) % 36000) / 100.0 - 180.0 AS lon1
    FROM supplier"""
  private def evSql(maxKey: Int) = s"""
    SELECT c_custkey AS point_id,
           ((c_custkey * 4409) % 17000) / 100.0 - 85.0 AS lat2,
           ((c_custkey * 9973) % 36000) / 100.0 - 180.0 AS lon2
    FROM customer WHERE c_custkey <= $maxKey"""

  // haversine in SQL with the exact operation order of Geo.haversineMeters
  private def distSql(lat1: String, lon1: String, lat2: String, lon2: String) = {
    val twoR = 2.0 * Geo.EarthRadiusM
    s"""($twoR * ASIN(SQRT(
        POW(SIN(RADIANS($lat2 - $lat1) / 2.0), 2.0) +
        COS(RADIANS($lat1)) * COS(RADIANS($lat2)) * POW(SIN(RADIANS($lon2 - $lon1) / 2.0), 2.0))))"""
  }
  private def azSql(lat1: String, lon1: String, lat2: String, lon2: String) =
    s"""(DEGREES(ATAN2(
         SIN(RADIANS($lon2 - $lon1)) * COS(RADIANS($lat2)),
         COS(RADIANS($lat1)) * SIN(RADIANS($lat2)) -
         SIN(RADIANS($lat1)) * COS(RADIANS($lat2)) * COS(RADIANS($lon2 - $lon1)))))"""

  val all: Seq[Q] = Seq(

    // ---- §2.3 geodesic cross join (SpatialCalculator shape): every
    //      station × every point, distance + azimuth, capped at 3000 km
    Q("q21_geodesic_crossjoin", (s, dir) => {
      val st = stations(s, dir)
      val ev = points(s, dir, 300)
      st.crossJoin(broadcast(ev))
        .withColumn("dist_m",
          Geo.haversineMeters(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
        .filter(col("dist_m") < 3000000.0)
        .select(col("station_id"), col("point_id"),
          round(col("dist_m") / 1000.0, 3).as("dist_km"),
          round({
            val d = Geo.initialBearingDeg(col("lat1"), col("lon1"), col("lat2"), col("lon2"))
            d
          }, 3).as("azimuth_deg"))
    }, Some(s"""
      WITH st AS ($stSql), ev AS (${evSql(300)})
      SELECT station_id, point_id,
             ROUND(${distSql("lat1", "lon1", "lat2", "lon2")} / 1000.0, 3) AS dist_km,
             ROUND(d.az - 360.0 * FLOOR(d.az / 360.0), 3) AS azimuth_deg
      FROM st CROSS JOIN ev
      CROSS JOIN LATERAL (SELECT ${azSql("lat1", "lon1", "lat2", "lon2")} AS az) d
      WHERE ${distSql("lat1", "lon1", "lat2", "lon2")} < 3000000.0"""),
      headline = true),

    // ---- §2.2 circular search: 1.2× bbox prefilter (dateline-crossing
    //      → OR rewrite) + exact refine with STRICT radius bounds
    Q("q22_radius_search", (s, dir) => {
      Geo.radiusSearch(points(s, dir, 1500), "lat2", "lon2",
          lat0 = 20.0, lon0 = 170.0, minM = 200000.0, maxM = 1500000.0)
        .select(col("point_id"), col("lat2"), col("lon2"),
                round(col("dist_m"), 3).as("dist_m"))
    }, {
      val (minLat, maxLat, lonBounds) = Geo.radiusBbox(20.0, 170.0, 1500000.0)
      val (minLon, maxLon) = lonBounds.get // wraps past 180 → OR rewrite
      val lonCond =
        if (minLon > maxLon) s"(lon2 >= $minLon OR lon2 <= $maxLon)"
        else s"(lon2 >= $minLon AND lon2 <= $maxLon)"
      Some(s"""
      WITH ev AS (${evSql(1500)})
      SELECT point_id, lat2, lon2,
             ROUND(${distSql("lat2", "lon2", "20.0", "170.0")}, 3) AS dist_m
      FROM ev
      WHERE lat2 >= $minLat AND lat2 <= $maxLat
        AND $lonCond
        AND ${distSql("lat2", "lon2", "20.0", "170.0")} > 200000.0
        AND ${distSql("lat2", "lon2", "20.0", "170.0")} < 1500000.0""")
    }),

    // ---- §2.8 longitude wrap custom cast (map_longitudes)
    Q("q23_longitude_wrap", (s, dir) => {
      val c = Tables.customer(s, dir)
      c.select(col("c_custkey"),
          ((col("c_custkey") * 37) % 720 - 360).cast("double").as("lon_raw"))
        .withColumn("lon_wrapped", Geo.wrapLongitude(col("lon_raw")))
    }, Some("""
      SELECT c_custkey,
             CAST((c_custkey * 37) % 720 - 360 AS DOUBLE) AS lon_raw,
             CAST((c_custkey * 37) % 720 - 360 AS DOUBLE)
               - 360.0 * FLOOR((CAST((c_custkey * 37) % 720 - 360 AS DOUBLE) + 180.0) / 360.0)
               AS lon_wrapped
      FROM customer"""))
  )
}
