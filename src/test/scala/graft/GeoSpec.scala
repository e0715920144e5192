package graft

import org.apache.spark.sql.functions._
import graft.functions.Geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("haversine: known distances within 0.5%") {
    // Paris (48.8566, 2.3522) ↔ London (51.5074, -0.1278) ≈ 343.5 km
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278))
      .toDF("a", "b", "c", "d")
      .select(Geo.haversineMeters(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(math.abs(d - 343500) < 2000)
  }

  test("haversine: zero for identical points, symmetric") {
    val df = Seq((10.0, 20.0)).toDF("lat", "lon")
    val z = df.select(Geo.haversineMeters(col("lat"), col("lon"),
      col("lat"), col("lon"))).as[Double].head()
    assert(z == 0.0)
  }

  test("bearing: due north/east from equator") {
    val df = Seq((0.0, 0.0)).toDF("lat", "lon")
    val north = df.select(Geo.initialBearingDeg(col("lat"), col("lon"),
      lit(10.0), lit(0.0))).as[Double].head()
    val east = df.select(Geo.initialBearingDeg(col("lat"), col("lon"),
      lit(0.0), lit(10.0))).as[Double].head()
    assert(math.abs(north - 0.0) < 1e-9)
    assert(math.abs(east - 90.0) < 1e-9)
  }

  test("wrapLongitude maps into [-180, 180)") {
    val vals = Seq(-360.0, -190.0, -180.0, 0.0, 180.0, 190.0, 360.0, 540.0)
    val wrapped = vals.toDF("lon")
      .select(Geo.wrapLongitude(col("lon"))).as[Double].collect()
    assert(wrapped.toSeq == Seq(0.0, 170.0, -180.0, 0.0, -180.0, -170.0, 0.0, -180.0))
  }

  test("dateline-crossing bbox becomes OR of half-boxes") {
    val pts = Seq((0.0, 175.0), (0.0, -175.0), (0.0, 0.0)).toDF("lat", "lon")
    val n = pts.filter(Geo.bboxPredicate(col("lat"), col("lon"),
      -10, 10, 170.0, -170.0)).count()
    assert(n == 2)
  }

  test("radiusSearch: strict bounds, bbox prefilter keeps correct points") {
    val pts = Seq((1L, 20.0, 170.0), (2L, 21.0, 170.0), (3L, 40.0, 170.0))
      .toDF("id", "lat", "lon")
    val hits = Geo.radiusSearch(pts, "lat", "lon", 20.0, 170.0,
      minM = 1000.0, maxM = 500000.0).select("id").as[Long].collect()
    assert(hits.toSeq == Seq(2L)) // self at d=0 excluded by strict min
  }
}
