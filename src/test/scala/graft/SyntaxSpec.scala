package graft

import org.apache.spark.sql.functions._
import graft.core.Schemas
import graft.functions.Geo
import graft.syntax._

class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("extension verbs: whereGlob, withSeedId, conformTo, overlapping") {
    val df = Seq(("N1", "S1", "", "BHZ", 0L, 10L), ("N1", "S2", "", "HHE", 5L, 20L))
      .toDF("network", "station", "location", "channel", "starttime", "endtime")
    assert(df.whereGlob("channel", "BH?").count() == 1)
    assert(df.whereGlob("channel", "*").count() == 2)
    assert(df.whereGlob("station", "S2").count() == 1)
    assert(df.withSeedId.select("seed_id").as[String].collect().toSet ==
      Set("N1.S1..BHZ", "N1.S2..HHE"))
    assert(df.overlapping(12L, 30L).count() == 1)
    assert(df.conformTo(Schemas.waveformIndex).columns.take(8).toSeq ==
      Schemas.waveformIndex.fieldNames.toSeq)
    assert(df.availabilityBy(Seq("network")).count() == 1)
  }

  test("vincenty: matches haversine within 0.5% and knowns") {
    // Paris ↔ London, WGS84 geodesic ≈ 343.9 km
    val v = Geo.vincentyScalar(48.8566, 2.3522, 51.5074, -0.1278)
    assert(math.abs(v - 343900) < 1500, v)
    assert(Geo.vincentyScalar(10.0, 20.0, 10.0, 20.0) == 0.0)
    // equator quarter-circumference
    val q = Geo.vincentyScalar(0.0, 0.0, 0.0, 90.0)
    assert(math.abs(q - 10018754.17) < 10.0, q)
    // UDF path
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a", "b", "c", "d")
      .select(Geo.vincentyMeters(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(math.abs(d - v) < 1e-6)
  }

  test("duplicate-coordinate guard flags conflicting ids") {
    val df = Seq(("x", 1.0, 2.0), ("x", 1.0, 2.0), ("y", 1.0, 2.0),
      ("y", 1.5, 2.0)).toDF("id", "lat", "lon")
    val bad = Geo.duplicateCoordIds(df, "id", "lat", "lon")
      .select("id").as[String].collect()
    assert(bad.toSeq == Seq("y"))
  }
}
