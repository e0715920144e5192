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

  test("corpus-pipeline verbs chain: redact -> dedup -> pack") {
    import graft.syntax._
    val docs = Seq(
      (1L, "hello a@b.co world one two"),
      (2L, "hello  a@b.co  world one two"), // ws-dup of 1 after redaction
      (3L, "three four five six")
    ).toDF("doc_id", "text")
    val out = docs.redactPii("text")
      .dedupExactKeepers("text", "doc_id")
      .packTokens("text", org.apache.spark.sql.functions.lit(0),
        org.apache.spark.sql.functions.col("doc_id"), budget = 8)
      .select("doc_id", "text", "tok_offset", "bin")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L)) // doc 2 deduped away
    assert(out(0)._2 == "hello <EMAIL> world one two")
    assert(out.map(_._3).toSeq == Seq(0L, 5L)) // offsets tile
  }
}
