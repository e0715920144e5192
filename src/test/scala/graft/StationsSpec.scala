package graft

import org.apache.spark.sql.functions._
import graft.stations.{StationBank, StationQuery, Stations}

class StationsSpec extends SparkSpec {
  import spark.implicits._

  private def channels = Seq(
    ("N1", "S1", "", "BHZ", "N1.S1..BHZ", 10.0, 20.0, 100.0, 0L, 1000L),
    ("N1", "S1", "", "BHN", "N1.S1..BHN", 10.0, 20.0, 100.0, 0L, 1000L),
    ("N1", "S2", "00", "HHZ", "N1.S2.00.HHZ", 11.0, 21.0, 50.0, 500L, 2000L),
    ("N2", "S3", "", "BHZ", "N2.S3..BHZ", -5.0, 100.0, 25.0, 0L, 2000L)
  ).toDF("network", "station", "location", "channel", "seed_id",
         "latitude", "longitude", "sample_rate", "start_date", "end_date")

  test("getStations: glob + strict time/geo kwargs") {
    assert(Stations.getStations(channels, StationQuery(channel = "BH?")).count() == 3)
    assert(Stations.getStations(channels,
      StationQuery(startAfter = Some(0L))).count() == 1)  // strict >
    assert(Stations.getStations(channels,
      StationQuery(minLatitude = Some(10.0))).count() == 1) // strict >
    assert(Stations.getStations(channels,
      StationQuery(network = "N1", endBefore = Some(1500L))).count() == 2)
  }

  test("inventory round trip: channel table → nested → flatten") {
    val inv = Stations.toInventory(channels)
    assert(inv.count() == 2) // two networks
    val flat = Stations.flatten(inv)
    assert(flat.count() == 4)
    val got = flat.orderBy("seed_id").select("seed_id").as[String].collect()
    assert(got.toSeq == Seq("N1.S1..BHN", "N1.S1..BHZ", "N1.S2.00.HHZ", "N2.S3..BHZ"))
  }

  test("inventory JSON round trip preserves the tree") {
    val inv = Stations.toInventory(channels)
    val json = Stations.toJson(inv)
    val back = Stations.fromJson(json, inv.schema)
    assert(Stations.flatten(back).count() == 4)
    assert(back.select("network").as[String].collect().toSet == Set("N1", "N2"))
  }

  test("NRL-style response attachment rides the inventory round trip") {
    // channels with NRL keys (two share a response), one without
    val keyed = channels
      .withColumn("datalogger_keys",
        when(col("station") =!= "S3",
          array(lit("REF TEK"), lit("RT 130"), lit("1"), lit("40"))))
      .withColumn("sensor_keys",
        when(col("station") =!= "S3",
          array(lit("Nanometrics"), lit("Trillium 120"))))
    val responses = Seq(
      (Seq("REF TEK", "RT 130", "1", "40"),
        Seq("Nanometrics", "Trillium 120"), "poles-zeros:pz-1")
    ).toDF("datalogger_keys", "sensor_keys", "response")
    val attached = Stations.attachResponses(keyed, responses)
    val flat = Stations.flatten(Stations.toInventory(attached))
    assert(flat.columns.contains("response"))
    val byStation = flat.select("station", "response").as[(String, Option[String])]
      .collect().toMap
    assert(byStation("S1").contains("poles-zeros:pz-1"))
    assert(byStation("S2").contains("poles-zeros:pz-1"))
    assert(byStation("S3").isEmpty) // no keys: null response, no error
    // requireMatch: a keyed channel with no matching response fails fast
    val e = intercept[Exception] {
      Stations.attachResponses(keyed,
          responses.withColumn("sensor_keys", array(lit("other"))),
          requireMatch = true)
        .collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("no response for keys"), chain)
    // responses survive JSON serialization of the tree too
    val inv = Stations.toInventory(attached)
    val back = Stations.fromJson(Stations.toJson(inv), inv.schema)
    assert(Stations.flatten(back).filter(col("response").isNotNull).count() == 3)
  }

  test("StationBank implements the StationClient protocol") {
    val client: graft.core.StationClient = new StationBank(channels)
    assert(client.getStations(StationQuery(network = "N1")).count() ==
      Stations.getStations(channels, StationQuery(network = "N1")).count())
  }
}
