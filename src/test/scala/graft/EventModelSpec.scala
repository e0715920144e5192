package graft

import org.apache.spark.sql.functions._
import graft.core.EventModel
import graft.core.EventModel.{EventTree, MagnitudeNode, PickNode}

class EventModelSpec extends SparkSpec {
  import spark.implicits._

  private def flatFixtures = {
    val events = Seq(
      ("ev1", 1000L, 45.0, 7.0, 10.0),
      ("ev2", 2000L, 46.0, 8.0, 12.0),
      ("ev3", 3000L, 47.0, 9.0, 14.0) // no children
    ).toDF("event_id", "time", "latitude", "longitude", "depth")
    val picks = Seq(
      ("p2", "ev1", 1010L, "N1.S1..BHZ", "P"),
      ("p1", "ev1", 1005L, "N1.S2..BHZ", "P"),
      ("p3", "ev2", 2010L, "N1.S1..BHZ", "S")
    ).toDF("resource_id", "event_id", "time", "seed_id", "phase_hint")
    val mags = Seq(
      ("m1", "ev1", 3.2, "ML"),
      ("m2", "ev2", 4.1, "MW")
    ).toDF("resource_id", "event_id", "magnitude", "magnitude_type")
    (events, picks, mags)
  }

  test("nest builds sorted child arrays; empty children are empty arrays") {
    val (events, picks, mags) = flatFixtures
    val trees = EventModel.nest(spark, events, picks, mags)
      .collect().sortBy(_.event_id)
    assert(trees.length == 3)
    // children sorted by resource_id regardless of input order
    assert(trees(0).picks.map(_.resource_id) == Seq("p1", "p2"))
    assert(trees(0).magnitudes == Seq(MagnitudeNode("m1", 3.2, "ML")))
    assert(trees(2).picks.isEmpty && trees(2).magnitudes.isEmpty)
  }

  test("nest -> flatten round-trips the flat tables") {
    val (events, picks, mags) = flatFixtures
    val (e2, p2, m2) = EventModel.flatten(EventModel.nest(spark, events, picks, mags))
    assert(e2.orderBy("event_id").collect().toSeq ==
      events.orderBy("event_id").collect().toSeq)
    assert(p2.orderBy("resource_id").collect().toSeq ==
      picks.orderBy("resource_id").collect().toSeq)
    assert(m2.orderBy("resource_id").collect().toSeq ==
      mags.orderBy("resource_id").collect().toSeq)
  }

  test("nested JSON round trip preserves every tree") {
    val (events, picks, mags) = flatFixtures
    val trees = EventModel.nest(spark, events, picks, mags)
    val back = EventModel.fromJson(spark, EventModel.toJson(spark, trees))
    assert(back.collect().sortBy(_.event_id).toSeq ==
      trees.collect().sortBy(_.event_id).toSeq)
  }

  test("typed Dataset ops work on the tree (filter by child count)") {
    val (events, picks, mags) = flatFixtures
    val multi = EventModel.nest(spark, events, picks, mags)
      .filter((e: EventTree) => e.picks.length >= 2)
      .collect()
    assert(multi.map(_.event_id).toSeq == Seq("ev1"))
  }
}
