package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The nested (object-tree) event model — obsplus' Catalog → Event →
  * Pick/Magnitude hierarchy (`events/schema.py:148-620`) as typed case
  * classes over `ArrayType(StructType)` columns, with the two
  * directions of `DataFrameExtractor` (`dfextractor.py:158-189`):
  *
  *   - [[EventModel.nest]]: flat summary/pick/magnitude tables →
  *     `Dataset[EventTree]` (one shuffle per child table — a
  *     collect_list groupBy — plus the final equi joins)
  *   - [[EventModel.flatten]]: `Dataset[EventTree]` → the flat tables
  *     back (generator-shaped explode with parent context carried)
  *   - JSON round trip of the nested schema (`events/json.py` analog)
  *     via to_json/from_json — schema derives from the encoder, no
  *     hand-written parsing.
  *
  * Children are sorted by id inside each event so nest→flatten→nest is
  * deterministic (pandas extractors inherit file order; a distributed
  * build must impose one).
  *
  * This is the EXTRACTION-grade tree (the fields the flat summary
  * tables carry). Catalog-manipulation utilities
  * (duplicate/prune/strip/preferred) operate on the richer
  * [[EventOps.FullEvent]], which adds statuses, references and
  * preferred ids.
  */
object EventModel {

  case class PickNode(resource_id: String, time: Long, seed_id: String,
                      phase_hint: String)
  case class MagnitudeNode(resource_id: String, magnitude: Double,
                           magnitude_type: String)
  case class EventTree(event_id: String, time: Long, latitude: Double,
                       longitude: Double, depth: Double,
                       picks: Seq[PickNode], magnitudes: Seq[MagnitudeNode])

  /** Flat tables → nested trees. Events with no children get empty
    * arrays (not null), like an obspy Event with empty lists.
    */
  def nest(spark: SparkSession, events: DataFrame, picks: DataFrame,
           magnitudes: DataFrame): Dataset[EventTree] = {
    import spark.implicits._
    val p = picks
      .groupBy("event_id")
      .agg(sort_array(collect_list(struct(
        col("resource_id"), col("time"), col("seed_id"),
        col("phase_hint")))).as("picks"))
    val m = magnitudes
      .groupBy("event_id")
      .agg(sort_array(collect_list(struct(
        col("resource_id"), col("magnitude"),
        col("magnitude_type")))).as("magnitudes"))
    events.select("event_id", "time", "latitude", "longitude", "depth")
      .join(p, Seq("event_id"), "left")
      .join(m, Seq("event_id"), "left")
      .withColumn("picks", coalesce(col("picks"), array()))
      .withColumn("magnitudes", coalesce(col("magnitudes"), array()))
      .as[EventTree]
  }

  /** Nested trees → (events, picks, magnitudes) flat tables — the
    * tree→rows extraction: explode each child array with the parent
    * event_id carried along.
    */
  def flatten(trees: Dataset[EventTree]): (DataFrame, DataFrame, DataFrame) = {
    val events = trees.toDF()
      .select("event_id", "time", "latitude", "longitude", "depth")
    val picks = trees.toDF()
      .select(col("event_id"), explode(col("picks")).as("p"))
      .select(col("p.resource_id"), col("event_id"), col("p.time"),
        col("p.seed_id"), col("p.phase_hint"))
    val mags = trees.toDF()
      .select(col("event_id"), explode(col("magnitudes")).as("m"))
      .select(col("m.resource_id"), col("event_id"), col("m.magnitude"),
        col("m.magnitude_type"))
    (events, picks, mags)
  }

  /** One JSON document per event (nested children inline). */
  def toJson(spark: SparkSession, trees: Dataset[EventTree]): Dataset[String] = {
    import spark.implicits._
    trees.toDF().select(to_json(struct(col("*"))).as("json")).as[String]
  }

  /** Parse [[toJson]] output back into trees — the schema comes from
    * the encoder, so model evolution can't drift from the parser.
    */
  def fromJson(spark: SparkSession, json: Dataset[String]): Dataset[EventTree] = {
    import spark.implicits._
    val schema = implicitly[org.apache.spark.sql.Encoder[EventTree]].schema
    json.toDF("json").select(from_json(col("json"), schema).as("e"))
      .select("e.*").as[EventTree]
  }
}
