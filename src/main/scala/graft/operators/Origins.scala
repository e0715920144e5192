package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `make_origins` (obsplus `utils/events.py:258-318`): give every
  * origin-less event a starting origin at its earliest acceptable
  * pick — time = first non-rejected P/p pick, location = that pick's
  * station coordinates from the inventory, fixed default depth.
  *
  * The reference loops events in Python and raises on the first event
  * without picks; here the whole catalog is ONE plan: a semi join to
  * the origin-less set, a first-pick window (min time, resource_id
  * tie-break — pandas' idxmin order is not a table property), and a
  * broadcast join to the channel table. Events with no acceptable
  * picks, or whose first pick's NSLC is absent from the inventory,
  * produce no row (callers can anti-join to find them — the
  * set-returning analog of the reference's ValidationError).
  */
object Origins {

  private val Nslc = Seq("network", "station", "location", "channel")

  def makeOrigins(originlessEvents: DataFrame, picks: DataFrame,
                  channels: DataFrame, depth: Double = 1.0,
                  phaseHints: Seq[String] = Seq("P", "p")): DataFrame = {
    val acceptable = picks
      .filter(coalesce(col("evaluation_status"), lit("")) =!= "rejected" &&
        col("phase_hint").isin(phaseHints: _*))
      .join(originlessEvents.select("event_id"), Seq("event_id"), "left_semi")
    val w = Window.partitionBy("event_id")
      .orderBy(col("time").asc, col("resource_id").asc)
    val firstPick = acceptable
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    // one row per NSLC ("first matching channel" made deterministic:
    // the minimum coordinate pair)
    val chan = channels
      .groupBy(Nslc.map(col): _*)
      .agg(min(struct(col("latitude"), col("longitude"))).as("c"))
      .select(Nslc.map(col) :+ col("c.latitude").as("latitude")
        :+ col("c.longitude").as("longitude"): _*)
    firstPick.join(broadcast(chan), Nslc, "inner")
      .select(col("event_id"), col("time"),
        col("latitude"), col("longitude"),
        lit(depth).as("depth"), lit(1L).as("time_fixed"))
  }
}
