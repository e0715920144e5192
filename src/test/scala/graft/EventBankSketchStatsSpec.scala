package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.bank.EventBank
import graft.operators.Sketches

/** The catalog sketch sidecar (round 11): putEvents rebuilds per-day
  * partials from the resolved catalog; sketchStats answers from
  * kilobytes; appendEvents (merge-on-read) stales the marker and the
  * next read rebuilds; estimatedEventCount is the planner probe.
  */
class EventBankSketchStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-evsketch").toString

  private val T0 = 1_600_000_000_000_000_000L
  private val HourNs = 3_600_000_000_000L
  private val DayNs = 86_400_000_000_000L

  /** `n` events across `hours` hour-slots; 1-in-7 has no magnitude,
    * authors cycle through 5 values.
    */
  private def events(ids: Range): DataFrame =
    ids.map { i =>
      (s"ev$i", T0 + (i % 72) * HourNs,
        if (i % 7 == 0) None else Some((i % 50) / 10.0),
        s"auth${i % 5}", i.toLong)
    }.toDF("event_id", "time", "magnitude", "author", "updated")

  /** From-scratch resketch of the resolved catalog, same parameters. */
  private def direct(bank: EventBank): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    // readIndex restores sentinels to null; this corpus has none
    bank.readIndex().select(
        floor(col("time") / lit(DayNs)).cast("long").as("day"),
        coalesce(col("author"), lit("")).as("author"),
        round(col("magnitude") * 1000).cast("long").as("mag_milli"))
      .groupBy("day")
      .agg(count(lit(1)).as("d_events"),
        Sketches.kmvSketch(expr("md5_long60(author)"), bank.statsAuthorK)
          .as("d_author"),
        expr("quantile_sketch512(mag_milli) FILTER (WHERE mag_milli IS NOT NULL)")
          .as("d_mag"),
        Sketches.freqSketch(col("author"), bank.statsAuthorK).as("d_top"))
  }

  private def assertMatches(bank: EventBank): Unit = {
    val rows = bank.sketchStats().join(direct(bank), "day").select(
        (col("n_events") === col("d_events")).as("c_ok"),
        (col("author_sk") === col("d_author")).as("a_ok"),
        (col("mag_sk") === col("d_mag")).as("m_ok"),
        (col("author_top") === col("d_top")).as("t_ok"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(0), s"counts drifted: $r")
      assert(r.getBoolean(1), s"author KMV != from-scratch: $r")
      assert(r.getBoolean(2), s"magnitude quantile != from-scratch: $r")
      assert(r.getBoolean(3), s"author top-k != from-scratch: $r")
    }
  }

  test("putEvents stamps the sidecar; upserts keep it on the resolved catalog") {
    val root = tmp()
    val bank = new EventBank(spark, root)
    bank.putEvents(events(0 until 200))
    assertMatches(bank)
    // upsert 50 of them with NEW times (moves them a day later) plus
    // 40 new events: the sidecar must describe the RESOLVED catalog
    val upd = events(0 until 50)
      .withColumn("time", col("time") + lit(DayNs))
      .withColumn("updated", col("updated") + 1000)
      .unionByName(events(200 until 240))
    bank.putEvents(upd)
    assert(bank.readIndex().count() == 240)
    assertMatches(bank)
    // null magnitudes stayed OUT of the quantile sketch: per-day sketch
    // n equals the count of events WITH a magnitude
    val magN = bank.sketchStats()
      .select(col("day"), Sketches.quantileN(col("mag_sk")).as("n"))
    val expected = bank.readIndex()
      .filter(col("magnitude").isNotNull)
      .groupBy(floor(col("time") / lit(DayNs)).cast("long").as("day"))
      .agg(count(lit(1)).as("e"))
    assert(magN.join(expected, "day").filter(col("n") =!= col("e"))
      .isEmpty, "null magnitudes leaked into the quantile sketch")
  }

  test("sketchStats reads kilobytes on the consistent path (no catalog scan) and short-circuits empty banks") {
    val root = tmp()
    val bank = new EventBank(spark, root)
    // fresh bank: correct empty frame, no throw
    assert(bank.sketchStats().isEmpty)
    bank.putEvents(events(0 until 120))
    val plan = bank.sketchStats().queryExecution.executedPlan.toString
    assert(!plan.contains(bank.indexPath),
      s"consistent-path read must not scan the catalog:\n$plan")
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"expected 1 FileScan, got $scans:\n$plan")
  }

  test("merge-on-read appendEvents stales the marker; next read rebuilds from the RESOLVED catalog") {
    val root = tmp()
    val bank = new EventBank(spark, root, mergeOnRead = true)
    bank.putEvents(events(0 until 100))
    assertMatches(bank)
    // append a delta that SUPERSEDES 30 events (newer updated, shifted
    // time) and adds 20: partials cannot express replacement — the
    // sidecar must rebuild, not over-count
    bank.appendEvents(events(0 until 30)
      .withColumn("time", col("time") + lit(DayNs))
      .withColumn("updated", col("updated") + 1000)
      .unionByName(events(100 until 120)))
    val total = bank.sketchStats().agg(sum("n_events")).head().getLong(0)
    assert(total == 120, s"sidecar reports $total of 120 resolved events")
    assertMatches(bank)
    // compact preserves the resolved catalog: marker re-stamped, and a
    // subsequent read needs no rebuild
    bank.compact()
    val listingBefore = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(bank.statsSketchPath))
      .map(s => (s.getPath.getName, s.getModificationTime)).toSeq.sorted
    assertMatches(bank)
    val listingAfter = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(bank.statsSketchPath))
      .map(s => (s.getPath.getName, s.getModificationTime)).toSeq.sorted
    assert(listingBefore == listingAfter,
      "post-compact read must not rebuild a re-stamped sidecar")
  }

  test("deleted catalog: sketchStats answers empty, never the dead sidecar (phantom-estimate guard)") {
    val root = tmp()
    val bank = new EventBank(spark, root)
    bank.putEvents(events(0 until 100))
    assert(bank.estimatedEventCount(T0, T0 + 72 * HourNs) == 100L)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(bank.indexPath), true)
    val fresh = new EventBank(spark, root)
    assert(fresh.sketchStats().isEmpty,
      "a deleted catalog's leftover sidecar must not serve as live stats")
    assert(fresh.estimatedEventCount(T0, T0 + 72 * HourNs) == 0L)
  }

  test("estimatedEventCount: sidecar-only day-granular estimate matches the catalog") {
    val root = tmp()
    val bank = new EventBank(spark, root, txIndex = true)
    bank.putEvents(events(0 until 300)) // 72 hour-slots → 4 days
    // a full-coverage window: estimate == exact count
    assert(bank.estimatedEventCount(T0, T0 + 72 * HourNs) == 300L)
    // a one-day window: day-granular upper bound equals that day's count
    val day0 = bank.readIndex()
      .filter(floor(col("time") / lit(DayNs)).cast("long")
        === Math.floorDiv(T0, DayNs))
      .count()
    assert(bank.estimatedEventCount(T0, T0 + 1) == day0)
  }
}
