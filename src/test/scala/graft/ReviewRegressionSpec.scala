package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fnmatch, Geo}
import graft.operators.{MergeOps, TimeChunks, TraceStitch}
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.Point

/** Regressions for the round-1 code-review findings. */
class ReviewRegressionSpec extends SparkSpec {
  import spark.implicits._

  test("radiusSearch at high latitude keeps due-east in-radius points") {
    // 100 km east of (60, 0) is ~1.8 deg of longitude — beyond the
    // unwidened 1.08 deg box
    val pts = Seq((1L, 60.0, 1.6), (2L, 60.0, 10.0)).toDF("id", "lat", "lon")
    val hits = Geo.radiusSearch(pts, "lat", "lon", 60.0, 0.0,
      minM = 1.0, maxM = 100000.0).select("id").as[Long].collect()
    assert(hits.toSeq == Seq(1L))
  }

  test("radiusSearch with whole-earth radius returns everything") {
    val pts = Seq((1L, 0.0, 0.0), (2L, -80.0, 179.0), (3L, 45.0, -120.0))
      .toDF("id", "lat", "lon")
    val hits = Geo.radiusSearch(pts, "lat", "lon", 10.0, 20.0,
      minM = 0.0, maxM = 2.1e7).count()
    assert(hits == 3) // no wrapped-complement bbox dropping rows
  }

  test("stitch: segment nested inside an earlier longer one does not split the group") {
    val out = TraceStitch.mergeTraces(spark, Seq(
      ("N.S..Z", 10L, 0L, Array.fill(100)(1.0)),   // [0, 1000)
      ("N.S..Z", 10L, 100L, Array.fill(5)(9.0)),   // nested [100, 150)
      ("N.S..Z", 10L, 500L, Array.fill(10)(5.0))   // nested [500, 600)
    ).toDF("seed_id", "sampling_period", "starttime", "samples")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("endtime") == 1000L)
  }

  test("stitch: one-sample dropout marks NaN instead of failing the job") {
    val out = TraceStitch.mergeTraces(spark, Seq(
      ("N.S..Z", 10L, 0L, Array.fill(100)(1.0)),   // ends 1000
      ("N.S..Z", 10L, 1010L, Array.fill(10)(2.0))  // 1 missing sample at 1000
    ).toDF("seed_id", "sampling_period", "starttime", "samples")).collect()
    assert(out.length == 1) // same merge group (gap <= one period)
    val xs = out(0).getAs[scala.collection.Seq[Double]]("samples")
    assert(xs.length == 111 && xs(100).isNaN && !xs(99).isNaN && !xs(101).isNaN)
  }

  test("identityMerge treats null values as values, not missing keys") {
    val oldCat = Seq((1L, Option.empty[Double]), (2L, Some(2.0)), (3L, Option.empty[Double]))
      .toDF("k", "v")
    val newCat = Seq((1L, Some(42.0)), (2L, Option.empty[Double]), (3L, Option.empty[Double]))
      .toDF("k", "v")
    val m = MergeOps.identityMerge(oldCat, newCat, "k", "v")
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "updated", 2L -> "updated", 3L -> "unchanged"))
  }

  test("fnmatch: negated class with literal ] and literal ^") {
    def m(g: String, s: String) = s.matches(Fnmatch.translate(g))
    assert(m("[!]x]", "a") && !m("[!]x]", "]") && !m("[!]x]", "x"))
    assert(m("[]x]", "]") && m("[]x]", "x") && !m("[]x]", "a"))
    assert(m("[^a]", "^") && m("[^a]", "a") && !m("[^a]", "b")) // ^ literal per fnmatch
  }

  test("time chunks: window larger than range yields no chunks") {
    assert(TimeChunks.chunks(spark, 0L, 100L, duration = 200L, step = 50L).count() == 0)
  }

  test("wavebank getWaveforms normalizes request codes like the index") {
    val root = java.nio.file.Files.createTempDirectory("graft-nslc").toString
    val bank = new graft.bank.WaveBank(spark, root)
    bank.putWaveforms(Seq(("N1", "S1", "--", "BHZ", 0L, 10L, Array.fill(10)(1.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    // indexed location is "" (nullish "--" normalized); raw "--" request
    // must still match
    assert(bank.getWaveforms("N1", "S1", "--", "BHZ", 0L, 100L).count() == 1)
  }

  test("stateful sessionizer emits far-late events as late singletons") {
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Point]
    val q = SessionizeStream.sessionize(input.toDS(), tolNs = 10L)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    input.addData(Point("a", 100L), Point("a", 105L))
    q.processAllAvailable()
    input.addData(Point("a", 20L)) // far earlier than open [100,105]
    q.processAllAvailable()
    val rows = spark.table("late_sessions")
      .as[SessionizeStream.ClosedSession].collect()
    assert(rows.length == 1 && rows(0).seg_start == 20L && rows(0).n_members == 1L)
    q.stop()
  }
}
