package graft

import org.apache.spark.sql.functions._
import graft.operators.Intervals

/** Port of the reference's synthetic edge fixtures: gapped, overlapping
  * and out-of-order segments (obsplus `tests/conftest.py:433-481`).
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // key, start, end — one key with [0,10] [8,20] (overlap), [25,30]
  // (gap of 5), one contiguous key
  private def segs = Seq(
    ("a", 0L, 10L), ("a", 8L, 20L), ("a", 25L, 30L),
    ("b", 0L, 5L), ("b", 5L, 9L)
  ).toDF("k", "starttime", "endtime")

  test("availability spans min..max per key") {
    val a = Intervals.availability(segs, Seq("k")).orderBy("k").collect()
    assert(a(0).getLong(1) == 0L && a(0).getLong(2) == 30L && a(0).getLong(3) == 3L)
    assert(a(1).getLong(1) == 0L && a(1).getLong(2) == 9L)
  }

  test("gaps: overlap absorbed by running max, single true gap found") {
    val g = Intervals.gaps(segs, Seq("k"), minGap = 0L).collect()
    assert(g.length == 1)
    assert(g(0).getString(0) == "a")
    assert(g(0).getLong(1) == 20L && g(0).getLong(2) == 25L && g(0).getLong(3) == 5L)
  }

  test("gaps respect minGap threshold strictly") {
    assert(Intervals.gaps(segs, Seq("k"), minGap = 5L).count() == 0) // 20+5 !< 25
    assert(Intervals.gaps(segs, Seq("k"), minGap = 4L).count() == 1)
  }

  test("gap detection handles out-of-order input (sorts internally)") {
    val shuffled = Seq(("a", 25L, 30L), ("a", 0L, 10L), ("a", 8L, 20L))
      .toDF("k", "starttime", "endtime")
    val g = Intervals.gaps(shuffled, Seq("k"), 0L).collect()
    assert(g.length == 1 && g(0).getLong(1) == 20L)
  }

  test("segments sessionize across overlaps and split at gaps") {
    val s = Intervals.segments(segs, Seq("k"), tol = 0L)
      .orderBy("k", "session_id").collect()
    // a → two sessions: [0,20] (2 members), [25,30]; b → one [0,9]
    assert(s.length == 3)
    assert(s(0).getLong(2) == 0L && s(0).getLong(3) == 20L && s(0).getLong(4) == 2L)
    assert(s(1).getLong(2) == 25L && s(1).getLong(3) == 30L)
    assert(s(2).getLong(2) == 0L && s(2).getLong(3) == 9L && s(2).getLong(4) == 2L)
  }

  test("uptime = span - gaps with zero-fill for gapless keys") {
    val u = Intervals.uptime(segs, Seq("k"), minGap = 0L).orderBy("k").collect()
    assert(u(0).getLong(4) == 5L)   // gap_total a
    assert(u(0).getLong(6) == 25L)  // uptime a = 30 - 5
    assert(u(1).getLong(4) == 0L)   // b gapless → filled 0
    assert(u(1).getDouble(7) == 1.0)
  }

  test("coalesceIntervals merges overlapping spans to their union") {
    val merged = Intervals.coalesceIntervals(segs, Seq("k"))
      .orderBy("k", "starttime").collect()
    assert(merged.length == 3)
    assert(merged(0).getLong(1) == 0L && merged(0).getLong(2) == 20L)
    assert(merged(1).getLong(1) == 25L && merged(1).getLong(2) == 30L)
  }

  test("bandedPoints auto width = median request span; results identical to explicit widths") {
    import graft.operators.IntervalJoin
    val points = Seq(("u1", 5L), ("u1", 95L), ("u1", 250L), ("u2", 40L))
      .toDF("k", "ts")
    val reqs = Seq(("u1", 0L, 100L), ("u1", 200L, 220L), ("u2", 30L, 50L))
      .toDF("k", "t1", "t2")
    // median span of (100, 20, 20) — an outlier-heavy mean would be 47
    assert(IntervalJoin.autoBandNs(reqs, "t1", "t2") == 20L)
    // robustness: an open-ended sentinel interval must not derive a
    // width that lets it EXPLODE — the max-span floor caps any single
    // request at MaxBandsPerRequest bands (an uncapped median-only
    // width of ~20 ns would sequence ~2·10^17 bands here and crash),
    // while the median still keeps the width from ballooning to the
    // sentinel's own scale (a mean would)
    val withSentinel = reqs.unionByName(
      Seq(("u1", 0L, 4_000_000_000_000_000_000L)).toDF("k", "t1", "t2"))
    val wS = IntervalJoin.autoBandNs(withSentinel, "t1", "t2")
    assert(wS >= 4_000_000_000_000_000_000L / IntervalJoin.MaxBandsPerRequest)
    assert(wS < 4_000_000_000_000_000_000L) // far below the sentinel span
    // ...and the previously-crashing shape now RUNS and matches the
    // broadcast path: point-dominated spans (median 0) + one wide request
    val pointReqs = Seq(("u1", 5L, 5L), ("u1", 95L, 95L), ("u1", 250L, 250L),
      ("u2", 40L, 40L), ("u1", 0L, 60_000_000_000L)).toDF("k", "t1", "t2")
    assert(IntervalJoin.bandedPoints(points, pointReqs, Seq("k"), "ts")
      .collect().map(_.toString).sorted.toSeq ==
      IntervalJoin.pointsInRanges(points, pointReqs, Seq("k"), "ts")
        .collect().map(_.toString).sorted.toSeq)
    def rows(bandNs: Long) =
      IntervalJoin.bandedPoints(points, reqs, Seq("k"), "ts", bandNs)
        .collect().map(_.toString).sorted.toSeq
    val auto = rows(0L)
    assert(auto.nonEmpty && auto == rows(7L) && auto == rows(1000L))
    // and the banded result equals the broadcast-path result
    assert(auto == IntervalJoin.pointsInRanges(points, reqs, Seq("k"), "ts")
      .collect().map(_.toString).sorted.toSeq)
  }

  test("overlap predicate: buffer widens, nulls excluded") {
    val df = Seq((1L, 0L, 10L), (2L, 20L, 30L))
      .toDF("id", "starttime", "endtime")
      .unionByName(Seq(3L).toDF("id")
        .withColumn("starttime", lit(100L))
        .withColumn("endtime", lit(null).cast("long")))
    assert(df.filter(Intervals.overlaps(12, 18, 0)).count() == 0)
    assert(df.filter(Intervals.overlaps(12, 18, 2)).count() == 2)
    assert(df.filter(Intervals.overlaps(90, 200, 0)).count() == 0) // null endtime
  }
}
