package graft

import graft.plans.BandedRangeJoinRule
import org.apache.spark.sql.functions._

/** Band-width auto-tuning (docs/NEXT.md follow-up): with CBO column
  * stats analyzed, the rule derives a width from extent/rowCount of
  * the range columns — landing within 2× of the hand-tuned conf on the
  * RangeJoinBench workload shape — and explicit conf still wins.
  */
class AutoBandWidthSpec extends SparkSpec {

  // the RangeJoinBench huge×huge workload, scaled down: intervals of
  // fixed width span/nIv*2 tiling a span; hand-tuned width = interval
  // width
  private val span = 1_000_000L
  private val nPoints = 20000L
  private val nIv = 500L
  private val handTuned = span / nIv * 2

  private def withTables[T](f: => T): T = {
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS g_auto_points")
    spark.sql("DROP TABLE IF EXISTS g_auto_iv")
    spark.range(nPoints)
      .select(col("id"), (col("id") * 2654435761L % span).as("ts"),
        (col("id") % 10).cast("string").as("key"))
      .write.saveAsTable("g_auto_points")
    spark.range(nIv)
      .select(col("id").as("iid"), (col("id") * 40503L % span).as("t1"),
        (col("id") % 10).cast("string").as("key"))
      .withColumn("t2", col("t1") + handTuned)
      .write.saveAsTable("g_auto_iv")
    spark.sql("ANALYZE TABLE g_auto_points COMPUTE STATISTICS FOR COLUMNS ts")
    spark.sql("ANALYZE TABLE g_auto_iv COMPUTE STATISTICS FOR COLUMNS t1, t2")
    try f finally {
      spark.sql("DROP TABLE IF EXISTS g_auto_points")
      spark.sql("DROP TABLE IF EXISTS g_auto_iv")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("CBO stats derive a width within 2x of the hand-tuned bench conf") {
    withTables {
      val p = spark.table("g_auto_points")
      val iv = spark.table("g_auto_iv")
      BandedRangeJoinRule.lastAutoWidth = None
      def q = p.join(iv, p("key") === iv("key") &&
        p("ts") >= iv("t1") && p("ts") <= iv("t2"))
      val n = q.count()
      val w = BandedRangeJoinRule.lastAutoWidth
      assert(w.isDefined, "auto width was not derived despite CBO stats")
      assert(w.get >= handTuned / 2 && w.get <= handTuned * 2,
        s"derived ${w.get} vs hand-tuned $handTuned")
      // correctness: same rows as the broadcast RangeJoinExec path
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      try assert(n == q.count())
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    }
  }

  test("explicit bandWidth conf beats the derived width") {
    withTables {
      val p = spark.table("g_auto_points")
      val iv = spark.table("g_auto_iv")
      spark.conf.set("spark.graft.rangeJoin.bandWidth", (span * 10).toString)
      try {
        BandedRangeJoinRule.lastAutoWidth = None
        p.join(iv, p("key") === iv("key") &&
          p("ts") >= iv("t1") && p("ts") <= iv("t2")).count()
        assert(BandedRangeJoinRule.lastAutoWidth.isEmpty)
      } finally spark.conf.unset("spark.graft.rangeJoin.bandWidth")
    }
  }

  test("overlapping intervals: derived width clamped, ANALYZE never causes the band-cap error") {
    // spans (90k) >> spacing (20): the naive extent/rowCount width of
    // ~20 would put ~4500 bands on every row — over the 4096 cap — so
    // un-clamped auto derivation turns this join into a runtime error
    // the moment stats exist. The clamp floors the width at
    // extent/maxBandsPerRow, trading selectivity for completion.
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS g_ovl_points")
    spark.sql("DROP TABLE IF EXISTS g_ovl_iv")
    try {
      spark.range(100)
        .select(col("id").as("pid"), (col("id") * 997L % 100000L).as("ts"))
        .write.saveAsTable("g_ovl_points")
      spark.range(5000)
        .select(col("id").as("iid"), (col("id") * 2L).as("t1"))
        .withColumn("t2", col("t1") + 90000L)
        .write.saveAsTable("g_ovl_iv")
      spark.sql("ANALYZE TABLE g_ovl_iv COMPUTE STATISTICS FOR COLUMNS t1, t2")
      val p = spark.table("g_ovl_points")
      val iv = spark.table("g_ovl_iv")
      BandedRangeJoinRule.lastAutoWidth = None
      def q = p.join(iv, p("ts") >= iv("t1") && p("ts") <= iv("t2"))
      val n = q.count() // must complete, not raise the band-cap error
      val w = BandedRangeJoinRule.lastAutoWidth
      assert(w.exists(_ >= 100000L / 4096), s"width $w below the clamp floor")
      // correctness vs the broadcast RangeJoinExec path
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      try assert(n == q.count())
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_ovl_points")
      spark.sql("DROP TABLE IF EXISTS g_ovl_iv")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("autoBandNs is memoized per request frame — no second agg on repeated calls") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    val pts = Seq(("a", 50L), ("a", 150L), ("b", 75L))
      .toDF("key", "ts")
    val reqs = Seq(("a", 0L, 100L), ("b", 50L, 160L), ("a", 140L, 260L))
      .toDF("key", "t1", "t2")
    val n0 = IntervalJoin.measureCount.get()
    val r1 = IntervalJoin.bandedPoints(pts, reqs, Seq("key"), "ts")
      .collect().map(_.toString).sorted.toSeq
    val afterFirst = IntervalJoin.measureCount.get()
    assert(afterFirst == n0 + 1, "first call must measure exactly once")
    // the iterative-caller shape: same frame, repeated calls
    val r2 = IntervalJoin.bandedPoints(pts, reqs, Seq("key"), "ts")
      .collect().map(_.toString).sorted.toSeq
    assert(r2 == r1)
    assert(IntervalJoin.measureCount.get() == afterFirst,
      "repeated call on the same requests frame must reuse the memo")
    // a trivially re-built but canonically identical frame also hits
    val reqsAgain = Seq(("a", 0L, 100L), ("b", 50L, 160L), ("a", 140L, 260L))
      .toDF("key", "t1", "t2")
    IntervalJoin.bandedPoints(pts, reqsAgain, Seq("key"), "ts").collect()
    assert(IntervalJoin.measureCount.get() == afterFirst,
      "canonically identical requests must reuse the memo")
    // a DIFFERENT requests frame measures again (no false sharing)
    val other = Seq(("a", 0L, 1000L)).toDF("key", "t1", "t2")
    IntervalJoin.bandedPoints(pts, other, Seq("key"), "ts").collect()
    assert(IntervalJoin.measureCount.get() == afterFirst + 1)
  }

  test("rule uses the session-measured width when stats are absent, floored at default") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // narrow measured width must be FLOORED at the default, never
      // narrowing another join's bands (the band-cap error direction)
      spark.conf.set("spark.graft.rangeJoin.bandWidth.measured", "5")
      val p = Seq((50L, 1), (150L, 2)).toDF("ts", "pid")
      val r = Seq((0L, 100L, 10)).toDF("t1", "t2", "rid")
      assert(p.join(r, p("ts") >= r("t1") && p("ts") <= r("t2")).count() == 1)
      // a wide measured width is used as-is: a row pair 2 widths apart
      // still joins correctly (width is a physical knob only)
      spark.conf.set("spark.graft.rangeJoin.bandWidth.measured",
        (7200L * 1000000000L).toString)
      assert(p.join(r, p("ts") >= r("t1") && p("ts") <= r("t2")).count() == 1)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.bandWidth.measured")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("auto off or no stats: default width, rule still correct") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.rangeJoin.bandWidth.auto", "false")
    try {
      import spark.implicits._
      val p = Seq((50L, 1), (150L, 2)).toDF("ts", "pid")
      val r = Seq((0L, 100L, 10)).toDF("t1", "t2", "rid")
      BandedRangeJoinRule.lastAutoWidth = None
      val n = p.join(r, p("ts") >= r("t1") && p("ts") <= r("t2")).count()
      assert(n == 1 && BandedRangeJoinRule.lastAutoWidth.isEmpty)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.bandWidth.auto")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
