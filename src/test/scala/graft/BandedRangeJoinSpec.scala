package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** BandedRangeJoinRule: when neither side is broadcastable, a plain
  * range join must plan as a banded equi join (shuffled hash /
  * sort-merge on the synthetic band key) — never BroadcastNestedLoop or
  * a cartesian product — and produce exactly the rows of the naive
  * plan, each once.
  */
class BandedRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan
  }

  // AQE may convert the banded SMJ to a broadcast HASH join at runtime
  // (fine — still the equi-keyed plan, not a nested loop), so BHJ
  // counts as a legal banded join. AQE wraps subtrees in leaf
  // QueryStageExec nodes, so traverse through those explicitly.
  private def collectJoins(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect {
      case j: SortMergeJoinExec => Seq(j)
      case j: ShuffledHashJoinExec => Seq(j)
      case j: BroadcastHashJoinExec => Seq(j)
      case j: BroadcastNestedLoopJoinExec => Seq(j)
      case j: CartesianProductExec => Seq(j)
      case a: AdaptiveSparkPlanExec => collectJoins(a.executedPlan)
      case s: QueryStageExec => collectJoins(s.plan)
    }
    here.flatten
  }

  /** Run with broadcasts disabled (forces the huge×huge planning path
    * on small test data) and a test-sized band width.
    */
  private def asHuge[T](bandWidth: Long)(f: => T): T = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.rangeJoin.bandWidth", bandWidth.toString)
    try f finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.rangeJoin.bandWidth")
    }
  }

  private def withBandedDisabled[T](f: => T): T = {
    spark.conf.set("spark.graft.rangeJoin.banded.enabled", "false")
    try f finally spark.conf.unset("spark.graft.rangeJoin.banded.enabled")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private lazy val points = spark.range(0, 4000).toDF("id")
    .withColumn("key", ($"id" % 5).cast("string"))
    .withColumn("ts", $"id" * 13 % 10007)
  // spans crossing many 100-wide bands, some zero-length, keys skewed
  private lazy val intervals = spark.range(0, 300).toDF("rid")
    .withColumn("key", ($"rid" % 5).cast("string"))
    .withColumn("t1", $"rid" * 31 % 9000)
    .withColumn("t2", $"rid" * 31 % 9000 + ($"rid" % 40) * 25)

  test("huge×huge point-in-range join plans banded, no nested loop, matches naive") {
    asHuge(bandWidth = 100L) {
      def q = points.join(intervals,
        points("key") === intervals("key") &&
          points("ts") >= intervals("t1") && points("ts") <= intervals("t2"))
      val joins = collectJoins(finalPlan(q))
      assert(joins.nonEmpty && joins.forall(j =>
        !j.isInstanceOf[BroadcastNestedLoopJoinExec] &&
          !j.isInstanceOf[CartesianProductExec]),
        joins.map(_.nodeName).toString)
      val got = sortedRows(q)
      val expected = withBandedDisabled(sortedRows(q))
      assert(got.nonEmpty && got == expected)
    }
  }

  test("interval-overlap join (both sides spans) dedups multi-band pairs") {
    asHuge(bandWidth = 50L) {
      // segments with width up to 500 → up to 11 shared bands per pair
      val segs = spark.range(0, 1000).toDF("sid")
        .withColumn("s1", $"sid" * 17 % 8000)
        .withColumn("s2", $"sid" * 17 % 8000 + ($"sid" % 10) * 50)
      def q = segs.join(intervals,
        segs("s2") >= intervals("t1") && segs("s1") <= intervals("t2"))
      val joins = collectJoins(finalPlan(q))
      assert(joins.forall(j =>
        !j.isInstanceOf[BroadcastNestedLoopJoinExec] &&
          !j.isInstanceOf[CartesianProductExec]),
        joins.map(_.nodeName).toString)
      val got = sortedRows(q)
      val expected = withBandedDisabled(sortedRows(q))
      assert(got.nonEmpty && got == expected) // same multiset → deduped
    }
  }

  test("negative timestamps band correctly (floor semantics)") {
    asHuge(bandWidth = 100L) {
      val p = Seq((-250L, 1), (-100L, 2), (-1L, 3), (0L, 4), (99L, 5))
        .toDF("ts", "pid")
      val r = Seq((-300L, -50L, 10), (-120L, 120L, 11)).toDF("t1", "t2", "rid")
      def q = p.join(r, p("ts") >= r("t1") && p("ts") <= r("t2"))
      val got = sortedRows(q)
      val expected = withBandedDisabled(sortedRows(q))
      assert(got == expected && got.size == 6)
    }
  }

  test("randomized differential: banded plan equals built-in plan row-for-row") {
    val rnd = new scala.util.Random(271828)
    for (trial <- 0 until 4) {
      val bw = Seq(7L, 50L, 333L, 1000L)(trial)
      val nP = 500 + rnd.nextInt(1500)
      val nR = 50 + rnd.nextInt(250)
      val pData = (0 until nP).map { i =>
        (i.toLong, rnd.nextInt(4).toString, rnd.nextInt(20000).toLong -
          (if (rnd.nextBoolean()) 10000L else 0L))
      }
      val rData = (0 until nR).map { i =>
        val lo = rnd.nextInt(20000).toLong - 10000L
        (i.toLong, rnd.nextInt(4).toString, lo, lo + rnd.nextInt(800).toLong)
      }
      val p = pData.toDF("pid", "key", "ts")
      val r = rData.toDF("rid", "key", "t1", "t2")
      asHuge(bandWidth = bw) {
        def strict = p.join(r, p("key") === r("key") &&
          p("ts") > r("t1") && p("ts") < r("t2"))       // strict bounds
        def overlapNoKey = p.join(r,
          p("ts") >= r("t1") && p("ts") <= r("t2"))     // no equi key
        for (q <- Seq(strict _, overlapNoKey _)) {
          val banded = sortedRows(q())
          val builtin = withBandedDisabled(sortedRows(q()))
          assert(banded == builtin,
            s"trial=$trial bw=$bw: ${banded.size} vs ${builtin.size}")
        }
      }
    }
  }

  test("rule stands down when a side is broadcastable (RangeJoinExec wins)") {
    def q = points.join(broadcast(intervals),
      points("ts") >= intervals("t1") && points("ts") <= intervals("t2"))
    q.collect()
    val hasRangeJoin = finalPlan(q).exists {
      case _: graft.plans.RangeJoinExec => true
      case _ => false
    }
    assert(hasRangeJoin)
  }

  test("a row spanning more than maxBandsPerRow fails fast with guidance") {
    asHuge(bandWidth = 10L) {
      spark.conf.set("spark.graft.rangeJoin.maxBandsPerRow", "100")
      try {
        val p = Seq((500L, 1)).toDF("ts", "pid")
        // 0..100000 at width 10 → 10k bands ≫ cap
        val r = Seq((0L, 100000L, 10)).toDF("t1", "t2", "rid")
        val ex = intercept[Exception] {
          p.join(r, p("ts") >= r("t1") && p("ts") <= r("t2")).collect()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains("rangeJoin.bandWidth")), msgs(ex))
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBandsPerRow")
    }
  }

  test("null bounds drop rows exactly like the built-in plan") {
    asHuge(bandWidth = 100L) {
      val p = Seq((Some(50L), 1), (None, 2)).toDF("ts", "pid")
      val r = Seq((Some(0L), Some(100L), 10), (None, Some(100L), 11))
        .toDF("t1", "t2", "rid")
      def q = p.join(r, p("ts") >= r("t1") && p("ts") <= r("t2"))
      val got = sortedRows(q)
      val expected = withBandedDisabled(sortedRows(q))
      assert(got == expected && got.size == 1)
    }
  }
}
