package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinExec

/** RangeJoinExec / RangeJoinStrategy: the custom broadcast interval-index
  * join must (a) actually get planned for equi+range inner joins, and
  * (b) produce byte-identical results to Spark's built-in plan
  * (BroadcastNestedLoop) with the strategy disabled.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def usesRangeJoin(df: DataFrame): Boolean = {
    df.collect() // force AQE final plan
    def findIn(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.exists {
        case _: RangeJoinExec => true
        case a: AdaptiveSparkPlanExec => findIn(a.executedPlan)
        case _ => false
      }
    findIn(df.queryExecution.executedPlan)
  }

  private def withStrategyDisabled[T](f: => T): T = {
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try f finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  private lazy val points = spark.range(0, 5000).toDF("id")
    .withColumn("key", ($"id" % 7).cast("string"))
    .withColumn("ts", $"id" * 13 % 10007)
  private lazy val intervals = spark.range(0, 400).toDF("rid")
    .withColumn("key", ($"rid" % 7).cast("string"))
    .withColumn("t1", $"rid" * 31 % 9000)
    .withColumn("t2", $"rid" * 31 % 9000 + ($"rid" % 50) * 10)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("equi+range join plans as RangeJoinExec and matches built-in results") {
    def q = points.join(broadcast(intervals),
      points("key") === intervals("key") &&
        points("ts") >= intervals("t1") && points("ts") <= intervals("t2"))
    assert(usesRangeJoin(q))
    val got = sortedRows(q)
    val expected = withStrategyDisabled { sortedRows(q) }
    assert(got.nonEmpty && got == expected)
  }

  test("pure range join (no equi keys) matches and respects strictness") {
    def q = points.join(broadcast(intervals),
      points("ts") > intervals("t1") && points("ts") < intervals("t2"))
    assert(usesRangeJoin(q))
    assert(sortedRows(q) == withStrategyDisabled(sortedRows(q)))
  }

  test("overlap-form condition (negated disjunction) matches") {
    // !(end < t1 || start > t2) — BooleanSimplification normalizes to conjuncts
    val segs = spark.range(0, 3000).toDF("sid")
      .withColumn("start", $"sid" * 17 % 8000)
      .withColumn("end", $"sid" * 17 % 8000 + 40)
    def q = segs.join(broadcast(intervals),
      !(segs("end") < intervals("t1") || segs("start") > intervals("t2")))
    assert(usesRangeJoin(q))
    assert(sortedRows(q) == withStrategyDisabled(sortedRows(q)))
  }

  test("broadcast-left orientation preserves column order and results") {
    def q = broadcast(intervals).join(points,
      points("key") === intervals("key") &&
        points("ts") >= intervals("t1") && points("ts") <= intervals("t2"))
    assert(usesRangeJoin(q))
    assert(sortedRows(q) == withStrategyDisabled(sortedRows(q)))
  }

  test("null bounds and null keys never match (inner join semantics)") {
    val p = Seq((Some(1L), "a"), (None, "a"), (Some(5L), null.asInstanceOf[String]))
      .toDF("ts", "key")
    val iv = Seq((Some(0L), Some(10L), "a"), (None, Some(10L), "a"),
      (Some(0L), Some(10L), null.asInstanceOf[String]))
      .toDF("t1", "t2", "key")
    def q = p.join(broadcast(iv),
      p("key") === iv("key") && p("ts") >= iv("t1") && p("ts") <= iv("t2"))
    assert(usesRangeJoin(q))
    val rows = q.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("ts") == 1L)
    assert(sortedRows(q) == withStrategyDisabled(sortedRows(q)))
  }

  test("residual predicates beyond the range pair are applied") {
    def q = points.join(broadcast(intervals),
      points("ts") >= intervals("t1") && points("ts") <= intervals("t2") &&
        points("id") % 2 === intervals("rid") % 2 &&
        points("ts") =!= intervals("t1") + 1)
    assert(usesRangeJoin(q))
    assert(sortedRows(q) == withStrategyDisabled(sortedRows(q)))
  }

  test("overlapping/duplicate intervals all match (running-max walk)") {
    // nested + duplicate intervals exercise the hiRunMax early-stop
    val iv = Seq((0L, 100L, 1), (10L, 20L, 2), (10L, 20L, 3), (15L, 90L, 4),
      (40L, 45L, 5), (0L, 5L, 6)).toDF("t1", "t2", "rid")
    val p = Seq(12L, 44L, 3L, 99L, 200L).toDF("ts")
    def q = p.join(broadcast(iv), p("ts") >= iv("t1") && p("ts") <= iv("t2"))
    assert(usesRangeJoin(q))
    val got = q.select("ts", "rid").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.toSeq == Seq((3L, 1), (3L, 6), (12L, 1), (12L, 2), (12L, 3),
      (44L, 1), (44L, 4), (44L, 5), (99L, 1)))
  }

  test("left/right outer joins are left to the built-in planner") {
    val q = points.join(broadcast(intervals),
      points("ts") >= intervals("t1") && points("ts") <= intervals("t2"), "left")
    assert(!usesRangeJoin(q))
  }

  test("non-integral bounds use the generic (boxed) index and still match") {
    // double bounds: the primitive-packed path admits Long/Int/Short
    // only, so this pins the generic fallback the long-bound tests no
    // longer reach
    val p = spark.range(0, 2000).toDF("id")
      .withColumn("key", ($"id" % 5).cast("string"))
      .withColumn("x", $"id".cast("double") / 3.0)
    val iv = spark.range(0, 150).toDF("rid")
      .withColumn("key", ($"rid" % 5).cast("string"))
      .withColumn("lo", $"rid".cast("double") * 4.4)
      .withColumn("hi", $"rid".cast("double") * 4.4 + ($"rid" % 9).cast("double"))
    def q = p.join(broadcast(iv),
      p("key") === iv("key") && p("x") >= iv("lo") && p("x") <= iv("hi"))
    assert(usesRangeJoin(q))
    val got = sortedRows(q)
    assert(got.nonEmpty && got == withStrategyDisabled(sortedRows(q)))
  }

  test("mixed integral widths (int bounds vs long stream) take the packed path correctly") {
    val p = spark.range(0, 3000).toDF("id")
      .withColumn("ts", $"id" * 7 % 5003) // long
    val iv = spark.range(0, 200).toDF("rid")
      .withColumn("t1", ($"rid" * 29 % 4500).cast("int"))
      .withColumn("t2", ($"rid" * 29 % 4500 + $"rid" % 40).cast("int"))
    def q = p.join(broadcast(iv), p("ts") >= iv("t1") && p("ts") <= iv("t2"))
    assert(usesRangeJoin(q))
    val got = sortedRows(q)
    assert(got.nonEmpty && got == withStrategyDisabled(sortedRows(q)))
  }
}
