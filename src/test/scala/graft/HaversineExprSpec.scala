package graft

import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.plans.GraftExtensions

class HaversineExprSpec extends SparkSpec {
  import spark.implicits._

  test("custom expression matches the composed-builtin kernel") {
    GraftExtensions.register(spark)
    val df = Seq(
      (48.8566, 2.3522, 51.5074, -0.1278),
      (0.0, 0.0, 0.0, 90.0),
      (10.0, 170.0, -10.0, -170.0)
    ).toDF("a", "b", "c", "d")
    val both = df.select(
      expr("haversine_m(a, b, c, d)").as("custom"),
      Geo.haversineMeters(col("a"), col("b"), col("c"), col("d")).as("composed"))
      .as[(Double, Double)].collect()
    both.foreach { case (x, y) => assert(math.abs(x - y) < 1e-6, s"$x vs $y") }
  }

  test("expression runs inside whole-stage codegen (no fallback)") {
    GraftExtensions.register(spark)
    val df = spark.range(1000).selectExpr(
      "haversine_m(CAST(id % 90 AS DOUBLE), CAST(id % 180 AS DOUBLE), 0.0D, 0.0D) AS d")
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [haversinemeters"))
    assert(df.agg(sum("d")).as[Double].head() > 0.0)
  }

  test("null propagation") {
    GraftExtensions.register(spark)
    val r = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
      .selectExpr("haversine_m(a, b, 0.0D, 0.0D)").collect()(0)
    assert(r.isNullAt(0))
  }
}
