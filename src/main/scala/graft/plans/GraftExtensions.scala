package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring for graft's custom expressions.
  *
  * Production: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. For an already
  * running session, `GraftExtensions.register(spark)` installs the
  * functions in the session's registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.haversineDescriptor)
    e.injectFunction(GraftExtensions.vecDotDescriptor)
    e.injectFunction(GraftExtensions.md5Long60Descriptor)
    e.injectFunction(GraftExtensions.shingleHash60Descriptor)
    GraftExtensions.sketchAlgebraDescriptors.foreach(e.injectFunction)
    // udafs (kmv_sketch256/64) cannot ride injectFunction — it carries
    // Expression builders only. The check-rule builder runs once per
    // session at analyzer construction with the live session in hand, so
    // a spark.sql.extensions=GraftExtensions session gets the full SQL
    // surface (q130 pattern) without an explicit register() call.
    e.injectCheckRule { session =>
      GraftExtensions.registerUdafs(session)
      _ => ()
    }
    e.injectOptimizerRule(_ => GlobRewriteRule)
    e.injectOptimizerRule(_ => BandedRangeJoinRule)
    e.injectPlannerStrategy(_ => RangeJoinStrategy)
  }
}

object GraftExtensions {

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4, "haversine_m(lat1, lon1, lat2, lon2)")
    HaversineMeters(exprs(0), exprs(1), exprs(2), exprs(3))
  }

  val haversineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("haversine_m"),
      new ExpressionInfo(classOf[HaversineMeters].getName, "haversine_m"),
      build)

  private def buildVecDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot(a, b)")
    VecDot(exprs(0), exprs(1))
  }

  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      buildVecDot)

  private def buildMd5Long60(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "md5_long60(s)")
    Md5Long60(exprs.head)
  }

  val md5Long60Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5_long60"),
      buildMd5Long60)

  private def buildShingleHash60(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "shingle_hash60(tokens, width, modulus)")
    ShingleHash60(exprs(0), exprs(1), exprs(2))
  }

  val shingleHash60Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("shingle_hash60"),
      new ExpressionInfo(classOf[ShingleHash60].getName, "shingle_hash60"),
      buildShingleHash60)

  /** Sketch-ALGEBRA SQL functions: each builder expands to the same
    * composite Expression tree the [[graft.operators.Sketches]] column
    * API builds (pure built-in nodes — size/element_at/array ops — so
    * the SQL path is codegen'd, not a UDF). `k` must be an integer
    * LITERAL: it shapes the expression (element_at index, slice
    * length) at resolution time. With these plus the `kmv_sketchNN`
    * udafs the whole distinct-algebra workflow is expressible in pure
    * SQL: `SELECT kmv_estimate(kmv_union(a.sk, b.sk, 256), 256) ...`.
    */
  val sketchAlgebraDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.operators.Sketches
    def litK(e: Expression, fn: String): Int = e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: k must be an integer literal, got $other")
    }
    def col(e: Expression) = ColumnBridge.column(e)
    def unary(name: String)(f: (Column, Int) => Column) =
      (FunctionIdentifier(name),
        new ExpressionInfo(Sketches.getClass.getName, name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"$name(sketch, k)")
          ColumnBridge.expression(f(col(exprs(0)), litK(exprs(1), name)))
        })
    def binary(name: String)(f: (Column, Column, Int) => Column) =
      (FunctionIdentifier(name),
        new ExpressionInfo(Sketches.getClass.getName, name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 3, s"$name(a, b, k)")
          ColumnBridge.expression(
            f(col(exprs(0)), col(exprs(1)), litK(exprs(2), name)))
        })
    Seq(
      unary("kmv_estimate")(Sketches.kmvEstimate),
      unary("kmv_theta")(Sketches.kmvTheta),
      binary("kmv_union")(Sketches.kmvUnion),
      binary("kmv_union_estimate")(Sketches.kmvUnionEstimate),
      binary("kmv_intersect_estimate")(Sketches.kmvIntersectEstimate),
      binary("kmv_difference_estimate")(Sketches.kmvDifferenceEstimate),
      binary("kmv_jaccard_estimate")(Sketches.kmvJaccardEstimate))
  }

  // Sessions already registered — operators call register() defensively
  // from every entry point, and re-running createOrReplaceTempFunction
  // logs a "replaced a previously registered function" WARN per
  // function per call, polluting every driver log at scale. Weak keys:
  // dropped sessions don't leak.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  /** Install on a live session (tests / notebooks). Idempotent per
    * session — repeat calls are no-ops.
    */
  /** The udaf half of the SQL surface (aggregates can't ride
    * injectFunction). Called from both the extensions check-rule hook
    * and [[register]]; idempotent via the functionExists probe.
    */
  def registerUdafs(spark: SparkSession): Unit = {
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("kmv_sketch256"))) {
      import graft.operators.Sketches
      spark.udf.register("kmv_sketch256", org.apache.spark.sql.functions
        .udaf(new Sketches.KmvAgg(256), org.apache.spark.sql.Encoders.scalaLong))
      spark.udf.register("kmv_sketch64", org.apache.spark.sql.functions
        .udaf(new Sketches.KmvAgg(64), org.apache.spark.sql.Encoders.scalaLong))
    }
  }

  def register(spark: SparkSession): Unit = {
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) != null) return
    registerUdafs(spark)
    // a session built WITH the extensions already has everything —
    // re-registering would log 'replaced a previously registered
    // function' WARNs once per session. Probe the NEWEST injected
    // builder, not the oldest: a session whose extensions list predates
    // the sketch functions (older jar on the classpath) then falls
    // through and picks up the additions instead of silently missing
    // them.
    if (spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("kmv_jaccard_estimate"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "haversine_m", build, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", buildVecDot, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_long60", buildMd5Long60, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hash60", buildShingleHash60, "built-in")
    sketchAlgebraDescriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(GlobRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GlobRewriteRule
    if (!spark.experimental.extraOptimizations.contains(BandedRangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedRangeJoinRule
  }
}
