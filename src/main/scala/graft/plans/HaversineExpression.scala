package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd haversine distance (meters) — the geodesic kernel
  * (obsplus `utils/geodetics.py:160-175`) as a Catalyst `Expression`.
  *
  * `Geo.haversineMeters` composes built-in trig Columns (preferred, and
  * what the oracle-checked queries use); this expression is the
  * "custom Expression with doGenCode" escape hatch for when the kernel
  * must be a single JVM call (e.g. swapping in a full WGS84 geodesic
  * that has no built-in decomposition). Both whole-stage-codegen and
  * interpreted paths call the same static `compute`.
  */
case class HaversineMeters(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override protected def nullSafeEval(lat1: Any, lon1: Any,
                                      lat2: Any, lon2: Any): Any =
    HaversineMeters.compute(lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.plans.HaversineMeters.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(newFirst, newSecond, newThird, newFourth)
}

object HaversineMeters {
  val EarthRadiusM = 6371008.8

  /** Shared kernel for interpreted eval and generated code. */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dlat = math.toRadians(lat2 - lat1) / 2.0
    val dlon = math.toRadians(lon2 - lon1) / 2.0
    val a = math.sin(dlat) * math.sin(dlat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dlon) * math.sin(dlon)
    2.0 * EarthRadiusM * math.asin(math.sqrt(a))
  }
}
