package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native fused dot product over two `array<float>` columns.
  *
  * Semantically identical (bit-for-bit) to the composed Column form
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, x) => acc + x)` — float widened before multiply, products
  * accumulated left-to-right, null result on length mismatch or null
  * element (zip_with pads the shorter side with null; null poisons the
  * sum). Oracle-checked queries can therefore swap freely between the
  * two forms.
  *
  * Why it exists: the HOF form materializes the products as an
  * intermediate array per pair and walks it with per-element lambda
  * dispatch; this expression is one primitive loop over the two
  * ArrayData buffers inside whole-stage codegen — the preferred
  * "custom Catalyst Expression beats UDF" path for the ANN hot loop
  * (SURVEY.md §4).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.plans.VecDot.compute($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object VecDot {
  /** Shared kernel for interpreted eval and generated code. Returns
    * null (boxed) exactly when the zip_with/aggregate composition
    * would: unequal lengths or a null element.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
