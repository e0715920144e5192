package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Expression ↔ Column converters that
  * Spark 4 moved behind `org.apache.spark.sql.classic`. Needed by
  * [[graft.plans.GraftExtensions]]'s SQL-function builders, which
  * expand `kmv_*` calls into the SAME composite Column expressions the
  * Scala API builds — a FunctionRegistry builder receives and must
  * return catalyst `Expression`s, and the public surface no longer
  * exposes the conversion. One object in the `org.apache.spark.sql`
  * namespace is the established extension-library pattern for this
  * (the alternative — duplicating every algebra formula as a
  * hand-built Expression tree — is the drift risk the builders exist
  * to avoid).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER conversion via `ColumnNodeToExpressionConverter`, not
    * `ExpressionUtils.expression`: the latter wraps the node in a lazy
    * `ColumnNodeExpression` placeholder that only the DataFrame entry
    * points unwrap during analysis — returned from a FunctionRegistry
    * builder it survives to codegen and dies with "Cannot generate
    * code for expression: columnnodeexpression" (observed). The eager
    * converter yields the plain catalyst tree (UnresolvedFunction
    * nodes included), which the analyzer then resolves normally.
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
