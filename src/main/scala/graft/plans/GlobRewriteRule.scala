package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal, RLike}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: an anchored regex with no metacharacters inside —
  * the shape `Fnmatch.translate` emits for wildcard-free globs — is a
  * plain equality. `EqualTo` beats `RLike` twice over: cheaper per row,
  * and eligible for parquet pushdown / hash-partition pruning, which a
  * regex never is. (The query builders already special-case literal
  * globs; this rule catches the ones that arrive as regexes anyway,
  * e.g. through SQL or saved plans.)
  */
object GlobRewriteRule extends Rule[LogicalPlan] {

  private val LiteralAnchored = "\\^([A-Za-z0-9_#\\- ]*)\\$".r

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case RLike(left, Literal(pat: UTF8String, StringType)) =>
        pat.toString match {
          case LiteralAnchored(inner) => EqualTo(left, Literal(inner))
          case _ => RLike(left, Literal(pat, StringType))
        }
    }
}
