package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan shape counters — the docs/PLANS.md audit as a
  * reusable function, so scale tests can ASSERT the shapes the docs
  * claim: shuffle count constant as the corpus grows, and no
  * BroadcastNestedLoop/cartesian sneaking in when size estimates
  * change. Traverses adaptive wrappers (AQE) and materialized query
  * stages; reused exchanges are not re-counted (they don't re-run).
  */
object PlanIntrospect {

  final case class Counts(shuffles: Int, broadcasts: Int,
                          bnlj: Int, cartesian: Int) {
    def render: String =
      s"shuffles=$shuffles broadcasts=$broadcasts bnlj=$bnlj cartesian=$cartesian"
  }

  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case _ => Nil
    }
    p +: (p.children ++ extra).flatMap(nodes)
  }

  /** Counts over the df's physical plan as planned (no execution
    * needed — the pre-AQE plan is the deterministic surface; AQE can
    * only coalesce or locally improve it at runtime).
    */
  def counts(df: DataFrame): Counts = {
    val all = nodes(df.queryExecution.executedPlan)
    Counts(
      all.count(_.isInstanceOf[ShuffleExchangeLike]),
      all.count(_.isInstanceOf[BroadcastExchangeLike]),
      all.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      all.count(_.isInstanceOf[CartesianProductExec]))
  }
}
