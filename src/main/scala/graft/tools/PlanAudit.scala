package graft.tools

/** Physical-plan audit CLI for the oracle queries: prints
  * [[PlanIntrospect]] counts plus the join strategies present in the
  * executed plan, for docs/PLANS.md upkeep.
  *
  * Run: `sbt "runMain graft.tools.PlanAudit [sfDir] [q1,q2,...]"`
  * (defaults: sf0.01, every catalog query). Queries whose bodies have
  * side effects (bank writes, temp archives) run them — this is a
  * plan audit, not a pure EXPLAIN.
  */
object PlanAudit {
  private val JoinNodes = Seq("BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
    "RangeJoin")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else graft.queries.Catalog.all.map(_.name)
    val spark = graft.core.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = graft.queries.Catalog.byName(n).run(spark, sfDir)
        val c = PlanIntrospect.counts(df)
        val plan = df.queryExecution.executedPlan.toString
        val joins = JoinNodes.filter(plan.contains)
        println(s"PLANAUDIT $n shuffles=${c.shuffles} " +
          s"broadcasts=${c.broadcasts} bnlj=${c.bnlj} " +
          s"cartesian=${c.cartesian} joins=${joins.mkString("+")}")
      } catch { case e: Throwable =>
        println(s"PLANAUDIT $n FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
