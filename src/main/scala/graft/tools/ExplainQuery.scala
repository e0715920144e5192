package graft.tools

import graft.queries.Catalog

/** Print the formatted physical plan of one or more catalog queries:
  * `runMain graft.tools.ExplainQuery q47_tfidf_topterms [q48_...]`.
  * Plan-audit tool (SURVEY.md §4 discipline): check pushed filters,
  * broadcast vs shuffle joins, and WholeStageCodegen spans per query.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.local()
    val names = if (args.nonEmpty) args.toSeq else Catalog.all.map(_.name)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Catalog.byName(n).run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
