package graft

import org.apache.spark.sql.functions._
import graft.plans.GlobRewriteRule

class GlobRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("literal anchored rlike rewrites to equality; real regexes survive") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ GlobRewriteRule
    try {
      // parquet-backed (a LocalRelation would be constant-folded away)
      val p = java.nio.file.Files.createTempDirectory("graft-glob").toString
      Seq("BHZ", "BHN", "XBHZ").toDF("c").write.mode("overwrite").parquet(p)
      val df = spark.read.parquet(p)
      val lit = df.filter(col("c").rlike("^BHZ$"))
      assert(lit.queryExecution.optimizedPlan.toString.contains("(c#"),
        lit.queryExecution.optimizedPlan.toString)
      assert(lit.queryExecution.optimizedPlan.toString.contains(" = BHZ"))
      assert(!lit.queryExecution.optimizedPlan.toString.contains("RLIKE"))
      assert(lit.as[String].collect().toSeq == Seq("BHZ")) // anchored semantics kept

      val re = df.filter(col("c").rlike("^BH.$"))
      assert(re.queryExecution.optimizedPlan.toString.contains("RLIKE"))
      assert(re.as[String].collect().toSet == Set("BHZ", "BHN"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == GlobRewriteRule)
    }
  }
}
