package graft.tools

import org.apache.spark.sql.functions._

/** A/B microbench: the native ordered_fold_sum vs the
  * collect_list + sort_array + lambda pipeline it replaced, on a
  * synthetic candidate-shaped frame (groups of ~3 string-keyed
  * contributions). Usage: jrun graft.tools.FoldAb [rows] [passes].
  */
object FoldAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = graft.core.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TopK
    val df = spark.range(n).select(
      (col("id") % (n / 3)).as("g"),
      concat(lit("term"), (col("id") % 37)).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    def time(tag: String)(f: => Long): Unit = {
      (1 to passes).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(s"$tag pass$i ${(System.nanoTime() - t0) / 1e9}%s rows=$r"
          .replace("%s", " s"))
      }
    }
    time("old_collect_sort") {
      df.groupBy("g")
        .agg(sort_array(collect_list(struct(col("k"), col("v"))))
          .as("cs"))
        .select(aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("v")).as("s"))
        .filter(col("s") >= 0).count()
    }
    time("new_ordered_fold") {
      df.groupBy("g")
        .agg(TopK.orderedFoldSum(col("k"), col("v")).as("s"))
        .filter(col("s") >= 0).count()
    }
    spark.stop()
  }
}
