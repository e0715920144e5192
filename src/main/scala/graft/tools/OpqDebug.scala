// Dump the float32-cast second moment of the failing OPQ bench corpus
// (clustered 1e6, decay 0.94) for offline numerical diagnosis.
// Run: sbt "runMain graft.tools.OpqDebug"
package graft.tools

import org.apache.spark.sql.functions._

object OpqDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val corpus = ScaleBench.synthClusteredEmbeddings(spark, n,
      clusters = 1024, sep = 1.0, noise = 0.35, decay = 0.94)
    import spark.implicits._
    val d = 64
    val rows = corpus.select(col("embedding")).as[Seq[Float]]
      .mapPartitions { it =>
        val sums = Array.ofDim[Double](d, d)
        var cnt = 0L
        it.foreach { v =>
          var r = 0
          while (r < d) {
            val vr = v(r).toDouble
            val row = sums(r)
            var c = 0
            while (c < d) { row(c) += vr * v(c).toDouble; c += 1 }
            r += 1
          }
          cnt += 1
        }
        if (cnt == 0L) Iterator.empty
        else (for (r <- (0 until d).iterator; c <- (0 until d).iterator)
          yield (r, c, sums(r)(c), cnt)).iterator
      }.toDF("r", "c", "ps", "n")
      .groupBy("r", "c").agg((sum("ps") / sum("n")).as("mu"))
      .collect()
    val m = Array.ofDim[Double](d, d)
    rows.foreach { row =>
      m(row.getAs[Int]("r"))(row.getAs[Int]("c")) =
        row.getAs[Double]("mu").toFloat.toDouble
    }
    val out = new java.io.PrintWriter("/tmp/opq_moment.txt")
    m.foreach(r => out.println(r.mkString(",")))
    out.close()
    println("WROTE /tmp/opq_moment.txt")
    spark.stop()
  }
}
