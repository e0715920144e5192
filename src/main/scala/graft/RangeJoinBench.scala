package graft

import org.apache.spark.sql.functions._

/** Micro-benchmark for the custom range-join strategy vs Spark's
  * built-in plans, at cardinalities where the asymptotics show:
  *
  *   - pure range (no equi key): built-in = BroadcastNestedLoop,
  *     O(|stream| × |bcast|); RangeJoinExec = O(|stream| × (log m + k)).
  *   - low-cardinality equi key + range: built-in = BroadcastHashJoin
  *     that scans every same-key build row per stream row (range is a
  *     residual filter); RangeJoinExec binary-searches within the key
  *     bucket.
  *
  * Prints one JSON line. Run: sbt "runMain graft.RangeJoinBench"
  * (env GRAFT_RJB_POINTS / GRAFT_RJB_INTERVALS to resize).
  */
object RangeJoinBench {

  def main(args: Array[String]): Unit = {
    val nPoints = sys.env.getOrElse("GRAFT_RJB_POINTS", "1000000").toLong
    val nIv = sys.env.getOrElse("GRAFT_RJB_INTERVALS", "5000").toLong
    val spark = graft.core.GraftSession.local()

    val span = 1_000_000_000L
    val width = span / nIv * 2 // ~2 expected hits per point
    val points = spark.range(nPoints)
      .select(col("id"), (col("id") * 2654435761L % span).as("ts"),
        (col("id") % 10).cast("string").as("key"))
    val intervals = spark.range(nIv)
      .select(col("id").as("iid"), (col("id") * 40503L % span).as("t1"),
        (col("id") % 10).cast("string").as("key"))
      .withColumn("t2", col("t1") + width)
    points.cache().count(); intervals.cache().count()

    def time(f: => Long): (Double, Long) = {
      val s = System.nanoTime(); val n = f; ((System.nanoTime() - s) / 1e9, n)
    }
    def withDisabled[T](f: => T): T = {
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
      try f finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
    }

    val pureCond = points("ts") >= intervals("t1") && points("ts") <= intervals("t2")
    def pureJoin = points.join(broadcast(intervals), pureCond).count()
    val (tPureRj, nPure) = time(pureJoin)
    val (tPureBnl, _) = withDisabled(time(pureJoin))

    val equiCond = points("key") === intervals("key") && pureCond
    def equiJoin = points.join(broadcast(intervals), equiCond).count()
    val (tEquiRj, nEqui) = time(equiJoin)
    val (tEquiBhj, _) = withDisabled(time(equiJoin))

    // huge×huge: NEITHER side broadcastable (the 100 TB regime, modeled
    // by disabling broadcasts) — BandedRangeJoinRule's banded equi join
    // vs the cartesian/BNLJ plan Spark otherwise produces
    def withHuge[T](banded: Boolean)(f: => T): T = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.rangeJoin.bandWidth", width.toString)
      spark.conf.set("spark.graft.rangeJoin.banded.enabled", banded.toString)
      try f finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.graft.rangeJoin.bandWidth")
        spark.conf.unset("spark.graft.rangeJoin.banded.enabled")
      }
    }
    def hugeJoin = points.join(intervals,
      points("key") === intervals("key") && pureCond).count()
    val (tHugeBanded, nHuge) = withHuge(banded = true)(time(hugeJoin))
    val (tHugeBuiltin, _) = withHuge(banded = false)(time(hugeJoin))

    println("{" + Seq(
      "pure_range_rangejoin_s" -> tPureRj, "pure_range_bnlj_s" -> tPureBnl,
      "equi_range_rangejoin_s" -> tEquiRj, "equi_range_bhj_s" -> tEquiBhj,
      "huge_banded_s" -> tHugeBanded, "huge_builtin_s" -> tHugeBuiltin)
      .map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString(",") +
      s""","n_points":$nPoints,"n_intervals":$nIv,"n_pure":$nPure,"n_equi":$nEqui,"n_huge":$nHuge}""")
    spark.stop()
  }
}
