package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Adversarial audit of the quantile summary's two conservation
  * theorems at tiny c (where every compaction path fires):
  * weight conservation (Σ entry weights = n — violated by the
  * round-10 odd-length-compaction bug this spec was written to catch:
  * evenHalf dropped one item per odd run, so a high-q estimate could
  * run off the end of the summary and return null) and the tracked
  * rank bound, across many value sets, partitionings, and quantiles.
  */
class QuantileBoundProbeSpec extends SparkSpec {
  import spark.implicits._

  test("c=8: weight conservation + rank bound across seeds, partitionings, quantiles") {
    val c = 8
    var failures = List.empty[String]
    for (seed <- 0 until 40; nParts <- Seq(1, 4, 8)) {
      val n = 40 + (seed * 7) % 80
      val vals = (0 until n).map(i =>
        ((i * 2654435761L + seed * 97L) % 1000L))
      val df = spark.createDataset(vals).toDF("v").repartition(nParts)
      val row = df.agg(Sketches.quantileSketch(col("v"), c).as("sk"))
        .select(
          aggregate(Sketches.quantileEntries(col("sk")), lit(0L),
            (acc, x) => acc + x.getField("_2")).as("w_sum"),
          Sketches.quantileN(col("sk")).as("n"),
          Sketches.quantileRankBound(col("sk")).as("rb"),
          Sketches.quantileEstimate(col("sk"), 0.5).as("p50"),
          Sketches.quantileEstimate(col("sk"), 0.9).as("p90"),
          Sketches.quantileEstimate(col("sk"), 0.99).as("p99"))
        .head()
      assert(row.getLong(0) == n,
        s"seed=$seed parts=$nParts: Σweights ${row.getLong(0)} != n=$n")
      assert(row.getLong(1) == n)
      val rb = row.getLong(2)
      val sorted = vals.sorted
      Seq(0.5 -> row.getLong(3), 0.9 -> row.getLong(4),
          0.99 -> row.getLong(5)).foreach { case (q, v) =>
        val target = math.max(1L, math.ceil(n * q).toLong)
        val rankLe = sorted.count(_ <= v).toLong
        val rankLt = sorted.count(_ < v).toLong
        if (!(rankLe >= target - rb && rankLt <= target + rb))
          failures ::= s"seed=$seed parts=$nParts n=$n q=$q v=$v " +
            s"rb=$rb target=$target rankLe=$rankLe rankLt=$rankLt"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("c=8: persisted rollup conserves weight and keeps the bound") {
    val c = 8
    val n = 500
    val vals = (0 until n).map(i => (i * 48271L) % 797L)
    val parts = spark.createDataset(vals.zipWithIndex.map {
        case (v, i) => (i % 7, v)
      }).toDF("g", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-qprobe").toString
    parts.groupBy("g")
      .agg(Sketches.quantileSketch(col("v"), c).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val row = spark.read.parquet(dir)
      .agg(Sketches.quantileMerge(col("sk"), c).as("sk"))
      .select(
        aggregate(Sketches.quantileEntries(col("sk")), lit(0L),
          (acc, x) => acc + x.getField("_2")).as("w_sum"),
        Sketches.quantileN(col("sk")).as("n"),
        Sketches.quantileRankBound(col("sk")).as("rb"),
        Sketches.quantileEstimate(col("sk"), 0.9).as("p90"))
      .head()
    assert(row.getLong(0) == n && row.getLong(1) == n)
    val sorted = vals.sorted
    val target = math.ceil(n * 0.9).toLong
    val v = row.getLong(3); val rb = row.getLong(2)
    assert(sorted.count(_ <= v) >= target - rb &&
      sorted.count(_ < v) <= target + rb)
  }
}
