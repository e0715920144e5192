package graft

import org.apache.spark.sql.functions._
import graft.operators.{MergeOps, Skew, TimeChunks, Validation}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("time chunks: window count, bounds, overlap membership") {
    val ch = TimeChunks.chunks(spark, 0L, 100L, duration = 20L, step = 10L)
      .orderBy("chunk_i").collect()
    assert(ch.length == 9) // last full window starts at 80
    assert(ch(0).getAs[Long]("chunk_start") == 0L &&
           ch(0).getAs[Long]("chunk_end") == 20L)
    assert(ch.last.getAs[Long]("chunk_end") == 100L)
    val pts = Seq(5L, 15L, 95L).toDF("ts")
    val assigned = TimeChunks.assign(pts, TimeChunks.chunks(spark, 0L, 100L, 20L, 10L), "ts")
    // t=15 belongs to chunks [0,20) and [10,30)
    assert(assigned.filter(col("ts") === 15L).count() == 2)
  }

  test("identity merge classifies new/updated/unchanged/rejected") {
    val oldCat = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
    val newCat = Seq((2L, 2.0), (3L, 9.0), (4L, 4.0)).toDF("k", "v")
    val m = MergeOps.identityMerge(oldCat, newCat, "k", "v")
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "rejected", 2L -> "unchanged",
                    3L -> "updated", 4L -> "new"))
  }

  test("latestByKey keeps the newest row per key") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")).toDF("k", "ts", "v")
    val out = MergeOps.latestByKey(df, "k", Seq(col("ts")))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "b", 2L -> "c"))
  }

  test("salted sum equals plain aggregate (exact decimals)") {
    val df = (1 to 1000).map(i => (i % 7L, i.toDouble / 100, i.toLong))
      .toDF("k", "v", "id")
    val salted = Skew.saltedSum(df, Seq("k"),
        col("v").cast("decimal(18,2)"), "s", pmod(col("id"), lit(16)))
      .select(col("k"), col("s").cast("double"), col("s_n"))
      .as[(Long, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val plain = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double"), count(lit(1)))
      .as[(Long, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(salted == plain)
  }

  test("validation report unions rules and names violations") {
    val df = Seq((1L, -5.0), (2L, 3.0)).toDF("entity_id", "bal")
    val rules = Seq(
      Validation.Rule("neg", () => df.filter(col("bal") < 0).select("entity_id")),
      Validation.Rule("big", () => df.filter(col("bal") > 100).select("entity_id")))
    val rep = Validation.report(rules).as[(Long, String)].collect()
    assert(rep.toSeq == Seq((1L, "neg")))
    val sum2 = Validation.summary(rules).as[(String, Long)].collect().toMap
    assert(sum2 == Map("neg" -> 1L))
  }

  test("wavebank: version enforcement rebuilds stale index; yieldWaveforms chunks") {
    val root = java.nio.file.Files.createTempDirectory("graft-ver").toString
    val bank = new graft.bank.WaveBank(spark, root)
    bank.putWaveforms(Seq(("N1", "S1", "", "BHZ", 0L, 10L, Array.fill(100)(1.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    // simulate an old index: drop the version column
    val old = spark.read.parquet(bank.indexPath).drop("index_version")
    old.write.mode("overwrite").parquet(s"$root/stale")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(bank.indexPath), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/stale"),
      new org.apache.hadoop.fs.Path(bank.indexPath))
    assert(!spark.read.parquet(bank.indexPath).columns.contains("index_version"))
    bank.enforceVersion()
    val rebuilt = spark.read.parquet(bank.indexPath)
    assert(rebuilt.columns.contains("index_version") && rebuilt.count() == 1)

    ()
  }

  test("wavebank: yieldWaveforms chunk join honors the ±1s buffer") {
    val root = java.nio.file.Files.createTempDirectory("graft-yield").toString
    val bank = new graft.bank.WaveBank(spark, root)
    // 100 samples × 10s period → segment [0, 1e12 ns]
    bank.putWaveforms(Seq(("N1", "S1", "", "BHZ", 0L, 10_000_000_000L,
        Array.fill(100)(1.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    val y = bank.yieldWaveforms(0L, 2_000_000_000_000L,
      durationNs = 500_000_000_000L, overlapNs = 0L)
    // chunks at 0 / 0.5e12 / 1e12 / 1.5e12; the 1e12 chunk still touches
    // the segment boundary within the buffer → 3 matches
    assert(y.count() == 3)
  }
}
