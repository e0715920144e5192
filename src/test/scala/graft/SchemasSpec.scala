package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Schemas

class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("conformTo: missing columns null-filled, extras sorted to end") {
    val df = Seq(("N1", 5)).toDF("network", "zzz_extra")
      .withColumn("aaa_extra", lit(1))
    val out = Schemas.conformTo(df, Schemas.waveformIndex)
    assert(out.columns.take(8).toSeq == Schemas.waveformIndex.fieldNames.toSeq)
    assert(out.columns.drop(8).toSeq == Seq("aaa_extra", "zzz_extra"))
    val r = out.collect()(0)
    assert(r.getAs[String]("network") == "N1")
    assert(r.isNullAt(out.columns.indexOf("starttime")))
  }

  test("conformTo coerces dtypes") {
    val df = Seq(("N1", "123")).toDF("network", "starttime")
    val out = Schemas.conformTo(df, Schemas.waveformIndex)
    assert(out.schema("starttime").dataType == LongType)
    assert(out.collect()(0).getAs[Long]("starttime") == 123L)
  }

  test("nslcNormalize: nullish → empty, single digits zero-padded") {
    val vals = Seq("None", "--", "nan", "1", "01", "BHZ", " 2 ")
    val out = vals.toDF("c").select(Schemas.nslcNormalize(col("c"))).as[String].collect()
    assert(out.toSeq == Seq("", "", "", "01", "01", "BHZ", "02"))
  }

  test("seed id round trip") {
    val df = Seq(("N", "S", "00", "BHZ")).toDF("n", "s", "l", "c")
      .select(Schemas.seedId(col("n"), col("s"), col("l"), col("c")).as("seed"))
    assert(df.as[String].head() == "N.S.00.BHZ")
    val back = Schemas.splitSeedId(col("seed"))
    val r = df.select(back.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(r.getAs[String]("channel") == "BHZ" && r.getAs[String]("location") == "00")
  }

  test("ns → timestamp view truncates to µs without precision loss") {
    val df = Seq(1704067207179575123L).toDF("t")
    val out = df.select(Schemas.nsToTimestamp("t").as("ts"))
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == 1704067207179575L)
  }

  test("NaT sentinels round-trip: null → SMALLDT64/LARGEDT64 → null") {
    val df = Seq(Some(1000L), None).toDF("t")
    val stored = df.select(
      Schemas.timeToStorage(col("t")).as("closed"),
      Schemas.timeToStorage(col("t"), openEnded = true).as("open"))
    val vals = stored.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(vals(0) == ((Schemas.SmallDt64, Schemas.LargeDt64)))
    assert(vals(1) == ((1000L, 1000L)))
    // restore: both sentinels read back as null, real values untouched
    val back = stored.select(
      Schemas.timeFromStorage(col("closed")).as("c"),
      Schemas.timeFromStorage(col("open")).as("o")).collect()
    assert(back.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
    assert(back.exists(r => !r.isNullAt(0) && r.getLong(0) == 1000L))
  }
}
