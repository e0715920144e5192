package graft

import java.nio.file.{Files, Paths}
import graft.core.Extractor
import graft.sources.BinarySegmentSource
import graft.sources.BinarySegmentSource.Segment
import org.apache.spark.sql.functions._

class SourceSpec extends SparkSpec {
  import spark.implicits._

  test("binary source: header-only summarize + full read + bad-file skip") {
    val dir = Files.createTempDirectory("graft-bin")
    BinarySegmentSource.writeFile(dir.resolve("a.seg"),
      Segment("N1", "S1", "", "BHZ", 1000L, 10L, Array(1.0, 2.0, 3.0), ""))
    BinarySegmentSource.writeFile(dir.resolve("b.seg"),
      Segment("N1", "S2", "00", "HHZ", 2000L, 5L, Array.fill(100)(7.0), ""))
    Files.write(dir.resolve("junk.seg"), "not a segment".getBytes) // skipped

    val idx = BinarySegmentSource.summaryIndex(spark, dir.toString)
    assert(idx.count() == 2)
    val a = idx.filter(col("station") === "S1").collect()(0)
    assert(a.getAs[Long]("starttime") == 1000L)
    assert(a.getAs[Long]("endtime") == 1030L) // 1000 + 3×10
    assert(a.getAs[String]("location") == "")

    val segs = BinarySegmentSource.readSegments(spark, dir.toString)
    val s1 = segs.filter(_.station == "S1").collect()(0)
    assert(s1.samples.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("extractor plugin: derived columns + SkipRow predicate") {
    val df = Seq((1L, "ok row"), (2L, ""), (3L, "fine")).toDF("id", "txt")
    val ex = Extractor()
      .withColumn("n_chars", length(col("txt")))
      .withColumn("upper", upper(col("txt")))
      .withKeep(length(col("txt")) > 0) // SkipRow analog
    val out = ex(df)
    assert(out.columns.toSeq == Seq("id", "txt", "n_chars", "upper"))
    assert(out.count() == 2)
    assert(out.filter(col("id") === 1).select("upper").as[String].head() == "OK ROW")
  }

  test("csv fallback reader conforms to schema") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("ev.csv")
    Files.write(f, "event_id,time,latitude\ne1,100,10.5\n".getBytes)
    val out = graft.core.Tables.readAny(spark, f.toString,
      graft.core.Schemas.eventSummary)
    assert(out.columns.take(3).toSeq == Seq("event_id", "time", "latitude"))
    val r = out.collect()(0)
    assert(r.getAs[String]("event_id") == "e1" && r.getAs[Long]("time") == 100L)
    assert(r.isNullAt(out.columns.indexOf("magnitude"))) // null-filled
  }
}
