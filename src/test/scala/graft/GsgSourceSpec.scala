package graft

import graft.sources.BinarySegmentSource.{Segment, writeFile, writeMultiRecordFile}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** The gsg DataSource V2: record-boundary split planning, small-file
  * coalescing, in-reader column pruning and header filter pushdown.
  */
class GsgSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): Path = Files.createTempDirectory("gsg")

  private def seg(net: String, sta: String, cha: String, t0: Long,
                  n: Int, fill: Double): Segment =
    Segment(net, sta, "", cha, t0, 10L, Array.fill(n)(fill), "")

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan: " +
      df.queryExecution.executedPlan.treeString))

  test("multi-record files round-trip with exact samples") {
    val dir = tmp()
    writeMultiRecordFile(dir.resolve("multi.gsg"), Seq(
      seg("N1", "S1", "BHZ", 0L, 100, 1.5),
      seg("N1", "S2", "BHN", 1000L, 50, 2.5),
      seg("N2", "S3", "HHZ", 2000L, 75, 3.5)))
    writeFile(dir.resolve("single.gsg"), seg("N3", "S4", "EHZ", 99L, 10, 9.0))

    val df = spark.read.format("gsg").load(dir.toString)
    assert(df.count() == 4)
    val r = df.filter($"station" === "S2").collect().head
    assert(r.getAs[Long]("starttime") == 1000L)
    val xs = r.getAs[scala.collection.Seq[Double]]("samples")
    assert(xs.length == 50 && xs.forall(_ == 2.5))
    assert(r.getAs[String]("path").endsWith("multi.gsg"))
  }

  test("oversized files split at record boundaries into parallel tasks") {
    val dir = tmp()
    // 40 records × (56 + 8*500) ≈ 162 KB; cap partitions at 16 KB
    writeMultiRecordFile(dir.resolve("big.gsg"),
      (0 until 40).map(i => seg("N1", "S1", "BHZ", i * 1000L, 500, i.toDouble)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16 * 1024).toString)
    try {
      val df = spark.read.format("gsg").load(dir.toString)
      assert(df.rdd.getNumPartitions > 4,
        s"expected many splits, got ${df.rdd.getNumPartitions}")
      assert(df.count() == 40)
      // every record lands exactly once with its own payload
      val sums = df.select($"starttime",
        aggregate($"samples", lit(0.0), (a, x) => a + x).as("s"))
        .as[(Long, Double)].collect().toMap
      assert(sums(7000L) == 7.0 * 500)
      assert(sums.size == 40)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("small files coalesce into few partitions") {
    val dir = tmp()
    (0 until 60).foreach(i =>
      writeFile(dir.resolve(f"f$i%03d.gsg"), seg("N1", s"S$i", "BHZ", i, 5, 1.0)))
    val df = spark.read.format("gsg").load(dir.toString)
    assert(df.count() == 60)
    assert(df.rdd.getNumPartitions <= 4,
      s"60 tiny files should share tasks, got ${df.rdd.getNumPartitions}")
  }

  test("column pruning drops samples from the read schema") {
    val dir = tmp()
    writeMultiRecordFile(dir.resolve("m.gsg"),
      (0 until 10).map(i => seg("N1", "S1", "BHZ", i * 100L, 1000, 1.0)))
    val q = spark.read.format("gsg").load(dir.toString)
      .select("network", "station", "starttime")
    val scan = scanOf(q)
    assert(!scan.scan.readSchema().fieldNames.contains("samples"),
      scan.scan.readSchema().simpleString)
    assert(q.count() == 10)
  }

  test("header filters push down and results stay exact") {
    val dir = tmp()
    writeMultiRecordFile(dir.resolve("m.gsg"), Seq(
      seg("N1", "S1", "BHZ", 100L, 10, 1.0),
      seg("N1", "S2", "BHZ", 200L, 10, 2.0),
      seg("N2", "S3", "BHZ", 300L, 10, 3.0)))
    val q = spark.read.format("gsg").load(dir.toString)
      .filter($"network" === "N1" && $"starttime" >= 150L)
    val desc = scanOf(q).scan.description()
    assert(desc.contains("PushedFilters") && desc.contains("network"), desc)
    val rows = q.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("station") == "S2")
  }

  test("corrupt files and corrupt tails skip permissively") {
    val dir = tmp()
    writeFile(dir.resolve("good.gsg"), seg("N1", "S1", "BHZ", 0L, 10, 1.0))
    Files.write(dir.resolve("garbage.gsg"),
      Array.fill[Byte](200)(0x42))
    // good record followed by a truncated one
    val goodBytes = graft.sources.BinarySegmentSource.recordBytes(
      seg("N1", "S9", "BHZ", 5L, 10, 1.0))
    val truncated = graft.sources.BinarySegmentSource.recordBytes(
      seg("N1", "S8", "BHZ", 6L, 100, 2.0)).take(100)
    Files.write(dir.resolve("tail.gsg"), goodBytes ++ truncated)
    val df = spark.read.format("gsg").load(dir.toString)
    assert(df.select("station").as[String].collect().toSet == Set("S1", "S9"))
  }

  test("summaryIndexV2 prunes to a header-only scan and matches summaryIndex") {
    val dir = tmp()
    // single-record files: the legacy summarize reads one header per
    // file, so this is the comparable surface (multi-record files are
    // covered above and are V2-only)
    writeFile(dir.resolve("a.gsg"), seg("N1", "S1", "BHZ", 0L, 100, 1.0))
    writeFile(dir.resolve("b.gsg"), seg("N1", "S2", "BHN", 500L, 200, 2.0))
    val v2 = graft.sources.BinarySegmentSource.summaryIndexV2(spark, dir.toString)
    val scan = scanOf(v2)
    assert(!scan.scan.readSchema().fieldNames.contains("samples"),
      scan.scan.readSchema().simpleString)
    val cols = Seq("network", "station", "location", "channel",
      "starttime", "sampling_period", "endtime")
    val a = v2.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted
    val b = graft.sources.BinarySegmentSource.summaryIndex(spark, dir.toString)
      .select(cols.map(col): _*).collect().map(_.mkString("|")).sorted
    assert(a.toSeq == b.toSeq && a.length == 2)
    assert(v2.filter($"station" === "S2").select("endtime").as[Long].head() ==
      500L + 200L * 10L)
  }

  test("corrupt magic with negative sample count cannot hang planning") {
    val dir = tmp()
    // valid magic, garbage fields with n = -7: header parse must reject
    val bad = java.nio.ByteBuffer.allocate(56 + 100)
      .put("GSG1".getBytes("ASCII"))
      .put(Array.fill[Byte](32)(' '.toByte))
      .putLong(0L).putLong(10L).putInt(-7)
      .array()
    Files.write(dir.resolve("neg.gsg"), bad)
    writeFile(dir.resolve("ok.gsg"), seg("N1", "S1", "BHZ", 0L, 10, 1.0))
    // force the split planner's header-hop over the corrupt file too
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
    try {
      val df = spark.read.format("gsg").load(dir.toString)
      assert(df.select("station").as[String].collect().toSeq == Seq("S1"))
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("matches the binaryFile-based readSegments on a mixed archive") {
    val dir = tmp()
    (0 until 10).foreach(i =>
      writeFile(dir.resolve(f"f$i.gsg"), seg("N1", s"S$i", "BHZ", i * 7L, 20, i)))
    val v2 = spark.read.format("gsg").load(dir.toString)
      .select("network", "station", "location", "channel", "starttime",
        "sampling_period", "samples")
      .collect().map(_.mkString("|")).sorted.toSeq
    val v1 = graft.sources.BinarySegmentSource.readSegments(spark, dir.toString)
      .toDF()
      .select("network", "station", "location", "channel", "starttime",
        "sampling_period", "samples")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(v2 == v1 && v2.size == 10)
  }
}
