package graft

import java.nio.file.Files
import graft.streaming.StreamingIndex

/** Incremental-indexing contract: a second run only processes files the
  * checkpoint hasn't seen (the mtime-watermark semantics of the
  * reference's `update_index`).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming index drains available files then picks up only new ones") {
    val root = Files.createTempDirectory("graft-stream").toString
    val segDir = s"$root/segments"; val idxDir = s"$root/index"
    val ckDir = s"$root/ck"

    def write(station: String, start: Long): Unit =
      Seq(("N1", station, "", "BHZ", start, 10L, Array.fill(10)(1.0)))
        .toDF("network", "station", "location", "channel",
              "starttime", "sampling_period", "samples")
        .coalesce(1).write.mode("append").parquet(segDir)

    write("S1", 0L); write("S2", 0L)
    val q1 = StreamingIndex.run(spark, segDir, idxDir, ckDir)
    q1.awaitTermination(60000)
    val first = spark.read.parquet(idxDir)
    assert(first.select("station").distinct().count() == 2)
    val batches1 = first.select("batch_id").distinct().count()

    write("S3", 100L)
    val q2 = StreamingIndex.run(spark, segDir, idxDir, ckDir)
    q2.awaitTermination(60000)
    val second = spark.read.parquet(idxDir)
    assert(second.select("station").distinct().count() == 3)
    // S1/S2 not re-summarized: only one extra batch of rows appended
    assert(second.count() == first.count() + 1)
    assert(second.select("batch_id").distinct().count() == batches1 + 1)
  }

  test("tx streaming index: incremental, exactly-once under batch replay") {
    val root = Files.createTempDirectory("graft-txstream").toString
    val segDir = s"$root/segments"; val ckDir = s"$root/ck"
    val tx = new graft.bank.TxTable(spark, s"$root/index")

    def write(station: String, start: Long): Unit =
      Seq(("N1", station, "", "BHZ", start, 10L, Array.fill(10)(1.0)))
        .toDF("network", "station", "location", "channel",
              "starttime", "sampling_period", "samples")
        .coalesce(1).write.mode("append").parquet(segDir)

    write("S1", 0L); write("S2", 0L)
    StreamingIndex.runTx(spark, segDir, tx, ckDir).awaitTermination(60000)
    val n1 = tx.read().count()
    assert(tx.read().select("station").distinct().count() == 2)

    // restart with the same checkpoint: nothing new → no new rows
    StreamingIndex.runTx(spark, segDir, tx, ckDir).awaitTermination(60000)
    assert(tx.read().count() == n1)

    // new file → exactly one more batch of rows
    write("S3", 100L)
    StreamingIndex.runTx(spark, segDir, tx, ckDir).awaitTermination(60000)
    assert(tx.read().select("station").distinct().count() == 3)

    // simulate foreachBatch replay of an already-committed batch: the
    // tag makes the re-commit a no-op, rows are not duplicated
    val before = tx.read().count()
    val replayRows = tx.read().limit(1)
    assert(tx.appendOnce(replayRows, tag = "stream-batch-0").isEmpty)
    assert(tx.read().count() == before)
    // a genuinely new tag commits
    assert(tx.appendOnce(replayRows, tag = "stream-batch-999").isDefined)
    assert(tx.read().count() == before + 1)
  }

  test("streaming dedup passes first arrival per fingerprint, drops later copies") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-sdedup").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val deduped = graft.streaming.StreamingDedup.dedupStream(
      in.toDF().toDF("doc_id", "text", "ts"),
      "text", "ts", watermark = "10 seconds")
    val ns = 1_000_000_000L
    in.addData((1L, "alpha beta", 1 * ns), (2L, "alpha  beta", 2 * ns), // dup (ws-insensitive)
               (3L, "gamma delta", 3 * ns))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("sdedup").select("doc_id").as[Long].collect().toSet
    // doc 2 is a fingerprint-dup of doc 1 within the watermark
    assert(out == Set(1L, 3L))
  }

  test("streaming duplicate-pick validation flags later same-station picks across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingValidation
    import graft.streaming.StreamingValidation.PickEvent
    val root = Files.createTempDirectory("graft-sval").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PickEvent]
    val violations = StreamingValidation.duplicatePicks(in.toDS())
    // default micro-batch trigger: the query stays live across the two
    // addData batches (AvailableNow would stop after the first)
    val q = violations.writeStream.format("memory").queryName("sval")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    def drain(): Unit = { q.processAllAvailable() }
    // batch 1: first P pick accepted; a second P on the same station
    // in the SAME batch flags; rejected and non-dup phases never flag
    in.addData(
      PickEvent("p1", "e1", "N", "S1", "", "P", "", 1000L),
      PickEvent("p2", "e1", "N", "S1", "", "P", "", 2000L), // dup (later)
      PickEvent("p3", "e1", "N", "S1", "", "P", "rejected", 500L), // skip
      PickEvent("p4", "e1", "N", "S1", "", "AML", "", 900L), // not a dup phase
      PickEvent("p5", "e1", "N", "S2", "", "P", "", 1000L)) // other station
    drain()
    assert(spark.table("sval").select("entity_id").as[String]
      .collect().toSet == Set("p2"))
    // batch 2: later pick on the same key flags against carried state;
    // an EARLIER late pick replaces the keeper and flags the old one
    in.addData(
      PickEvent("p6", "e1", "N", "S1", "", "P", "", 3000L), // dup vs p1
      PickEvent("p0", "e1", "N", "S2", "", "P", "", 100L)) // earlier than p5
    drain()
    q.stop()
    val all = spark.table("sval").select("entity_id").as[String].collect().toSet
    assert(all == Set("p2", "p6", "p5"))
  }
}
