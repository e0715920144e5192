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

  test("streaming gaps: incremental emission, in-watermark reorder, O(1) sealed state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-sgaps").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val h = 3_600_000_000_000L // 1 h in ns
    // base offset: event time 0 equals the INITIAL watermark, and
    // stateful operators drop input at/under the watermark — real
    // archive times are epoch-scale, so the test's should be too
    val t0 = 1_000_000_000_000_000_000L
    val in = MemoryStream[(String, Long, Long)]
    val gaps = graft.streaming.StreamingIntervals.gapStream(
      in.toDF().toDF("sid", "starttime", "endtime"),
      "sid", "starttime", "endtime",
      minGap = h / 2, watermark = "10 seconds")
    val q = gaps.writeStream.format("memory").queryName("sgaps")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    def emitted(): Set[(String, Long, Long, Long)] =
      spark.table("sgaps").as[(String, Long, Long, Long)].collect().toSet
    try {
      // batch 1: A has a 1 h hole between [0,1h] and [2h,3h]; the two
      // segments arrive REVERSED — the watermark buffer must reorder.
      // B is contiguous (overlapping segments, running-max case).
      in.addData(("A", t0 + 2 * h, t0 + 3 * h), ("A", t0, t0 + 1 * h),
                 ("B", t0, t0 + 2 * h), ("B", t0 + 1 * h, t0 + 3 * h))
      q.processAllAvailable()
      // nothing sealed yet (watermark still behind the data)
      assert(emitted().isEmpty)
      // batch 2: later data advances the watermark past batch 1; A's
      // gap emits, B stays gapless. A's new segment opens a second hole
      // that is NOT yet sealed.
      in.addData(("A", t0 + 6 * h, t0 + 7 * h))
      q.processAllAvailable()
      in.addData(("C", t0 + 8 * h, t0 + 9 * h)) // watermark pusher + fresh key
      q.processAllAvailable()
      in.addData(("C", t0 + 10 * h, t0 + 11 * h)) // second pusher: timeouts fire
      q.processAllAvailable()
      assert(emitted() == Set(("A", t0 + 1 * h, t0 + 2 * h, 1 * h),
        ("A", t0 + 3 * h, t0 + 6 * h, 3 * h)), s"got ${emitted()}")
      // the batch operator on the same sealed data agrees
      val batch = graft.operators.Intervals.gaps(
        Seq(("A", t0, t0 + 1 * h), ("A", t0 + 2 * h, t0 + 3 * h),
          ("A", t0 + 6 * h, t0 + 7 * h),
          ("B", t0, t0 + 2 * h), ("B", t0 + 1 * h, t0 + 3 * h))
          .toDF("sid", "starttime", "endtime"), Seq("sid"), h / 2)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(batch == emitted(), s"batch $batch vs stream ${emitted()}")
      // sealed state is O(1): a station silent for "days" still yields
      // its gap when it resumes (runMax persisted after finalization)
      in.addData(("A", t0 + 100 * h, t0 + 101 * h))
      q.processAllAvailable()
      in.addData(("C", t0 + 120 * h, t0 + 121 * h)) // pusher
      q.processAllAvailable()
      in.addData(("C", t0 + 122 * h, t0 + 123 * h)) // second pusher
      q.processAllAvailable()
      assert(emitted().contains(("A", t0 + 7 * h, t0 + 100 * h, 93 * h)),
        s"idle-resume gap missing: ${emitted()}")
    } finally q.stop()
  }

  test("streaming segments: watermark closure, session-id parity, idle numbering") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-ssegs").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val h = 3_600_000_000_000L // 1 h in ns
    val t0 = 1_000_000_000_000_000_000L
    val in = MemoryStream[(String, Long, Long)]
    val segs = graft.streaming.StreamingIntervals.segmentStream(
      in.toDF().toDF("sid", "starttime", "endtime"),
      "sid", "starttime", "endtime",
      tol = h / 2, watermark = "10 seconds")
    val q = segs.writeStream.format("memory").queryName("ssegs")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    def emitted(): Set[(String, Long, Long, Long, Long)] =
      spark.table("ssegs").as[(String, Long, Long, Long, Long)]
        .collect().toSet
    try {
      // A: two sessions separated by a 1 h hole, arriving REVERSED;
      // B: overlapping rows coalescing into ONE session
      in.addData(("A", t0 + 2 * h, t0 + 3 * h), ("A", t0, t0 + 1 * h),
                 ("B", t0, t0 + 2 * h), ("B", t0 + 1 * h, t0 + 3 * h))
      q.processAllAvailable()
      // whether A's FIRST session has emitted yet depends on whether a
      // no-data micro-batch ran after the watermark advanced (a timing
      // race processAllAvailable does not pin) — but A's still-open
      // second session and B's still-extendable session must NOT have:
      // the watermark has not passed their runMax + tol
      assert(emitted().subsetOf(Set(("A", 1L, t0, t0 + 1 * h, 1L))),
        s"premature emission: ${emitted()}")
      // pushers advance the watermark; NO further A/B data ever arrives,
      // so A's last session and B's only session can close ONLY via the
      // watermark-closure path (cut > runMax + tol)
      in.addData(("C", t0 + 8 * h, t0 + 9 * h))
      q.processAllAvailable()
      in.addData(("C", t0 + 10 * h, t0 + 11 * h))
      q.processAllAvailable()
      in.addData(("C", t0 + 12 * h, t0 + 13 * h))
      q.processAllAvailable()
      val ab = emitted().filter(r => r._1 == "A" || r._1 == "B")
      assert(ab == Set(("A", 1L, t0, t0 + 1 * h, 1L),
                       ("A", 2L, t0 + 2 * h, t0 + 3 * h, 1L),
                       ("B", 1L, t0, t0 + 3 * h, 2L)), s"got $ab")
      // the batch operator agrees, session ids included
      val batch = graft.operators.Intervals.segments(
        Seq(("A", t0, t0 + 1 * h), ("A", t0 + 2 * h, t0 + 3 * h),
          ("B", t0, t0 + 2 * h), ("B", t0 + 1 * h, t0 + 3 * h))
          .toDF("sid", "starttime", "endtime"), Seq("sid"), h / 2)
        .select("sid", "session_id", "seg_start", "seg_end", "n_members")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(batch == ab, s"batch $batch vs stream $ab")
      // idle-key resume: A comes back "days" later — the O(1) sealed
      // state keeps the session COUNTER, so the new span numbers 3
      in.addData(("A", t0 + 100 * h, t0 + 101 * h))
      q.processAllAvailable()
      in.addData(("C", t0 + 120 * h, t0 + 121 * h))
      q.processAllAvailable()
      in.addData(("C", t0 + 122 * h, t0 + 123 * h))
      q.processAllAvailable()
      assert(emitted().contains(("A", 3L, t0 + 100 * h, t0 + 101 * h, 1L)),
        s"idle-resume session missing or mis-numbered: ${emitted()}")
    } finally q.stop()
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

  test("streaming span detection converges to batch q79 across batches; late data drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-sspan").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val in = MemoryStream[(Long, String, Long)]
    val changes = graft.streaming.StreamingDedup.duplicateSpanStream(
      in.toDF().toDF("doc_id", "text", "ts"), "text", "doc_id", "ts",
      width = 8, stride = 1, minDocs = 2L,
      watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("sspan")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    try {
      // batch 1: two docs sharing the planted run at different offsets
      in.addData((1L, s"a1 a2 $run", 10 * ns), (2L, s"$run z1 z2", 11 * ns))
      q.processAllAvailable()
      // batch 2: a third doc with the run AND a repeat of doc 1 (the
      // (span, doc) pair is already in dedup state — must not double
      // count); plus an unrelated unique doc
      in.addData((3L, s"m1 $run m2", 12 * ns), (1L, s"a1 a2 $run", 12 * ns),
        (9L, "u1 u2 u3 u4 u5 u6 u7 u8 u9", 13 * ns))
      q.processAllAvailable()
      // watermark pusher: event time far past window end + delay, so
      // append mode emits the 0-1h window's final counts
      in.addData((999L, (1 to 8).map(i => s"f$i").mkString(" "), 7200 * ns))
      q.processAllAvailable()
      // a LATE copy of the run (event time far behind the watermark)
      // must be dropped, not resurrect state or re-emit
      in.addData((4L, s"late $run", 9 * ns))
      q.processAllAvailable()
      in.addData((998L, (1 to 8).map(i => s"g$i").mkString(" "), 7300 * ns))
      q.processAllAvailable()

      val got = spark.table("sspan")
        .select("span_h", "n_docs").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      // the batch operator on the ON-TIME docs is the reference
      val batch = graft.operators.Dedup.duplicateSpans(
        Seq((1L, s"a1 a2 $run"), (2L, s"$run z1 z2"), (3L, s"m1 $run m2"),
          (9L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
          .toDF("doc_id", "text"),
        "text", "doc_id", width = 8, stride = 1, minDocs = 2L)
        .select("span_h", "n_docs").as[(Long, Long)].collect().toMap
      assert(got == batch, s"stream $got vs batch $batch")
      assert(batch.values.toSeq == Seq(3L), "exactly the planted run, 3 docs")
    } finally q.stop()
  }

  test("streaming minhash near-dup pairs match the batch pipeline; state evicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-sndup").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val near = "x0 " + (2 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"v$i").mkString(" ")
    val in = MemoryStream[(Long, String, Long)]
    val changes = graft.streaming.StreamingDedup.nearDupStream(
      in.toDF().toDF("doc_id", "text", "ts"), "text", "doc_id", "ts",
      k = 8, bands = 4, rowsPerBand = 2,
      watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("sndup")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    try {
      // batch 1: an exact near-dup family (1, 2) and an unrelated doc
      in.addData((1L, base, 10 * ns), (2L, base, 11 * ns), (5L, other, 11 * ns))
      q.processAllAvailable()
      // batch 2: a NEAR copy joins the family; doc 1 is re-delivered
      // (bucket state must not pair it with itself or double-emit)
      in.addData((3L, near, 12 * ns), (1L, base, 13 * ns))
      q.processAllAvailable()
      // watermark pusher past window end + delay: append emits finals
      in.addData((999L, (1 to 9).map(i => s"f$i").mkString(" "), 7200 * ns))
      q.processAllAvailable()
      // LATE near-dup copy (behind the watermark): dropped, no re-emit
      in.addData((4L, base, 9 * ns))
      q.processAllAvailable()
      in.addData((998L, (1 to 9).map(i => s"g$i").mkString(" "), 7300 * ns))
      q.processAllAvailable()

      val got = spark.table("sndup")
        .select("window_ns", "a", "b").as[(Long, Long, Long)].collect().toSet
      // the batch pipeline on the ON-TIME distinct docs is the reference
      val docs = Seq((1L, base), (2L, base), (3L, near), (5L, other))
        .toDF("doc_id", "text")
      val sigs = docs
        .withColumn("toks", graft.functions.TextFunctions.tokens($"text"))
        .select($"doc_id", graft.operators.Dedup.intMinhashSignature(
          graft.operators.Dedup.tokenShingleHashes($"toks"), 8).as("sig"))
      val batch = graft.operators.Dedup.candidatePairs(
        graft.operators.Dedup.lshBuckets(sigs, "sig", "doc_id", 4, 2),
        "doc_id").as[(Long, Long)].collect().toSet
      assert(batch.contains((1L, 2L)), "identical docs must pair")
      assert(got == batch.map { case (a, b) => (0L, a, b) },
        s"stream $got vs batch $batch")
      // watermark-bounded state: the closed window's dedup + bucket
      // rows were evicted, not retained forever
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "expected state eviction after the watermark passed")
    } finally q.stop()
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

  test("streaming validation: processing-time timeout expires idle per-key state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import graft.streaming.StreamingValidation
    import graft.streaming.StreamingValidation.PickEvent
    val root = Files.createTempDirectory("graft-sval-to").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PickEvent]
    val violations = StreamingValidation.duplicatePicks(in.toDS(),
      GroupStateTimeout.ProcessingTimeTimeout(), timeoutMs = 2000L)
    // a real trigger interval: with armed processing-time timeouts the
    // default 0ms trigger busy-loops no-data micro-batches. NOTE:
    // processAllAvailable() never returns under ProcessingTimeTimeout
    // (shouldRunAnotherBatch is always true, so the no-new-data latch
    // never fires) — observe the sink by polling instead.
    val q = violations.writeStream.format("memory").queryName("sval_to")
      .option("checkpointLocation", s"$root/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .outputMode("append").start()
    def sink(): Set[String] =
      spark.table("sval_to").select("entity_id").as[String].collect().toSet
    def awaitSink(expect: Set[String], ms: Long = 30000L): Unit = {
      val deadline = System.currentTimeMillis + ms
      while (sink() != expect && System.currentTimeMillis < deadline)
        Thread.sleep(100L)
      assert(sink() == expect)
    }
    try {
      in.addData(PickEvent("p1", "e1", "N", "S1", "", "P", "", 1000L))
      // same-key duplicate while state is live (within the timeout):
      // flags
      in.addData(PickEvent("p2", "e1", "N", "S1", "", "P", "", 2000L))
      awaitSink(Set("p2"))
      // let the key sit past the timeout; the continuous trigger
      // delivers the expiry (hasTimedOut -> state removed), so the
      // next same-key pick is accepted as a fresh first, NOT flagged
      Thread.sleep(3500L)
      in.addData(PickEvent("p3", "e1", "N", "S1", "", "P", "", 3000L))
      // p3 must NOT appear: give the query ample time to prove it
      Thread.sleep(1500L)
      assert(sink() == Set("p2"), "state should have expired before p3")
      // and the fresh state is live again: a fourth pick flags vs p3
      in.addData(PickEvent("p4", "e1", "N", "S1", "", "P", "", 4000L))
      awaitSink(Set("p2", "p4"))
    } finally q.stop()
  }

  test("streaming S-before-P: out-of-order delivery converges to the batch verdict") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingValidation
    import graft.streaming.StreamingValidation.PickEvent
    val root = Files.createTempDirectory("graft-sbp").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PickEvent]
    val q = StreamingValidation.sBeforeP(in.toDS())
      .writeStream.format("memory").queryName("sbp")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    // changelog contract: emissions per entity strictly alternate
    // starting at violated=true, so an odd change count means the
    // latest verdict is "violated" — no reliance on sink row order
    def latestViolated(): Set[String] = {
      val rows = spark.table("sbp").select("entity_id").as[String].collect()
      rows.groupBy(identity).collect {
        case (e, vs) if vs.length % 2 == 1 => e
      }.toSet
    }
    // S arrives first: alone it is no violation
    in.addData(PickEvent("s1", "e1", "N", "S1", "", "S", "", 100L))
    q.processAllAvailable()
    assert(latestViolated().isEmpty)
    // later P arrives -> S (100) < P (200): violated
    in.addData(PickEvent("pp1", "e1", "N", "S1", "", "P", "", 200L))
    q.processAllAvailable()
    assert(latestViolated() == Set("e1|N.S1."))
    // a LATE, earlier P (50) clears the verdict -> changelog retraction
    in.addData(PickEvent("pp0", "e1", "N", "S1", "", "P", "", 50L))
    q.processAllAvailable()
    q.stop()
    assert(latestViolated().isEmpty)
    // batch rule on the complete data agrees
    val picksDf = Seq(
      ("s1", "e1", "N", "S1", "", "S", null.asInstanceOf[String], 100L),
      ("pp1", "e1", "N", "S1", "", "P", null.asInstanceOf[String], 200L),
      ("pp0", "e1", "N", "S1", "", "P", null.asInstanceOf[String], 50L))
      .toDF("resource_id", "event_id", "network", "station", "location",
        "phase_hint", "evaluation_status", "time")
    assert(graft.operators.CatalogValidation.sBeforeP(picksDf).count() == 0)
  }

  test("streaming amp-pick link: dangling pick flags, late matching pick retracts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingValidation
    import graft.streaming.StreamingValidation.{AmpEvent, PickEvent}
    val root = Files.createTempDirectory("graft-ampl").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ampsIn = MemoryStream[AmpEvent]
    val picksIn = MemoryStream[PickEvent]
    val q = StreamingValidation.ampPickLink(ampsIn.toDS(), picksIn.toDS())
      .writeStream.format("memory").queryName("ampl")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    // same alternation argument as the S-before-P case: odd change
    // count per entity == currently violated
    def latestViolated(): Set[String] = {
      val rows = spark.table("ampl").select("entity_id").as[String].collect()
      rows.groupBy(identity).collect {
        case (e, vs) if vs.length % 2 == 1 => e
      }.toSet
    }
    // windowed amp before its pick: violated as of now (dangling link);
    // a windowless amp is never checked; a rejected amp is skipped
    ampsIn.addData(
      AmpEvent("a1", "e1", "pk1", "", Some(1000L), has_window = true),
      AmpEvent("a2", "e1", "pk2", "", Some(999L), has_window = true),
      AmpEvent("a3", "e1", "pk1", "", Some(77L), has_window = false),
      AmpEvent("a4", "e1", "pk1", "rejected", Some(77L), has_window = true))
    q.processAllAvailable()
    assert(latestViolated() == Set("a1", "a2"))
    // pk1 lands with time == a1.reference: a1 retracts; pk2 lands with
    // a different time: a2 stays violated
    picksIn.addData(
      PickEvent("pk1", "e1", "N", "S1", "", "P", "", 1000L),
      PickEvent("pk2", "e1", "N", "S1", "", "P", "", 1000L))
    q.processAllAvailable()
    q.stop()
    assert(latestViolated() == Set("a2"))
    // batch rule on the complete data agrees: a2 mismatched, a1
    // matches, a3 windowless, a4 rejected
    val ampsDf = Seq(
      ("a1", "e1", "pk1", Option.empty[String], Option(0L), Option.empty[Long], Option(1000L)),
      ("a2", "e1", "pk2", Option.empty[String], Option(0L), Option.empty[Long], Option(999L)),
      ("a3", "e1", "pk1", Option.empty[String], Option.empty[Long], Option.empty[Long], Option(77L)),
      ("a4", "e1", "pk1", Option("rejected"), Option(0L), Option.empty[Long], Option(77L)))
      .toDF("resource_id", "event_id", "pick_id", "evaluation_status",
        "time_begin", "time_end", "reference")
    val picksDf = Seq(("pk1", "e1", 1000L), ("pk2", "e1", 1000L))
      .toDF("resource_id", "event_id", "time")
    val batch = graft.operators.CatalogValidation
      .ampTimesContainPickTime(ampsDf, picksDf)
      .as[String].collect().toSet
    assert(batch == Set("a2"))
  }

  test("streaming embedding near-dup pairs match the batch pipeline; state evicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-sedup").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    // 8-dim vectors: base family co-buckets (all-positive signs), the
    // unrelated vector lands in a different sign bucket entirely
    val base = Seq.tabulate(8)(i => 1.0f + i * 0.1f)
    val near = base.updated(0, 1.01f) // cosine ≈ 0.999986 vs base
    val other = Seq.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val in = MemoryStream[(Long, Seq[Float], Long)]
    val changes = graft.streaming.StreamingDedup.embeddingNearDupStream(
      in.toDF().toDF("doc_id", "embedding", "ts"), "doc_id", "embedding",
      "ts", bits = 8, minCosine = 0.99,
      watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("sedup")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    try {
      // batch 1: an exact copy pair (1, 2) and an unrelated vector
      in.addData((1L, base, 10 * ns), (2L, base, 11 * ns),
        (5L, other, 11 * ns))
      q.processAllAvailable()
      // batch 2: a NEAR copy joins the family; doc 1 re-delivered (the
      // bucket dedup state must not self-pair or double-emit it)
      in.addData((3L, near, 12 * ns), (1L, base, 13 * ns))
      q.processAllAvailable()
      // watermark pusher past window end + delay: append emits finals
      in.addData((999L, other.map(-_), 7200 * ns))
      q.processAllAvailable()
      // LATE copy (behind the watermark): dropped, no re-emit
      in.addData((4L, base, 9 * ns))
      q.processAllAvailable()
      in.addData((998L, other.map(-_), 7300 * ns))
      q.processAllAvailable()

      val got = spark.table("sedup")
        .select("window_ns", "a", "b", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSet
      // the batch operator on the ON-TIME distinct vectors is the
      // reference — identical bucketing, cosine rounding, and cut
      val batch = graft.operators.Similarity.nearDupPairs(
        Seq((1L, base), (2L, base), (3L, near), (5L, other))
          .toDF("doc_id", "embedding"),
        "doc_id", "embedding", bits = 8, minCosine = 0.99)
        .as[(Long, Long, Double)].collect().toSet
      assert(batch.map(_._3).contains(1.0d), "identical vectors at cos 1")
      assert(batch.exists { case (a, b, _) => (a, b) == (1L, 3L) },
        "near copy must pair with the family")
      assert(got == batch.map { case (a, b, c) => (0L, a, b, c) },
        s"stream $got vs batch $batch")
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "expected state eviction after the watermark passed")
    } finally q.stop()
  }

  test("streaming ANN over a static corpus matches batch lshTopK; late query drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-sann").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    // corpus: two sign-bucket families (all-positive / alternating),
    // graded so top-k order is unambiguous in double precision
    val corpusRows = (0 until 12).map { i =>
      val fam = i % 2
      val v = Seq.tabulate(8) { d =>
        val base = if (fam == 0) 1.0f else { if (d % 2 == 0) 1.0f else -1.0f }
        base * (1.0f + 0.05f * ((i * (d + 3)) % 7))
      }
      (100L + i, v)
    }
    val corpusDf = graft.streaming.StreamingSimilarity.bucketCorpus(
      corpusRows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      bits = 8).persist()
    val in = MemoryStream[(Long, Seq[Float], Long)]
    val changes = graft.streaming.StreamingSimilarity.annStream(
      in.toDF().toDF("vec_id", "embedding", "ts"), corpusDf,
      "vec_id", "embedding", "ts", bits = 8, k = 3,
      watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("sann")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    val qa = Seq.tabulate(8)(_ => 1.0f)
    val qb = Seq.tabulate(8)(d => if (d % 2 == 0) 2.0f else -2.0f)
    try {
      // batch 1: one query per family; batch 2: a re-delivered copy of
      // query 1 (must dedup, not double-emit) and a third query
      in.addData((1L, qa, 10 * ns), (2L, qb, 11 * ns))
      q.processAllAvailable()
      in.addData((1L, qa, 12 * ns), (3L, qa.map(_ * 3f), 13 * ns))
      q.processAllAvailable()
      // watermark pusher past window end + delay: append emits finals
      in.addData((999L, qb, 7200 * ns))
      q.processAllAvailable()
      // LATE query behind the watermark: dropped, never answered
      in.addData((4L, qa, 9 * ns))
      q.processAllAvailable()
      in.addData((998L, qb, 7300 * ns))
      q.processAllAvailable()

      val got = spark.table("sann")
        .select("q_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      // batch reference on the ON-TIME distinct queries
      val batch = graft.operators.Similarity.lshTopK(
        corpusRows.toDF("vec_id", "embedding"),
        Seq((1L, qa), (2L, qb), (3L, qa.map(_ * 3f)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", bits = 8, k = 3)
        .select("q_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(batch.count(_._1 == 1L) == 3, "full top-3 per query")
      assert(got == batch, s"stream $got vs batch $batch")
      // the static corpus carries no state: only the query dedup and
      // the window agg hold rows, and the watermark evicted them
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "expected state eviction after the watermark passed")
    } finally { q.stop(); corpusDf.unpersist() }
  }

  test("streaming image near-dup: window attribution and cross-window suppression") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-simg2w").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    def png(id: Long) = graft.queries.MultimodalQueries.renderPng(id)
    val in = MemoryStream[(Long, Array[Byte], Long)]
    val changes = graft.streaming.StreamingDedup.imageNearDupStream(
      in.toDF().toDF("doc_id", "payload", "ts"), "doc_id", "payload",
      "ts", maxHamming = 3, watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("simg2w")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    try {
      // window 0: an identical-image pair (1, 2) + an unrelated image;
      // window 1: a second identical pair (4, 5) + doc 6 carrying the
      // SAME image as window 0's pair — identical pixels, Hamming 0,
      // but a different window, so (1,6)/(2,6) must never emit
      in.addData((1L, png(1), 10 * ns), (2L, png(1), 11 * ns),
        (3L, png(500), 12 * ns))
      q.processAllAvailable()
      in.addData((4L, png(2), 3610 * ns), (5L, png(2), 3620 * ns),
        (6L, png(1), 3630 * ns))
      q.processAllAvailable()
      in.addData((999L, png(900), 7200 * ns))
      q.processAllAvailable()
      // LATE copy of image 1 inside window 0's span: dropped
      in.addData((7L, png(1), 9 * ns))
      q.processAllAvailable()
      in.addData((998L, png(901), 7300 * ns))
      q.processAllAvailable()

      val got = spark.table("simg2w")
        .select("window_ns", "a", "b", "hamming")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((0L, 1L, 2L, 0L), (3600L * ns, 4L, 5L, 0L)),
        s"per-window pairs only, under their own window_ns: $got")
    } finally q.stop()
  }

  test("streaming audio near-dup: window attribution and cross-window suppression") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-saud2w").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    def wav(id: Long) = graft.queries.AudioQueries.renderWav(id)
    val in = MemoryStream[(Long, Array[Byte], Long)]
    val changes = graft.streaming.StreamingDedup.audioNearDupStream(
      in.toDF().toDF("doc_id", "payload", "ts"), "doc_id", "payload",
      "ts", maxHamming = 3, watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("saud2w")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    try {
      // window 0: an identical-clip pair (1, 2) + an unrelated clip;
      // window 1: a second identical pair (4, 5) + doc 6 carrying the
      // SAME clip as window 0's pair — Hamming 0 but a different
      // window, so (1,6)/(2,6) must never emit; a late copy of clip 1
      // inside window 0's span drops at the watermark
      in.addData((1L, wav(1), 10 * ns), (2L, wav(1), 11 * ns),
        (3L, wav(500), 12 * ns))
      q.processAllAvailable()
      in.addData((4L, wav(2), 3610 * ns), (5L, wav(2), 3620 * ns),
        (6L, wav(1), 3630 * ns))
      q.processAllAvailable()
      in.addData((999L, wav(900), 7200 * ns))
      q.processAllAvailable()
      in.addData((7L, wav(1), 9 * ns))
      q.processAllAvailable()
      in.addData((998L, wav(901), 7300 * ns))
      q.processAllAvailable()

      val got = spark.table("saud2w")
        .select("window_ns", "a", "b", "hamming")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((0L, 1L, 2L, 0L), (3600L * ns, 4L, 5L, 0L)),
        s"per-window pairs only, under their own window_ns: $got")
    } finally q.stop()
  }

  test("streaming IVF ANN matches batch ivfTopK across batches; late query drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-sivf").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    // 12 corpus vectors spread over 4 deterministic centroids (the
    // first 4 by id); graded magnitudes keep every ordering strict
    val corpusRows = (0 until 12).map { i =>
      val v = Seq.tabulate(8) { d =>
        val sgn = if (((i / 4) + d) % 2 == 0) 1.0f else -1.0f
        sgn * (1.0f + 0.07f * ((i * (d + 5)) % 11))
      }
      (100L + i, v)
    }
    val corpusDf = corpusRows.toDF("vec_id", "embedding")
    val index = graft.streaming.StreamingSimilarity.ivfIndex(
      corpusDf, "vec_id", "embedding", nCells = 4)
    index.cells.persist().count()
    val in = MemoryStream[(Long, Seq[Float], Long)]
    val changes = graft.streaming.StreamingSimilarity.ivfStream(
      in.toDF().toDF("vec_id", "embedding", "ts"), index,
      "vec_id", "embedding", "ts", nProbe = 2, k = 3,
      watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("sivf")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    val qa = corpusRows(1)._2.map(_ * 1.1f)
    val qb = corpusRows(6)._2.map(_ * 0.9f)
    val qc = corpusRows(10)._2
    try {
      in.addData((1L, qa, 10 * ns), (2L, qb, 11 * ns))
      q.processAllAvailable()
      // re-delivered query 1 must dedup; a third query joins
      in.addData((1L, qa, 12 * ns), (3L, qc, 13 * ns))
      q.processAllAvailable()
      in.addData((999L, qb.map(-_), 7200 * ns))
      q.processAllAvailable()
      in.addData((4L, qa, 9 * ns)) // late: dropped
      q.processAllAvailable()
      in.addData((998L, qb.map(-_), 7300 * ns))
      q.processAllAvailable()

      val got = spark.table("sivf")
        .select("q_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      val batch = graft.operators.Similarity.ivfTopK(
        corpusDf, Seq((1L, qa), (2L, qb), (3L, qc))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", nCells = 4, nProbe = 2, k = 3)
        .select("q_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(batch.count(_._1 == 1L) == 3, "full top-3 per query")
      assert(got == batch, s"stream $got vs batch $batch")
    } finally { q.stop(); index.cells.unpersist() }
  }

  test("multi-probe ANN stream matches batch lshTopKMultiProbe; recall dominates single-probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-sannmp").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    // vectors with one small-|component| dim, so a query sitting just
    // across that hyperplane recovers its neighbors via the flip probe
    // per-row UNIQUE sign patterns on dims 1..7 (driven by i's bits),
    // tiny |dim 0|: the flip probe's target hyperplane
    val corpusRows = (0 until 10).map { i =>
      val v = Seq.tabulate(8) { d =>
        if (d == 0) 0.05f * (if (i % 2 == 0) 1 else -1)
        else (1.0f + 0.04f * ((i * (d + 3)) % 7)) *
          (if (((i >> (d % 4)) & 1) == 0) 1f else -1f)
      }
      (300L + i, v)
    }
    val corpusDf = graft.streaming.StreamingSimilarity.bucketCorpus(
      corpusRows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      bits = 8).persist()
    val in = MemoryStream[(Long, Seq[Float], Long)]
    val changes = graft.streaming.StreamingSimilarity.annStream(
      in.toDF().toDF("vec_id", "embedding", "ts"), corpusDf,
      "vec_id", "embedding", "ts", bits = 8, k = 5,
      watermark = "30 seconds", windowDur = "1 hour", nProbe = 3)
    val q = changes.writeStream.format("memory").queryName("sannmp")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    val qa = corpusRows(2)._2.updated(0, -0.01f) // just across dim-0's plane
    try {
      in.addData((1L, qa, 10 * ns))
      q.processAllAvailable()
      in.addData((999L, corpusRows(0)._2.map(-_), 7200 * ns))
      q.processAllAvailable()
      val got = spark.table("sannmp")
        .select("q_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      val batch = graft.operators.Similarity.lshTopKMultiProbe(
        corpusRows.toDF("vec_id", "embedding"),
        Seq((1L, qa)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", bits = 8, nProbe = 3, k = 5)
        .select("q_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == batch, s"stream $got vs batch $batch")
      // the probe across dim 0 recovers neighbors single-probe misses:
      // with a candidate SUPERSET, the best cosine can only improve
      // (set inclusion at fixed k need not hold — better candidates
      // displace weaker ones), and here it strictly does
      val single = graft.operators.Similarity.lshTopK(
        corpusRows.toDF("vec_id", "embedding"),
        Seq((1L, qa)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", bits = 8, k = 5)
        .select("cosine").as[Double].collect()
      val bestSingle = if (single.isEmpty) -1.0 else single.max
      val bestMulti = batch.map(_._3).max
      assert(bestMulti > bestSingle,
        s"expected a strictly better best match: $bestSingle vs $bestMulti")
    } finally { q.stop(); corpusDf.unpersist() }
  }

  test("trained-centroid IVF index: stream matches batch ivfTopKWith on the same codebook") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-sivft").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    val corpusRows = (0 until 16).map { i =>
      val v = Seq.tabulate(8) { d =>
        val sgn = if (((i / 4) + d) % 2 == 0) 1.0f else -1.0f
        sgn * (1.0f + 0.06f * ((i * (d + 7)) % 13))
      }
      (200L + i, v)
    }
    val corpusDf = corpusRows.toDF("vec_id", "embedding")
    val index = graft.streaming.StreamingSimilarity.ivfIndexTrained(
      corpusDf, "vec_id", "embedding", nCells = 4, iters = 2)
    index.cells.persist().count()
    // the trained codebook must differ from the raw first-4 seeding
    // (Lloyd's moved the centroids) or this test proves nothing
    val firstK = graft.operators.Similarity.centroidVectors(
      corpusDf, "vec_id", "embedding", 4)
    assert(index.centroids != firstK, "training should move centroids")
    val in = MemoryStream[(Long, Seq[Float], Long)]
    val changes = graft.streaming.StreamingSimilarity.ivfStream(
      in.toDF().toDF("vec_id", "embedding", "ts"), index,
      "vec_id", "embedding", "ts", nProbe = 2, k = 3,
      watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("sivft")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    try {
      in.addData((1L, corpusRows(3)._2.map(_ * 1.2f), 10 * ns),
        (2L, corpusRows(9)._2.map(_ * 0.8f), 11 * ns))
      q.processAllAvailable()
      in.addData((999L, corpusRows(0)._2.map(-_), 7200 * ns))
      q.processAllAvailable()
      val got = spark.table("sivft")
        .select("q_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      val batch = graft.operators.Similarity.ivfTopKWith(
        corpusDf, Seq((1L, corpusRows(3)._2.map(_ * 1.2f)),
          (2L, corpusRows(9)._2.map(_ * 0.8f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", index.centroids, nProbe = 2, k = 3)
        .select("q_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == batch, s"stream $got vs batch $batch")
    } finally { q.stop(); index.cells.unpersist() }
  }

  test("corpusIngest: incremental, exactly-once, and the loaded snapshot serves like batch") {
    val root = Files.createTempDirectory("graft-singest").toString
    val feed = s"$root/feed"
    def vecs(from: Int, until: Int) = (from until until).map { i =>
      (i.toLong, Seq.tabulate(8)(d => (1.0f + 0.03f * ((i * (d + 3)) % 5)) *
        (if ((i / 4 + d) % 2 == 0) 1f else -1f)))
    }
    vecs(0, 96).toDF("vec_id", "embedding")
      .repartition(4).write.parquet(feed)
    val tx = new graft.bank.TxTable(spark, s"$root/tx")
    def drain(): Unit = graft.streaming.StreamingSimilarity.corpusIngest(
      spark.readStream.schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", "2").parquet(feed),
      "vec_id", "embedding", bits = 8, tx,
      checkpointDir = s"$root/ck").awaitTermination()
    drain()
    val v1 = tx.latestVersion()
    assert(graft.streaming.StreamingSimilarity.loadCorpus(tx).count() == 96)
    // a second drain over the SAME feed: the checkpoint remembers the
    // files, no batch re-runs, the log gains nothing
    drain()
    assert(tx.latestVersion() == v1, "re-drain must commit nothing")
    // new feed files ingest incrementally; the pinned old version
    // still serves the old snapshot (the refresh contract)
    vecs(96, 128).toDF("vec_id", "embedding")
      .repartition(2).write.mode("append").parquet(feed)
    drain()
    assert(graft.streaming.StreamingSimilarity.loadCorpus(tx).count() == 128)
    assert(graft.streaming.StreamingSimilarity
      .loadCorpus(tx, Some(v1)).count() == 96)
    // the ingested store serves EXACTLY like a corpus bucketed in
    // place from the same vectors
    val served = graft.streaming.StreamingSimilarity.loadCorpus(tx)
    val inPlace = graft.streaming.StreamingSimilarity.bucketCorpus(
      vecs(0, 128).toDF("vec_id", "embedding"), "vec_id", "embedding",
      bits = 8)
    assert(served.select("neighbor_id", "n_norm", "bucket")
      .as[(Long, Double, String)].collect().toSet ==
      inPlace.select("neighbor_id", "n_norm", "bucket")
        .as[(Long, Double, String)].collect().toSet)
  }

  test("streaming decontamination matches batch; re-delivery dedups; late doc drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft-sdecon").toString
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1_000_000_000L
    val evalDocs = Seq((100L, "the secret eval answer is forty two"))
      .toDF("doc_id", "text")
    val evalH = graft.streaming.StreamingContamination
      .evalShingles(evalDocs, "text").persist()
    val leaky = "we think the secret eval answer is forty two exactly"
    // shares WORDS and even bigrams with the eval doc, but no 3-gram
    val partial = "eval answer lurks here secret forty"
    val clean = "totally unrelated words in this document"
    val in = MemoryStream[(Long, String, Long)]
    val changes = graft.streaming.StreamingContamination.contaminatedStream(
      in.toDF().toDF("doc_id", "text", "ts"), evalH, "text", "doc_id",
      "ts", watermark = "30 seconds", windowDur = "1 hour")
    val q = changes.writeStream.format("memory").queryName("sdecon")
      .option("checkpointLocation", s"$root/ck")
      .outputMode("append").start()
    try {
      in.addData((1L, leaky, 10 * ns), (2L, clean, 11 * ns))
      q.processAllAvailable()
      // batch 2: doc 1 re-delivered (must not double-count its
      // shingles), a no-shared-3-gram doc, and a second leak
      in.addData((1L, leaky, 12 * ns), (3L, partial, 12 * ns),
        (4L, "eval answer is forty two", 13 * ns))
      q.processAllAvailable()
      in.addData((999L, "zz flush doc", 7200 * ns))
      q.processAllAvailable()
      // LATE leak behind the watermark: dropped, never flagged —
      // the caller's horizon contract, same as every stream here
      in.addData((5L, leaky, 9 * ns))
      q.processAllAvailable()
      in.addData((998L, "zz flush two", 7300 * ns))
      q.processAllAvailable()

      val got = spark.table("sdecon")
        .select("doc_id", "n_shared").as[(Long, Long)].collect().toSet
      val batch = graft.operators.Contamination.contaminatedDocs(
        Seq((1L, leaky), (2L, clean), (3L, partial),
          (4L, "eval answer is forty two")).toDF("doc_id", "text"),
        evalDocs, "text", "doc_id")
        .as[(Long, Long)].collect().toSet
      assert(batch.map(_._1) == Set(1L, 4L), s"expected docs 1,4: $batch")
      assert(got == batch, s"stream $got vs batch $batch")
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "expected state eviction after the watermark passed")
    } finally { q.stop(); evalH.unpersist() }
  }
}
