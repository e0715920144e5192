package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.bank.WaveBank
import graft.operators.Sketches

/** The persisted sketch sidecar (round 10): every index write stamps
  * per-day sketch partials; `sketchStats()` rolls them up losslessly.
  * Pins the three lifecycle paths — append (partials from multiple
  * writes merge to the same sketch a from-scratch pass produces),
  * in-place-modification rewrite (stale partials discarded, sidecar
  * rebuilt), and backfill (pre-sidecar stores get one on first read).
  */
class BankSketchStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-banksketch").toString

  private val T0 = 1_600_000_000_000_000_000L
  private val HourNs = 3_600_000_000_000L

  /** `slots` hour-slots across 2 stations; lengths vary by slot. */
  private def segs(slots: Range, extra: Long = 0L): DataFrame =
    slots.flatMap { h =>
      Seq(0, 1).map { sid =>
        ("XX", s"S$sid", "", if (h % 2 == 0) "BHZ" else "BHN",
          T0 + h * HourNs, 1_000_000_000L,
          Array.fill((10 + (h * 7 + sid * 3) % 13 + extra).toInt)(1.0))
      }
    }.toDF("network", "station", "location", "channel",
      "starttime", "sampling_period", "samples")

  /** From-scratch resketch of the live index, same parameters. */
  private def direct(bank: WaveBank): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    bank.readIndex().select(
        floor(col("starttime") / lit(86_400_000_000_000L)).cast("long")
          .as("day"),
        concat_ws(".", col("network"), col("station"), col("location"),
          col("channel")).as("seed_id"),
        ((col("endtime") - col("starttime")) / col("sampling_period"))
          .cast("long").as("n_samples"))
      .groupBy("day")
      .agg(count(lit(1)).as("d_segments"),
        sum("n_samples").as("d_samples"),
        Sketches.kmvSketch(expr("md5_long60(seed_id)"), bank.statsSeedK)
          .as("d_seed"),
        Sketches.quantileSketch(col("n_samples"), bank.statsLenC)
          .as("d_len"),
        Sketches.freqSketch(col("seed_id"), bank.statsSeedK).as("d_top"))
  }

  private def assertMatches(bank: WaveBank): Unit = {
    val rows = bank.sketchStats().join(direct(bank), "day").select(
        (col("n_segments") === col("d_segments")).as("c_ok"),
        (col("sum_samples") === col("d_samples")).as("s_ok"),
        (col("seed_sk") === col("d_seed")).as("seed_ok"),
        (col("len_sk") === col("d_len")).as("len_ok"),
        (col("seed_top") === col("d_top")).as("top_ok"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(0) && r.getBoolean(1), s"counts drifted: $r")
      assert(r.getBoolean(2), s"KMV rollup != from-scratch: $r")
      assert(r.getBoolean(3), s"quantile rollup != from-scratch: $r")
      assert(r.getBoolean(4), s"freq rollup != from-scratch: $r")
    }
  }

  test("sidecar append: multi-write partials roll up bit-equal to a from-scratch resketch") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segs(0 until 30))  // spans days 1 and 2
    bank.putWaveforms(segs(30 until 50)) // day 2 gains a second partial
    // the sidecar genuinely holds >1 partial for the shared day —
    // otherwise this test would not exercise the merge at all
    val parts = spark.read.parquet(bank.statsSketchPath)
    assert(parts.groupBy("day").count().filter(col("count") > 1)
      .limit(1).count() == 1)
    assertMatches(bank)
  }

  test("sidecar rewrite: in-place-modified files rebuild the sidecar (stale partials dropped)") {
    import graft.sources.BinarySegmentSource.{Segment, writeFile}
    val root = tmp()
    val segDir = java.nio.file.Paths.get(s"$root/segments")
    Files.createDirectories(segDir)
    def write(h: Int, n: Int): java.nio.file.Path = {
      val p = segDir.resolve(f"f_$h%02d.gsg")
      writeFile(p, Segment("XX", "S0", "", "BHZ", T0 + h * HourNs,
        1_000_000_000L, Array.fill(n)(1.0), ""))
      p
    }
    (0 until 12).foreach(h => write(h, 10 + h))
    val bank = new WaveBank(spark, root, segmentFormat = "gsg")
    bank.updateIndex()
    val before = bank.sketchStats().select("sum_samples").as[Long].head()
    // rewrite 4 files in place: same path, longer payload, newer mtime
    (0 until 4).foreach { h =>
      val p = write(h, 40 + h)
      assert(p.toFile.setLastModified(System.currentTimeMillis() + 5000))
    }
    bank.updateIndex()
    val after = bank.sketchStats().select("sum_samples").as[Long].head()
    // 4 files grew by 30 samples each; stale partials must NOT linger
    assert(after == before + 4 * 30)
    assertMatches(bank)
  }

  test("sidecar day-range: filters push to the partial scan and match the unfiltered rollup") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segs(0 until 50)) // spans 3 days
    val all = bank.sketchStats().orderBy("day").collect()
    assert(all.length == 3)
    val mid = all(1).getAs[Long]("day")
    val ranged = bank.sketchStats(Some(mid), Some(mid))
    // the day predicate reaches the parquet scan of the partials
    val formatted = ranged.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") &&
      formatted.contains("GreaterThanOrEqual(day"),
      s"day filter not pushed:\n$formatted")
    val row = ranged.collect()
    assert(row.length == 1 && row.head.getAs[Long]("day") == mid)
    assert(row.head.getAs[Long]("n_segments") ==
      all(1).getAs[Long]("n_segments"))
  }

  test("sidecar plan shape: sketchStats scans ONLY the sidecar, never the index") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segs(0 until 20))
    val plan = bank.sketchStats().queryExecution.executedPlan.toString
    assert(plan.contains("stats_sketch"),
      s"rollup must read the sidecar:\n$plan")
    assert(!plan.contains("/index"),
      s"dashboard read must NOT scan the index:\n$plan")
    // exactly one file source feeds the rollup
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"expected 1 FileScan, got $scans:\n$plan")
  }

  test("sidecar poisoning guard: a write to a pre-sidecar store backfills the WHOLE index") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segs(0 until 20))
    // store predates the sidecar (older jar / external cleanup)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(bank.statsSketchPath),
      true))
    // a WRITE arrives before any sketchStats read: without the
    // in-append backfill the sidecar would hold only this batch's
    // partials forever (the directory exists, so the read-time
    // backfill never fires again)
    bank.putWaveforms(segs(20 until 30))
    assertMatches(bank)
    val total = bank.sketchStats().agg(sum("n_segments")).head().getLong(0)
    assert(total == 60, s"sidecar covers $total of 60 segments")
  }

  test("sidecar survives compaction without a rebuild (marker re-stamped, not stale)") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segs(0 until 20))
    bank.putWaveforms(segs(20 until 30))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def partFiles() = fs.listStatus(
        new org.apache.hadoop.fs.Path(bank.statsSketchPath))
      .filter(_.getPath.getName.startsWith("part-"))
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen))
      .sortBy(_._1).toSeq
    val before = partFiles()
    bank.compactIndex()
    assertMatches(bank) // results still correct post-compaction...
    assert(partFiles() == before,
      "compaction must re-stamp the marker, not trigger a sidecar rebuild")
  }

  test("sidecar crash window: stale marker (index written, sidecar not) forces rebuild") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segs(0 until 20))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the index write and the sidecar write:
    // wipe the sidecar's content but leave the DIRECTORY (the shape a
    // half-finished overwrite or lost append leaves behind) — the old
    // absence-only guard was blind to this
    fs.delete(new org.apache.hadoop.fs.Path(bank.statsSketchPath), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(bank.statsSketchPath))
    // read path repairs
    assertMatches(bank)
    // and a WRITE against a stale marker repairs too: corrupt the
    // marker, then append — the whole index must be re-covered
    fs.delete(
      new org.apache.hadoop.fs.Path(s"${bank.statsSketchPath}/_graft_stamp"),
      false)
    bank.putWaveforms(segs(20 until 30))
    val total = bank.sketchStats().agg(sum("n_segments")).head().getLong(0)
    assert(total == 60, s"sidecar covers $total of 60 segments")
    assertMatches(bank)
  }

  test("sidecar maintained by the streaming indexer: no rebuild on read, bit-equal, replay-idempotent") {
    val root = tmp()
    val segDir = s"$root/stream_segments"
    val ckpt = s"$root/ckpt"
    val bank = new WaveBank(spark, root, txIndex = true)
    // three waves, each drained as its own micro-batch (AvailableNow
    // re-run per wave: checkpoint continuity gives batchIds 0,1,2)
    def drain(): Unit =
      graft.streaming.StreamingIndex.runBank(spark, segDir, bank, ckpt)
        .awaitTermination()
    segs(0 until 16).write.mode("append").parquet(segDir); drain()
    segs(16 until 36).write.mode("append").parquet(segDir); drain()
    segs(36 until 50).write.mode("append").parquet(segDir); drain()
    // one index row per segment, exactly once
    assert(bank.readIndex().count() == 100)
    // every partial came from the stream — no rebuild ever fired
    val tags = spark.read.parquet(bank.statsSketchPath)
      .select("src_tag").distinct().as[String].collect().toSet
    assert(tags == Set("stream-batch-0", "stream-batch-1", "stream-batch-2"),
      s"unexpected sidecar tags: $tags")
    // the dashboard read answers from the stream-written partials
    // WITHOUT rewriting the sidecar (no O(index) resketch)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def listing = fs.listStatus(
        new org.apache.hadoop.fs.Path(bank.statsSketchPath))
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen))
      .toSeq.sortBy(_._1)
    val before = listing
    assertMatches(bank) // rolled-up == from-scratch resketch, bit-equal
    assert(listing == before,
      "sketchStats read must not rebuild a stream-maintained sidecar")
    // plan pin: the read scans ONLY the sidecar, never the index
    val plan = bank.sketchStats().queryExecution.executedPlan.toString
    assert(!plan.contains(bank.indexPath),
      s"dashboard read must NOT scan the index:\n$plan")
    // REPLAY the last micro-batch (foreachBatch is at-least-once):
    // same batchId tag → index append skipped by appendOnce, sidecar
    // partial appended bit-identically and collapsed by the rollup's
    // (day, src_tag) dedup — totals and sketches unchanged
    val replayRows = segs(36 until 50).select(
      col("network"), col("station"), col("location"), col("channel"),
      col("starttime"),
      (col("starttime") + size(col("samples")).cast("long")
        * col("sampling_period")).as("endtime"),
      col("sampling_period"), lit("replayed").as("path"),
      lit(-1L).as("mtime_ms"),
      lit(System.currentTimeMillis() * 1000000L).as("indexed_at"),
      lit(bank.indexVersion).as("index_version"))
    bank.streamingAppend(replayRows, batchId = 2L)
    // the duplicate partial physically exists pre-dedup…
    val dupGroups = spark.read.parquet(bank.statsSketchPath)
      .groupBy("day", "src_tag").count().filter(col("count") > 1).count()
    assert(dupGroups > 0, "replay should have appended a duplicate partial")
    // …and the rollup collapses it: exactly-once totals, index untouched
    assert(bank.readIndex().count() == 100)
    assert(bank.sketchStats().agg(sum("n_segments")).head().getLong(0) == 100)
    assertMatches(bank)
  }

  test("deleted index: reads answer empty, streaming into a recycled root drops the orphan sidecar") {
    val root = tmp()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val bank = new WaveBank(spark, root, txIndex = true)
    val segDir = s"$root/stream_segments"
    segs(0 until 10).write.mode("append").parquet(segDir)
    graft.streaming.StreamingIndex
      .runBank(spark, segDir, bank, s"$root/ckpt").awaitTermination()
    assert(bank.sketchStats().count() > 0)
    // external cleanup deletes the tx log but leaves the sidecar
    fs.delete(new org.apache.hadoop.fs.Path(bank.indexPath), true)
    // a read must NOT serve the dead store's partials
    assert(new WaveBank(spark, root, txIndex = true).sketchStats().isEmpty)
    // a fresh stream into the recycled root must not append beside
    // them either: totals reflect only the new batches
    val bank2 = new WaveBank(spark, root, txIndex = true)
    segs(10 until 16).write.mode("append").parquet(segDir)
    graft.streaming.StreamingIndex
      .runBank(spark, segDir, bank2, s"$root/ckpt2").awaitTermination()
    // ckpt2 is fresh, so BOTH waves replay into the new store: 32 segs
    val total = bank2.sketchStats().agg(sum("n_segments")).head().getLong(0)
    assert(total == 32, s"recycled-root sidecar reports $total of 32")
    assertMatches(bank2)
  }

  test("sidecar backfill: pre-sidecar stores rebuild from the index on first sketchStats read") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segs(0 until 20))
    // simulate a store written before the sidecar existed
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(bank.statsSketchPath),
      true))
    assertMatches(bank)
  }
}
