package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.bank.{EventBank, EventQuery, WaveBank}
import graft.core.Schemas
import graft.fetch.Fetcher

/** End-to-end bank lifecycle on a synthetic archive in a temp dir —
  * the §3 query lifecycles: index → filter → bulk fetch → stitch, and
  * event upsert → kwarg queries.
  */
class BankSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-bank").toString

  private def segmentDf = Seq(
    // N1.S1..BHZ: two adjacent segments then a gap then one more
    ("N1", "S1", "", "BHZ", 0L, 10L, Array.fill(100)(1.0)),
    ("N1", "S1", "", "BHZ", 1000L, 10L, Array.fill(100)(2.0)),
    ("N1", "S1", "", "BHZ", 5000L, 10L, Array.fill(50)(3.0)),
    // N1.S2..BHN: single segment
    ("N1", "S2", "", "BHN", 0L, 10L, Array.fill(200)(4.0))
  ).toDF("network", "station", "location", "channel",
         "starttime", "sampling_period", "samples")

  test("wavebank: index, glob+interval readIndex, availability, gaps") {
    val bank = new WaveBank(spark, tmp())
    bank.putWaveforms(segmentDf)

    assert(bank.readIndex().count() == 4)
    assert(bank.readIndex(station = "S?").count() == 4)
    assert(bank.readIndex(station = "S1").count() == 3)
    assert(bank.readIndex(channel = "BH[NE]").count() == 1)
    // interval query touches only overlapping segments (±1 s buffer is
    // huge vs these times, so restrict with exact window on a far key)
    val av = bank.availability().orderBy("station", "channel").collect()
    assert(av.length == 2)
    assert(av(0).getAs[Long]("starttime") == 0L)
    assert(av(0).getAs[Long]("endtime") == 5500L)
    val gaps = bank.gaps().collect()
    assert(gaps.length == 1) // 2000 → 5000
    assert(gaps(0).getAs[Long]("gap_start") == 2000L &&
           gaps(0).getAs[Long]("gap_end") == 5000L)
  }

  test("wavebank: containment index cache — hits re-filter persisted rows, updates invalidate") {
    val root = tmp()
    val cached = new WaveBank(spark, root, indexCacheSize = 2)
    val direct = new WaveBank(spark, root)
    cached.putWaveforms(segmentDf)

    def rows(b: WaveBank, t1: Long, t2: Long, sta: String = "*") =
      b.readIndex(station = sta, starttime = Some(t1), endtime = Some(t2))
        .select("station", "channel", "starttime", "endtime")
        .collect().map(_.toString).sorted.toSeq

    // wide query fills the cache; the contained narrow query must
    // return exactly what an uncached bank computes
    val wide = rows(cached, 0L, 10000L)
    assert(wide == rows(direct, 0L, 10000L))
    assert(cached.indexCache.get.occupied == 1)
    val narrowDf = cached.readIndex(
      starttime = Some(4000L), endtime = Some(6000L))
    assert(narrowDf.collect().map(_.getAs[Long]("starttime")).toSeq
      .forall(_ <= 7000L))
    assert(rows(cached, 4000L, 6000L) == rows(direct, 4000L, 6000L))
    // the contained query's plan reads the persisted entry, not parquet
    assert(narrowDf.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"))
    assert(cached.indexCache.get.occupied == 1) // hit, no new entry

    // different kwargs miss containment (S1-only rows ≠ all rows)
    assert(rows(cached, 0L, 10000L, sta = "S1") ==
      rows(direct, 0L, 10000L, sta = "S1"))
    assert(cached.indexCache.get.occupied == 2)

    // an index update invalidates: the new segment must be visible
    // through a query contained in the previously cached interval
    cached.putWaveforms(Seq(("N1", "S1", "", "BHE", 4500L, 10L,
      Array.fill(10)(9.0))).toDF("network", "station", "location",
      "channel", "starttime", "sampling_period", "samples"))
    assert(cached.indexCache.get.occupied == 0)
    assert(rows(cached, 4000L, 6000L).exists(_.contains("BHE")))
    assert(rows(cached, 4000L, 6000L) == rows(direct, 4000L, 6000L))
  }

  test("wavebank: index cache survives readers racing index updates") {
    val root = tmp()
    val bank = new WaveBank(spark, root, indexCacheSize = 2)
    bank.putWaveforms(segmentDf)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    try {
      val readers = (0 until 4).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = try {
            (0 until 12).foreach { j =>
              // alternate wide (fills) and contained (hits) intervals
              val (t1, t2) = if (j % 2 == 0) (0L, 10000L)
                             else (1000L + i * 100, 6000L)
              bank.readIndex(starttime = Some(t1), endtime = Some(t2))
                .count()
            }
          } catch { case t: Throwable => errors.add(t) }
        })
      }
      val writer = pool.submit(new Runnable {
        override def run(): Unit = try {
          (0 until 3).foreach { k =>
            bank.putWaveforms(Seq(("N9", s"W$k", "", "HHZ",
              k * 1000L, 10L, Array.fill(10)(1.0)))
              .toDF("network", "station", "location", "channel",
                "starttime", "sampling_period", "samples"))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
      (readers :+ writer).foreach(_.get())
    } finally pool.shutdown()
    assert(errors.isEmpty, s"racing cache raised: ${errors.peek()}")
    // settled state: cached and uncached banks agree exactly
    val direct = new WaveBank(spark, root)
    def all(b: WaveBank) = b.readIndex(starttime = Some(0L),
      endtime = Some(10000L)).collect().map(_.toString).sorted.toSeq
    assert(all(bank) == all(direct))
    assert(all(bank).count(_.contains("N9")) == 3)
  }

  test("wavebank: index cache detects a SECOND instance's writes (store stamp)") {
    val root = tmp()
    val reader = new WaveBank(spark, root, indexCacheSize = 2)
    val writer = new WaveBank(spark, root) // separate instance, same store
    writer.putWaveforms(segmentDf)

    def rows(b: WaveBank, t1: Long, t2: Long) =
      b.readIndex(starttime = Some(t1), endtime = Some(t2))
        .select("station", "channel", "starttime", "endtime")
        .collect().map(_.toString).sorted.toSeq

    // fill reader's cache, then prove a contained query hits it
    rows(reader, 0L, 10000L)
    assert(reader.indexCache.get.occupied == 1)
    assert(rows(reader, 4000L, 6000L) ==
      rows(new WaveBank(spark, root), 4000L, 6000L))
    assert(reader.indexCache.get.occupied == 1) // containment hit

    // the OTHER instance appends: reader must see it on the next
    // contained query without clearIndexCache() — the stamp guard
    writer.putWaveforms(Seq(("N1", "S1", "", "BHE", 4500L, 10L,
      Array.fill(10)(9.0))).toDF("network", "station", "location",
      "channel", "starttime", "sampling_period", "samples"))
    val after = rows(reader, 4000L, 6000L)
    assert(after.exists(_.contains("BHE")),
      "second instance's write invisible through the containment cache")
    assert(after == rows(new WaveBank(spark, root), 4000L, 6000L))
    // and an unchanged store still serves hits (no thrash): same
    // contained query again must not grow occupancy
    val occ = reader.indexCache.get.occupied
    rows(reader, 4000L, 6000L)
    assert(reader.indexCache.get.occupied == occ)
  }

  test("wavebank: txIndex mode — same results, plus time travel and compaction") {
    val root = tmp()
    val bank = new WaveBank(spark, root, txIndex = true)
    bank.enforceVersion() // fresh tx bank: must be a no-op, not a crash
    bank.putWaveforms(segmentDf)
    assert(bank.readIndex().count() == 4)
    assert(bank.readIndex(station = "S1").count() == 3)
    val v0 = bank.txTable.latestVersion()
    bank.putWaveforms(Seq(("N2", "S9", "", "HHZ", 0L, 10L, Array.fill(10)(0.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    assert(bank.readIndex().count() == 5)
    // snapshot as of before the second put
    assert(bank.txTable.read(Some(v0)).count() == 4)
    // compaction is content-neutral for every downstream query
    val gapsBefore = bank.gaps().collect().map(_.mkString("|")).sorted.toSeq
    bank.compactIndex()
    assert(bank.readIndex().count() == 5)
    assert(bank.gaps().collect().map(_.mkString("|")).sorted.toSeq == gapsBefore)
    // bulk fetch still works off the tx index
    val got = bank.getWaveforms("N1", "S2", "", "BHN", 0L, 500L)
    assert(got.count() > 0)
  }

  test("wavebank: incremental updateIndex only adds new segments") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segmentDf)
    assert(bank.readIndex().count() == 4)
    bank.putWaveforms(Seq(("N2", "S9", "", "HHZ", 0L, 10L, Array.fill(10)(0.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    assert(bank.readIndex().count() == 5)
    assert(bank.readIndex(network = "N2").count() == 1)
  }

  test("wavebank: updateIndex is idempotent under the mtime-slack race") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segmentDf)
    assert(bank.readIndex().count() == 4)
    // Simulate a file whose mtime lands inside the −1 ms slack window
    // (same millisecond as the pass's indexed_at stamp): bump every
    // already-indexed segment file's mtime PAST the watermark, so the
    // next pass's listing re-includes all of them. The path anti-join
    // must keep the index duplicate-free, and a pass that re-includes
    // only known files must append nothing.
    val segDir = new java.io.File(s"$root/segments")
    def bump(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(bump)
      else { f.setLastModified(System.currentTimeMillis() + 5000); () }
    }
    bump(segDir)
    bank.updateIndex()
    assert(bank.readIndex().count() == 4)
    // a genuinely new file arriving alongside the re-included ones still
    // gets indexed exactly once
    bank.putWaveforms(Seq(("N2", "S9", "", "HHZ", 0L, 10L, Array.fill(10)(0.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    assert(bank.readIndex().count() == 5)
    assert(bank.readIndex(network = "N2").count() == 1)
    // cross-pass clock skew: the future-mtime files re-list AGAIN in a
    // pass whose most recent batch is someone else's (N2's) — the
    // full-path dedup must still refuse them
    bank.updateIndex()
    assert(bank.readIndex().count() == 5)
  }

  test("wavebank: plain-parquet compactIndex re-clusters without changing content") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segmentDf)
    bank.putWaveforms(Seq(("N2", "S9", "", "HHZ", 0L, 10L, Array.fill(10)(0.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    val before = bank.readIndex().collect().map(_.mkString("|")).sorted.toSeq
    // resolve the current-pointer file: compaction publishes a fresh
    // generation dir and swaps `index.ptr` onto it
    def liveDir(): String = {
      val ptr = new java.io.File(s"$root/index.ptr")
      if (ptr.exists())
        new String(java.nio.file.Files.readAllBytes(ptr.toPath)).trim
      else "index"
    }
    def files(): Int = new java.io.File(s"$root/${liveDir()}").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val nBefore = files()
    bank.compactIndex()
    // content identical (indexed_at preserved), layout collapsed
    assert(bank.readIndex().collect().map(_.mkString("|")).sorted.toSeq == before)
    assert(files() < nBefore, s"expected fewer files than $nBefore")
    // the mtime watermark survives compaction: the next update is still
    // incremental (appends exactly the one new segment, no re-index)
    bank.putWaveforms(Seq(("N3", "S8", "", "HHZ", 0L, 10L, Array.fill(10)(0.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    assert(bank.readIndex().count() == before.size + 1)
    assert(bank.readIndex(network = "N3").count() == 1)
  }

  test("wavebank: compactIndex pointer swap — concurrent readers never see a missing dir") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segmentDf)
    val before = bank.readIndex().collect().map(_.mkString("|")).sorted.toSeq
    // a reader plan resolved BEFORE the compact: the generation it
    // points at must survive the swap (kept as the grace copy)
    val inFlight = bank.readIndex()
    bank.compactIndex()
    assert(inFlight.collect().map(_.mkString("|")).sorted.toSeq == before)
    // the pointer now names a generation dir; the legacy dir is the
    // grace copy and both are complete
    val ptr = new java.io.File(s"$root/index.ptr")
    assert(ptr.exists())
    val live = new String(java.nio.file.Files.readAllBytes(ptr.toPath)).trim
    assert(live.matches("index\\.g\\d+"), s"unexpected pointer '$live'")
    assert(bank.readIndex().collect().map(_.mkString("|")).sorted.toSeq == before)
    // a second compact garbage-collects the oldest generation but keeps
    // the one just replaced — and content still never changes
    bank.compactIndex()
    val live2 = new String(java.nio.file.Files.readAllBytes(ptr.toPath)).trim
    assert(live2 != live)
    assert(!new java.io.File(s"$root/index").exists(),
      "oldest generation should be garbage-collected")
    assert(new java.io.File(s"$root/$live").exists(),
      "previous generation should remain as the grace copy")
    assert(bank.readIndex().collect().map(_.mkString("|")).sorted.toSeq == before)
    // crash simulation: an orphan half-written generation (no pointer
    // swap) is invisible to readers and collected by the next compact
    val orphan = new java.io.File(s"$root/index.g99")
    orphan.mkdirs()
    assert(bank.readIndex().collect().map(_.mkString("|")).sorted.toSeq == before)
    bank.compactIndex()
    assert(!orphan.exists(), "orphan generation should be garbage-collected")
    assert(bank.readIndex().collect().map(_.mkString("|")).sorted.toSeq == before)
  }

  test("wavebank: indexStamp is listing-independent via the stamp file") {
    val root = tmp()
    val bank = new WaveBank(spark, root)
    bank.putWaveforms(segmentDf)
    assert(new java.io.File(s"$root/index.stamp").exists())
    val s1 = bank.indexStamp()
    // an in-place touch of an index data file — name, length and even
    // content unchanged, only listing metadata moves — must NOT change
    // the stamp: bank-API writes are the unit of store change
    new java.io.File(s"$root/index").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.setLastModified(f.lastModified() + 60000)))
    assert(bank.indexStamp() == s1, "stamp must ignore listing metadata")
    // every bank write bumps it — even two writes landing in the same
    // mtime tick (the coarse-granularity-filesystem blind spot the
    // listing fingerprint had)
    bank.putWaveforms(Seq(("N2", "S9", "", "HHZ", 0L, 10L, Array.fill(10)(0.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    val s2 = bank.indexStamp()
    assert(s2 != s1)
    bank.compactIndex()
    val s3 = bank.indexStamp()
    assert(s3 != s2)
    // a SECOND instance's write is observed (monotonic counter in the
    // shared stamp file — the q99 scenario without a listing probe)
    val other = new WaveBank(spark, root)
    other.putWaveforms(Seq(("N3", "S8", "", "HHZ", 0L, 10L, Array.fill(10)(0.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    assert(bank.indexStamp() != s3)
    // deleting the stamp file falls back to the listing fingerprint
    // (pre-existing/externally-written stores)
    assert(new java.io.File(s"$root/index.stamp").delete())
    val fb1 = bank.indexStamp()
    val ptr = new java.io.File(s"$root/index.ptr")
    val live = new String(java.nio.file.Files.readAllBytes(ptr.toPath)).trim
    new java.io.File(s"$root/$live").listFiles()
      .filter(_.getName.endsWith(".parquet")).take(1)
      .foreach(f => assert(f.setLastModified(f.lastModified() + 60000)))
    assert(bank.indexStamp() != fb1, "fallback fingerprint tracks the listing")
  }

  test("wavebank: updateIndex re-indexes a file modified in place (v2 store)") {
    import graft.sources.BinarySegmentSource.{Segment, writeFile}
    val root = tmp()
    val segDir = java.nio.file.Paths.get(s"$root/segments")
    java.nio.file.Files.createDirectories(segDir)
    writeFile(segDir.resolve("a.gsg"),
      Segment("N1", "S1", "", "BHZ", 0L, 10L, Array.fill(100)(1.0), ""))
    writeFile(segDir.resolve("b.gsg"),
      Segment("N1", "S2", "", "BHZ", 0L, 10L, Array.fill(50)(2.0), ""))
    val bank = new WaveBank(spark, root, segmentFormat = "gsg")
    bank.updateIndex()
    assert(bank.readIndex().count() == 2)
    assert(bank.readIndex(station = "S1").head().getAs[Long]("endtime") == 1000L)
    // the acquisition tool rewrites a.gsg IN PLACE with more samples
    // (same path, newer mtime): the reference's mtime contract
    // re-indexes it — the stale row must be REPLACED, not kept (nor
    // duplicated)
    writeFile(segDir.resolve("a.gsg"),
      Segment("N1", "S1", "", "BHZ", 0L, 10L, Array.fill(200)(1.5), ""))
    assert(segDir.resolve("a.gsg").toFile
      .setLastModified(System.currentTimeMillis() + 5000))
    bank.updateIndex()
    assert(bank.readIndex().count() == 2, "modified file must replace, not duplicate")
    assert(bank.readIndex(station = "S1").head().getAs[Long]("endtime") == 2000L,
      "index must reflect the rewritten file")
    // and the pass after the replacement is a no-op again
    val stamp = bank.indexStamp()
    bank.updateIndex()
    assert(bank.readIndex().count() == 2)
    assert(bank.indexStamp() == stamp, "no-op pass must not bump the stamp")

    // the SAME contract on a tx-index bank: the replacement must go
    // through a log COMMIT (a plain generation swap would be invisible
    // to tx readers, silently keeping the stale row)
    val txRoot = tmp()
    val txSegDir = java.nio.file.Paths.get(s"$txRoot/segments")
    java.nio.file.Files.createDirectories(txSegDir)
    writeFile(txSegDir.resolve("a.gsg"),
      Segment("N1", "S1", "", "BHZ", 0L, 10L, Array.fill(100)(1.0), ""))
    val txBank = new WaveBank(spark, txRoot, txIndex = true,
      segmentFormat = "gsg")
    txBank.updateIndex()
    assert(txBank.readIndex().count() == 1)
    writeFile(txSegDir.resolve("a.gsg"),
      Segment("N1", "S1", "", "BHZ", 0L, 10L, Array.fill(200)(1.5), ""))
    assert(txSegDir.resolve("a.gsg").toFile
      .setLastModified(System.currentTimeMillis() + 5000))
    txBank.updateIndex()
    assert(txBank.readIndex().count() == 1)
    assert(txBank.readIndex().head().getAs[Long]("endtime") == 2000L,
      "tx index must reflect the rewritten file")
    // no stray plain-parquet generation dirs or pointer
    assert(!new java.io.File(s"$txRoot/index.ptr").exists())
    assert(new java.io.File(txRoot).list().forall(!_.startsWith("index.g")))
  }

  test("wavebank: gsg segment store — real record files, same query surface") {
    val root = tmp()
    val bank = new WaveBank(spark, root, segmentFormat = "gsg")
    bank.putWaveforms(segmentDf)

    // the archive is REAL gsg files an external consumer can read raw
    val segDir = java.nio.file.Paths.get(root, "segments")
    val files = java.nio.file.Files.list(segDir).iterator()
    var names = List.empty[String]
    while (files.hasNext) names ::= files.next().getFileName.toString
    names = names.filterNot(_.startsWith(".")) // local FS .crc sidecars
    assert(names.nonEmpty && names.forall(n =>
      n.startsWith("part-") && n.endsWith(".gsg")), names.mkString(","))
    val raw = graft.sources.BinarySegmentSource
      .readSegments(spark, segDir.toString)
    assert(raw.count() == 4)

    // index and query surface behave exactly like the parquet store
    assert(bank.readIndex().count() == 4)
    assert(bank.readIndex(station = "S1").count() == 3)
    val av = bank.availability().orderBy("station", "channel").collect()
    assert(av.length == 2 && av(0).getAs[Long]("endtime") == 5500L)
    val out = bank.getWaveformsBulk(
        Seq(("N1.S1..BHZ", 0L, 1500L)).toDF("seed_id", "t1", "t2"))
      .orderBy("starttime").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("starttime") == 0L &&
      out(0).getAs[Long]("endtime") == 2000L)
    assert(out(0).getAs[scala.collection.Seq[Double]]("samples")
      .take(100).forall(_ == 1.0))

    // incremental: a second put indexes only the new file
    bank.putWaveforms(Seq(("N2", "S9", "", "HHZ", 0L, 10L, Array.fill(10)(0.0)))
      .toDF("network", "station", "location", "channel",
            "starttime", "sampling_period", "samples"))
    assert(bank.readIndex().count() == 5)
    assert(bank.readIndex(network = "N2").count() == 1)

    // scalar get_waveforms trims to the window off the gsg store
    val got = bank.getWaveforms("N1", "S2", "", "BHN", 0L, 500L)
    assert(got.count() > 0)
  }

  test("wavebank: bulk fetch stitches adjacent segments, later wins") {
    val bank = new WaveBank(spark, tmp())
    bank.putWaveforms(segmentDf)
    val reqs = Seq(("N1.S1..BHZ", 0L, 1500L)).toDF("seed_id", "t1", "t2")
    val out = bank.getWaveformsBulk(reqs).orderBy("starttime").collect()
    // segments at 0 and 1000 are adjacent (0..1000, 1000..2000) → merged;
    // 5000.. is a separate trace but its file also matched the read
    assert(out.length == 2)
    assert(out(0).getAs[Long]("starttime") == 0L &&
           out(0).getAs[Long]("endtime") == 2000L)
    assert(out(0).getAs[scala.collection.Seq[Double]]("samples").take(100).forall(_ == 1.0))
    assert(out(0).getAs[scala.collection.Seq[Double]]("samples").drop(100).forall(_ == 2.0))
  }

  test("eventbank: upsert by id, strict kwarg filters, circular, limit") {
    val bank = new EventBank(spark, tmp())
    val ev = Seq(
      ("e1", 1000L, 10.0, 20.0, 5.0, 2.5, "ML", 1L),
      ("e2", 2000L, 11.0, 21.0, 6.0, 3.5, "ML", 1L),
      ("e3", 3000L, 50.0, -170.0, 7.0, 4.5, "MW", 1L)
    ).toDF("event_id", "time", "latitude", "longitude", "depth",
           "magnitude", "magnitude_type", "updated")
    bank.putEvents(ev)
    assert(bank.readIndex().count() == 3)

    // upsert: e2 with newer updated wins; stale row ignored
    bank.putEvents(Seq(("e2", 2000L, 11.0, 21.0, 6.0, 9.9, "ML", 5L))
      .toDF("event_id", "time", "latitude", "longitude", "depth",
            "magnitude", "magnitude_type", "updated"))
    val e2 = bank.readIndex().filter(col("event_id") === "e2").collect()
    assert(e2.length == 1 && e2(0).getAs[Double]("magnitude") == 9.9)

    // strict min: magnitude > 2.5 excludes the 2.5 event
    assert(bank.getEvents(EventQuery(minMagnitude = Some(2.5))).count() == 2)
    // circular search around e1
    val near = bank.getEvents(EventQuery(latitude = Some(10.0),
      longitude = Some(20.0), maxRadiusM = Some(500000.0)))
    assert(near.select("event_id").as[String].collect().toSet == Set("e2"))
    assert(bank.getEvents(EventQuery(limit = Some(1))).count() == 1)

    // NaT rewrite: a sentinel-stored unknown time never matches a
    // maxTime-only query even though SMALLDT64 < any real bound
    bank.putEvents(Seq(("e4", graft.core.Schemas.SmallDt64, 12.0, 22.0,
        5.0, 1.0, "ML", 1L))
      .toDF("event_id", "time", "latitude", "longitude", "depth",
            "magnitude", "magnitude_type", "updated"))
    val early = bank.getEvents(EventQuery(maxTime = Some(2500L)))
    assert(early.select("event_id").as[String].collect().toSet == Set("e1", "e2"))
  }

  test("fetcher: origin cross-expansion and p-phase station join") {
    val events = Seq(("e1", 1000L), ("e2", 5000L)).toDF("event_id", "time")
    val stations = Seq(
      ("N1", "S1", "", "BHZ", "N1.S1..BHZ"),
      ("N1", "S1", "", "BHN", "N1.S1..BHN"),
      ("N1", "S2", "", "BHZ", "N1.S2..BHZ"))
      .toDF("network", "station", "location", "channel", "seed_id")
    val picks = Seq(("e1", "S1", "P", 900L), ("e1", "S1", "P", 950L),
        ("e1", "S2", "S", 1100L))
      .toDF("event_id", "station", "phase_hint", "time")
    val f = new Fetcher(spark, events, stations, picks)

    assert(f.eventRequests("origin", 10L, 20L).count() == 6) // 2 ev × 3 ch
    val p = f.eventRequests("p", 0L, 0L).collect()
    assert(p.length == 2) // first P pick of e1/S1 → both S1 channels
    assert(p.forall(_.getAs[Long]("t1") == 900L)) // idxmin pick time
  }

  test("fetcher: channels outside their operating window are dropped; null end_date = forever") {
    val events = Seq(("e1", 1000L)).toDF("event_id", "time")
    val stations = Seq(
      // active across the window
      ("S1", "N1.S1..BHZ", 0L, Some(2000L)),
      // decommissioned before the window
      ("S2", "N1.S2..BHZ", 0L, Some(500L)),
      // not yet installed
      ("S3", "N1.S3..BHZ", 5000L, None),
      // open-ended end_date → still operating
      ("S4", "N1.S4..BHZ", 0L, None)
    ).toDF("station", "seed_id", "start_date", "end_date")
    val f = new Fetcher(spark, events, stations, picks = events)
    val reqs = f.eventRequests("origin", 100L, 100L)
      .select("seed_id").as[String].collect().sorted.toSeq
    assert(reqs == Seq("N1.S1..BHZ", "N1.S4..BHZ"))
  }

  test("fetcher: multiple overlapping channel epochs yield ONE request, not one per epoch") {
    val events = Seq(("e1", 1000L)).toDF("event_id", "time")
    // the FDSN shape: same NSLC, two epoch rows, both overlap the window
    val stations = Seq(
      ("S1", "N1.S1..BHZ", 0L, Some(1500L)),
      ("S1", "N1.S1..BHZ", 900L, None)
    ).toDF("station", "seed_id", "start_date", "end_date")
    val f = new Fetcher(spark, events, stations, picks = events)
    // channel dedup in the strategy + LEFT SEMI activity join: one
    // request per (event, channel), regardless of epoch count
    assert(f.eventRequests("origin", 100L, 100L).count() == 1)
    // and a channel active in only ONE of its epochs still qualifies
    val lateWindow = f.eventRequests("origin", -600L, 1000L) // [1600, 2000]
    assert(lateWindow.count() == 1) // second (open-ended) epoch covers it
  }

  test("eventbank: quakeml archive round trip — export, reindex, identical index") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("eb-qml").toString
    val bank = new graft.bank.EventBank(spark, s"$root/bank")
    val events = Seq(
      ("ev1", 1000000000123456789L, 35.5, -117.25, 5000.0, 2.75, "ML", 5L, "auto", "AG"),
      ("ev2", 1000000000987654321L, 36.0, -118.0, 7500.0, 3.25, "MW", 6L, "rev", "AG"))
      .toDF("event_id", "time", "latitude", "longitude", "depth",
        "magnitude", "magnitude_type", "updated", "author", "agency_id")
    bank.putEvents(events)
    bank.exportQuakeMl(s"$root/xml")
    val reparsed = new graft.bank.EventBank(spark, s"$root/bank2")
    reparsed.indexQuakeMlDir(s"$root/xml")
    val key = Seq("event_id", "time", "latitude", "longitude", "depth",
      "magnitude", "magnitude_type", "updated", "author", "agency_id")
    val a = bank.readIndex().select(key.head, key.tail: _*)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = reparsed.readIndex().select(key.head, key.tail: _*)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)

    // with picks + arrivals supplied, the derived quality counts
    // survive export → reindex (they recompute from <arrival>/<pick>)
    import graft.sources.QuakeMl
    val picksDf = Seq(
      QuakeMl.PickRow("pk-ev1", "ev1", Some(1L), Some("N1"), Some("S1"),
        Some(""), Some("BHZ"), Some("P"), None, None, None),
      QuakeMl.PickRow("pk-ev2", "ev2", Some(2L), Some("N1"), Some("S2"),
        Some(""), Some("BHZ"), Some("S"), None, None, None)).toDS().toDF()
    val arrDf = Seq(
      QuakeMl.ArrivalRow("ar-ev1", "ev1", "o", Some("pk-ev1"), Some("P"),
        None, None, None, None),
      QuakeMl.ArrivalRow("ar-ev2", "ev2", "o", Some("pk-ev2"), Some("S"),
        None, None, None, None)).toDS().toDF()
    bank.exportQuakeMl(s"$root/xml2", picks = Some(picksDf),
      arrivals = Some(arrDf))
    val re2 = new graft.bank.EventBank(spark, s"$root/bank3")
    re2.indexQuakeMlDir(s"$root/xml2")
    val counts = re2.readIndex()
      .select("event_id", "p_phase_count", "s_phase_count", "station_count")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(counts("ev1") == ((1L, 0L, 1L)))
    assert(counts("ev2") == ((0L, 1L, 1L)))
  }

  test("eventbank merge-on-read: append defers the merge to read; compact folds the log") {
    val root = tmp()
    val bank = new EventBank(spark, root, mergeOnRead = true)
    val batch1 = Seq(
      ("e1", 1000L, 10.0, 20.0, 5.0, 2.5, "ML", 1L),
      ("e2", 2000L, 11.0, 21.0, 6.0, 3.5, "ML", 1L)
    ).toDF("event_id", "time", "latitude", "longitude", "depth",
           "magnitude", "magnitude_type", "updated")
    bank.appendEvents(batch1)
    // newer version of e2 lands as a pure append — no index rewrite
    bank.appendEvents(Seq(("e2", 2000L, 11.0, 21.0, 6.0, 9.9, "ML", 5L))
      .toDF("event_id", "time", "latitude", "longitude", "depth",
            "magnitude", "magnitude_type", "updated"))
    // raw log holds all 3 versions; the read resolves to 2
    assert(spark.read.parquet(s"$root/event_index").count() == 3)
    val idx = bank.readIndex()
    assert(idx.count() == 2)
    assert(idx.filter(col("event_id") === "e2")
      .select("magnitude").as[Double].head() == 9.9)
    // kwarg queries see resolved rows, not raw versions
    assert(bank.getEvents(EventQuery(minMagnitude = Some(3.0))).count() == 1)

    // compact rewrites the log down to one version per id
    bank.compact()
    assert(spark.read.parquet(s"$root/event_index").count() == 2)
    assert(bank.readIndex().filter(col("event_id") === "e2")
      .select("magnitude").as[Double].head() == 9.9)

    // a copy-on-write bank refuses appendEvents (its reads don't merge)
    val plain = new EventBank(spark, tmp())
    intercept[IllegalArgumentException] { plain.appendEvents(batch1) }
  }

  test("eventbank: txIndex + mergeOnRead — atomic upserts with time travel") {
    val root = tmp()
    val bank = new EventBank(spark, root, mergeOnRead = true, txIndex = true)
    bank.appendEvents(Seq(
      ("e1", 1000L, 10.0, 20.0, 5.0, 2.5, "ML", 1L),
      ("e2", 2000L, 11.0, 21.0, 6.0, 3.5, "ML", 1L)
    ).toDF("event_id", "time", "latitude", "longitude", "depth",
           "magnitude", "magnitude_type", "updated"))
    val v0 = bank.txTable.latestVersion()
    bank.appendEvents(Seq(("e2", 2000L, 11.0, 21.0, 6.0, 9.9, "ML", 5L))
      .toDF("event_id", "time", "latitude", "longitude", "depth",
            "magnitude", "magnitude_type", "updated"))
    // resolved read sees the upsert; the v0 snapshot still has the old row
    assert(bank.readIndex().count() == 2)
    assert(bank.readIndex().filter(col("event_id") === "e2")
      .select("magnitude").as[Double].head() == 9.9)
    assert(bank.txTable.read(Some(v0)).count() == 2) // two raw v0 rows
    // compaction folds versions AND commits atomically (no dir swap)
    bank.compact()
    assert(bank.txTable.read().count() == 2)
    assert(bank.getEvents(EventQuery(minMagnitude = Some(3.0))).count() == 1)
    // copy-on-write putEvents also commits through the log
    bank.putEvents(Seq(("e3", 3000L, 1.0, 2.0, 3.0, 1.1, "ML", 9L))
      .toDF("event_id", "time", "latitude", "longitude", "depth",
            "magnitude", "magnitude_type", "updated"))
    assert(bank.readIndex().count() == 3)
  }

  test("wavebank: interval predicates reach the parquet index scan") {
    val bank = new WaveBank(spark, tmp())
    bank.putWaveforms(segmentDf)
    val q = bank.readIndex(starttime = Some(500L), endtime = Some(1500L))
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("PushedFilters")).getOrElse("")
    // the overlap rewrite must land as min/max-stat-prunable filters
    val pushed = scan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
    assert(pushed.contains("starttime") && pushed.contains("endtime"), scan)
  }

  test("wavebank: exportSds writes a day-partitioned layout losslessly") {
    val bank = new WaveBank(spark, tmp())
    // one segment below the day boundary, one above (day = ns div 86400e9)
    val day0 = 1_000_000_000L
    val day1 = 86_400_000_000_000L + 5_000L
    bank.putWaveforms(Seq(
      ("N1", "S1", "", "BHZ", day0, 10L, Array.fill(10)(1.0)),
      ("N1", "S1", "", "BHZ", day1, 10L, Array.fill(10)(2.0))
    ).toDF("network", "station", "location", "channel",
           "starttime", "sampling_period", "samples"))
    val out = tmp()
    bank.exportSds(out)
    // partition dirs exist per (network, station, channel, day)
    val days = new java.io.File(s"$out/network=N1/station=S1/channel=BHZ")
      .listFiles().map(_.getName).filter(_.startsWith("day=")).sorted
    assert(days.toSeq == Seq("day=0", "day=1"))
    // and the re-chunked copy is lossless (partition cols restore)
    val rt = spark.read.parquet(out)
    assert(rt.count() == 2)
    assert(rt.select("starttime").as[Long].collect().sorted.toSeq ==
      Seq(day0, day1))
  }
}
