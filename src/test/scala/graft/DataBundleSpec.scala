package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger
import graft.bank.DataBundle
import graft.bank.DataBundle.BundleSpec
import graft.stations.StationQuery

/** Bundle lifecycle: fetch-once caching, sha256 verification,
  * version-driven refetch, and the copy surface — the reference's
  * dataset behavior (`datasets/dataset.py`) minus the network.
  */
class DataBundleSpec extends SparkSpec {
  import spark.implicits._

  private def segmentDf = Seq(
    ("N1", "S1", "", "BHZ", 0L, 10L, Array.fill(100)(1.0)),
    ("N1", "S2", "", "BHN", 0L, 10L, Array.fill(200)(4.0))
  ).toDF("network", "station", "location", "channel",
         "starttime", "sampling_period", "samples")

  private def eventDf = Seq(("ev1", 1000L), ("ev2", 2000L))
    .toDF("event_id", "time")

  private def channelDf = Seq(
    ("N1", "S1", "", "BHZ", "N1.S1..BHZ", 10.0, 20.0, 0L, 1000L))
    .toDF("network", "station", "location", "channel", "seed_id",
      "latitude", "longitude", "start_date", "end_date")

  /** A fetcher that materializes all three sides and counts calls. */
  private def spec(name: String, version: String,
                   calls: AtomicInteger): BundleSpec =
    BundleSpec(name, version, dir => {
      calls.incrementAndGet()
      new graft.bank.WaveBank(spark, s"$dir/waveforms")
        .putWaveforms(segmentDf)
      new graft.bank.EventBank(spark, s"$dir/events").putEvents(eventDf)
      channelDf.write.mode("overwrite").parquet(s"$dir/stations")
    })

  test("load fetches once, verifies hashes, and serves all three clients") {
    val base = Files.createTempDirectory("graft-bundle").toString
    val calls = new AtomicInteger(0)
    DataBundle.register(spec("crandall", "1.0.0", calls))

    val b = DataBundle.load(spark, "crandall", Some(base))
    assert(calls.get() == 1)
    assert(b.waveBank.get.readIndex().count() == 2)
    assert(b.eventBank.get.readIndex().count() == 2)
    assert(b.stationBank.get
      .getStations(StationQuery(channel = "BH?")).count() == 1)

    // second load: cache hit — no refetch, still verified + queryable
    val b2 = DataBundle.load(spark, "crandall", Some(base))
    assert(calls.get() == 1)
    assert(b2.waveBank.get.readIndex().count() == 2)
  }

  test("hash corruption is detected loudly; version bump refetches") {
    val base = Files.createTempDirectory("graft-bundle").toString
    val calls = new AtomicInteger(0)
    DataBundle.register(spec("corrupt", "1.0.0", calls))
    val b = DataBundle.load(spark, "corrupt", Some(base))

    // flip bytes in one shipped data file
    val dir = Path.of(b.path)
    val victim = Files.walk(dir).filter(p =>
      Files.isRegularFile(p) && p.toString.contains("waveforms") &&
        p.toString.endsWith(".parquet")).findFirst().get()
    Files.write(victim, "corrupted".getBytes)
    val err = intercept[IllegalArgumentException] {
      DataBundle.load(spark, "corrupt", Some(base))
    }
    assert(err.getMessage.contains("hash changed"))

    // a new registered version forces a refetch, which heals the cache
    DataBundle.register(spec("corrupt", "1.0.1", calls))
    val healed = DataBundle.load(spark, "corrupt", Some(base))
    assert(calls.get() == 2 && healed.version == "1.0.1")
    assert(healed.waveBank.get.readIndex().count() == 2)
  }

  test("missing sides load as None; unknown names list the registry") {
    val base = Files.createTempDirectory("graft-bundle").toString
    val calls = new AtomicInteger(0)
    DataBundle.register(BundleSpec("eventsonly", "1.0.0", dir => {
      calls.incrementAndGet()
      new graft.bank.EventBank(spark, s"$dir/events").putEvents(eventDf)
    }))
    val b = DataBundle.load(spark, "eventsonly", Some(base))
    assert(b.waveBank.isEmpty && b.stationBank.isEmpty)
    assert(b.eventBank.get.readIndex().count() == 2)

    val err = intercept[IllegalArgumentException] {
      DataBundle.load(spark, "no-such-bundle", Some(base))
    }
    assert(err.getMessage.contains("eventsonly"))
  }

  test("copyTo replicates a verified bundle and refuses a corrupt one") {
    val base = Files.createTempDirectory("graft-bundle").toString
    val calls = new AtomicInteger(0)
    DataBundle.register(spec("copyme", "1.0.0", calls))
    val b = DataBundle.load(spark, "copyme", Some(base))

    val dest = Files.createTempDirectory("graft-bundle-copy").resolve("copyme")
    DataBundle.copyTo(Path.of(b.path), dest)
    assert(DataBundle.verify(dest).isEmpty)
    // the copy is a self-sufficient bundle dir: banks open directly
    assert(new graft.bank.WaveBank(spark, s"$dest/waveforms")
      .readIndex().count() == 2)

    val victim = Files.walk(Path.of(b.path)).filter(p =>
      Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.write(victim, "junk".getBytes)
    intercept[IllegalArgumentException] {
      DataBundle.copyTo(Path.of(b.path),
        Files.createTempDirectory("graft-bundle-copy2"))
    }
  }

  test("named reference datasets load by name with the published shapes") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-named").toString
    graft.bank.Datasets.registerAll(spark)
    assert(Seq("bingham_test", "crandall_test", "ta_test")
      .forall(DataBundle.registered.contains))

    // ---- bingham_test: v0.1.0, events around the pit, 20 km ring of
    //      HH? 100 Hz stations, one -10..+60 s window per event/channel
    val bing = DataBundle.load(spark, "bingham_test", Some(base))
    assert(bing.version == "0.1.0")
    val bIdx = bing.waveBank.get.readIndex()
    // the index is per miniSEED RECORD; segment identity is the
    // (station, channel, window-start) triple
    assert(bIdx.select("station", "channel", "starttime").distinct()
      .count() >= 5L * 6 * 3, "one window per event x station x channel")
    assert(bIdx.select("station", "channel").distinct().count() == 18)
    assert(bIdx.select("sampling_period").distinct().as[Long].head() ==
      10_000_000L, "HH channels are 100 Hz")
    val bEv = bing.eventBank.get.readIndex()
    assert(bEv.count() == 5)
    val (latMin, latMax) = bEv.agg(min("latitude"), max("latitude"))
      .as[(Double, Double)].head()
    assert(latMin > 40.53829 - 0.1 && latMax < 40.53829 + 0.1,
      "epicenters stay inside the 20 km pit ring")
    assert(bing.stationBank.get.getStations(
      graft.stations.StationQuery(channel = "HH?")).count() == 18)
    // windows cover each event's -10 s lead
    val covered = bEv.select(col("time")).join(bIdx,
      bIdx("starttime") <= bEv("time") - 9L * 1_000_000_000L)
    assert(covered.count() > 0)

    // ---- ta_test: v0.0.0, TA M11A/M14A, VH? at 0.1 Hz, ten days of
    //      one-hour chunks, no events side
    val ta = DataBundle.load(spark, "ta_test", Some(base))
    assert(ta.version == "0.0.0" && ta.eventBank.isEmpty)
    val tIdx = ta.waveBank.get.readIndex()
    assert(tIdx.select("station").distinct().as[String].collect().toSet ==
      Set("M11A", "M14A"))
    assert(tIdx.select("station", "channel", "starttime").distinct()
      .count() == 240L * 2 * 3, "10 days of hour chunks x 2 x VH?")
    assert(tIdx.select("sampling_period").distinct().as[Long].head() ==
      10_000_000_000L, "VH channels are 0.1 Hz")

    // ---- crandall_test: v0.0.1, collapse-week events, regional BH?
    val cran = DataBundle.load(spark, "crandall_test", Some(base))
    assert(cran.version == "0.0.1")
    assert(cran.eventBank.get.readIndex().count() == 6)
    val t0 = 1186358400L * 1_000_000_000L // 2007-08-06
    val (tMin, tMax) = cran.eventBank.get.readIndex()
      .agg(min("time"), max("time")).as[(Long, Long)].head()
    assert(tMin >= t0 && tMax < t0 + 4L * 86400 * 1_000_000_000L,
      "events inside the 2007-08-06..10 window")
    val cIdx = cran.waveBank.get.readIndex()
    assert(cIdx.select("station").distinct().count() == 8)
    assert(cIdx.select("station", "channel").distinct().count() == 24)

    // loads are cache hits now, still hash-verified; a corrupted
    // shipped file is caught by name on the NEXT load
    val again = DataBundle.load(spark, "bingham_test", Some(base))
    assert(again.path == bing.path)
    val victim = Files.walk(Path.of(bing.path)).filter(p =>
      Files.isRegularFile(p) && p.toString.contains("segments"))
      .findFirst().get()
    Files.write(victim, "rot".getBytes)
    val err = intercept[IllegalArgumentException] {
      DataBundle.load(spark, "bingham_test", Some(base))
    }
    assert(err.getMessage.contains("hash changed"))
  }
}
