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
}
