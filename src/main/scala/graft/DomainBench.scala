package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.bank.{EventBank, EventQuery, WaveBank}
import graft.fetch.Fetcher
import graft.sources.BinarySegmentSource
import graft.sources.BinarySegmentSource.Segment

/** Domain-workload benchmark — records the numbers the reference never
  * published (BASELINE.md): mirrors `profiling/profile_wavebank.ipynb`'s
  * synthetic bank (4000 files of hourly traces), then times index
  * build, filtered index reads, gap analytics, bulk interval fetch and
  * the one-job event-waveform join. Prints one JSON line.
  *
  * Run: sbt "runMain graft.DomainBench" (optional env GRAFT_BENCH_FILES).
  */
object DomainBench {

  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("GRAFT_BENCH_FILES", "4000").toInt
    val spark = graft.core.GraftSession.local()
    import spark.implicits._

    val root = Files.createTempDirectory("graft-dbench").toString
    val segDir = s"$root/archive"
    Files.createDirectories(Paths.get(segDir))

    // synthetic archive: nFiles hour-long segments over 10 stations,
    // 100 samples/hour, contiguous per station (like the reference's
    // 4000-file profiling bank)
    val hourNs = 3_600_000_000_000L
    val t0 = System.nanoTime()
    (0 until nFiles).foreach { i =>
      val sta = f"S${i % 10}%02d"
      val hour = i / 10
      BinarySegmentSource.writeFile(Paths.get(s"$segDir/seg_$i.bin"),
        Segment("N1", sta, "", "BHZ", hour * hourNs, hourNs / 100,
          Array.tabulate(100)(j => (i + j).toDouble), ""))
    }
    val tGen = (System.nanoTime() - t0) / 1e9

    def time(f: => Long): (Double, Long) = {
      val s = System.nanoTime(); val n = f; ((System.nanoTime() - s) / 1e9, n)
    }

    // 1. index build (header-only summarize of every file)
    val (tIndex, nIdx) = time {
      val idx = BinarySegmentSource.summaryIndex(spark, segDir)
      idx.write.mode("overwrite").parquet(s"$root/index")
      spark.read.parquet(s"$root/index").count()
    }

    val bank = new WaveBank(spark, root) // reuse index written above
    val idxDf = spark.read.parquet(s"$root/index")

    // 2. filtered index read: glob + interval
    val (tRead, nRead) = time {
      idxDf.filter(graft.functions.Fnmatch.matches(col("station"), "S0?"))
        .filter(graft.operators.Intervals.overlaps(0L, 50L * hourNs, 1_000_000_000L))
        .count()
    }
    // 2b. containment index cache: the wide query fills (persist +
    // materialize), the contained narrow query re-filters in-memory
    // rows — the repeated-dashboard-query shape
    val cachedBank = new WaveBank(spark, root, indexCacheSize = 2)
    val (tCacheFill, _) = time(cachedBank.readIndex(station = "S0?",
      starttime = Some(0L), endtime = Some(90L * hourNs)).count())
    val (tCacheHit, nCacheHit) = time(cachedBank.readIndex(station = "S0?",
      starttime = Some(0L), endtime = Some(50L * hourNs)).count())

    // 2c (opt-in, GRAFT_BENCH_INDEX_ROWS=<n>): row-group pruning at
    // archive scale — the same N-row index written unclustered (file-
    // listing order: station varies fastest, time spans everything) vs
    // clustered the way indexAppend now writes (global sort by NSLC,
    // starttime → disjoint range slices, tight per-row-group min/max),
    // then one NSLC+window readIndex-shaped filter against each. The
    // delta is pure parquet row-group/file skipping — identical rows,
    // identical plan.
    val idxScale = sys.env.get("GRAFT_BENCH_INDEX_ROWS").map(_.toLong)
    val pruneTimes = idxScale.map { n =>
      require(n >= 100000,
        s"GRAFT_BENCH_INDEX_ROWS=$n too small: below 100 rows/station " +
          "the hour modulus degenerates (and the probe window empties)")
      val stations = 1000L
      val nHrs = n / stations
      // raw order = SCRAMBLED station and time (a real archive's file
      // listing interleaves stations and revisits time ranges), so
      // every unclustered row group spans the full key range — the
      // honest no-pruning baseline
      val hr = (col("id") * 48271L) % lit(nHrs)
      val big = spark.range(n).select(
        lit("N1").as("network"),
        concat(lit("S"), lpad(pmod(col("id") * 7L, lit(stations))
          .cast("string"), 4, "0")).as("station"),
        lit("").as("location"), lit("BHZ").as("channel"),
        (hr * hourNs).as("starttime"),
        (hr * hourNs + hourNs).as("endtime"),
        lit(hourNs / 100).as("sampling_period"),
        concat(lit("f"), col("id")).as("path"))
      big.write.mode("overwrite").parquet(s"$root/bigidx_raw")
      spark.read.parquet(s"$root/bigidx_raw")
        .sort("network", "station", "location", "channel", "starttime")
        .write.mode("overwrite").parquet(s"$root/bigidx_sorted")
      def probe(dir: String): (Double, Long) = time {
        spark.read.parquet(dir)
          .filter(col("station") === "S0123" &&
            graft.operators.Intervals.overlaps(
              (nHrs / 2) * hourNs, (nHrs / 2 + 24) * hourNs,
              1_000_000_000L))
          .count()
      }
      probe(s"$root/bigidx_raw") // warm the page cache evenly
      probe(s"$root/bigidx_sorted")
      val (tRaw, nRaw) = probe(s"$root/bigidx_raw")
      val (tSorted, nSorted) = probe(s"$root/bigidx_sorted")
      require(nRaw == nSorted, s"pruning changed results: $nRaw vs $nSorted")
      (tRaw, tSorted, nRaw)
    }

    // 2d (opt-in, GRAFT_BENCH_COMPACT=<rows>): the compactIndex
    // generation swap at archive scale. The store accumulates 32
    // incremental append batches — each clustered the way indexAppend
    // writes, but batches OVERLAP in key range (every batch carries all
    // stations over the full time span), so a station+window probe must
    // open every batch's files; compaction restores store-wide disjoint
    // slices, adding FILE-level pruning on top of the per-file
    // row-group pruning measured in 2c. Also pins the pointer-swap
    // read contract at scale: a reader plan resolved BEFORE the
    // compact collects correctly afterwards (the replaced generation
    // survives as the grace copy).
    val compactScale = sys.env.get("GRAFT_BENCH_COMPACT").map(_.toLong)
    val compactTimes = compactScale.map { n =>
      require(n >= 3200000, s"GRAFT_BENCH_COMPACT=$n too small: below " +
        "100 rows/station/batch the probe window empties")
      val stations = 1000L
      val batches = 32
      val per = n / batches
      val totalHrs = n / stations
      val compRoot = s"$root/compactbank"
      val bank = new graft.bank.WaveBank(spark, compRoot)
      (0 until batches).foreach { b =>
        val hr = (col("id") * 48271L + lit(b.toLong)) % lit(totalHrs)
        spark.range(per).select(
            lit("N1").as("network"),
            concat(lit("S"), lpad(pmod(col("id") * 7L, lit(stations))
              .cast("string"), 4, "0")).as("station"),
            lit("").as("location"), lit("BHZ").as("channel"),
            (hr * hourNs).as("starttime"),
            (hr * hourNs + hourNs).as("endtime"),
            lit(hourNs / 100).as("sampling_period"),
            concat(lit("f"), lit(b.toLong) * per + col("id")).as("path"),
            lit(-1L).as("mtime_ms"),
            lit(b.toLong).as("indexed_at"),
            lit(graft.bank.WaveBank.IndexVersion).as("index_version"))
          .sort("network", "station", "location", "channel", "starttime")
          .write.mode("append").parquet(s"$compRoot/index")
      }
      def probe(): (Double, Long) = time {
        bank.readIndex(station = "S0123",
          starttime = Some((totalHrs / 2) * hourNs),
          endtime = Some((totalHrs / 2 + 24) * hourNs)).count()
      }
      probe() // warm
      val (tBefore, nBefore) = probe()
      val inFlight = bank.readIndex(station = "S0123",
        starttime = Some((totalHrs / 2) * hourNs),
        endtime = Some((totalHrs / 2 + 24) * hourNs))
      val (tCompact, _) = time { bank.compactIndex(); 0L }
      val nInFlight = inFlight.count() // grace-copy read-through
      probe() // warm the compacted layout
      val (tAfter, nAfter) = probe()
      require(nBefore == nAfter && nBefore == nInFlight,
        s"compaction changed results: $nBefore / $nInFlight / $nAfter")
      (tBefore, tCompact, tAfter, nBefore)
    }

    // 3. gaps over the full index
    val (tGaps, nGaps) = time {
      graft.operators.Intervals.gaps(idxDf,
        Seq("network", "station", "location", "channel"), 0L).count()
    }


    // 4. bulk interval join: 10k random-ish windows vs index
    val reqs = spark.range(10000).select(
      concat(lit("N1.S"), lpad((col("id") % 10).cast("string"), 2, "0"), lit("..BHZ")).as("seed_id"),
      (col("id") % 300 * hourNs).as("t1"),
      ((col("id") % 300 + 2) * hourNs).as("t2"))
    val idxSeed = idxDf.withColumn("seed_id",
      graft.core.Schemas.seedId(col("network"), col("station"), col("location"), col("channel")))
    val (tBulk, nBulk) = time {
      graft.operators.IntervalJoin.overlapping(idxSeed, reqs,
        keyCols = Seq("seed_id"), buffer = 1_000_000_000L).count()
    }
    // same join with the custom strategy disabled — what Spark's planner
    // does on its own (BroadcastNestedLoop), for the speedup record
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    val (tBulkBnl, _) =
      try time {
        graft.operators.IntervalJoin.overlapping(idxSeed, reqs,
          keyCols = Seq("seed_id"), buffer = 1_000_000_000L).count()
      } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")

    // 4b. same bulk join through the banded optimizer rule (huge×huge
    // path): broadcasts disabled, plain join syntax → BandedRangeJoinRule
    // rewrites to a banded equi join instead of BNLJ
    val bandSaved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.rangeJoin.bandWidth", hourNs.toString)
    val (tBulkBanded, nBulkBanded) =
      try time {
        graft.operators.IntervalJoin.overlapping(idxSeed, reqs,
          keyCols = Seq("seed_id"), buffer = 1_000_000_000L,
          broadcastRequests = false).count()
      } finally {
        bandSaved match {
          case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
          case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
        spark.conf.unset("spark.graft.rangeJoin.bandWidth")
      }

    // 4c. gsg DataSource V2: index build through the planner-pruned
    // header-only scan (vs workload 1's listing+mapPartitions path)
    val (tIndexV2, nIdxV2) = time {
      BinarySegmentSource.summaryIndexV2(spark, segDir).count()
    }

    // 4d. one oversized multi-record file: record-boundary split
    // planning turns it into parallel tasks; header-only vs full decode
    val bigDir = s"$root/bigfile"
    Files.createDirectories(Paths.get(bigDir))
    BinarySegmentSource.writeMultiRecordFile(Paths.get(s"$bigDir/big.gsg"),
      (0 until 2000).map(i => Segment("N1", f"S${i % 10}%02d", "", "BHZ",
        i * hourNs, hourNs / 5000, Array.tabulate(5000)(_.toDouble), "")))
    spark.conf.set("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
    val (tBigHeaders, nBigRecs) =
      try time {
        spark.read.format("gsg").load(bigDir)
          .select("station", "starttime").count()
      } finally ()
    val bigParts = spark.read.format("gsg").load(bigDir).rdd.getNumPartitions
    val (tBigFull, _) =
      try time {
        spark.read.format("gsg").load(bigDir)
          .select(aggregate(col("samples"), lit(0.0), (a, x) => a + x).as("s"))
          .agg(sum("s")).count()
      } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")

    // 4e. transactional index: 20 log-structured appends + snapshot read
    // + compaction (the concurrent-producer contract)
    val txRoot = s"$root/txbank"
    val txBank = new WaveBank(spark, txRoot, txIndex = true)
    val (tTxAppend, _) = time {
      (0 until 20).foreach { i =>
        txBank.txTable.append(idxDf.limit(200).withColumn("batch", lit(i)))
      }
      20L
    }
    val (tTxRead, nTxRows) = time(txBank.txTable.read().count())
    val (tTxCompact, _) = time { txBank.txTable.compact(); 1L }

    // 5. event query surface (rect + circular + limit)
    val ebank = new EventBank(spark, root)
    val events = spark.range(5000).select(
      concat(lit("ev"), col("id")).as("event_id"),
      (col("id") * hourNs / 10).as("time"),
      ((col("id") % 170).cast("double") / 2 - 40).as("latitude"),
      ((col("id") % 360).cast("double") - 180).as("longitude"),
      lit(5.0).as("depth"),
      ((col("id") % 80).cast("double") / 10).as("magnitude"),
      lit("ML").as("magnitude_type"), col("id").as("updated"))
    ebank.putEvents(events)
    val (tEvents, nEvents) = time {
      ebank.getEvents(EventQuery(minMagnitude = Some(2.0),
        latitude = Some(10.0), longitude = Some(20.0),
        maxRadiusM = Some(3.0e6))).count()
    }

    // 6. one-job event-waveform fetch: events × channels → interval join
    val stations = idxDf.select("network", "station", "location", "channel")
      .distinct()
      .withColumn("seed_id", graft.core.Schemas.seedId(
        col("network"), col("station"), col("location"), col("channel")))
    val evDf = ebank.readIndex().select(col("event_id"), col("time"))
    val fetcher = new Fetcher(spark, evDf, stations, spark.emptyDataFrame)
    val (tFetch, nFetch) = time {
      fetcher.fetchEventSegments(idxSeed, "origin",
        beforeNs = hourNs / 2, afterNs = hourNs / 2).count()
    }

    // 7. skew injection: one hot key owns HALF the fact rows, joined to
    // a 1M-key dim. Broadcast is disabled (at production scale the dim
    // wouldn't fit) so the join shuffles; AQE thresholds are lowered to
    // match the local data volume (the ratios, not the absolutes, are
    // what scale). Records the straggler cost AQE's runtime skew split
    // removes — the crossover evidence for AQE-vs-manual-salting.
    val nSkew = sys.env.getOrElse("GRAFT_BENCH_SKEW_ROWS", "10000000").toLong
    def skewJoin(): Long = {
      val facts = spark.range(nSkew).select(
        when(col("id") % 2 === 0, 0L)
          .otherwise(pmod(col("id"), lit(1000000L))).as("k"),
        (col("id") % 1000).as("v"))
      val dims = spark.range(1000000L).select(
        col("id").as("k"), (col("id") % 97).as("w"))
      facts.join(dims, "k").agg(sum(col("v") * col("w"))).count()
    }
    val skewConfs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m")
    val saved = skewConfs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    val (tSkewStatic, tSkewAqe) =
      try {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        val staticT =
          try time(skewJoin())
          finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        (staticT._1, time(skewJoin())._1)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }

    // 8. catalog validation + event utilities: the reference walks one
    // ObsPy event at a time in Python (`validate_catalog`,
    // `prune_events`); here the full 11-rule report over 500k picks is
    // a handful of keyed shuffles, and pruning 100k trees is one
    // narrow map stage.
    val nVal = sys.env.getOrElse("GRAFT_BENCH_VAL_PICKS", "500000").toLong
    def vTable(n: Long) = spark.range(n).select(
      col("id"),
      concat(lit("e"), pmod(col("id"), lit(20000L))).as("event_id"),
      concat(lit("N"), pmod(col("id"), lit(2L))).as("network"),
      concat(lit("S"), pmod(col("id"), lit(7L))).as("station"),
      lit("").as("location"),
      when(col("id") % 3 === 0, "HHZ").otherwise("HHN").as("channel"),
      when(col("id") % 13 === 0, "rejected").otherwise("")
        .as("evaluation_status"),
      (col("id") * 7_000_000L % 1_000_000_000_000L).as("time"))
    val vPicks = vTable(nVal)
      .withColumn("resource_id", concat(lit("pk/"), col("id")))
      .withColumn("phase_hint",
        when(col("id") % 5 === 0, "P").when(col("id") % 5 === 1, "S")
          .when(col("id") % 5 === 2, "AML").otherwise("Pg"))
      .drop("id")
    val vArr = vTable(nVal / 10)
      .withColumn("resource_id", concat(lit("ar/"), col("id")))
      .withColumn("pick_id", concat(lit("pk/"),
        when(col("id") % 17 === 0, lit("none"))
          .otherwise(col("id").cast("string"))))
      .select("resource_id", "event_id", "pick_id")
    val vAmps = vTable(nVal / 10)
      .withColumn("resource_id", concat(lit("am/"), col("id")))
      .withColumn("pick_id", concat(lit("pk/"), col("id") * 5 + 2))
      .withColumn("generic_amplitude", (col("id") % 1000).cast("double"))
      .withColumn("filter_id", concat(lit("f/"), pmod(col("id"), lit(3L))))
      .withColumn("reference", col("time"))
      .withColumn("time_begin", lit(0.5)).withColumn("time_end", lit(1.0))
      .drop("id")
    val vOrig = vTable(nVal / 50)
      .withColumn("resource_id", concat(lit("or/"), col("id")))
      .withColumn("latitude", (col("id") % 180).cast("double") - 90)
      .withColumn("longitude", (col("id") % 360).cast("double") - 180)
      .withColumn("depth", lit(5.0)).drop("id")
    val (tValidate, nViol) = time {
      graft.operators.Validation.report(
        graft.operators.CatalogValidation.rules(vPicks, vArr, vAmps, vOrig,
          pLimUs = Some(3_600_000_000L), ampLim = Some(900.0),
          filterIds = Seq("f/0", "f/1"), noZAmps = true)).count()
    }

    import graft.core.EventOps
    val nTrees = sys.env.getOrElse("GRAFT_BENCH_TREES", "100000").toLong
    val treeDs = spark.range(nTrees).as[Long].map { id =>
      EventOps.FullEvent(s"ev/$id", Some(s"or/$id"), None, Seq("d"),
        picks = Seq(
          EventOps.Pick(s"p1/$id", id * 1000, "N.S..HHZ", "P",
            if (id % 3 == 0) Some("rejected") else Some("")),
          EventOps.Pick(s"p2/$id", id * 1000 + 5, "N.S..HHN", "S", Some(""))),
        origins = Seq(EventOps.Origin(s"or/$id", id * 1000, 1, 2, 3,
          if (id % 5 == 0) Some("rejected") else Some(""),
          Seq(EventOps.Arrival(s"ar/$id", s"p2/$id", "S")))),
        magnitudes = Seq(EventOps.Magnitude(s"mg/$id", 1.0, "ML", s"or/$id",
          if (id % 7 == 0) Some("rejected") else Some(""))),
        amplitudes = Seq(EventOps.Amplitude(s"am/$id", 1.0, s"p1/$id", "f",
          Some(""))))
    }
    val (tPrune, nPruned) = time(EventOps.pruneEvents(treeDs).count())
    val (tStrip, _) = time(EventOps.stripEvents(treeDs).count())

    // 9. round-5 surface benches: segment sinks, HTTP claims, decoders
    // 9a. sink throughput: the same 4000-segment frame through the
    // parquet store, the gsg staged sink, and the mseed (Steim-2) sink
    val sinkSegs = spark.range(4000).select(
      lit("N1").as("network"),
      concat(lit("S"), pmod(col("id"), lit(10L))).as("station"),
      lit("").as("location"), lit("BHZ").as("channel"),
      (col("id") * lit(hourNs / 100)).as("starttime"), // 36 s apart, on the 100 µs grid
      lit(10_000_000L).as("sampling_period"),
      transform(sequence(lit(0), lit(999)),
        i => (i % 97).cast("double")).as("samples"))
      .localCheckpoint(true) // synth cost excluded from sink timing
    val segBytesMb = 4000.0 * 1000 * 8 / 1e6 // payload doubles, pre-encoding
    // SDS export: the same 4000 segments through a real parquet bank,
    // re-chunked into the day-partitioned layout (one clustering
    // shuffle + partitioned write); put/index setup untimed
    val sdsBank = new WaveBank(spark, s"$root/sdsbank")
    sdsBank.putWaveforms(sinkSegs)
    val (tSds, nSdsParts) = time {
      sdsBank.exportSds(s"$root/sds")
      // LEAF partition dirs (network/station/channel/day), not the
      // single top-level network dir
      def leaves(f: java.io.File): Long = {
        val subs = Option(f.listFiles()).getOrElse(Array.empty)
          .filter(_.isDirectory)
        if (subs.isEmpty) 1L else subs.map(leaves).sum
      }
      leaves(new java.io.File(s"$root/sds"))
    }
    val (tSinkParquet, _) = time {
      sinkSegs.write.mode("overwrite").parquet(s"$root/sink_pq"); 1L
    }
    val (tSinkGsg, _) = time {
      sinkSegs.write.format("gsg").mode("overwrite").save(s"$root/sink_gsg"); 1L
    }
    val (tSinkMseed, _) = time {
      sinkSegs.write.format("mseed").mode("overwrite").save(s"$root/sink_ms"); 1L
    }
    // read-back full decode, same aggregation over each store
    def sumSamples(df: org.apache.spark.sql.DataFrame): Long =
      df.select(aggregate(col("samples"), lit(0.0), (a, x) => a + x).as("s"))
        .agg(sum("s")).count()
    val (tScanGsg, _) = time(sumSamples(
      spark.read.format("gsg").load(s"$root/sink_gsg")))
    val (tScanMseed, _) = time(sumSamples(
      spark.read.format("mseed").load(s"$root/sink_ms")))

    // 9b. HTTP conditional-put claims: 8 writers race 200 versions
    // through an in-process object store (the TxClaimSpec shape, timed)
    val claimServer = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    claimServer.createContext("/", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit =
        try {
          ex.getRequestBody.readAllBytes()
          val conditional = Option(ex.getRequestHeaders
            .getFirst("If-None-Match")).contains("*")
          val status =
            if (conditional && !claimed.add(ex.getRequestURI.getPath)) 412
            else 200
          ex.sendResponseHeaders(status, -1)
        } finally ex.close()
    })
    // non-daemon pool: must be shut down explicitly or the forked JVM
    // never exits (server.stop does NOT stop a user-provided executor)
    val claimExec = java.util.concurrent.Executors.newFixedThreadPool(8)
    claimServer.setExecutor(claimExec)
    claimServer.start()
    val (tClaims, nClaimWins) = try time {
      val ep = new java.net.URI(
        s"http://127.0.0.1:${claimServer.getAddress.getPort}")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val wins = new java.util.concurrent.atomic.AtomicLong(0)
        val tasks = (0 until 8).map { w =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              val store = new graft.bank.HttpConditionalPutClaimStore(ep)
              (0 until 200).foreach { v =>
                if (store.putIfAbsent(
                  new org.apache.hadoop.fs.Path(s"/c/$v.json"),
                  s"w$w".getBytes)) wins.incrementAndGet()
              }
            }
          })
        }
        tasks.foreach(_.get())
        wins.get() // must be exactly 200: one winner per version
      } finally pool.shutdown()
    } finally { claimServer.stop(0); claimExec.shutdown() }

    // 9c. decoder throughput: real PNG decode (javax.imageio) vs the
    // header stub over the same 2000-payload column
    val pngBytes = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 64).foreach(x => (0 until 64).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val payloads = spark.range(2000).select(col("id").as("doc_id"),
      lit("image").as("media_type"), lit(pngBytes).as("payload"))
      .localCheckpoint(true)
    import graft.multimodal.Multimodal
    val (tDecodeStub, _) = time(
      Multimodal.decodeMeta(spark, payloads).groupBy().sum("width").count())
    val (tDecodeReal, nDecoded) = time(
      Multimodal.decodeMeta(spark, payloads, () => Multimodal.ImageIoDecoder)
        .filter(r => r.width == 64L).count())

    val metrics = Seq(
      "archive_gen_s" -> tGen,
      "index_build_s" -> tIndex, "index_files_per_s" -> nFiles / tIndex,
      "read_index_s" -> tRead,
      "read_index_cache_fill_s" -> tCacheFill,
      "read_index_cache_hit_s" -> tCacheHit,
      "gaps_s" -> tGaps, "sds_export_s" -> tSds,
      "bulk_join_10k_s" -> tBulk, "bulk_join_10k_bnlj_s" -> tBulkBnl,
      "bulk_join_10k_banded_s" -> tBulkBanded,
      "index_build_v2_s" -> tIndexV2,
      "bigfile_headers_s" -> tBigHeaders, "bigfile_full_s" -> tBigFull,
      "tx_append20_s" -> tTxAppend, "tx_read_s" -> tTxRead,
      "tx_compact_s" -> tTxCompact,
      "event_query_s" -> tEvents,
      "event_fetch_job_s" -> tFetch,
      "skew_join_static_s" -> tSkewStatic, "skew_join_aqe_s" -> tSkewAqe,
      "validate_rules_s" -> tValidate,
      "validate_picks_per_s" -> nVal / tValidate,
      "prune_trees_s" -> tPrune, "prune_trees_per_s" -> nTrees / tPrune,
      "strip_trees_s" -> tStrip,
      "sink_parquet_s" -> tSinkParquet, "sink_gsg_s" -> tSinkGsg,
      "sink_mseed_s" -> tSinkMseed,
      "sink_gsg_mb_per_s" -> segBytesMb / tSinkGsg,
      "sink_mseed_mb_per_s" -> segBytesMb / tSinkMseed,
      "scan_gsg_s" -> tScanGsg, "scan_mseed_s" -> tScanMseed,
      "http_claims_1600_s" -> tClaims,
      "http_claims_per_s" -> 1600.0 / tClaims,
      "decode_stub_s" -> tDecodeStub, "decode_imageio_s" -> tDecodeReal,
      "decode_imageio_per_s" -> 2000.0 / tDecodeReal) ++
      pruneTimes.toSeq.flatMap { case (tRaw, tSorted, _) => Seq(
        "bigidx_read_unsorted_s" -> tRaw,
        "bigidx_read_clustered_s" -> tSorted) } ++
      compactTimes.toSeq.flatMap { case (tBefore, tCompact, tAfter, _) => Seq(
        "compact_probe_before_s" -> tBefore,
        "compact_s" -> tCompact,
        "compact_probe_after_s" -> tAfter) }
    val counts = Seq("n_indexed" -> nIdx, "n_read" -> nRead, "n_gaps" -> nGaps,
      "n_sds_partitions" -> nSdsParts,
      "n_bulk" -> nBulk, "n_bulk_banded" -> nBulkBanded,
      "n_indexed_v2" -> nIdxV2, "n_big_records" -> nBigRecs,
      "big_file_partitions" -> bigParts.toLong, "n_tx_rows" -> nTxRows,
      "n_events" -> nEvents, "n_fetch" -> nFetch,
      "n_violations" -> nViol, "n_pruned_trees" -> nPruned,
      "n_claim_wins" -> nClaimWins, "n_png_decoded" -> nDecoded,
      "n_cache_hit" -> nCacheHit) // must equal n_read: same predicate
    println("{" +
      // Locale.ROOT: a comma-locale JVM's "%.3f" would corrupt the JSON
      (metrics.map { case (k, v) => s""""$k":${String.format(
        java.util.Locale.ROOT, "%.3f", Double.box(v))}""" } ++
       counts.map { case (k, v) => s""""$k":$v""" }).mkString(",") +
      s""","n_files":$nFiles}""")
    spark.stop()
  }
}
