package graft

import org.apache.spark.sql.functions._
import graft.bank.EventBank
import graft.fetch.Fetcher

/** Sketch-assisted fetch planning (round 11): the request side
  * broadcasts only while the sidecar-estimated cardinality fits the
  * budget; past it the join runs un-hinted on the planner's own
  * scale machinery. Results are identical either way — the estimate
  * moves the PLAN, never the answer.
  */
class FetcherPlanSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1_600_000_000_000_000_000L
  private val HourNs = 3_600_000_000_000L

  private def corpus() = {
    val quakes = (0 until 50).map(i =>
      (s"ev$i", T0 + i * HourNs)).toDF("event_id", "time")
    val channels = (0 until 10).map(c => s"NT.S$c..BHZ").toDF("seed_id")
    val index = (0 until 2000).map { i =>
      (s"NT.S${i % 10}..BHZ", T0 + (i / 10) * HourNs / 4,
        T0 + (i / 10) * HourNs / 4 + 600_000_000_000L)
    }.toDF("seed_id", "starttime", "endtime")
    (quakes, channels, index)
  }

  test("estimatedRequests: sidecar event count x channel count, no catalog scan needed") {
    val (quakes, channels, _) = corpus()
    val root = java.nio.file.Files.createTempDirectory("graft-fplan").toString
    val bank = new EventBank(spark, root)
    bank.putEvents(quakes.withColumn("updated", lit(1L)))
    val fetcher = new Fetcher(spark, quakes, channels, picks = quakes)
    val est = fetcher.estimatedRequests(bank, T0, T0 + 50 * HourNs)
    // 50 events x 10 channels — the sketch estimate is EXACT here
    assert(est == 500L, s"estimate $est")
    // and equals the true materialized request count
    val actual = fetcher.eventRequests("origin", HourNs, HourNs).count()
    assert(est == actual, s"estimate $est vs actual $actual")
  }

  test("decision flip: estimate under budget broadcasts, over budget does not; results identical") {
    val (quakes, channels, index) = corpus()
    val fetcher = new Fetcher(spark, quakes, channels, picks = quakes)
    def planOf(estimate: Option[Long]): (String, Array[(String, String, Long)]) = {
      val df = fetcher
        .fetchEventSegments(index, "origin", HourNs, HourNs, estimate)
        .groupBy("event_id", "seed_id").agg(count(lit(1)).as("n"))
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .sortBy(t => (t._1, t._2)))
    }
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // kill size-triggered broadcasts so the pins test OUR decision,
      // not AQE's size fallback (the 100 TB shape)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // NOTE: the request CONSTRUCTION (events × tiny channel table)
      // legitimately broadcasts the channel side in every variant —
      // the pins below are about the index↔requests join only
      def requestsBroadcast(plan: String): Boolean =
        plan.contains("BroadcastHashJoin") ||
          plan.contains("RangeJoinExec") // packed broadcast range join
      val (smallPlan, smallRows) = planOf(Some(500L)) // <= default budget
      assert(requestsBroadcast(smallPlan),
        s"under-budget estimate must broadcast the requests:\n$smallPlan")
      val (bigPlan, bigRows) = planOf(Some(3_000_000L)) // > default budget
      assert(!requestsBroadcast(bigPlan),
        s"over-budget estimate must NOT force a request broadcast:\n$bigPlan")
      // the round-13 default (1M, down from 2M): 1.6M — the point where
      // the forced broadcast measured SLOWER than shuffled — now lands
      // on the shuffled path by default, and 0.9M still broadcasts
      val (xoverPlan, xoverRows) = planOf(Some(1_600_000L))
      assert(!requestsBroadcast(xoverPlan),
        s"1.6M (past the measured crossover) must not broadcast:\n$xoverPlan")
      assert(xoverRows.sameElements(smallRows))
      val (underPlan, underRows) = planOf(Some(900_000L))
      assert(requestsBroadcast(underPlan),
        s"0.9M (under the 1M default) must broadcast:\n$underPlan")
      assert(underRows.sameElements(smallRows))
      assert(bigPlan.contains("SortMergeJoin")
          && bigPlan.contains("_graft_band"),
        s"over-budget fetch should land on the banded SMJ scale path:\n$bigPlan")
      assert(smallRows.sameElements(bigRows),
        "plan choice changed RESULTS")
      // the budget is a conf, not a constant
      spark.conf.set("spark.graft.fetch.broadcastMaxRequests", "100")
      val (confPlan, confRows) = planOf(Some(500L))
      assert(!requestsBroadcast(confPlan),
        s"conf-shrunk budget must flip the same estimate to shuffled:\n$confPlan")
      assert(confRows.sameElements(smallRows))
      // no estimate = the historical always-broadcast contract
      spark.conf.unset("spark.graft.fetch.broadcastMaxRequests")
      val (defPlan, _) = planOf(None)
      assert(requestsBroadcast(defPlan))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.graft.fetch.broadcastMaxRequests")
    }
  }

  test("both-side choice: requests over budget + small index estimate broadcasts the SEGMENT side; results identical") {
    val (quakes, channels, index) = corpus()
    val fetcher = new Fetcher(spark, quakes, channels, picks = quakes)
    def planOf(reqEst: Option[Long], segEst: Option[Long])
        : (String, Array[(String, String, Long)]) = {
      val df = fetcher
        .fetchEventSegments(index, "origin", HourNs, HourNs, reqEst, segEst)
        .groupBy("event_id", "seed_id").agg(count(lit(1)).as("n"))
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .sortBy(t => (t._1, t._2)))
    }
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // requests over budget, index side fits: the fact side broadcasts
      // (a BroadcastNestedLoopJoin/BroadcastHashJoin whose BUILD input
      // is the index scan — NOT the banded SMJ)
      val (segPlan, segRows) =
        planOf(Some(3_000_000L), Some(2000L))
      assert(!segPlan.contains("_graft_band"),
        s"segment-side broadcast must not fall to the banded path:\n$segPlan")
      assert(segPlan.contains("Broadcast"),
        s"index side must broadcast:\n$segPlan")
      // both over budget: un-hinted, lands on the banded SMJ scale path
      val (nonePlan, noneRows) =
        planOf(Some(3_000_000L), Some(3_000_000L))
      assert(nonePlan.contains("SortMergeJoin")
          && nonePlan.contains("_graft_band"),
        s"both-over-budget fetch should land on the banded SMJ:\n$nonePlan")
      assert(segRows.sameElements(noneRows), "plan choice changed RESULTS")
      // request-side broadcast keeps priority when both fit
      val (reqPlan, reqRows) = planOf(Some(500L), Some(2000L))
      assert(reqPlan.contains("BroadcastHashJoin")
          || reqPlan.contains("RangeJoinExec"))
      assert(reqRows.sameElements(segRows))
      // the segment budget is a conf, not a constant
      spark.conf.set("spark.graft.fetch.broadcastMaxSegments", "100")
      val (shrunkPlan, shrunkRows) = planOf(Some(3_000_000L), Some(2000L))
      assert(shrunkPlan.contains("_graft_band"),
        s"conf-shrunk segment budget must fall back to banded:\n$shrunkPlan")
      assert(shrunkRows.sameElements(segRows))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.graft.fetch.broadcastMaxSegments")
    }
  }

  test("segment-side broadcast slices the index to the requests' time hull first (full-archive safety)") {
    val (quakes, channels, index) = corpus()
    // a "full archive": the thin-window rows plus 20x decoy rows far
    // outside any request window — the shape where a thin-window
    // estimate next to an unsliced frame used to broadcast everything
    val decoys = (0 until 40000).map { i =>
      (s"NT.S${i % 10}..BHZ", T0 + 1000 * HourNs + i * HourNs,
        T0 + 1000 * HourNs + i * HourNs + 600_000_000_000L)
    }.toDF("seed_id", "starttime", "endtime")
    // parquet-backed like a real archive, so the hull filter must show
    // up as PushedFilters on the index scan (not constant-folded away
    // as it is for a LocalRelation)
    val dir = java.nio.file.Files.createTempDirectory("graft-hull").toString
    index.unionByName(decoys).write.mode("overwrite").parquet(dir)
    val archive = spark.read.parquet(dir)
    val fetcher = new Fetcher(spark, quakes, channels, picks = quakes)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def run(reqEst: Option[Long], segEst: Option[Long]) = {
        val df = fetcher
          .fetchEventSegments(archive, "origin", HourNs, HourNs, reqEst, segEst)
          .groupBy("event_id", "seed_id").agg(count(lit(1)).as("n"))
        (df.queryExecution.executedPlan.toString,
          df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
            .sortBy(t => (t._1, t._2)))
      }
      val (segPlan, segRows) = run(Some(3_000_000L), Some(2000L))
      assert(segPlan.contains("Broadcast"), s"index side must broadcast:\n$segPlan")
      // the hull slice reaches the parquet scan as pushed predicates on
      // (endtime, starttime) — the decoy row groups never leave disk
      assert(segPlan.contains("GreaterThanOrEqual(endtime") // in PushedFilters
          && """starttime#\d+L? <= \d+""".r.findFirstIn(segPlan).isDefined,
        s"expected the time-hull filter pushed to the index scan:\n$segPlan")
      // and the slice is result-identical to the un-hinted scale plan
      val (_, noneRows) = run(Some(3_000_000L), Some(3_000_000L))
      assert(segRows.sameElements(noneRows), "hull slice changed RESULTS")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("estimatedSegments: sidecar day counts over the padded window, no index scan needed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-wplan").toString
    val bank = new graft.bank.WaveBank(spark, root)
    val segs = (0 until 40).map { h =>
      ("NT", s"S${h % 4}", "", "BHZ", T0 + h * HourNs,
        1_000_000_000L, Array.fill(16)(1.0))
    }.toDF("network", "station", "location", "channel",
      "starttime", "sampling_period", "samples")
    bank.putWaveforms(segs)
    // all 40 segments start inside the (day-granular) window
    val est = bank.estimatedSegmentCount(T0, T0 + 40 * HourNs)
    assert(est == 40L, s"estimate $est")
    // and the fetcher helper pads the window by the request margins
    val fetcher = new Fetcher(spark,
      Seq(("e", T0)).toDF("event_id", "time"),
      Seq("NT.S0..BHZ").toDF("seed_id"),
      picks = Seq(("e", T0)).toDF("event_id", "time"))
    assert(fetcher.estimatedSegments(bank, T0, T0 + 40 * HourNs,
      HourNs, HourNs) == 40L)
  }
}
