package graft

import scala.util.Random
import graft.operators.Intervals

/** Differential tests: random interval sets checked against a
  * straightforward in-memory reference implementation of the
  * running-max gap/segment semantics (the SURVEY §5 property-test
  * plan). Seeded → deterministic.
  */
class IntervalPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Iv(k: String, s: Long, e: Long)

  private def refGaps(ivs: Seq[Iv], minGap: Long): Seq[(String, Long, Long)] =
    ivs.groupBy(_.k).toSeq.flatMap { case (k, group) =>
      val sorted = group.sortBy(iv => (iv.s, iv.e))
      val runmax = sorted.scanLeft(Long.MinValue)((m, iv) => math.max(m, iv.e)).drop(1)
      sorted.zip(runmax).zip(sorted.drop(1)).collect {
        case ((_, rm), next) if rm + minGap < next.s => (k, rm, next.s)
      }
    }

  private def refSegments(ivs: Seq[Iv], tol: Long): Seq[(String, Long, Long, Long)] =
    ivs.groupBy(_.k).toSeq.flatMap { case (k, group) =>
      val sorted = group.sortBy(iv => (iv.s, iv.e))
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      var (ss, se, n) = (sorted.head.s, sorted.head.e, 1L)
      sorted.drop(1).foreach { iv =>
        if (se + tol < iv.s) { out += ((k, ss, se, n)); ss = iv.s; se = iv.e; n = 1 }
        else { se = math.max(se, iv.e); n += 1 }
      }
      out += ((k, ss, se, n))
      out.toSeq
    }

  private def randomSet(seed: Int): Seq[Iv] = {
    val rnd = new Random(seed)
    (0 until (5 + rnd.nextInt(40))).map { _ =>
      val s = rnd.nextInt(1000).toLong
      Iv(s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(120).toLong)
    }
  }

  test("gaps match the reference implementation on random inputs") {
    for (seed <- 1 to 6; minGap <- Seq(0L, 7L)) {
      val ivs = randomSet(seed)
      val got = Intervals.gaps(ivs.map(iv => (iv.k, iv.s, iv.e)).toDF("k", "starttime", "endtime"), Seq("k"), minGap)
        .select("k", "gap_start", "gap_end")
        .as[(String, Long, Long)].collect().sorted.toSeq
      val exp = refGaps(ivs, minGap).sorted
      assert(got == exp, s"seed=$seed minGap=$minGap")
    }
  }

  test("segments match the reference implementation on random inputs") {
    for (seed <- 10 to 15) {
      val ivs = randomSet(seed)
      val got = Intervals.segments(ivs.map(iv => (iv.k, iv.s, iv.e)).toDF("k", "starttime", "endtime"), Seq("k"), 5L)
        .select("k", "seg_start", "seg_end", "n_members")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      val exp = refSegments(ivs, 5L).sorted
      assert(got == exp, s"seed=$seed")
    }
  }

  test("gaps and segments are consistent: per key, segments = gaps + 1") {
    for (seed <- 20 to 24) {
      val ivs = randomSet(seed)
      val df = ivs.map(iv => (iv.k, iv.s, iv.e)).toDF("k", "starttime", "endtime")
      val nGaps = Intervals.gaps(df, Seq("k"), 3L)
        .groupBy("k").count().as[(String, Long)].collect().toMap
      val nSegs = Intervals.segments(df, Seq("k"), 3L)
        .groupBy("k").count().as[(String, Long)].collect().toMap
      nSegs.foreach { case (k, segs) =>
        assert(segs == nGaps.getOrElse(k, 0L) + 1, s"seed=$seed key=$k")
      }
    }
  }

  test("uptime identity: duration = uptime + gap total; frac in [0,1]") {
    for (seed <- 30 to 33) {
      val ivs = randomSet(seed)
      val rows = Intervals.uptime(ivs.map(iv => (iv.k, iv.s, iv.e)).toDF("k", "starttime", "endtime"), Seq("k"), 0L)
        .select("duration_ns", "uptime_ns", "gap_total_ns", "availability_frac")
        .as[(Long, Long, Long, Double)].collect()
      rows.foreach { case (d, u, g, f) =>
        assert(d == u + g)
        assert(f >= 0.0 && f <= 1.0)
      }
    }
  }

  test("streaming gaps match the batch operator on random multi-batch replays") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1_000_000_000_000_000_000L
    val ns = 1_000_000_000L
    for (seed <- Seq(11, 23, 57)) {
      val rnd = new Random(seed)
      val ivs = (0 until (20 + rnd.nextInt(30))).map { _ =>
        val s = rnd.nextInt(1000).toLong
        (s"k${rnd.nextInt(3)}", t0 + s * ns,
          t0 + (s + 1 + rnd.nextInt(120)) * ns)
      }
      // event-time-ordered chunks (so no chunk is late vs the previous
      // chunk's watermark), but SHUFFLED inside each chunk — the
      // within-watermark reorder the buffer must absorb
      val chunks = ivs.sortBy(iv => (iv._2, iv._3))
        .grouped(math.max(1, ivs.size / 3)).toSeq
        .map(c => new Random(seed).shuffle(c))
      val in = MemoryStream[(String, Long, Long)]
      val gaps = graft.streaming.StreamingIntervals.gapStream(
        in.toDF().toDF("k", "starttime", "endtime"),
        "k", "starttime", "endtime", minGap = 7 * ns,
        watermark = "10 seconds")
      val sink = s"sgaps_prop_$seed"
      val q = gaps.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-sgp").toString)
        .outputMode("append").start()
      try {
        chunks.foreach { c => in.addData(c: _*); q.processAllAvailable() }
        // two pushers: the first advances the watermark over all real
        // rows, the second lets the armed timeouts fire
        val far = t0 + 1_000_000L * ns
        in.addData(("zz", far, far + ns)); q.processAllAvailable()
        in.addData(("zz", far + 100 * ns, far + 101 * ns))
        q.processAllAvailable()
        val got = spark.table(sink).as[(String, Long, Long, Long)]
          .collect().toSet.filterNot(_._1 == "zz")
        val want = Intervals.gaps(
          ivs.toDF("k", "starttime", "endtime"), Seq("k"), 7 * ns)
          .as[(String, Long, Long, Long)].collect().toSet
        assert(got == want, s"seed=$seed: stream $got vs batch $want")
      } finally { q.stop(); spark.catalog.dropTempView(sink); () }
    }
  }

  test("coalesce is idempotent and covers every input interval") {
    for (seed <- 40 to 43) {
      val ivs = randomSet(seed)
      val df = ivs.map(iv => (iv.k, iv.s, iv.e)).toDF("k", "starttime", "endtime")
      val once = Intervals.coalesceIntervals(df, Seq("k"))
      val twice = Intervals.coalesceIntervals(once, Seq("k"))
      val a = once.as[(String, Long, Long)].collect().sorted.toSeq
      val b = twice.as[(String, Long, Long)].collect().sorted.toSeq
      assert(a == b, s"seed=$seed")
      // every input interval is inside some merged span of its key
      val spans = a.groupBy(_._1)
      ivs.foreach { iv =>
        assert(spans(iv.k).exists(sp => sp._2 <= iv.s && iv.e <= sp._3), s"$iv")
      }
    }
  }
}
