package graft

import graft.sources.MiniSeed
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level miniSEED codec: encode→parse→decode round trips across
  * encodings, record segmentation, BTIME conversion, rate fields, and
  * the fail-fast contracts. Spark-free — the DSv2 surface is covered
  * by MiniSeedSourceSpec.
  */
class MiniSeedSpec extends AnyFunSuite {

  private val t0 = 1_600_000_000_000_000_000L // 2020-09-13, on the 100 µs grid

  private def roundTrip(samples: Array[Double], encoding: String,
                        reclen: Int = 512,
                        periodNs: Long = 10_000_000L): Seq[(MiniSeed.RecordHeader, Array[Double])] = {
    val bytes = MiniSeed.encode("GR", "STA01", "00", "BHZ", t0, periodNs,
      samples, encoding, reclen)
    assert(bytes.length % reclen == 0, s"${bytes.length} not a multiple of $reclen")
    var off = 0
    val out = Seq.newBuilder[(MiniSeed.RecordHeader, Array[Double])]
    while (off < bytes.length) {
      val h = MiniSeed.parseRecordHeader(bytes, off)
        .getOrElse(fail(s"unparseable record at $off"))
      assert(h.recordLen == reclen)
      out += ((h, MiniSeed.decodeSamples(bytes, off, h)))
      off += h.recordLen
    }
    out.result()
  }

  private def reassemble(recs: Seq[(MiniSeed.RecordHeader, Array[Double])]): Array[Double] =
    recs.flatMap(_._2).toArray

  test("steim2 round trip: random-walk integers, multi-record, times chain") {
    val rnd = new scala.util.Random(7)
    var x = 0
    val samples = Array.fill(5000) { x += rnd.nextInt(2001) - 1000; x.toDouble }
    val recs = roundTrip(samples, "steim2")
    assert(recs.size > 1, "5000 samples must span multiple 512-byte records")
    assert(reassemble(recs).toSeq == samples.toSeq)
    // each record's BTIME advances by its predecessor's sample count
    var expected = t0
    recs.foreach { case (h, xs) =>
      assert(h.starttime == expected, s"record start $expected")
      assert(h.n == xs.length)
      assert(h.network == "GR" && h.station == "STA01" &&
        h.location == "00" && h.channel == "BHZ")
      assert(h.samplingPeriod == 10_000_000L)
      expected += h.n.toLong * h.samplingPeriod
    }
  }

  test("steim1 round trip incl. 32-bit jumps steim2 cannot hold") {
    val samples = Array[Double](0, 1 << 30, -(1 << 30), 5, 5, 6, 1 << 29, 0)
    val recs = roundTrip(samples, "steim1")
    assert(reassemble(recs).toSeq == samples.toSeq)
  }

  test("steim2 packs all seven chunk shapes and stays exact") {
    // runs tailored to hit 7x4, 6x5, 5x6, 4x8, 3x10, 2x15, 1x30 packs
    val parts = Seq(
      Array.fill(21)(3.0),                       // tiny diffs -> 7x4
      Array.tabulate(12)(i => i * 14.0),         // 5-bit diffs -> 6x5
      Array.tabulate(10)(i => i * 28.0),         // 6-bit
      Array.tabulate(8)(i => i * 120.0),         // 8-bit
      Array.tabulate(6)(i => i * 500.0),         // 10-bit
      Array.tabulate(4)(i => i * 16000.0),       // 15-bit
      Array[Double](0, 400_000_000, 0))          // 30-bit singles
    var acc = 0.0
    val samples = parts.flatten.map { v => acc = v; v }.toArray
    val recs = roundTrip(samples, "steim2")
    assert(reassemble(recs).toSeq == samples.toSeq)
  }

  test("int32 and float64 round trips; float64 keeps arbitrary doubles bit-exact") {
    val ints = Array.tabulate(300)(i => (i * 7919 % 100001 - 50000).toDouble)
    assert(reassemble(roundTrip(ints, "int32")).toSeq == ints.toSeq)
    val dbls = Array(math.Pi, -0.0, 1e-300, 6.02e23, Double.MinPositiveValue, 42.5)
    assert(reassemble(roundTrip(dbls, "float64")).toSeq == dbls.toSeq)
  }

  test("auto picks steim2 / steim1 / float64 by sample shape") {
    def encOf(samples: Array[Double]): Int = {
      val b = MiniSeed.encode("GR", "S", "", "BHZ", t0, 10_000_000L, samples, "auto")
      MiniSeed.parseRecordHeader(b, 0).get.encoding
    }
    assert(encOf(Array(1.0, 2.0, 3.0)) == MiniSeed.EncSteim2)
    assert(encOf(Array(0.0, (1L << 30).toDouble)) == MiniSeed.EncSteim1)
    assert(encOf(Array(1.5, 2.0)) == MiniSeed.EncFloat64)
    // all of them still round trip
    Seq(Array(1.0, 2.0, 3.0), Array(0.0, (1L << 30).toDouble), Array(1.5, 2.0))
      .foreach(s => assert(reassemble(roundTrip(s, "auto")).toSeq == s.toSeq))
  }

  test("4096-byte records and a year-boundary BTIME round trip") {
    val newYear = java.time.LocalDate.of(2023, 12, 31).toEpochDay * 86400L
    val t = (newYear + 23 * 3600 + 59 * 60 + 59) * 1_000_000_000L + 999_900_000L
    val samples = Array.tabulate(3000)(i => math.sin(i / 10.0) * 1000)
      .map(math.rint)
    val bytes = MiniSeed.encode("XX", "BOUND", "10", "HHZ", t, 100_000L,
      samples, "steim2", recordLen = 4096)
    val h = MiniSeed.parseRecordHeader(bytes, 0).get
    assert(h.recordLen == 4096 && h.starttime == t)
    assert(h.samplingPeriod == 100_000L) // 10 kHz
    var off = 0; val all = Seq.newBuilder[Double]
    while (off < bytes.length) {
      val hh = MiniSeed.parseRecordHeader(bytes, off).get
      all ++= MiniSeed.decodeSamples(bytes, off, hh)
      off += hh.recordLen
    }
    assert(all.result() == samples.toSeq)
  }

  test("slow channels: integer seconds-per-sample rates round trip") {
    val samples = Array.tabulate(10)(_.toDouble)
    val b = MiniSeed.encode("GR", "SLOW", "", "LHZ", t0,
      10L * 1_000_000_000L, samples, "int32") // 0.1 Hz
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(h.samplingPeriod == 10_000_000_000L)
  }

  test("fast rates beyond i16 split into factor x multiplier") {
    val b = MiniSeed.encode("GR", "FAST", "", "EHZ", t0, 20_000L,
      Array(1.0, 2.0), "int32") // 50 kHz > Short.MaxValue
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(h.samplingPeriod == 20_000L)
  }

  test("fail fast: off-grid starttime, bad period, long codes, non-integral steim") {
    val s = Array(1.0, 2.0)
    intercept[IllegalArgumentException](
      MiniSeed.encode("GR", "S", "", "BHZ", t0 + 1, 10_000_000L, s))
    intercept[IllegalArgumentException](
      MiniSeed.encode("GR", "S", "", "BHZ", t0, 3_333_333L, s)) // ~300.00003 Hz
    intercept[IllegalArgumentException](
      MiniSeed.encode("GR", "STATION9", "", "BHZ", t0, 10_000_000L, s))
    intercept[IllegalArgumentException](
      MiniSeed.encode("TOOLONG", "S", "", "BHZ", t0, 10_000_000L, s))
    intercept[IllegalArgumentException](
      MiniSeed.encode("GR", "S", "", "BHZ", t0, 10_000_000L, Array(1.5), "steim2"))
    intercept[IllegalArgumentException](
      MiniSeed.encode("GR", "S", "", "BHZ", t0, 10_000_000L,
        Array(0.0, (1L << 30).toDouble), "steim2")) // 30-bit ceiling
  }

  test("corrupt bytes parse as None; truncated steim payload throws") {
    val good = MiniSeed.encode("GR", "S", "", "BHZ", t0, 10_000_000L,
      Array.tabulate(100)(_.toDouble), "steim2")
    assert(MiniSeed.parseRecordHeader(new Array[Byte](48), 0).isEmpty)
    val badSeq = good.clone(); badSeq(0) = 'x'.toByte
    assert(MiniSeed.parseRecordHeader(badSeq, 0).isEmpty)
    val badYear = good.clone()
    badYear(20) = 0x7F.toByte; badYear(21) = 0xFF.toByte // year 32767 both ways
    assert(MiniSeed.parseRecordHeader(badYear, 0).isEmpty)
    // flip a payload byte: the reverse-integration check must catch it
    val torn = good.clone(); torn(100) = (torn(100) ^ 0x55).toByte
    val h = MiniSeed.parseRecordHeader(torn, 0).get
    intercept[java.io.IOException](MiniSeed.decodeSamples(torn, 0, h))
  }

  test("parse limit bounds the blockette walk: stale tail never read") {
    val good = MiniSeed.encode("GR", "S", "", "BHZ", t0, 10_000_000L,
      Array.tabulate(10)(_.toDouble), "int32")
    // a reused probe buffer: previous record's bytes past probeLen
    val reused = new Array[Byte](MiniSeed.ProbeLen)
    System.arraycopy(good, 0, reused, 0, MiniSeed.ProbeLen)
    // new "read" delivers only 52 bytes (fixed header + 4): the
    // blockette-1000 at 48 is NOT fully inside the read
    val shortRead = 52
    // corrupt the new record's first-blockette offset to point past the
    // short read, where the STALE blockette 1000 still sits
    assert(MiniSeed.parseRecordHeader(reused, 0, shortRead).isEmpty,
      "short read must take the skip path, not parse stale bytes")
    // with the full record present the same bytes parse fine
    assert(MiniSeed.parseRecordHeader(reused, 0, MiniSeed.ProbeLen).isDefined)
  }

  test("empty segment emits one zero-sample record that parses") {
    val b = MiniSeed.encode("GR", "S", "", "BHZ", t0, 10_000_000L, Array.empty)
    assert(b.length == 512)
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(h.n == 0 && MiniSeed.decodeSamples(b, 0, h).isEmpty)
  }

  test("differential fuzz: random series round trip every encoding") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(2000)
      var x = rnd.nextInt(1 << 20)
      val walk = Array.fill(n) {
        x += rnd.nextInt(1 << (1 + rnd.nextInt(16))) - (1 << rnd.nextInt(16))
        x.toDouble
      }
      for (enc <- Seq("steim1", "steim2", "int32", "auto")) {
        val got = reassemble(roundTrip(walk, enc,
          reclen = if (seed % 2 == 0) 512 else 4096))
        assert(got.toSeq == walk.toSeq, s"seed=$seed enc=$enc")
      }
    }
  }
}
