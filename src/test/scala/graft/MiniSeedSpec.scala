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

  // -------------------------------------------------- legacy breadth

  /** A 512-byte int32 record to mutate into legacy shapes: patch the
    * blockette-1000 encoding byte (offset 52) and overwrite the
    * payload at the data offset.
    */
  private def legacyBase(n: Int): Array[Byte] = {
    val b = MiniSeed.encode("GR", "LEGCY", "", "BHZ", t0, 10_000_000L,
      Array.tabulate(n)(_.toDouble), "int32")
    assert(b.length == 512)
    b
  }
  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 8) & 0xFF).toByte; b(off + 1) = (v & 0xFF).toByte
  }

  test("GEOSCOPE 16-bit gain-ranged decode (3- and 4-bit exponent)") {
    // SEED Appendix A: word = G (bits 12..) | 12-bit biased mantissa M;
    // sample = (M - 2048) / 2^G
    val b = legacyBase(3)
    b(52) = MiniSeed.EncGeoscope163.toByte
    putU16(b, 64, (2 << 12) | 3000) // (3000-2048)/4  = 238.0
    putU16(b, 66, 2048)             // (2048-2048)/1  = 0.0
    putU16(b, 68, (7 << 12) | 0)    // (0-2048)/128   = -16.0
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(h.encoding == MiniSeed.EncGeoscope163)
    assert(MiniSeed.decodeSamples(b, 0, h).toSeq == Seq(238.0, 0.0, -16.0))

    val b4 = legacyBase(2)
    b4(52) = MiniSeed.EncGeoscope164.toByte
    putU16(b4, 64, (12 << 12) | 100) // (100-2048)/4096 = -0.4755859375
    putU16(b4, 66, (15 << 12) | 4095) // (4095-2048)/32768
    val h4 = MiniSeed.parseRecordHeader(b4, 0).get
    assert(MiniSeed.decodeSamples(b4, 0, h4).toSeq ==
      Seq(-0.4755859375, 2047.0 / 32768))
  }

  test("GEOSCOPE 24-bit decode, both payload byte orders") {
    val b = legacyBase(3)
    b(52) = MiniSeed.EncGeoscope24.toByte
    // big-endian payload: FF FF FF = -1; 00 01 00 = 256; 80 00 00 = -2^23
    val bytes = Array(0xFF, 0xFF, 0xFF, 0x00, 0x01, 0x00, 0x80, 0x00, 0x00)
    for (i <- bytes.indices) b(64 + i) = bytes(i).toByte
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(MiniSeed.decodeSamples(b, 0, h).toSeq ==
      Seq(-1.0, 256.0, -8388608.0))
    // little-endian payload (blockette-1000 word-order byte = 0):
    // per-sample byte triples reversed
    val le = legacyBase(3)
    le(52) = MiniSeed.EncGeoscope24.toByte
    le(53) = 0
    val leBytes = Array(0xFF, 0xFF, 0xFF, 0x00, 0x01, 0x00, 0x00, 0x00, 0x80)
    for (i <- leBytes.indices) le(64 + i) = leBytes(i).toByte
    val lh = MiniSeed.parseRecordHeader(le, 0).get
    assert(!lh.payloadBigEndian)
    assert(MiniSeed.decodeSamples(le, 0, lh).toSeq ==
      Seq(-1.0, 256.0, -8388608.0))
  }

  test("SRO gain-ranged decode: sample = mantissa * 2^(10 - gain)") {
    val b = legacyBase(3)
    b(52) = MiniSeed.EncSro.toByte
    putU16(b, 64, (10 << 12) | 4091) // mantissa -5, 2^0   -> -5.0
    putU16(b, 66, (8 << 12) | 100)   // 100 * 2^2          -> 400.0
    putU16(b, 68, (12 << 12) | 5)    // 5 * 2^-2           -> 1.25
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(MiniSeed.decodeSamples(b, 0, h).toSeq == Seq(-5.0, 400.0, 1.25))
  }

  test("DWWSSN 16-bit two's-complement decode") {
    val b = legacyBase(3)
    b(52) = MiniSeed.EncDwwssn.toByte
    putU16(b, 64, 0xFFFE) // -2
    putU16(b, 66, 5)
    putU16(b, 68, 0x8000) // -32768
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(MiniSeed.decodeSamples(b, 0, h).toSeq == Seq(-2.0, 5.0, -32768.0))
  }

  test("blockette 100 actual sample rate overrides the header pair") {
    // header says 100 Hz; a blockette 100 AFTER the 1000 carries the
    // true 40 Hz float rate (walk must not stop at the 1000)
    val b = legacyBase(10)
    putU16(b, 50, 56)   // blockette 1000's next -> 56
    putU16(b, 56, 100)  // blockette 100
    putU16(b, 58, 0)    //   chain ends
    val fbits = java.lang.Float.floatToIntBits(40.0f)
    b(60) = (fbits >> 24).toByte; b(61) = ((fbits >> 16) & 0xFF).toByte
    b(62) = ((fbits >> 8) & 0xFF).toByte; b(63) = (fbits & 0xFF).toByte
    putU16(b, 44, 128)  // move data past the longer blockette region
    System.arraycopy(legacyBase(10), 64, b, 128, 40)
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(h.samplingPeriod == 25_000_000L, "40 Hz -> 25 ms/sample")
    assert(MiniSeed.decodeSamples(b, 0, h).toSeq ==
      Array.tabulate(10)(_.toDouble).toSeq)
    // a non-finite/zero rate is ignored: header pair stands
    val bad = legacyBase(10)
    putU16(bad, 50, 56); putU16(bad, 56, 100); putU16(bad, 58, 0)
    // rate bytes left zero -> r == 0 -> ignored
    putU16(bad, 44, 128)
    System.arraycopy(legacyBase(10), 64, bad, 128, 40)
    assert(MiniSeed.parseRecordHeader(bad, 0).get.samplingPeriod == 10_000_000L)
  }

  test("blockette chain into the record's tail terminates cleanly") {
    // b1000 found, then a (corrupt) next pointer into the record's
    // final 7 bytes: nothing this walk cares about can start there, so
    // the header parses rather than requesting a read past the record
    val b = legacyBase(10)
    putU16(b, 50, 508) // next -> 4 bytes before the 512-byte record end
    val h = MiniSeed.parseRecordHeader(b, 0)
    assert(h.isDefined && h.get.samplingPeriod == 10_000_000L)
    assert(MiniSeed.parseRecordHeaderEx(b, 0, 512) == MiniSeed.Ok(h.get))
  }

  test("blockette chain past the probe: NeedMore, then full parse") {
    // opaque blockette (2000) at 48 pointing to a blockette 1000 at
    // 400 — past the 256-byte probe
    val base = legacyBase(10)
    val b = new Array[Byte](512)
    System.arraycopy(base, 0, b, 0, 48) // fixed header only
    putU16(b, 46, 48)     // first blockette
    putU16(b, 48, 2000)   // opaque blockette type
    putU16(b, 50, 400)    //   next -> 400
    putU16(b, 400, 1000)  // blockette 1000
    putU16(b, 402, 0)
    b(404) = MiniSeed.EncInt32.toByte
    b(405) = 1            // big-endian payload
    b(406) = 9            // 2^9 = 512
    putU16(b, 44, 408)    // data offset past the chain
    System.arraycopy(base, 64, b, 408, 40)
    MiniSeed.parseRecordHeaderEx(b, 0, 256) match {
      case MiniSeed.NeedMore(min) => assert(min == 408)
      case r => fail(s"expected NeedMore from a 256-byte probe, got $r")
    }
    val h = MiniSeed.parseRecordHeader(b, 0).get
    assert(h.recordLen == 512 && h.dataOffset == 408 &&
      h.encoding == MiniSeed.EncInt32)
    assert(MiniSeed.decodeSamples(b, 0, h).toSeq ==
      Array.tabulate(10)(_.toDouble).toSeq)
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
