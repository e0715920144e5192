package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.QuakeMl

/** Source-format queries — SURVEY.md §2.1: the QuakeML scan path
  * (obsplus `eventbank.py:392-418`) oracle-checked end-to-end by
  * generating a document per row, parsing it back with the StAX
  * parser, and emitting the extracted fields. If serialization,
  * ns-time ISO formatting, or extraction drift, the DuckDB hash
  * mismatches.
  */
object SourceQueries {

  val all: Seq[Q] = Seq(

    Q("q43_xml_roundtrip", (s, dir) => {
      import s.implicits._
      Tables.eventsUs(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[(Long, Long, Long, String, Double)]
        .map { case (id, ts, uid, typ, v) =>
          val ev = QuakeMl.EventRow(
            event_id = s"smi:local/$id",
            time = Some(ts),
            latitude = Some(uid / 10.0 - 50.0),
            longitude = Some(v * 3.0 - 150.0),
            depth = Some(v * 100.0),
            magnitude = Some(v / 10.0),
            magnitude_type = Some(typ),
            updated = None, author = None, agency_id = None, path = None)
          val xml = QuakeMl.toQuakeMl(ev)
          val back = QuakeMl.parseCatalog(xml.getBytes("UTF-8")).events.head
          (back.event_id, back.time.get, back.latitude.get, back.longitude.get,
            back.depth.get, back.magnitude.get, back.magnitude_type.get)
        }
        .toDF("event_id", "time", "latitude", "longitude", "depth",
          "magnitude", "magnitude_type")
    }, Some("""
      SELECT 'smi:local/' || event_id AS event_id, epoch_ns(ts) AS time,
             user_id / 10.0 - 50.0 AS latitude,
             value * 3.0 - 150.0 AS longitude,
             value * 100.0 AS depth,
             value / 10.0 AS magnitude,
             event_type AS magnitude_type
      FROM events""")),

    // ---- real miniSEED round trip, oracle-checked: deterministic
    //      segments derived from `events` are ENCODED as Steim-2
    //      128-byte records (every segment over 91 samples fragments
    //      into several records), committed through the staged V2
    //      sink, decoded back by the V2 scan, and reduced to
    //      fragmentation-invariant per-station facts. The oracle
    //      computes the same facts from the derivation alone — any
    //      drift in BTIME conversion, rate fields, Steim packing or
    //      reassembly breaks the hash.
    Q("q81_mseed_roundtrip", (s, dir) => {
      val T0 = 1_600_000_000_000_000_000L // on the 100 µs BTIME grid
      val segs = Tables.events(s, dir)
        .select((col("user_id") % 8).cast("string").as("sid"),
          (col("event_id") % 40).as("slot"), col("event_id"))
        .groupBy("sid", "slot").agg((min("event_id") % 100).as("v0"))
        .select(lit("XX").as("network"),
          concat(lit("S"), col("sid")).as("station"),
          lit("").as("location"), lit("BHZ").as("channel"),
          (lit(T0) + col("slot") * lit(10_000_000_000L)).as("starttime"),
          lit(10_000_000L).as("sampling_period"), // 100 Hz
          transform(sequence(lit(0L), col("v0") + lit(49L)),
            i => ((col("v0") + i) % 50).cast("double")).as("samples"))
      val out = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_q81_mseed").getAbsolutePath
      segs.write.format("mseed").mode("overwrite")
        .option("recordLen", "128").save(out)
      s.read.format("mseed").load(out)
        .groupBy("station")
        .agg(sum(col("n_samples").cast("long")).as("total_samples"),
          sum(aggregate(col("samples"), lit(0.0), (a, x) => a + x))
            .cast("long").as("checksum"),
          min(col("starttime")).as("t0"),
          max(col("starttime") +
            col("n_samples").cast("long") * col("sampling_period")).as("t_end"))
    }, Some("""
      WITH base AS (
        SELECT user_id % 8 AS sid, event_id % 40 AS slot,
               MIN(event_id) % 100 AS v0
        FROM events GROUP BY 1, 2),
      seg AS (SELECT sid, slot, v0, v0 + 50 AS len FROM base)
      SELECT 'S' || CAST(sid AS VARCHAR) AS station,
             CAST(SUM(len) AS BIGINT) AS total_samples,
             CAST(SUM(list_sum(list_transform(range(len), i -> (v0 + i) % 50))) AS BIGINT) AS checksum,
             MIN(1600000000000000000 + slot * 10000000000) AS t0,
             MAX(1600000000000000000 + slot * 10000000000 + len * 10000000) AS t_end
      FROM seg GROUP BY 1"""), headline = true),

    // ---- legacy archive encodings, oracle-checked (was spec-only):
    //      deterministic record specs derived from `events` are built
    //      as raw SEED records — one family per legacy codec the
    //      reference's libmseed delegate decodes transparently
    //      (obsplus `utils/mseed.py:70-112`): GEOSCOPE multiplexed
    //      24-bit, GEOSCOPE 16-bit gain-ranged (3- and 4-bit
    //      exponent), SRO gain-ranged, DWWSSN 16-bit — then decoded
    //      by the DSv2 scan and reduced to per-family facts. The
    //      oracle recomputes every decoded sample arithmetically;
    //      ×2¹⁵ scaling makes each contribution an exact integer
    //      (max gain 2⁻¹⁵), so the checksum is order-independent
    //      long addition. Any drift in the Appendix-A bit rules
    //      (mantissa bias, gain placement, sign extension, byte
    //      order) breaks the hash.
    Q("q90_mseed_legacy", (s, dir) => {
      val T0 = 1_600_000_000_000_000_000L
      val specs = Tables.events(s, dir)
        .select((col("user_id") % 5).as("fam"),
          (col("event_id") % 24).as("slot"), col("event_id"))
        .groupBy("fam", "slot").agg((min("event_id") % 512).as("v0"))
        .collect() // bounded: ≤ 5 families × 24 slots = 120 record specs
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // per-run temp dir: a fixed shared path would race concurrent
      // executions (one deleting the other's records mid-write)
      val out = Scratch
        .tempDir("graft-q90-mseed").toFile
      specs.groupBy(_._1).foreach { case (fam, rs) =>
        val fos = new java.io.FileOutputStream(
          new java.io.File(out, s"fam$fam.mseed"))
        try rs.sortBy(_._2).foreach { case (_, slot, v0) =>
          fos.write(legacyRecord(fam, slot, v0, T0))
        } finally fos.close()
      }
      s.read.format("mseed").load(out.getAbsolutePath)
        .groupBy("station")
        .agg(sum(col("n_samples").cast("long")).as("total_samples"),
          sum(aggregate(col("samples"), lit(0L),
            (a, x) => a + (x * lit(32768)).cast("long"))).as("checksum"),
          min(col("starttime")).as("t0"),
          max(col("starttime") +
            col("n_samples").cast("long") * col("sampling_period")).as("t_end"))
    }, Some("""
      WITH base AS (
        SELECT user_id % 5 AS fam, event_id % 24 AS slot,
               MIN(event_id) % 512 AS v0
        FROM events GROUP BY 1, 2),
      spec AS (SELECT fam, slot, v0, 8 + v0 % 9 AS n FROM base),
      samp AS (SELECT fam, slot, v0, n, UNNEST(range(n)) AS i FROM spec),
      chk AS (SELECT fam, slot, n,
        CASE fam
          WHEN 0 THEN ((v0*9973 + i*7919) % 16777216 - 8388608) * 32768
          WHEN 1 THEN ((v0*7 + i*13) % 4096 - 2048)
            * CAST(power(2, 15 - (v0 + i) % 8) AS BIGINT)
          WHEN 2 THEN ((v0*7 + i*13) % 4096 - 2048)
            * CAST(power(2, 15 - (v0 + i) % 16) AS BIGINT)
          WHEN 3 THEN (CASE WHEN (v0*5 + i*11) % 4096 >= 2048
                            THEN (v0*5 + i*11) % 4096 - 4096
                            ELSE (v0*5 + i*11) % 4096 END)
            * CAST(power(2, 25 - (v0 + i) % 16) AS BIGINT)
          ELSE (CASE WHEN (v0*3 + i*17) % 65536 >= 32768
                     THEN (v0*3 + i*17) % 65536 - 65536
                     ELSE (v0*3 + i*17) % 65536 END) * 32768
        END AS c
        FROM samp)
      SELECT 'LG' || CAST(fam AS VARCHAR) AS station,
             CAST(COUNT(*) AS BIGINT) AS total_samples,
             CAST(SUM(c) AS BIGINT) AS checksum,
             MIN(1600000000000000000 + slot * 10000000000) AS t0,
             MAX(1600000000000000000 + slot * 10000000000 + n * 10000000)
               AS t_end
      FROM chk GROUP BY 1""")))

  /** One raw legacy-encoded SEED record: a 512-byte int32 skeleton from
    * the engine's own encoder (correct fixed header + blockette 1000,
    * data offset 64), its encoding byte patched to the legacy codec and
    * the payload overwritten with deterministic Appendix-A bit patterns
    * derived from (fam, v0, i) — the arithmetic the DuckDB oracle
    * mirrors. Families: 0 GEOSCOPE-24, 1/2 GEOSCOPE 16-bit gain-ranged
    * (3-/4-bit exponent), 3 SRO, 4 DWWSSN.
    */
  private def legacyRecord(fam: Long, slot: Long, v0: Long,
                           t0: Long): Array[Byte] = {
    import graft.sources.MiniSeed
    val n = (8 + v0 % 9).toInt
    val b = MiniSeed.encode("XX", s"LG$fam", "", "BHZ",
      t0 + slot * 10_000_000_000L, 10_000_000L,
      new Array[Double](n), "int32")
    val enc = fam match {
      case 0 => MiniSeed.EncGeoscope24
      case 1 => MiniSeed.EncGeoscope163
      case 2 => MiniSeed.EncGeoscope164
      case 3 => MiniSeed.EncSro
      case _ => MiniSeed.EncDwwssn
    }
    b(52) = enc.toByte
    val off = 64 // the int32 skeleton's data offset (single record)
    def putU16(o: Int, v: Int): Unit = {
      b(o) = ((v >> 8) & 0xFF).toByte; b(o + 1) = (v & 0xFF).toByte
    }
    var i = 0
    while (i < n) {
      fam match {
        case 0 => // 24-bit two's complement, big-endian triples
          val stored = (((v0 * 9973 + i * 7919) % 16777216) - 8388608)
            .toInt & 0xFFFFFF
          b(off + 3 * i) = ((stored >> 16) & 0xFF).toByte
          b(off + 3 * i + 1) = ((stored >> 8) & 0xFF).toByte
          b(off + 3 * i + 2) = (stored & 0xFF).toByte
        case 1 => // gain 0..7 | 12-bit biased mantissa
          val g = ((v0 + i) % 8).toInt
          val m = ((v0 * 7 + i * 13) % 4096).toInt
          putU16(off + 2 * i, (g << 12) | m)
        case 2 => // gain 0..15 | 12-bit biased mantissa
          val g = ((v0 + i) % 16).toInt
          val m = ((v0 * 7 + i * 13) % 4096).toInt
          putU16(off + 2 * i, (g << 12) | m)
        case 3 => // SRO: gain | 12-bit two's-complement mantissa
          val g = ((v0 + i) % 16).toInt
          val m = ((v0 * 5 + i * 11) % 4096).toInt
          putU16(off + 2 * i, (g << 12) | m)
        case _ => // DWWSSN: bare 16-bit two's complement
          putU16(off + 2 * i, ((v0 * 3 + i * 17) % 65536).toInt)
      }
      i += 1
    }
    b
  }
}
