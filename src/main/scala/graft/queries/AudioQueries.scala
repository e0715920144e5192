package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.Multimodal

/** Audio multimodal queries (round 9): REAL WAV files built per doc,
  * decoded through the JDK codec (`javax.sound.sampled` — the actual
  * container/PCM parse, not a stub), then features, energy-gradient
  * fingerprints, and near-dup pairs through the shared banded-Hamming
  * blocking. The synthesis formula is pure integer arithmetic, WAV PCM
  * is lossless, and every feature is integer — so DuckDB recomputes
  * everything bit-exactly from the formula while Spark goes through
  * the real encode→decode round trip. Any drift in the codec path,
  * the endianness handling, the fingerprint construction, or the
  * banded blocking breaks the hash.
  */
object AudioQueries {

  /** Deterministic 260-sample 16-bit PCM for q119–q121: sample i of
    * doc `id` is a quadratic modular formula of (base id, i) — the
    * q104 decorrelation trick in one dimension (a linear formula
    * makes consecutive block energies near-monotone, collapsing
    * fingerprint bits; squaring a prime-reduced value makes the
    * energy-difference signs behave iid, measured background Hamming
    * mean 32.0 at 500 docs). Ids with `id % 50 == 13` render their
    * BASE (id−13) signal with two locally-perturbed samples in
    * distant blocks (9 and 32) — planted near-dup pairs at Hamming
    * 0–2 (measured [2,1,1,1,1,2,1,0,1,0] over the ten sf0.01 pairs),
    * under the 4-band pigeonhole bound so banded recall is exact.
    * Amplitudes stay within ±9998, no 16-bit clamping to mirror.
    */
  private[graft] def renderSamples(id: Long): Array[Int] = {
    val nearDup = id % 50 == 13 && id >= 13
    val base = if (nearDup) id - 13 else id
    Array.tabulate(260) { i =>
      if (nearDup && i == 37) 9000
      else if (nearDup && i == 130) -9500
      else {
        // TWO distinct prime moduli (the q104 lesson, round 9 edition):
        // one modulus makes the whole CLIP periodic in the id with
        // period 46337 — at 10⁶ clips every fingerprint repeats ~21
        // times (13.3M spurious pairs, measured); the pair makes the
        // joint period 46337·46327 ≈ 2.1·10⁹, beyond any bench scale
        val v1 = (base * 1000003L + i * 7919L) % 46337L
        val v2 = (base * 999983L + i * 7907L) % 46327L
        (((v1 * v1 / 64 + v2 * v2 / 64) % 19997L) - 9998L).toInt
      }
    }
  }

  private[graft] def renderWav(id: Long): Array[Byte] =
    Multimodal.encodeWav16(renderSamples(id), 8000)

  /** Deterministic 1024-sample detection trace for q131: the dual-
    * modulus background formula (no near-dup aliasing — base = id)
    * with a PLANTED TRANSIENT on ids ≡ 4 (mod 25): samples 600–615
    * scaled ×4 (clamped ±20000), a 16-sample burst at ~16× energy —
    * an STA(16)/LTA(128) ratio of ~12–16, far above the 3.0 trigger
    * threshold, while the stationary background never crosses it
    * (measured at sf0.01: exactly the 20 planted docs trigger, zero
    * false positives, onsets at 604–610).
    */
  private[graft] def renderTraceSamples(id: Long): Array[Int] = {
    val burst = id % 25 == 4
    Array.tabulate(1024) { i =>
      val v1 = (id * 1000003L + i * 7919L) % 46337L
      val v2 = (id * 999983L + i * 7907L) % 46327L
      val v = (((v1 * v1 / 64 + v2 * v2 / 64) % 19997L) - 9998L).toInt
      if (burst && i >= 600 && i <= 615) {
        if (v >= 0) math.min(v * 4, 20000) else math.max(v * 4, -20000)
      } else v
    }
  }

  private[graft] def renderTraceWav(id: Long): Array[Byte] =
    Multimodal.encodeWav16(renderTraceSamples(id), 8000)

  /** DuckDB mirror of [[renderSamples]] (base resolution + the two
    * perturbations inlined); `i` ranges over range(260).
    */
  private val sampleSql = """
      CASE WHEN doc_id % 50 = 13 AND doc_id >= 13 AND i = 37 THEN 9000
           WHEN doc_id % 50 = 13 AND doc_id >= 13 AND i = 130 THEN -9500
           ELSE ((((base * 1000003 + i * 7919) % 46337)
                  * ((base * 1000003 + i * 7919) % 46337) // 64)
                 + (((base * 999983 + i * 7907) % 46327)
                    * ((base * 999983 + i * 7907) % 46327) // 64))
                % 19997 - 9998
      END"""

  private val baseSql = """
      SELECT doc_id, CASE WHEN doc_id % 50 = 13 AND doc_id >= 13
                          THEN doc_id - 13 ELSE doc_id END AS base
      FROM documents"""

  /** Shared oracle CTE: per-doc 64-bit energy-gradient fingerprint
    * (65 four-sample block energies; bit b set iff e(b+1) > e(b),
    * with the bit-63 two's-complement literal as in the q104 oracle).
    */
  private val fingerprintSql = s"""
      b AS ($baseSql),
      s AS (SELECT doc_id, i, $sampleSql AS v FROM b, range(260) t(i)),
      e AS (SELECT doc_id, i // 4 AS blk, SUM(v * v) AS en
            FROM s GROUP BY 1, 2),
      h AS (SELECT l.doc_id,
              bit_or(CASE WHEN r.en > l.en THEN
                CASE WHEN l.blk = 63 THEN (-9223372036854775807::BIGINT - 1)
                     ELSE (1::BIGINT << l.blk) END
                ELSE 0::BIGINT END) AS afp
            FROM e l JOIN e r
              ON r.doc_id = l.doc_id AND r.blk = l.blk + 1
            WHERE l.blk < 64
            GROUP BY 1)"""

  private def wavDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, renderWav(id))))
      .toDF("doc_id", "payload")
  }

  /** Shared oracle for q131 (batch) and q132 (stateless stream —
    * identical output by construction). */
  private val triggersOracleSql = """
      WITH s AS (
        SELECT doc_id, i,
          CAST(CASE WHEN doc_id % 25 = 4 AND i BETWEEN 600 AND 615
            THEN CASE WHEN (((((doc_id*1000003 + i*7919) % 46337)
                             * ((doc_id*1000003 + i*7919) % 46337) // 64)
                            + (((doc_id*999983 + i*7907) % 46327)
                               * ((doc_id*999983 + i*7907) % 46327) // 64))
                           % 19997 - 9998) >= 0
              THEN LEAST((((((doc_id*1000003 + i*7919) % 46337)
                            * ((doc_id*1000003 + i*7919) % 46337) // 64)
                           + (((doc_id*999983 + i*7907) % 46327)
                              * ((doc_id*999983 + i*7907) % 46327) // 64))
                          % 19997 - 9998) * 4, 20000)
              ELSE GREATEST((((((doc_id*1000003 + i*7919) % 46337)
                               * ((doc_id*1000003 + i*7919) % 46337) // 64)
                              + (((doc_id*999983 + i*7907) % 46327)
                                 * ((doc_id*999983 + i*7907) % 46327) // 64))
                             % 19997 - 9998) * 4, -20000) END
            ELSE ((((doc_id*1000003 + i*7919) % 46337)
                   * ((doc_id*1000003 + i*7919) % 46337) // 64)
                  + (((doc_id*999983 + i*7907) % 46327)
                     * ((doc_id*999983 + i*7907) % 46327) // 64))
                 % 19997 - 9998
          END AS BIGINT) AS v
        FROM documents, range(1024) t(i)),
      ps AS (SELECT doc_id, i,
               SUM(v*v) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS stasum,
               SUM(v*v) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN 127 PRECEDING AND CURRENT ROW) AS ltasum
             FROM s),
      r AS (SELECT doc_id, i,
              CASE WHEN ltasum = 0 THEN CAST(0 AS DOUBLE)
                   ELSE CAST(stasum * 128 AS DOUBLE)
                        / CAST(ltasum * 16 AS DOUBLE) END AS ratio
            FROM ps WHERE i >= 127),
      ev AS (SELECT doc_id, i, ratio,
               CASE WHEN ratio >= 3.0 THEN 1 ELSE 0 END AS e
             FROM r WHERE ratio >= 3.0 OR ratio <= 1.5),
      lg AS (SELECT *, lag(e) OVER (PARTITION BY doc_id ORDER BY i) AS pe
             FROM ev),
      onsets AS (SELECT doc_id, i AS onset FROM lg
                 WHERE e = 1 AND (pe = 0 OR pe IS NULL)),
      ends AS (SELECT o.doc_id, o.onset,
                 COALESCE(MIN(CASE WHEN b.e = 0 AND b.i > o.onset
                                   THEN b.i END), 1023) AS endi
               FROM onsets o LEFT JOIN ev b ON b.doc_id = o.doc_id
               GROUP BY 1, 2)
      SELECT e.doc_id, e.onset AS onset_idx, e.endi AS end_idx,
             MAX(r.ratio) AS peak_ratio
      FROM ends e JOIN r ON r.doc_id = e.doc_id
        AND r.i BETWEEN e.onset AND e.endi
      GROUP BY 1, 2, 3"""

  val all: Seq[Q] = Seq(

    // ---- audio decode + integer features: the WAV bytes round-trip
    //      through javax.sound (container parse, PCM16 LE frames) and
    //      the features — peak, zero crossings, total energy — are
    //      integer reductions of the decoded samples. The oracle never
    //      sees the WAV: it recomputes from the synthesis formula, so
    //      a single mis-decoded sample anywhere breaks the hash.
    Q("q119_audio_features", (s, dir) => {
      Multimodal.audioFeatures(s, wavDf(s, dir)).toDF()
        .select(col("doc_id"), col("n_samples"), col("sample_rate"),
          col("peak"), col("zero_crossings"), col("energy"))
    }, Some(s"""
      WITH b AS ($baseSql),
      s AS (SELECT doc_id, i, $sampleSql AS v FROM b, range(260) t(i)),
      w AS (SELECT doc_id, i, v,
              lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
            FROM s)
      SELECT doc_id, CAST(260 AS BIGINT) AS n_samples,
             CAST(8000 AS BIGINT) AS sample_rate,
             CAST(MAX(abs(v)) AS BIGINT) AS peak,
             CAST(SUM(CASE WHEN pv IS NOT NULL AND (v < 0) <> (pv < 0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
             CAST(SUM(v * v) AS BIGINT) AS energy
      FROM w GROUP BY 1""")),

    // ---- audio fingerprint near-dup (the dedup pillar over the audio
    //      column type): decode → 64-bit energy-gradient fingerprint →
    //      banded-Hamming pairs through the SimHash blocking — the
    //      third 64-bit signature family on the one join topology.
    //      maxHamming 3 < 4 bands ⇒ banded recall is pigeonhole-exact,
    //      so the plan's pair set must equal the oracle's brute force.
    Q("q120_audio_fp_neardup", (s, dir) => {
      Multimodal.audioNearDupPairs(s, wavDf(s, dir), maxHamming = 3)
        .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
    }, Some(s"""
      WITH $fingerprintSql
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.afp, b.afp)) <= 3""")),

    // ---- STREAMING audio near-dup: the q120 corpus replays through
    //      the file source with event times inside one 6 h window and
    //      `StreamingDedup.audioNearDupStream` (real decode +
    //      fingerprint on arrival, shared bandedSigPairStream) must
    //      emit EXACTLY the batch pair set, window-stamped — the q106
    //      contract for the audio signature. A flush clip 8 h ahead
    //      closes the window; its fingerprint shares no
    //      within-threshold pair.
    Q("q121_stream_audio_neardup", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val t0 = 1_600_000_000_000_000_000L
      val wavs = wavDf(s, dir)
        .withColumn("ts", lit(t0) + col("doc_id") * lit(1_000_000L))
      val flush = s.range(1).select(lit(999999999L).as("doc_id"),
        lit(renderWav(999999999L)).as("payload"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q121").toString
      wavs.unionByName(flush).repartition(8)
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = graft.streaming.StreamingDedup.audioNearDupStream(
        stream, "doc_id", "payload", "ts", maxHamming = 3)
      val sink = "q121_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH $fingerprintSql
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns,
             a.doc_id AS a, b.doc_id AS b,
             CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.afp, b.afp)) <= 3""")),

    // ---- STA/LTA trigger detection (Allen 1978) over real WAV
    //      payloads: decode → integer window energies → one-division
    //      ratios → the classic on/off trigger state machine, all
    //      fused in one scan-local pass. The oracle recomputes the
    //      ratios with window SUMs over the synthesis formula and
    //      replays the state machine relationally (an onset is an
    //      on-event whose previous on/off EVENT is an off or nothing;
    //      the end is the first off-event after it, else trace end) —
    //      ratios, crossings, trigger pairing, and peaks all bit-exact.
    //      At sf0.01 exactly the 20 planted-burst docs trigger with
    //      zero background false positives.
    Q("q131_sta_lta_triggers", (s, dir) => {
      import s.implicits._
      val traces = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(it => it.map(id => (id, renderTraceWav(id))))
        .toDF("doc_id", "payload")
      graft.operators.Triggers.detectTriggers(s, traces,
          ns = 16, nl = 128, onThr = 3.0, offThr = 1.5).toDF()
        .select(col("doc_id"), col("onset_idx"), col("end_idx"),
          col("peak_ratio"))
    }, Some(triggersOracleSql)),

    // ---- STREAMING detection: q131's traces replayed through the
    //      file source with `detectTriggers` applied directly to the
    //      STREAMING frame — the kernel is stateless per trace
    //      (mapPartitions, no watermark, no state store), so detection
    //      keeps up with ingestion at the batch scan rate and the
    //      emitted trigger set must equal the batch result exactly.
    Q("q132_stream_triggers", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val traces = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(it => it.map(id => (id, renderTraceWav(id))))
        .toDF("doc_id", "payload")
      val tmp = Scratch
        .tempDir("graft-q132").toString
      traces.repartition(8).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", "3").parquet(tmp)
      val changes = graft.operators.Triggers.detectTriggers(s, stream,
        ns = 16, nl = 128, onThr = 3.0, offThr = 1.5).toDF()
      val sink = "q132_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink)
        .select(col("doc_id"), col("onset_idx"), col("end_idx"),
          col("peak_ratio"))
        .localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(triggersOracleSql))
  )
}
