package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Classic STA/LTA event detection (Allen 1978; Withers et al., BSSA
  * 1998) — the canonical seismic trigger, re-expressed for the 100 TB
  * archive scan. obsplus itself delegates detection to obspy's
  * single-machine kernels (`obspy.signal.trigger.classic_sta_lta`);
  * this is the Spark-first equivalent: one SCAN-LOCAL integer kernel
  * per trace inside `mapPartitions` (decode → ratio → state machine
  * fused, nothing shuffles — detection output is ~triggers-sized, the
  * 10⁻⁶ of the input a cluster job wants to move).
  *
  * Arithmetic is oracle-grade deterministic: window energies are exact
  * integer sums (prefix-free ring accumulation), and each ratio is ONE
  * IEEE division of two longs — `(staSum·nl) / (ltaSum·ns)` — so a SQL
  * engine reproduces every ratio, threshold crossing, and peak bit for
  * bit (q131).
  */
object Triggers {

  case class TriggerRow(doc_id: Long, onset_idx: Long, end_idx: Long,
                        peak_ratio: Double)

  /** STA/LTA trigger scan over one trace. `ns`/`nl` are the short/long
    * window lengths in samples (trailing, inclusive); ratios exist for
    * i ≥ nl−1. The trigger state machine is the classic on/off pair:
    * an onset where the ratio crosses `onThr` while inactive, the end
    * at the first ratio ≤ `offThr` after it (or the trace end for a
    * still-active trigger), `peak_ratio` the max over [onset, end].
    */
  def triggerScan(samples: Array[Int], ns: Int, nl: Int,
                  onThr: Double, offThr: Double): Seq[(Int, Int, Double)] = {
    require(ns >= 1 && nl > ns, s"need 1 <= ns < nl, got ns=$ns nl=$nl")
    // Overflow invariant: the one-division ratio (staSum·nl)/(ltaSum·ns)
    // stays in Long only because decoded samples are ≤16-bit (decodeAudio
    // emits 8/16-bit PCM): ltaSum ≤ nl·32767² < nl·2³⁰, so ltaSum·ns
    // (the larger product) needs ns·nl < 2³³. Pin it here so a future
    // 24-bit decode path fails loudly instead of wrapping silently.
    require(ns.toLong * nl < (1L << 33),
      s"ns*nl=$ns*$nl exceeds the 16-bit-sample overflow bound 2^33")
    val n = samples.length
    if (n < nl) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    var staSum = 0L; var ltaSum = 0L
    var active = false; var onset = -1; var peak = 0.0
    var i = 0
    while (i < n) {
      val v = samples(i).toLong
      val sq = v * v
      staSum += sq; ltaSum += sq
      if (i >= ns) {
        val o = samples(i - ns).toLong; staSum -= o * o
      }
      if (i >= nl) {
        val o = samples(i - nl).toLong; ltaSum -= o * o
      }
      if (i >= nl - 1) {
        val ratio =
          if (ltaSum == 0L) 0.0
          else (staSum * nl).toDouble / (ltaSum * ns).toDouble
        if (!active) {
          if (ratio >= onThr) { active = true; onset = i; peak = ratio }
        } else {
          if (ratio > peak) peak = ratio
          if (ratio <= offThr) {
            out += ((onset, i, peak)); active = false
          }
        }
      }
      i += 1
    }
    if (active) out += ((onset, n - 1, peak))
    out.toSeq
  }

  /** Detection over a frame of WAV payloads (doc_id, payload): decode
    * through [[graft.multimodal.Multimodal.decodeAudio]] and trigger-
    * scan in the same partition-local pass — undecodable payloads are
    * dropped (the audio family's policy), triggerless traces emit
    * nothing. Output is triggers-sized: the only thing that ever
    * leaves the scan.
    */
  def detectTriggers(spark: SparkSession, df: DataFrame,
                     ns: Int = 16, nl: Int = 128,
                     onThr: Double = 3.0,
                     offThr: Double = 1.5): Dataset[TriggerRow] = {
    import spark.implicits._
    df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          graft.multimodal.Multimodal.decodeAudio(p).iterator.flatMap {
            case (_, s) =>
              triggerScan(s, ns, nl, onThr, offThr).map { case (a, b, pk) =>
                TriggerRow(id, a.toLong, b.toLong, pk)
              }
          }
        }
      }
  }
}
