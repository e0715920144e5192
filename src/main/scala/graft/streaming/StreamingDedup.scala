package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Streaming corpus dedup — the continuous-ingestion complement of the
  * batch [[graft.operators.Dedup]] family: documents arriving on a
  * stream are dropped if a document with the same canonical
  * fingerprint was already seen within the watermark horizon.
  *
  * State is keyed by the 32-hex fingerprint only (not the text), so
  * per-key state is O(1) bytes and the watermark bounds total state —
  * the two properties that keep exactly-this-job running for months on
  * a 1000-executor cluster. Exact-dup only: near-dup (MinHash) needs
  * cross-key candidate generation, which is a batch join shape, not
  * per-key streaming state — run it as a periodic batch sweep over the
  * deduped sink instead.
  */
object StreamingDedup {

  /** Append-mode dedup stream: first arrival of each fingerprint within
    * the watermark passes through, later copies drop. `tsCol` is an
    * epoch-ns long event-time column.
    */
  def dedupStream(stream: DataFrame, textCol: String, tsCol: String,
                  watermark: String): DataFrame =
    stream
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("_ts", timestamp_micros(expr(s"$tsCol div 1000")))
      .withWatermark("_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("_ts", "fp") // output schema = input schema

  /** Streaming exact-substring duplicate DETECTION — the continuous
    * complement of [[graft.operators.Dedup.duplicateSpans]] (Lee et
    * al. 2022), same span-key convention: width-token windows every
    * `stride` tokens, 60-bit md5 span hash, count DISTINCT documents
    * per span. A span crossing `minDocs` within a time window is
    * verbatim text repeating across the incoming corpus — boilerplate
    * detection that keeps up with ingestion instead of waiting for the
    * nightly batch sweep.
    *
    * Built from two DECLARATIVE stateful stages (a documented-
    * supported chain, no custom state function):
    *
    *   1. `dropDuplicatesWithinWatermark(span_h, doc)` — the
    *      accepted-(span, doc) state; per-key state is O(1) bytes and
    *      the watermark expires it, so a mega-duplicated span costs
    *      one state row per DOCUMENT, never an unbounded per-key set;
    *   2. a watermarked tumbling-window count per span — append mode
    *      emits each window's final (span, n_docs) once the watermark
    *      passes, and window state is likewise bounded.
    *
    * Output (append changelog): window_ns, span_h, n_docs for spans
    * with `n_docs >= minDocs` — q82 replays the oracle corpus through
    * a file source and hash-matches the batch q79 detection set.
    *
    * Semantics note: counts are per (window × span), so "duplicated"
    * means "repeated within `windowDur`" — the horizon-bounded meaning
    * any infinite-stream dedup must adopt (the batch operator's global
    * count is the windowDur → ∞ limit).
    */
  def duplicateSpanStream(stream: DataFrame, textCol: String, idCol: String,
                          tsCol: String, width: Int, stride: Int,
                          minDocs: Long, watermark: String,
                          windowDur: String): DataFrame =
    stream
      .withColumn("toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("toks")) >= width)
      .select(col(idCol).as("doc_id"), col("toks"), col(tsCol).as("_tsns"),
        explode(sequence(lit(1), size(col("toks")) - lit(width) + 1,
          lit(stride))).as("start"))
      .select(col("doc_id"),
        conv(substring(md5(
          concat_ws(" ", slice(col("toks"), col("start"), lit(width)))), 1, 15),
          16, 10).cast("long").as("span_h"),
        timestamp_micros(expr("_tsns div 1000")).as("_ts"))
      .withWatermark("_ts", watermark)
      .dropDuplicatesWithinWatermark("span_h", "doc_id")
      .groupBy(window(col("_ts"), windowDur).as("w"), col("span_h"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(expr("unix_micros(w.start) * 1000").as("window_ns"),
        col("span_h"), col("n_docs"))
}
