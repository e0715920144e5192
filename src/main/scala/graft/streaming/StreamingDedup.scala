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
}
