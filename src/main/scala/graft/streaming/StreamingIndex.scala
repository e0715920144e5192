package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental indexing as Structured Streaming — the reference's
  * mtime-watermark contract (`bank/core.py:193-210`: only files newer
  * than the last pass are re-scanned) is exactly Spark's file-source
  * semantics: the checkpoint remembers processed files, each trigger
  * summarizes only new ones, and `foreachBatch` appends to the index
  * with exactly-once bookkeeping.
  *
  * `Trigger.AvailableNow` drains everything pending then stops — the
  * batch `update_index()` call; leave the default trigger for a live
  * continuously-indexing bank.
  */
object StreamingIndex {

  /** Segment-file schema expected on the stream. */
  def segmentSchema: StructType = StructType.fromDDL(
    "network STRING, station STRING, location STRING, channel STRING, " +
      "starttime BIGINT, sampling_period BIGINT, samples ARRAY<DOUBLE>")

  /** Shared source → summary stream (bounded-memory batching, header
    * arithmetic for endtime).
    */
  private def summaryStream(spark: SparkSession, segmentsDir: String): DataFrame =
    spark.readStream
      .schema(segmentSchema)
      .option("maxFilesPerTrigger", "1000") // bounded-memory batching
      .parquet(segmentsDir)
      .select(
        col("network"), col("station"), col("location"), col("channel"),
        col("starttime"),
        (col("starttime") + size(col("samples")).cast("long") * col("sampling_period"))
          .as("endtime"),
        col("sampling_period"))

  /** Per-batch summary aggregation shared by both sinks. */
  private def batchRows(batch: DataFrame, batchId: Long): DataFrame =
    batch.groupBy("network", "station", "location", "channel", "sampling_period")
      .agg(min("starttime").as("starttime"), max("endtime").as("endtime"),
           count(lit(1)).as("n_segments"))
      .withColumn("batch_id", lit(batchId))

  private def start(df: DataFrame, checkpointDir: String, availableNow: Boolean)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) => sink(batch, batchId) }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Start (and by default drain) the incremental indexer: parquet
    * segment files under segmentsDir → summary rows appended to
    * indexDir.
    */
  def run(spark: SparkSession, segmentsDir: String, indexDir: String,
          checkpointDir: String, availableNow: Boolean = true): StreamingQuery =
    start(summaryStream(spark, segmentsDir), checkpointDir, availableNow) {
      (batch, batchId) =>
        batchRows(batch, batchId).write.mode("append").parquet(indexDir)
    }

  /** The BANK-integrated variant: per-SEGMENT summary rows in the
    * WaveBank index schema (one row per segment, NSLC-normalized,
    * path + mtime for the mtime-watermark contract), committed through
    * [[graft.bank.WaveBank.streamingAppend]] — exactly-once index
    * appends (appendOnce batchId tags) AND sidecar sketch partials
    * with the same tag, marker re-stamped per batch. A continuously
    * ingesting bank keeps `sketchStats()`'s flat kilobyte-sized
    * dashboard read; without this, every micro-batch staled the
    * marker and the next read paid an O(index) resketch.
    *
    * Requires a `txIndex` bank. Covers append-only segment dirs: the
    * file source keys processed files by path, so a segment file
    * MODIFIED in place is not re-delivered — in-place modification
    * remains the batch `updateIndex()` path (which rewrites the
    * superseded rows).
    */
  def runBank(spark: SparkSession, segmentsDir: String,
              bank: graft.bank.WaveBank, checkpointDir: String,
              availableNow: Boolean = true): StreamingQuery = {
    // fail FAST at the call site: deferring this to the sink's own
    // require would surface as a mid-stream StreamingQueryException
    // after the checkpoint dir exists
    require(bank.isTxIndex,
      "StreamingIndex.runBank requires a txIndex WaveBank " +
        "(exactly-once micro-batch commits via appendOnce)")
    import graft.core.Schemas
    val perSegment = spark.readStream
      .schema(segmentSchema)
      .option("maxFilesPerTrigger", "1000") // bounded-memory batching
      .parquet(segmentsDir)
      .select(
        Schemas.nslcNormalize(col("network")).as("network"),
        Schemas.nslcNormalize(col("station")).as("station"),
        Schemas.nslcNormalize(col("location")).as("location"),
        Schemas.nslcNormalize(col("channel")).as("channel"),
        col("starttime"),
        (col("starttime")
          + size(col("samples")).cast("long") * col("sampling_period"))
          .as("endtime"),
        col("sampling_period"),
        col("_metadata.file_path").as("path"),
        unix_millis(col("_metadata.file_modification_time")).as("mtime_ms"))
    start(perSegment, checkpointDir, availableNow) { (batch, batchId) =>
      bank.streamingAppend(
        batch
          .withColumn("indexed_at",
            lit(System.currentTimeMillis() * 1000000L))
          .withColumn("index_version", lit(bank.indexVersion)),
        batchId)
    }
  }

  /** The transactional variant: the same incremental indexer, but each
    * micro-batch commits through a [[graft.bank.TxTable]] with an
    * idempotence tag keyed by batchId. `foreachBatch` can replay a
    * batch after a crash (its at-least-once contract); `appendOnce`
    * sees the batch's tag already in the log and skips, so the index
    * gets each batch EXACTLY once — and concurrent non-streaming
    * writers (manual `updateIndex`, compaction) interleave safely via
    * the same commit protocol. This is the composition the reference's
    * single-process HDF5 bank cannot express.
    */
  def runTx(spark: SparkSession, segmentsDir: String,
            tx: graft.bank.TxTable, checkpointDir: String,
            availableNow: Boolean = true): StreamingQuery =
    start(summaryStream(spark, segmentsDir), checkpointDir, availableNow) {
      (batch, batchId) =>
        tx.appendOnce(batchRows(batch, batchId), tag = s"stream-batch-$batchId")
        ()
    }

  /** Streaming availability with watermarked tumbling windows over a
    * live event stream — the streaming analog of the availability agg.
    */
  def windowedCounts(stream: DataFrame, tsCol: String,
                     window_ : String, watermark: String): DataFrame =
    stream
      .withColumn("ts_ts", timestamp_micros(expr(s"$tsCol div 1000")))
      .withWatermark("ts_ts", watermark)
      .groupBy(window(col("ts_ts"), window_), col("network"), col("station"))
      .agg(count(lit(1)).as("n"), min(tsCol).as("min_ts"), max(tsCol).as("max_ts"))
}
