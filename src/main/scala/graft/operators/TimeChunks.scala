package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding time-window generation — obsplus `make_time_chunks`
  * (`utils/time.py:378-421`), used for chunked archive delivery
  * (`wavebank.py:649-704`). Windows are [t, t + duration] advancing by
  * `step` (= duration − overlap); generated declaratively with
  * `sequence` + `explode` so the chunk table is a first-class DataFrame
  * that joins/broadcasts like any other — in streaming mode the same
  * shape is `window(ts, duration, step)`.
  */
object TimeChunks {

  /** Chunk table: (chunk_i, chunk_start, chunk_end), epoch-ns. Includes
    * every window with chunk_end <= stop (the reference yields while
    * t2 <= stop).
    */
  def chunks(spark: SparkSession, start: Long, stop: Long,
             duration: Long, step: Long): DataFrame = {
    // no window fits → empty set (the reference yields nothing when
    // even the first t2 would exceed stop)
    val nWindows =
      if (stop < start + duration) 0L
      else (stop - duration - start) / step + 1
    spark.range(0, nWindows).toDF("chunk_i")
      .withColumn("chunk_start", lit(start) + col("chunk_i") * lit(step))
      .withColumn("chunk_end", col("chunk_start") + lit(duration))
  }

  /** Assign points to (possibly overlapping) chunks: broadcast the chunk
    * table, half-open membership [start, end).
    */
  def assign(points: DataFrame, chunkTable: DataFrame, tsCol: String): DataFrame =
    points.join(broadcast(chunkTable),
      points(tsCol) >= chunkTable("chunk_start") &&
      points(tsCol) < chunkTable("chunk_end"))
}
