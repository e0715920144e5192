package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.Tables

/** Oracle-checked Structured Streaming: the streaming operators are
  * spec-tested for streaming-only behavior (checkpoint restart,
  * watermark drops), but an end-to-end replay whose OUTPUT hash-matches
  * DuckDB proves the streaming plan computes the same answer as the
  * batch engine — the strongest cross-engine check available to a
  * streaming job.
  */
object StreamQueries {

  private val WindowNs = 21600L * 1000000000L // 6 h, epoch-aligned

  val all: Seq[Q] = Seq(

    // ---- §2.9 end-to-end: events replayed through the file source,
    //      tumbling 6h windows per event_type, complete-mode memory
    //      sink drained by AvailableNow. Spark's window() aligns to
    //      the epoch, so the oracle is integer ns-bucket arithmetic;
    //      both sides see µs-truncated timestamps in EVERY generator
    //      vintage (ns vintage: parquet TIMESTAMP(NANOS) → µs in
    //      DuckDB; µs TIMESTAMP/TIMESTAMP_NTZ vintages are µs-grained
    //      on disk already; timestamp_micros here).
    Q("q66_stream_windows", (s, dir) => {
      val stream = Tables.eventsStream(s, dir)
      val agg = stream
        .withColumn("tss", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("tss"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast("decimal(18,2)")).cast("double")
               .as("sum_value"))
      val sink = "q66_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // materialize, then unregister the sink table — repeated runs in
      // one session must not accumulate complete-mode state tables
      val out = s.table(sink)
        .select(expr("unix_micros(w.start) * 1000").as("window_ns"),
          col("event_type"), col("n_events"), col("sum_value"))
        .localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      -- floor-aligned bucket via positive mod (DuckDB // truncates
      -- toward zero, Spark's window() floors — they differ pre-1970);
      -- Spark's TimeWindowing also drops null timestamps, so mirror it
      SELECT epoch_ns(ts) - ((epoch_ns(ts) % $WindowNs) + $WindowNs) % $WindowNs
               AS window_ns,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2"""))
  )
}
