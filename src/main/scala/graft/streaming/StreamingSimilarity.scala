package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming similarity search — a live QUERY stream against a static
  * corpus index, the serving counterpart of the batch
  * [[graft.operators.Similarity]] paths (reference: the fetcher's
  * "query arrives, probe the archive" shape, re-expressed for vectors).
  *
  * This is the library's first stream-STATIC join surface: the corpus
  * never streams, never shuffles per trigger, and carries no state —
  * each micro-batch equi-joins the arriving queries' sign buckets
  * against the bucketed corpus exactly like the batch `lshTopK` probe.
  * The only state is the per-(window × query) candidate buffer of
  * (neighbor id, cosine) pairs — NO vectors — bounded by the bucket
  * candidate count and watermark-evicted.
  *
  * At 100 TB the corpus side is the knob: pass a pre-bucketed,
  * persisted (or bucketed-table) corpus via [[bucketCorpus]] so the
  * per-trigger probe reads only the matched buckets instead of
  * re-scanning parquet every micro-batch; `bits` widens bucket
  * fan-out, dividing per-query candidates (and state) by ~2^bits.
  */
object StreamingSimilarity {

  import graft.functions.VectorFunctions._

  /** The static side of [[annStream]], computed once: id, vector,
    * hoisted norm, sign bucket. Callers persist (or write as a
    * bucketed table on `bucket`) before serving — one decode of the
    * corpus instead of one per micro-batch.
    */
  def bucketCorpus(corpus: DataFrame, idCol: String, vecCol: String,
                   bits: Int): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      normNative(col(vecCol)).as("n_norm"),
      signBucket(col(vecCol), bits).as("bucket"))
      // hash-partition AND sort by the probe key BEFORE the caller
      // persists: the cached layout then satisfies both the join's
      // distribution and ordering requirements, so each micro-batch
      // plans SortMergeJoin(shuffled+sorted queries, raw cache scan)
      // — without this the whole corpus re-exchanges and re-sorts on
      // EVERY trigger (verified in the physical plan)
      .repartition(col("bucket")).sortWithinPartitions("bucket")
  }

  /** Append-mode streaming ANN: each query vector arriving on
    * `queries` (with an epoch-ns long event-time column) probes its
    * sign bucket of the STATIC `corpus` and emits its top-k neighbors
    * when the watermark closes the query's window — batch `lshTopK`
    * semantics (rank on the raw double cosine descending, neighbor id
    * ascending; self-match excluded; cosine rounded to 6 places in
    * the output only) with a window stamp.
    *
    * `corpus` must be the [[bucketCorpus]] shape. Re-delivered query
    * ids inside the watermark dedup before probing, like every stream
    * in [[StreamingDedup]].
    *
    * Output (append changelog): `window_ns, q_id, neighbor_id, bucket,
    * cosine, rank` — q33's batch columns, window-stamped.
    */
  def annStream(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, tsCol: String, bits: Int, k: Int,
                watermark: String = "10 seconds",
                windowDur: String = "6 hours"): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val q = queries
      .select(col(idCol).cast("long").as("q_id"), col(vecCol).as("q_vec"),
        normNative(col(vecCol)).as("q_norm"),
        signBucket(col(vecCol), bits).as("bucket"),
        timestamp_micros(expr(s"$tsCol div 1000")).as("_ts"))
      .withWatermark("_ts", watermark)
      .dropDuplicatesWithinWatermark("q_id")
    q.join(corpus, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .withColumn("cos", cosineWithNormsNative(
        col("q_vec"), col("n_vec"), col("q_norm"), col("n_norm")))
      // candidate buffer rows carry NO vectors: (sort key, id, rounded
      // cosine) only — the struct sorts by (-cos, neighbor_id), i.e.
      // exactly the batch rank order
      .groupBy(window(col("_ts"), windowDur).as("w"),
        col("q_id"), col("bucket"))
      .agg(slice(array_sort(collect_list(struct(
        negate(col("cos")).as("nc"), col("neighbor_id").as("id"),
        round(col("cos"), 6).as("cosine")))), 1, k).as("top"))
      .select(col("w"), col("q_id"), col("bucket"),
        posexplode(col("top")).as(Seq("pos", "m")))
      .select(expr("unix_micros(w.start) * 1000").as("window_ns"),
        col("q_id"), col("m.id").as("neighbor_id"), col("bucket"),
        col("m.cosine").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
