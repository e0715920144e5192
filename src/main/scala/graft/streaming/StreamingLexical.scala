package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TopK

/** Streaming BM25 serving — a live query stream against a static
  * precomputed postings store ([[graft.operators.Lexical.bm25Store]]):
  * the lexical twin of [[StreamingSimilarity.ivfAdcStream]]. Arriving
  * queries tokenize scan-local, stream-static equi-join the store on
  * `term` (the corpus never streams, never shuffles per trigger), and
  * emit their top-k when the watermark closes the window.
  *
  * Two chained windowed aggregations (legal append-mode stateful
  * chaining): the first folds a query's per-document score from its
  * matched term contributions — state is the per-(window, query, doc)
  * contribution buffer, ≤ |query terms| entries per row, bounded by
  * the candidate count (Σ df over the query's terms — the classic
  * postings-traversal cost, same shape [[StreamingSimilarity]]'s
  * annStream documents); the second is the bounded [[TopK]] heap, so
  * everything after the per-doc fold clamps at k entries per query in
  * every partial, every shuffle, and the state row.
  *
  * Scores are the batch [[graft.operators.Lexical.bm25TopK]] values
  * bit for bit: contributions fold in term-asc order, rank orders by
  * the ROUND-6 score with a doc-id tiebreak.
  *
  * Output (append changelog): `window_ns, q_id, doc_id, score, rank`.
  *
  * OPERATIONAL NOTE (round 15, measured on the ADC twin): size
  * `spark.sql.shuffle.partitions` — which fixes the state partition
  * count at checkpoint creation — to the STATE (per-query top-k rows),
  * not the data, and set it AFTER persisting the store so the cached
  * term layout keeps the join's scan parallelism; default-width
  * stateful operators otherwise pay dozens of near-empty state-store
  * commits per trigger (BASELINE's stream-partitions table).
  */
object StreamingLexical {

  /** `statePartitions`: size the stream's state partition count to the
    * state (per-query top-k rows) instead of the session default —
    * requires `store` persisted; see [[StatePartitions.pin]] for the
    * ordering guarantee this option enforces (cached store layout is
    * materialized under the wide conf BEFORE the conf narrows).
    */
  def bm25Stream(queries: DataFrame, store: DataFrame,
                 qIdCol: String, qTextCol: String, tsCol: String,
                 k: Int,
                 watermark: String = "10 seconds",
                 windowDur: String = "6 hours",
                 statePartitions: Option[Int] = None): DataFrame =
    bm25RankedW(queries, store, qIdCol, qTextCol, tsCol, k,
      watermark, windowDur, statePartitions)
      .select(expr("unix_micros(w.start) * 1000").as("window_ns"),
        col("q_id"), col("doc_id"), col("score"), col("rank"))

  /** [[bm25Stream]] up to the ranked tier output, KEEPING the window
    * struct (`w, q_id, doc_id, score, rank`) so a downstream stateful
    * fusion stage ([[StreamingHybrid]]) can chain another windowed
    * aggregation on the same event time — the window attribute carries
    * the event-time tag through the projection.
    */
  private[streaming] def bm25RankedW(
      queries: DataFrame, store: DataFrame,
      qIdCol: String, qTextCol: String, tsCol: String,
      k: Int, watermark: String, windowDur: String,
      statePartitions: Option[Int]): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    graft.plans.GraftExtensions.register(queries.sparkSession)
    statePartitions.foreach(StatePartitions.pin(store, _))
    val qTerms = queries
      .select(col(qIdCol).cast("long").as("q_id"),
        col(qTextCol).as("qtext"),
        timestamp_micros(expr(s"$tsCol div 1000")).as("_ts"))
      .withWatermark("_ts", watermark)
      .dropDuplicatesWithinWatermark("q_id")
      .select(col("q_id"), col("_ts"),
        explode(graft.operators.Lexical.queryTerms(col("qtext")))
          .as("term"))
    val perDoc = qTerms
      .join(store.select(col("term"), col("doc_id"), col("contrib")),
        Seq("term"))
      .groupBy(window(col("_ts"), windowDur).as("w"),
        col("q_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("contrib"))))
        .as("cs"))
      .withColumn("score",
        round(aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("contrib")), 6))
    perDoc
      .groupBy(window(col("w"), windowDur).as("w2"), col("q_id"))
      .agg(TopK.topKNative(k, negate(col("score")), col("doc_id"))
        .as("top"))
      .select(col("w2"), col("q_id"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("w2").as("w"),
        col("q_id"), col("t.id").as("doc_id"),
        negate(col("t.d")).as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
