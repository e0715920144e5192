package graft.core

import org.apache.spark.sql.SparkSession

/** Session configuration for the graft engine.
  *
  * Conventions (see SURVEY.md §1.2):
  *   - All wall-clock times are canonically `LongType` epoch-nanoseconds
  *     (the reference keeps int64 epoch-ns internally; Spark's
  *     TimestampType is µs so ns-grade data stays in longs).
  *     `spark.sql.legacy.parquet.nanosAsLong=true` makes parquet
  *     TIMESTAMP(NANOS) columns surface as LongType ns directly.
  *   - UTC session timezone everywhere (oracle parity).
  *   - Shuffle partitions default to the local core count, not 200; at
  *     cluster scale callers override via `spark.sql.shuffle.partitions`.
  *     AQE coalesces further at runtime.
  */
object GraftSession {

  /** Apply graft's required configs to a builder. Safe to call on a
    * builder that already has master/app set.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Respect the advisory partition size when coalescing instead of
    // first preserving cluster parallelism (round 17, guide §2.2
    // "fewer, larger reduce partitions"): parallelismFirst=true (the
    // default) deliberately ignores the advisory size and keeps one
    // tiny partition per core, which Spark's own config doc recommends
    // turning off in production. With it off, AQE sizes every
    // post-shuffle stage by bytes — kilobyte stages collapse to one
    // task instead of |cores| no-op tasks, and at cluster scale the
    // reduce-side block count stops growing with core count. The
    // advisory size stays at Spark's 64 MB default; callers override
    // per deployment.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "false")
    // Let AQE size CACHED plans too (round 17): by default Spark pins
    // a persisted frame's output partitioning to the pre-AQE shuffle
    // count for compatibility, so every serving-store cache kept one
    // tiny partition per core and every cache scan paid |cores| task
    // launches per pass. With the flag on, caches coalesce by the same
    // advisory size as live stages (explicit repartition() layouts are
    // never coalesced, so pinned state layouts are unaffected).
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    // ObjectHashAggregate (the operator every TypedImperativeAggregate
    // — bounded_topk, the sketches — plans into) falls back to
    // SORT-based aggregation once a task sees >128 distinct groups
    // (Spark's default): the partial agg then externally sorts every
    // CANDIDATE row by group key before updating, which is exactly
    // backwards for bounded_topk, whose per-group state is ≤ k
    // primitive entries (16 B each) no matter how many rows feed it.
    // Serving streams group by (window, query) — thousands of groups,
    // millions of candidate rows — and the BM25 impact-truncation build
    // groups by term (vocabulary-sized). 64Ki groups × a k=10 buffer
    // (~200 B with headers) ≈ 13 MB per task — far under executor
    // memory; beyond that (web-scale vocabularies, unbounded sketch
    // cardinalities) the sort fallback engages as designed, since
    // ObjectHashAggregate does not meter its buffer map's heap.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 16).toString)

  /** Local session for tests / CLI mains. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
