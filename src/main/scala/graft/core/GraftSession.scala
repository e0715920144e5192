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
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")

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
