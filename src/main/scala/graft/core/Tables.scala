package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query entry point takes a scale-factor directory so the same
  * plan runs on sf0.001 (smoke), sf0.01 (correctness) and sf0.1+ (bench)
  * — and, at cluster scale, a 100 TB dataset path with identical code.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `ts` is LongType epoch-ns (GraftSession nanosAsLong). */
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")

  /** `events` with ts truncated to µs-grained ns (`ts div 1000 * 1000`).
    * The engine is ns-native, but DuckDB (the correctness oracle) reads
    * parquet TIMESTAMP(NANOS) as µs TIMESTAMP, truncating sub-µs digits
    * — oracle-checked queries must start from the same truncated values.
    * Integer `div` (not double /) — doubles can't represent 1.7e18 ns.
    */
  def eventsUs(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("ts",
      org.apache.spark.sql.functions.expr("ts div 1000 * 1000"))

  /** Any-format loader with CSV fallback + schema conform — the
    * reference's "every to-df entry point falls back to read_csv"
    * contract (obsplus `events/pd.py:269-276`).
    */
  def readAny(s: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val raw =
      if (path.endsWith(".csv"))
        s.read.option("header", "true").schema(
          org.apache.spark.sql.types.StructType(schema.fields)).csv(path)
      else s.read.parquet(path)
    Schemas.conformTo(raw, schema)
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
