package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names and value normalization must agree exactly —
  * every aggregate/computed column is aliased identically on both sides,
  * numeric outputs are BIGINT or DOUBLE (exact-decimal sums cast to
  * double; libm-dependent values rounded), times are epoch-ns longs or
  * DATE.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
