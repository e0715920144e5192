package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Pin the SQL confs oracle parity depends on. Driver-provided sessions
    * may carry any timezone/parquet settings; the NTZ branch of
    * `Tables.normalizeTs` interprets naive wall times in the SESSION
    * timezone, so a non-UTC external session would silently shift every
    * events epoch-ns. Both confs are runtime SQL confs — safe to set on
    * an already-started session.
    */
  private def harden(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("q01_pricing_summary").run(harden(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map { q =>
      q.name -> ((s: SparkSession, dir: String) => q.run(harden(s), dir))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
