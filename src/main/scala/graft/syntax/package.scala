package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.core.Schemas
import graft.functions.Fnmatch
import graft.operators.Intervals

/** Extension-method API — the Spark-idiomatic replacement for the
  * reference's monkey-patched methods (`Catalog.to_df`,
  * `Stream.get_waveforms`, `Inventory.get_stations`; obsplus
  * `events/pd.py:608-661` etc.): import graft.syntax._ and the graft
  * verbs appear on any DataFrame.
  */
package object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** Glob-filter a string column (NSLC-style fnmatch semantics). */
    def whereGlob(colName: String, glob: String): DataFrame =
      if (glob == "*") df
      else if (Fnmatch.isLiteral(glob)) df.filter(col(colName) === glob)
      else df.filter(Fnmatch.matches(col(colName), glob))

    /** Conform to a fixed schema (null-fill, coerce, order). */
    def conformTo(schema: StructType): DataFrame = Schemas.conformTo(df, schema)

    /** Append a seed_id column from NSLC columns. */
    def withSeedId: DataFrame =
      df.withColumn("seed_id", Schemas.seedId(
        col("network"), col("station"), col("location"), col("channel")))

    /** Interval-overlap filter on (starttime, endtime). */
    def overlapping(t1: Long, t2: Long, bufferNs: Long = 0L): DataFrame =
      df.filter(Intervals.overlaps(t1, t2, bufferNs))

    def gapsBy(keys: Seq[String], minGapNs: Long): DataFrame =
      Intervals.gaps(df, keys, minGapNs)

    def availabilityBy(keys: Seq[String]): DataFrame =
      Intervals.availability(df, keys)

    // ---- corpus-pipeline verbs (the beyond-reference operator set) ----

    /** Scrub emails/phone numbers in place. */
    def redactPii(textCol: String): DataFrame =
      df.withColumn(textCol,
        graft.functions.TextFunctions.redactPii(col(textCol)))

    /** Keep one row per canonical text fingerprint (minimum id wins). */
    def dedupExactKeepers(textCol: String, idCol: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("_fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
        .withColumn("_keep", min(col(idCol)).over(Window.partitionBy("_fp")))
        .filter(col(idCol) === col("_keep"))
        .drop("_fp", "_keep")
    }

    /** Token-budget packing bins (see TextStats.packTokenBudget). */
    def packTokens(textCol: String, shard: Column, order: Column,
                   budget: Long): DataFrame =
      graft.operators.TextStats.packTokenBudget(df, textCol, shard, order, budget)
  }
}
