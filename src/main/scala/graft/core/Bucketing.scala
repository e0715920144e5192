package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: pre-shuffling a fact table once into N
  * buckets on its join/grouping key makes every later equi join or
  * aggregation on that key shuffle-free — the right trade for tables
  * joined repeatedly at 100 TB (pay the shuffle once at write time).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String,
                    keys: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
}
