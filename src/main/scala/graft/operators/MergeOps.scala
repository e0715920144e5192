package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed catalog merge + upsert semantics — obsplus `events/merge.py`
  * (pick identity join, `merge.py:45-119`) and the EventBank
  * upsert-by-id contract (`eventbank.py:351-378`).
  */
object MergeOps {

  /** Full-outer identity merge of an old and new catalog on `keyCol`,
    * classifying each key: right-only → "new", left-only → "rejected"
    * (the reference marks picks missing from the update as rejected),
    * both with changed `valueCol` → "updated", else "unchanged".
    */
  def identityMerge(oldCat: DataFrame, newCat: DataFrame,
                    keyCol: String, valueCol: String): DataFrame = {
    // presence flags, not value-nullness: a legitimately null value
    // must not masquerade as a missing key
    val l = oldCat.select(col(keyCol), col(valueCol).as("val_old"),
      lit(true).as("_in_old"))
    val r = newCat.select(col(keyCol), col(valueCol).as("val_new"),
      lit(true).as("_in_new"))
    l.join(r, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("_in_old").isNull, "new")
          .when(col("_in_new").isNull, "rejected")
          .when(!(col("val_old") <=> col("val_new")), "updated")
          .otherwise("unchanged"))
      .drop("_in_old", "_in_new")
  }

  /** Upsert: keep the newest row per key ordered by `orderCols` desc —
    * the read-dedup-write replacement for the reference's
    * delete-then-append SQLite upsert. At scale this is the standard
    * merge-on-read pattern: one window shuffle on the key.
    */
  def latestByKey(df: DataFrame, keyCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
