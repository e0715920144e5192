package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: explicit two-phase (salted) aggregation for
  * hot keys. AQE's skew handling covers joins; for groupBy on a
  * power-law key (user_id, domain, bucket) the salt spreads one hot
  * key over `salts` reducers in phase 1, then phase 2 combines the
  * partials. Result is identical to the plain aggregate — only the
  * shuffle shape changes.
  *
  * Works for decomposable aggregates; pass the partial and final
  * expressions explicitly.
  */
object Skew {

  /** saltedSum: sum(valueExpr) per keys, hot-key-safe. `saltExpr`
    * should derive from a row-varying column (e.g.
    * `pmod(col("event_id"), lit(16))`) so it is deterministic; sum an
    * exact type (decimal/long) if bit-identical results across
    * groupings matter.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueExpr: Column,
                outName: String, saltExpr: Column): DataFrame =
    df.withColumn("_salt", saltExpr)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(valueExpr).as("_partial"), count(lit(1)).as("_pn"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(outName), sum(col("_pn")).as(s"${outName}_n"))
}
