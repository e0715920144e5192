package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable column extractors — the `DataFrameExtractor` extension
  * point (obsplus `structures/dfextractor.py:98-189`): users register
  * named extractors that derive output columns; a row predicate plays
  * the role of `SkipRow` (rows failing any keep-predicate drop out).
  *
  * Everything stays a Column expression, so user extensions ride inside
  * codegen instead of per-row callbacks — the Spark-native version of
  * the reference's per-object extractor functions.
  */
final class Extractor private (
    private val columns: Vector[(String, Column)],
    private val keeps: Vector[Column]) {

  def withColumn(name: String, c: Column): Extractor =
    new Extractor(columns :+ (name -> c), keeps)

  /** SkipRow analog: rows where `pred` is false are dropped. */
  def withKeep(pred: Column): Extractor = new Extractor(columns, keeps :+ pred)

  /** Apply: base columns + extracted columns, then keep-predicates. */
  def apply(df: DataFrame): DataFrame = {
    val out = df.select(df.columns.map(col) ++
      columns.map { case (n, c) => c.as(n) }: _*)
    keeps.foldLeft(out)((d, p) => d.filter(p))
  }
}

object Extractor {
  def apply(): Extractor = new Extractor(Vector.empty, Vector.empty)
}
