package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative validation framework — the reference's `@validator`
  * registry + `validate(report=True)` (obsplus `utils/validate.py:
  * 88-219`, seismology rules `events/validate.py:29-281`): each rule
  * maps the dataset to its violation rows; the report is the union.
  *
  * Rules are whole-DataFrame transforms, so each check is a pushed-down
  * scan/join — the report over N rules is N parallel jobs or one union
  * plan, never a per-row python callback.
  */
object Validation {

  /** A named rule producing violation rows with an `entity_id` column. */
  final case class Rule(name: String, violations: () => DataFrame)

  /** Violation report: one row per (rule, entity), `rule` column added.
    * Rules with no violations contribute nothing (matching the
    * reference's pass/fail frame semantics).
    */
  def report(rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Validation.report requires at least one rule")
    rules.map(r =>
      r.violations().select(col("entity_id"), lit(r.name).as("rule")))
      .reduce(_ unionByName _)
  }

  /** Aggregated report: violations per rule. */
  def summary(rules: Seq[Rule]): DataFrame =
    report(rules).groupBy("rule").agg(count(lit(1)).as("n_violations"))
}
