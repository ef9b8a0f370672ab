package graft.write

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CHECK constraints (Delta's `ALTER TABLE ... ADD CONSTRAINT name
 * CHECK (expr)` surface, stored as `qbeast.constraints.<name>` table
 * properties in the log's configuration). SQL-standard semantics: a
 * row passes when the expression is TRUE or NULL (UNKNOWN); it
 * violates only on FALSE.
 *
 * Enforcement is one extra validation pass over the NEW/CHANGED rows
 * of a write (append, overwrite, streaming batch, UPDATE's assigned
 * rows, MERGE/upsert's indexed rows) — existing data was validated
 * when the constraint was added, so rewrite survivors never re-pay.
 * All constraints fold into a single OR predicate, so a clean write
 * costs exactly one pass regardless of constraint count; the
 * per-constraint probe runs only on the failure path to NAME the
 * violated constraint in the error.
 */
object Constraints {

  val Prefix = "qbeast.constraints."

  def of(configuration: Map[String, String]): Map[String, String] =
    configuration.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }

  /** Throw if any row of `df` violates any constraint. */
  def validate(df: DataFrame, constraints: Map[String, String], context: String): Unit = {
    if (constraints.isEmpty) return
    val anyViolation = constraints.values
      .map(sql => not(coalesce(expr(sql), lit(true))))
      .reduce(_ || _)
    if (df.filter(anyViolation).take(1).nonEmpty) {
      // failure path only: probe per constraint to name the culprit
      val culprit = constraints.find { case (_, sql) =>
        df.filter(not(coalesce(expr(sql), lit(true)))).take(1).nonEmpty
      }
      val (name, sql) = culprit.getOrElse(constraints.head)
      throw new IllegalArgumentException(
        s"CHECK constraint $name ($sql) violated by $context data")
    }
  }
}
