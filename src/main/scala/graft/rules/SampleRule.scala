package graft.rules

import graft.core.model.{Revision, Weight}
import graft.read.QbeastFileIndex

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * The flagship rewrite (reference: `src/.../rules/SampleRule.scala:44-129`):
 *
 *   Sample(lb, ub, withReplacement=false) over a qbeast relation
 *     ⇒ Filter(lb·range ≤ murmur3(indexedCols, 42) < ub·range)
 *
 * The filter lands in `FileSourceScanExec.dataFilters`, where
 * [[graft.read.QbeastFileIndex]] turns it into *file-level* pruning via
 * block weight ranges, while its per-row evaluation (stock codegen)
 * keeps exact deterministic sampling semantics. Because rows were
 * weighted with the *same* expression at write time, the sampled subset
 * is statistically uniform.
 */
class SampleRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case s @ Sample(lower, upper, false, _, child) if hasQbeastRelation(child) =>
      pushSampleAsFilter(lower, upper, child)
  }

  private def hasQbeastRelation(plan: LogicalPlan): Boolean = {
    var found = false
    plan.foreach {
      case LogicalRelation(HadoopFsRelation(_: QbeastFileIndex, _, _, _, _, _), _, _, _, _) =>
        found = true
      case _ =>
    }
    found
  }

  /** Replace the Sample node by weight filters injected directly above
   * each qbeast relation (below any Project, so the indexed columns are
   * always in scope). */
  private def pushSampleAsFilter(
      lower: Double,
      upper: Double,
      child: LogicalPlan): LogicalPlan = child transformUp {
    case r @ LogicalRelation(HadoopFsRelation(fi: QbeastFileIndex, _, _, _, _, _), _, _, _, _) =>
      revisionColumns(fi, r.output) match {
        case Some(cols) =>
          val hashExpr = new Murmur3Hash(cols)
          val minW = Literal(Weight.fromFraction(lower).value)
          val maxW = Literal(Weight.fromFraction(upper).value)
          val condition =
            if (lower <= 0.0) LessThan(hashExpr, maxW)
            else And(GreaterThanOrEqual(hashExpr, minW), LessThan(hashExpr, maxW))
          Filter(condition, r)
        case None => r
      }
  }

  /** Indexed columns of the latest revision, resolved against the
   * relation output. */
  private def revisionColumns(
      fi: QbeastFileIndex,
      output: Seq[Attribute]): Option[Seq[Attribute]] = {
    val snapshot = fi.currentSnapshot
    snapshot.lastRevision.filterNot(_.isStaging).flatMap { revision: Revision =>
      val resolved = revision.columnNames.map(name =>
        output.find(a => a.name.equalsIgnoreCase(name)))
      if (resolved.forall(_.nonEmpty)) Some(resolved.map(_.get)) else None
    }
  }

}
