package graft.rules

import graft.core.model.{Revision, Weight}
import graft.read.QbeastIndex

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
    // ONLY a linear Project/Filter chain over ONE qbeast relation may be
    // rewritten (reference `SampleRule.scala:89-107` matches the same
    // shapes): rewriting below a join/union/agg would sample each side
    // independently (≈ f² of the join), not f of the result.
    case s @ Sample(lower, upper, false, _, child) =>
      linearChainRelation(child) match {
        case Some((fi, relation)) =>
          revisionColumns(fi, relation.output) match {
            case Some(cols) => injectWeightFilter(lower, upper, child, relation)
            case None => s
          }
        case None => s
      }
  }

  /** The single qbeast relation at the bottom of a Project/Filter-only
   * chain, if that is the plan's shape. */
  private def linearChainRelation(
      plan: LogicalPlan): Option[(QbeastIndex, LogicalRelation)] = plan match {
    case r @ LogicalRelation(HadoopFsRelation(fi: QbeastIndex, _, _, _, _, _), _, _, _, _) =>
      Some((fi, r))
    case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
      linearChainRelation(p.child)
    case f: Filter => linearChainRelation(f.child)
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      linearChainRelation(s.child)
    case _ => None
  }

  /** Replace the Sample node by a weight filter injected directly above
   * the relation (below any Project, so the indexed columns are always
   * in scope). */
  private def injectWeightFilter(
      lower: Double,
      upper: Double,
      child: LogicalPlan,
      target: LogicalRelation): LogicalPlan = child transformUp {
    case r: LogicalRelation if r eq target =>
      val fi = r.relation.asInstanceOf[HadoopFsRelation].location
        .asInstanceOf[QbeastIndex]
      val cols = revisionColumns(fi, r.output).get
      val hashExpr = new Murmur3Hash(cols)
      val minW = Literal(Weight.fromFraction(lower).value)
      val maxW = Literal(Weight.fromFraction(upper).value)
      val condition =
        if (lower <= 0.0) LessThan(hashExpr, maxW)
        else And(GreaterThanOrEqual(hashExpr, minW), LessThan(hashExpr, maxW))
      Filter(condition, r)
  }

  /** Indexed columns of the latest revision, resolved against the
   * relation output. */
  private def revisionColumns(
      fi: QbeastIndex,
      output: Seq[Attribute]): Option[Seq[Attribute]] = {
    val snapshot = fi.currentSnapshot
    snapshot.lastRevision.filterNot(_.isStaging).flatMap { revision: Revision =>
      // revision columns are PHYSICAL names; the relation output is
      // LOGICAL — map back before resolving (identity on unmapped tables)
      val resolved = revision.columnNames.map { name =>
        val logical = snapshot.schema
          .map(graft.core.model.ColumnMapping.logicalOf(_, name)).getOrElse(name)
        output.find(a => a.name.equalsIgnoreCase(logical))
      }
      if (resolved.forall(_.nonEmpty)) Some(resolved.map(_.get)) else None
    }
  }

}
