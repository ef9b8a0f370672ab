package graft.rules

import graft.read.QbeastIndex

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * Answer an unfiltered `count(*)` over a qbeast table from the commit
 * log instead of scanning data (the Delta
 * `OptimizeMetadataOnlyQuery` idea): every add action carries exact
 * per-block element counts — maintained by the writer, optimize, and
 * every copy-on-write DML rewrite — so the global row count is a sum
 * over file metadata the driver already holds. At 100 TB this turns
 * the most common sanity query a pipeline runs (`SELECT count(*)`)
 * from a full-table scan into an O(#files) driver fold that was
 * already paid for by snapshot replay.
 *
 * Strictly scoped: the aggregate must be global (no grouping), every
 * aggregate must be a plain non-distinct, unfiltered `count(<non-null
 * literal>)` (what `count(*)`/`count(1)`/`Dataset.count()` analyze
 * to), and the child must be a Project-only chain over ONE qbeast
 * relation — a Filter, Sample, Limit, join or a light (sidecar)
 * snapshot leaves the plan untouched.
 */
class MetadataCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case agg: Aggregate if agg.groupingExpressions.isEmpty =>
      rowCountOf(agg.child).flatMap(n => rewrite(agg, n)).getOrElse(agg)
  }

  /** The exact metadata row count, when the child is a row-preserving
   * (Project-only) chain over one complete-snapshot qbeast relation. */
  private def rowCountOf(plan: LogicalPlan): Option[Long] = plan match {
    case LogicalRelation(HadoopFsRelation(fi: QbeastIndex, _, _, _, _, _), _, _, _, _) =>
      val snap = fi.currentSnapshot
      // a light snapshot's `files` is only the post-checkpoint tail;
      // the bulk lives in the parquet sidecar — don't guess
      if (snap.filesComplete) Some(snap.files.map(_.elementCount).sum) else None
    case p: Project => rowCountOf(p.child)
    case s: SubqueryAlias => rowCountOf(s.child)
    case _ => None
  }

  /** Fold the aggregate into a one-row LocalRelation iff every output
   * is a plain count-star (→ the metadata count) or a literal. */
  private def rewrite(agg: Aggregate, n: Long): Option[LogicalPlan] = {
    val values = agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          // count(*) / count(1): every argument a non-null literal
          case Count(children)
              if children.nonEmpty &&
                children.forall(c => c.foldable && c.eval() != null) =>
            Some(n)
          case _ => None
        }
      case Alias(l: Literal, _) => Some(l.value)
      case l: Literal => Some(l.value)
      case _ => None
    }
    if (values.forall(_.isDefined))
      Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.get)))))
    else None
  }
}
