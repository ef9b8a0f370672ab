package graft.rules

import graft.log.QbeastSnapshot
import graft.read.{FileStatsPruning, QbeastIndex}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/**
 * Answer unfiltered `count(*)` / `min(col)` / `max(col)` over a qbeast
 * table from the commit log instead of scanning data (the Delta
 * `OptimizeMetadataOnlyQuery` idea): every add action carries exact
 * per-block element counts plus Delta-style per-file column stats
 * ([[graft.write.FileStatsCollector]]), so the most common sanity
 * query a pipeline runs (`SELECT count(*), min(ts), max(ts)`) becomes
 * an O(#files) driver fold that was already paid for by snapshot
 * replay — at 100 TB, that's a full-table scan saved.
 *
 * Strictly scoped: the aggregate must be global (no grouping), every
 * output a plain non-distinct unfiltered `count(<non-null literal>)`,
 * `min`/`max` of a directly-scanned column, or a literal; the child a
 * Project-only chain over ONE qbeast relation. min/max additionally
 * require EVERY file to carry complete stats for the column with an
 * exactness-safe type (long/double families, boolean, date,
 * timestamp — strings are excluded: the collector invalidates
 * oversized values, which is indistinguishable from all-null in the
 * emitted JSON). A Filter, Sample, Limit, join, light (sidecar)
 * snapshot, or any stats gap leaves the plan untouched.
 */
class MetadataCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case agg: Aggregate if agg.groupingExpressions.isEmpty =>
      snapshotOf(agg.child).flatMap { case (snap, output, conds) =>
        if (conds.isEmpty) rewrite(agg, (snap, output))
        else rewriteFiltered(agg, snap, output, conds)
      }.getOrElse(agg)
  }

  /** The complete snapshot under a row-preserving (Project-only) chain
   * over one qbeast relation, with the relation's output (so min/max
   * attributes can be matched by exprId) and any Filter conditions met
   * on the way down (split into conjuncts). */
  private def snapshotOf(
      plan: LogicalPlan): Option[(QbeastSnapshot, Seq[Attribute], Seq[Expression])] =
    plan match {
      case r @ LogicalRelation(HadoopFsRelation(fi: QbeastIndex, _, _, _, _, _), _, _, _, _) =>
        val snap = fi.currentSnapshot
        // a light snapshot's `files` is only the post-checkpoint tail;
        // the bulk lives in the parquet sidecar — don't guess.
        // Deletion vectors do NOT bail counts: every vector's
        // cardinality is exact log metadata, so live rows = block
        // element counts minus masked rows (min/max still bail — the
        // extreme row may be a masked one, see statsExtreme).
        if (snap.filesComplete) Some((snap, r.output, Nil))
        else None
      case p: Project => snapshotOf(p.child)
      case s: SubqueryAlias => snapshotOf(s.child)
      case f: Filter =>
        snapshotOf(f.child).map { case (s, o, cs) =>
          // DvMaskRule's planted NOT dv_row_deleted conjunct is the
          // mask itself — already accounted for by the cardinality
          // subtraction, never a user predicate to prove
          val user = splitConjuncts(f.condition).filterNot(
            _.exists(_.isInstanceOf[graft.expressions.DvRowDeleted]))
          (s, o, user ++ cs)
        }
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /**
   * `count(*)` under a predicate, answered from per-file stats alone:
   * every file must PROVE the conjunction true for all rows or true
   * for none ([[FileStatsPruning.proveAll]] — exact value-space
   * min/max/nullCount, so no transformation inverse or null-coordinate
   * subtleties); one undecidable file bails the whole rewrite to the
   * scan. On a qbeast table the write clusters files by cube, so
   * indexed-column ranges are tight per file and range predicates
   * decide most files — at 100 TB this turns the most common dashboard
   * query (`count(*) WHERE day = X`) into a driver fold.
   */
  private def rewriteFiltered(
      agg: Aggregate,
      snap: QbeastSnapshot,
      output: Seq[Attribute],
      conds: Seq[Expression]): Option[LogicalPlan] = {
    // only count(*)-shaped outputs (min/max of a filtered scan are not
    // derivable from whole-file stats)
    val countsOnly = agg.aggregateExpressions.forall {
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(children) =>
            children.nonEmpty && children.forall(c => c.foldable && c.eval() != null)
          case _ => false
        }
      case Alias(_: Literal, _) | _: Literal => true
      case _ => false
    }
    if (!countsOnly) return None
    // every referenced attribute must be a RAW relation column (a
    // filter above a Project alias would resolve names to computed
    // values the stats know nothing about)
    val outIds = output.map(_.exprId).toSet
    if (!conds.forall(_.references.forall(a => outIds.contains(a.exprId)))) return None

    var n = 0L
    snap.files.foreach { f =>
      if (f.elementCount > 0L) {
        val stats = f.stats.flatMap(FileStatsPruning.parse).getOrElse(return None)
        if (stats.numRecords != f.elementCount) return None // stale/odd stats
        val proofs = conds.map(c => FileStatsPruning.proveAll(stats, c))
        if (proofs.exists(_.contains(false))) () // no row matches: adds 0
        else if (proofs.forall(_.contains(true)))
          // proofs hold for every PHYSICAL row, hence for every live
          // one: the file contributes its unmasked rows exactly
          n += f.elementCount - snap.dvs.get(f.path).map(_.cardinality).getOrElse(0L)
        else return None // partial overlap: bail to the scan
      }
    }
    val values = agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _) => n
      case Alias(l: Literal, _) => l.value
      case l: Literal => l.value
    }
    Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
  }

  /** Fold the aggregate into a one-row LocalRelation iff every output
   * is answerable from metadata. */
  private def rewrite(
      agg: Aggregate,
      rel: (QbeastSnapshot, Seq[Attribute])): Option[LogicalPlan] = {
    val (snap, output) = rel
    // live rows = physical block counts minus deletion-vector masks
    // (vector cardinalities are exact log metadata)
    lazy val n = snap.files.map(_.elementCount).sum - snap.dvMaskedRows
    val values = agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          // count(*) / count(1): every argument a non-null literal
          case Count(children)
              if children.nonEmpty &&
                children.forall(c => c.foldable && c.eval() != null) =>
            Some(n)
          case Min(a: Attribute) if output.exists(_.exprId == a.exprId) =>
            statsExtreme(snap, a.name, a.dataType, isMin = true)
          case Max(a: Attribute) if output.exists(_.exprId == a.exprId) =>
            statsExtreme(snap, a.name, a.dataType, isMin = false)
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

  /** Global min/max of `column` folded over per-file stats. Returns
   * None ("can't answer") on any file with missing/incomplete stats;
   * Some(null) is the legal answer for an empty or all-null column.
   * Float/double fold in Spark's total order (-Inf < finite < +Inf <
   * NaN): the collector records NaN/±Inf as sentinel strings, so a
   * table containing NaN answers max() = NaN exactly like the scan
   * would — folding only the numeric stats would silently return the
   * largest non-NaN instead. */
  private def statsExtreme(
      snap: QbeastSnapshot,
      column: String,
      dt: DataType,
      isMin: Boolean): Option[Any] = {
    if (!MetadataCountRule.exactStatsType(dt)) return None
    // a masked table's extreme might BE a masked row — stats can't tell
    if (snap.dvs.nonEmpty) return None
    val floating = dt == FloatType || dt == DoubleType
    var acc: Option[BigDecimal] = None
    var accBool: Option[Boolean] = None
    var accD: Option[Double] = None
    def foldD(d: Double): Unit = {
      val keep = accD.forall { p =>
        val c = FileStatsPruning.nanCmp(d, p)
        if (isMin) c < 0 else c > 0
      }
      if (keep) accD = Some(d)
    }
    snap.files.foreach { f =>
      if (f.elementCount > 0L) {
        val stats = f.stats.flatMap(FileStatsPruning.parse).getOrElse(return None)
        val nulls = stats.nulls.getOrElse(column, return None)
        if (nulls < stats.numRecords) {
          val side = if (isMin) stats.mins else stats.maxs
          side.getOrElse(column, return None) match {
            case b: Boolean =>
              accBool = Some(accBool.fold(b)(p => if (isMin) p && b else p || b))
            case bd: BigDecimal =>
              if (floating) foldD(bd.toDouble)
              else acc = Some(acc.fold(bd)(p => if (isMin) p.min(bd) else p.max(bd)))
            case s: String if floating =>
              // collector's non-finite sentinels, decoded by the single
              // shared definition
              FileStatsPruning.nonFinite(s) match {
                case Some(d) => foldD(d)
                case None => return None
              }
            case _ => return None // string or unexpected shape
          }
        }
      }
    }
    dt match {
      case BooleanType => Some(accBool.orNull)
      case FloatType => Some(accD.map[Any](_.toFloat).orNull)
      case DoubleType => Some(accD.map[Any](d => d).orNull)
      case _ =>
        // map[Any]: without the ascription Scala unifies the numeric
        // arms by WEAK CONFORMANCE — every branch silently widens to
        // Double, putting a boxed Double in a Long column's row slot
        Some(acc.map[Any] { bd =>
          dt match {
            case ByteType => bd.toByteExact
            case ShortType => bd.toShortExact
            case IntegerType | DateType => bd.toIntExact
            case LongType | TimestampType | TimestampNTZType => bd.toLongExact
          }
        }.orNull)
    }
  }
}

object MetadataCountRule {

  /** Types whose stats JSON round-trip is exact (see
   * FileStatsCollector: long family as decimal text, float widened to
   * double losslessly, doubles printed round-trippably). */
  def exactStatsType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
        BooleanType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}
