package graft.rules

import graft.catalog.QbeastTableImpl
import graft.read.QbeastIndex

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.{Column, GraftShims, Row, SparkSession}

/**
 * SQL `UPDATE` / `MERGE INTO` over qbeast tables.
 *
 * Architecture note: the reference inherits these statements from Delta
 * Lake, and Delta plans them exactly this way — an analyzer rule that
 * intercepts the analyzed [[UpdateTable]] / [[MergeIntoTable]] plans and
 * routes them into the format's own copy-on-write machinery (Delta's
 * `DeltaAnalysis` → `UpdateCommand`/`MergeIntoCommand`). The alternative
 * — connector-level `SupportsRowLevelOperations` — would make Spark's
 * group-based rewrite re-shuffle the WHOLE table through a V2 batch
 * write unless runtime group filtering is also implemented; the
 * interception reuses [[graft.table.QbeastTable.updateWhere]] /
 * [[graft.table.QbeastTable.upsert]], which already rewrite only the
 * index-pruned affected files and commit atomically.
 *
 * Scale shape: affected-file discovery runs through the index-pruned
 * qbeast read path, so a keyed UPDATE/MERGE on indexed columns rewrites
 * a handful of files at 100 TB, not the table.
 */
class QbeastDmlRules(spark: SparkSession) extends Rule[LogicalPlan] {

  import QbeastDmlRules._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {

    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      targetPath(target) match {
        case None => plan
        case Some(path) =>
          val asgn = assignments.map { a =>
            columnPath(a.key, "UPDATE SET") -> unresolveToColumn(a.value)
          }.toMap
          UpdateQbeastTableCommand(path, asgn, condition.map(unresolveToColumn))
      }

    case m @ MergeIntoTable(target, source, mergeCond,
        matched, notMatched, notMatchedBySource, _) if m.resolved =>
      targetPath(target) match {
        case None => plan
        case Some(path) =>
          val keys = equiJoinKeys(mergeCond, target, source)
          // upsert fast path: unconditional UPDATE + INSERT assigning
          // every target column the same value on both sides (SET * /
          // INSERT * shape) — skips the join machinery. Duplicate source
          // keys are checked inside upsert() (Delta's multiple-matches
          // rule: error only when duplicates hit a target row). Anything
          // else (partial SET, differing sides) falls through to the
          // general row-level merge.
          val fastReplacement = (matched, notMatched, notMatchedBySource) match {
            case (Seq(UpdateAction(None, updateAsgn, _)),
                Seq(InsertAction(None, insertAsgn)), Seq()) =>
              replacementRow(target.output.map(_.name), updateAsgn, insertAsgn)
            case _ => None
          }
          (matched, notMatched, notMatchedBySource) match {
            case _ if fastReplacement.isDefined =>
              // the command projects the source to target-named columns
              // before upsert, so only the target-side key names remain
              MergeQbeastTableCommand(path, source, keys.map(_._1), fastReplacement.get)
            // anti-join fast path: lone unconditional MATCHED DELETE
            case (Seq(DeleteAction(None)), Seq(), Seq()) =>
              MergeDeleteQbeastTableCommand(path, source, keys)
            // everything else: the general row-level merge (ordered
            // conditional clauses, partial SET, NOT MATCHED BY SOURCE)
            case _ =>
              val srcPrefix = "__src_"
              val sourceIds = source.outputSet
              // joined-frame context: source attrs under the prefix,
              // target attrs bare
              def joinedCol(e: Expression): Column = GraftShims.column(e.transform {
                case a: AttributeReference if sourceIds.contains(a) =>
                  UnresolvedAttribute.quoted(srcPrefix + a.name)
                case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
              })
              def clauses(
                  actions: Seq[MergeAction],
                  over: Expression => Column): Seq[(Option[Column], Option[Seq[(String, Column)]])] =
                actions.map {
                  case UpdateAction(c, asgn, _) =>
                    (c.map(over), Some(asgn.map(a =>
                      columnPath(a.key, "MERGE UPDATE SET") -> over(a.value))))
                  case DeleteAction(c) => (c.map(over), None)
                  case InsertAction(c, asgn) =>
                    (c.map(over), Some(asgn.map(a =>
                      columnName(a.key, "MERGE INSERT") -> over(a.value))))
                  case other => unsupported(s"MERGE action $other")
                }
              GeneralMergeQbeastTableCommand(path, source, keys,
                clauses(matched, joinedCol),
                // insert clauses run over the source frame: bare names
                clauses(notMatched, unresolveToColumn),
                clauses(notMatchedBySource, joinedCol),
                srcPrefix)
          }
      }

    case _ => plan
  }

  /** Per target column: the (source-side) expression both actions
   * assign — Some only when UPDATE and INSERT each assign every target
   * column and agree on the value (the SET * / INSERT * shape that
   * qualifies for the whole-row upsert fast path). None = let the
   * general row-level merge handle it. */
  private def replacementRow(
      targetCols: Seq[String],
      updateAsgn: Seq[Assignment],
      insertAsgn: Seq[Assignment]): Option[Seq[(String, Column)]] = {
    def byCol(asgn: Seq[Assignment], what: String): Map[String, Expression] =
      asgn.map(a => columnName(a.key, what).toLowerCase -> a.value).toMap
    val up = byCol(updateAsgn, "MERGE UPDATE SET")
    val ins = byCol(insertAsgn, "MERGE INSERT")
    val row = targetCols.map { c =>
      (up.get(c.toLowerCase), ins.get(c.toLowerCase)) match {
        case (Some(u), Some(i)) if u.canonicalized == i.canonicalized =>
          Some(c -> GraftShims.column(u))
        case _ => None
      }
    }
    if (row.forall(_.isDefined)) Some(row.map(_.get)) else None
  }

  /** ON condition → (targetColumn, sourceColumn) equi-key pairs: a
   * conjunction of target.col = source.col equalities, names free to
   * differ between the sides (Delta semantics). */
  private def equiJoinKeys(
      cond: Expression,
      target: LogicalPlan,
      source: LogicalPlan): Seq[(String, String)] = {
    val targetIds = target.outputSet
    val sourceIds = source.outputSet
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val pairs = split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetIds.contains(a) && sourceIds.contains(b) =>
        a.name -> b.name
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetIds.contains(b) && sourceIds.contains(a) =>
        b.name -> a.name
      case other =>
        unsupported(s"MERGE ON condition $other (a conjunction of " +
          "target.key = source.key equalities is supported)")
    }
    // one column per side per pair: reusing a column across pairs (ON
    // t.a = s.k AND t.b = s.k) would later fail as an opaque ambiguous-
    // reference error from the renamed key frames — reject it up front
    Seq("target" -> pairs.map(_._1), "source" -> pairs.map(_._2)).foreach {
      case (side, names) =>
        val dups = names.groupBy(_.toLowerCase).collect {
          case (_, g) if g.size > 1 => g.head
        }
        if (dups.nonEmpty)
          unsupported(s"MERGE ON reusing the same $side column in multiple " +
            s"equalities (${dups.mkString(", ")})")
    }
    pairs
  }

}

object QbeastDmlRules {

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"qbeast MERGE/UPDATE does not support $what")

  /** The qbeast table path behind a DML target, whichever shape the
   * resolution fixpoint has it in ([[QbeastAnalysis]] may already have
   * swapped the V2 relation for the V1 read relation). */
  private def targetPath(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => targetPath(child)
    case r: DataSourceV2Relation => r.table match {
      case t: QbeastTableImpl => Some(t.location)
      case _ => None
    }
    case l: LogicalRelation => l.relation match {
      case HadoopFsRelation(fi: QbeastIndex, _, _, _, _, _) =>
        Some(fi.currentSnapshot.tablePath)
      case _ => None
    }
    case _ => None
  }

  /** Assignment key → plain column name (nested fields unsupported —
   * INSERT clauses, where Delta is also top-level-only). */
  private def columnName(key: Expression, what: String): String = key match {
    case a: AttributeReference => a.name
    case other => unsupported(s"$what on non-top-level column $other")
  }

  /** Assignment key → top-level name or dotted struct path (`s.x.y`) —
   * UPDATE SET / MERGE UPDATE SET support struct-field assignment, the
   * Delta semantics the reference inherits.
   * [[graft.table.Assignments]] applies these via `withField`. */
  private def columnPath(key: Expression, what: String): String = key match {
    case a: AttributeReference => a.name
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      val fieldName = g.name.getOrElse(
        g.child.dataType.asInstanceOf[org.apache.spark.sql.types.StructType](g.ordinal).name)
      columnPath(g.child, what) + "." + fieldName
    case other => unsupported(s"$what on unsupported column expression $other")
  }

  /** Resolved expression over the DML target → Column that re-resolves
   * by NAME against the fresh frame the command reads from the path
   * (the original exprIds die with the analyzed plan). */
  private def unresolveToColumn(e: Expression): Column =
    GraftShims.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

}

/** SQL `UPDATE t SET ... WHERE ...` → copy-on-write
 * [[graft.table.QbeastTable.updateWhere]]. */
case class UpdateQbeastTableCommand(
    path: String,
    assignments: Map[String, Column],
    condition: Option[Column])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    graft.table.QbeastTable.forPath(spark, path)
      .updateWhere(condition.getOrElse(org.apache.spark.sql.functions.lit(true)), assignments)
    Seq.empty
  }

}

/** SQL `MERGE INTO t USING s ON keys WHEN MATCHED THEN DELETE` →
 * copy-on-write [[graft.table.QbeastTable.deleteMatched]] (drop every
 * target row whose keys appear in the source). `keys` are
 * (targetColumn, sourceColumn) pairs; the source keys are renamed to
 * the target names before the anti-join. */
case class MergeDeleteQbeastTableCommand(
    path: String,
    source: LogicalPlan,
    keys: Seq[(String, String)])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val srcKeys = GraftShims.ofRows(spark, source)
      .select(keys.map { case (t, sn) => org.apache.spark.sql.functions.col(sn).as(t) }: _*)
    graft.table.QbeastTable.forPath(spark, path)
      .deleteMatched(srcKeys, keys.map(_._1))
    Seq.empty
  }

}

/** General SQL `MERGE INTO` → row-level
 * [[graft.table.QbeastTable.mergeOn]]: ordered conditional WHEN MATCHED
 * UPDATE/DELETE, conditional WHEN NOT MATCHED INSERT, WHEN NOT MATCHED
 * BY SOURCE UPDATE/DELETE. Clause tuples are (condition, assignments);
 * assignments None = DELETE. `keys` are (targetColumn, sourceColumn)
 * equi-key pairs — names may differ between the sides. */
case class GeneralMergeQbeastTableCommand(
    path: String,
    source: LogicalPlan,
    keys: Seq[(String, String)],
    matched: Seq[(Option[Column], Option[Seq[(String, Column)]])],
    notMatched: Seq[(Option[Column], Option[Seq[(String, Column)]])],
    notMatchedBySource: Seq[(Option[Column], Option[Seq[(String, Column)]])],
    srcPrefix: String)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    def mc(t: (Option[Column], Option[Seq[(String, Column)]])) =
      graft.table.MergeClause(t._1, t._2.map(_.toMap))
    graft.table.QbeastTable.forPath(spark, path).mergeOn(
      GraftShims.ofRows(spark, source), keys,
      matched.map(mc), notMatched.map(mc), notMatchedBySource.map(mc), srcPrefix)
    Seq.empty
  }

}

/** SQL `MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE SET *
 * WHEN NOT MATCHED THEN INSERT *` → copy-on-write
 * [[graft.table.QbeastTable.upsert]]. The source plan is re-wrapped as
 * a DataFrame and projected to the target's columns. */
case class MergeQbeastTableCommand(
    path: String,
    source: LogicalPlan,
    keys: Seq[String],
    replacement: Seq[(String, Column)])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val srcDf = GraftShims.ofRows(spark, source)
      .select(replacement.map { case (name, c) => c.as(name) }: _*)
    graft.table.QbeastTable.forPath(spark, path).upsert(srcDf, keys)
    Seq.empty
  }

}
