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
 * Project/Filter-only chain over ONE qbeast relation (a Filter routes
 * through the stats-proof path: every file must decide the predicate
 * wholly true or wholly false). min/max additionally require EVERY
 * candidate file to carry complete stats for the column with an
 * exactness-safe type (long/double families, boolean, date, timestamp,
 * string). A string file whose winning bound is TRUNCATED (the
 * collector's `inexact` marker — an oversized value contributed a
 * prefix/bumped bound, not a row value) folds as a BOUND, exactly like
 * a dv-masked file: the fold still answers when an exact witness
 * dominates it, and bails to the scan otherwise. Sidecar-scale tables
 * (light snapshots, ≥200k files) run the count/min/max folds —
 * filtered AND unfiltered — as ONE Spark job over the parquet sidecar
 * ([[graft.log.DistributedMetadata]]) — O(partitions) partials to the
 * driver, never the file list — memoized per snapshot instance. A
 * Sample, Limit, join, any stats gap, or an undecidable file leaves
 * the plan untouched.
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
        // the bulk lives in the parquet sidecar — served by ONE Spark
        // job over the sidecar (DistributedMetadata) instead of a data
        // scan, provided the sidecar is still on disk. Deletion
        // vectors do NOT bail counts: every vector's cardinality is
        // exact log metadata, so live rows = block element counts
        // minus masked rows (min/max fold when the unmasked witness
        // dominates every masked file's stats bound — see statsExtreme).
        if (snap.filesComplete ||
          graft.log.DistributedMetadata.usable(spark, snap))
          Some((snap, r.output, Nil))
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
   * `count(*)` / `min(col)` / `max(col)` under a predicate, answered
   * from per-file stats alone: every file must PROVE the conjunction
   * true for all rows or true for none ([[FileStatsPruning.proveAll]] —
   * exact value-space min/max/nullCount, so no transformation inverse
   * or null-coordinate subtleties); one undecidable file bails the
   * whole rewrite to the scan. A TRUE-proved file's rows ALL satisfy
   * the predicate, so its stats extreme is achieved by a qualifying
   * row — min/max fold over exactly the surviving files (the same
   * witness/bound mask discipline as the unfiltered path). On a qbeast
   * table the write clusters files by cube, so indexed-column ranges
   * are tight per file and range predicates decide most files — at
   * 100 TB this turns the most common dashboard query
   * (`count(*), min(ts), max(ts) WHERE day = X`) into a driver fold.
   */
  /** Per-file stats/sketches are keyed by PHYSICAL column names; plan
   * attributes carry LOGICAL ones (identity on unmapped tables). */
  private def physName(snap: QbeastSnapshot, a: Attribute): String =
    snap.schema.map(graft.core.model.ColumnMapping.physicalOf(_, a.name))
      .getOrElse(a.name)

  /** Physical names of the min/max fold columns of `agg`. */
  private def foldColumns(agg: Aggregate, snap: QbeastSnapshot): Seq[String] =
    agg.aggregateExpressions.flatMap {
      case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
        case Min(a: Attribute) => Some(physName(snap, a))
        case Max(a: Attribute) => Some(physName(snap, a))
        case _ => None
      }
      case _ => None
    }

  /** Era gate for TYPE-WIDENED columns ([[graft.core.model.TypeWidening]]):
   * narrow-era stats of a unit-changing widen (date → timestamp_ntz)
   * cannot answer min/max or prove ANY predicate on the column, and
   * narrow-era bloom filters would FALSE-NEGATIVE equality proofs
   * against widened literals — a metadata answer could silently drop
   * rows. A gated reference bails the whole rewrite to the scan
   * (conservative; widens are rare, the scan is always correct).
   * Range proofs on a bloom-gated column stay allowed — min/max values
   * survive every value-preserving widen (BigDecimal compare). All
   * names physical. */
  private def eraBlocked(
      snap: QbeastSnapshot,
      provable: Seq[Expression],
      foldCols: Seq[String]): Boolean =
    snap.schema.exists { sc =>
      import graft.core.model.TypeWidening
      if (!TypeWidening.isEnabled(sc)) false
      else TypeWidening.proofBlocked(sc, provable) ||
        foldCols.exists(TypeWidening.statsTrustless(sc).contains)
    }

  private def rewriteFiltered(
      agg: Aggregate,
      snap: QbeastSnapshot,
      output: Seq[Attribute],
      conds0: Seq[Expression]): Option[LogicalPlan] = {
    val conds = snap.schema match {
      case Some(sc) => graft.core.model.ColumnMapping.toPhysicalExprs(conds0, sc)
      case None => conds0
    }
    val outIds = output.map(_.exprId).toSet
    // only count(*)/min/max-shaped outputs the stats can answer
    val answerable = agg.aggregateExpressions.forall {
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(children) =>
            children.nonEmpty && children.forall(c => c.foldable && c.eval() != null)
          case Min(a: Attribute) =>
            outIds.contains(a.exprId) && MetadataCountRule.exactStatsType(a.dataType)
          case Max(a: Attribute) =>
            outIds.contains(a.exprId) && MetadataCountRule.exactStatsType(a.dataType)
          case _ => false
        }
      case Alias(_: Literal, _) | _: Literal => true
      case _ => false
    }
    if (!answerable) return None
    // every referenced attribute must be a RAW relation column (a
    // filter above a Project alias would resolve names to computed
    // values the stats know nothing about)
    if (!conds.forall(_.references.forall(a => outIds.contains(a.exprId)))) return None

    // monotone date-function predicates (year(ts)=…, cast-to-date,
    // trunc) rewrite to EQUIVALENT raw-column ranges, so their
    // TRUE/FALSE proofs below are exactly the original predicate's
    val provable = graft.read.DerivedPredicates.expand(conds)

    if (eraBlocked(snap, provable, foldColumns(agg, snap))) return None

    if (!snap.filesComplete) return rewriteFilteredLight(agg, snap, provable)

    var n = 0L
    val surviving = scala.collection.mutable.HashSet.empty[String]
    snap.files.foreach { f =>
      if (f.elementCount > 0L) {
        val stats = f.stats.flatMap(FileStatsPruning.parse).getOrElse(return None)
        if (stats.numRecords != f.elementCount) return None // stale/odd stats
        val proofs = provable.map(c => FileStatsPruning.proveAll(stats, c))
        if (proofs.exists(_.contains(false))) () // no row matches: adds 0
        else if (proofs.forall(_.contains(true))) {
          // proofs hold for every PHYSICAL row, hence for every live
          // one: the file contributes its unmasked rows exactly
          n += f.elementCount - snap.dvs.get(f.path).map(_.cardinality).getOrElse(0L)
          surviving += f.path
        } else return None // partial overlap: bail to the scan
      }
    }
    val values = agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _) =>
        ae.aggregateFunction match {
          case _: Count => Some(n)
          case Min(a: Attribute) =>
            statsExtreme(snap, physName(snap, a), a.dataType, isMin = true, surviving.contains)
          case Max(a: Attribute) =>
            statsExtreme(snap, physName(snap, a), a.dataType, isMin = false, surviving.contains)
        }
      case Alias(l: Literal, _) => Some(l.value)
      case l: Literal => Some(l.value)
    }
    if (values.forall(_.isDefined))
      Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.get)))))
    else None
  }

  /** The sidecar-scale half of [[rewriteFiltered]]: ONE Spark job runs
   * the tri-state proofs + count + extreme folds over the sidecar bulk
   * ([[graft.log.DistributedMetadata.filteredFoldPartials]]), the
   * post-checkpoint tail folds driver-side, and the result is memoized
   * per (snapshot instance, conjunct text, columns) so optimizer
   * fixpoint iterations never re-launch the job. The shape pre-checks
   * already passed in the caller. */
  private def rewriteFilteredLight(
      agg: Aggregate,
      snap: QbeastSnapshot,
      provable: Seq[Expression]): Option[LogicalPlan] = {
    import MetadataCountRule.{foldFileFiltered, freshQuads, mergeQuads, resolveExtreme}
    // SAFETY screen before anything ships to executors: a subquery
    // conjunct (ScalarSubquery/Exists/In — the rule runs before the
    // predicate-subquery rewrite) embeds a whole LogicalPlan whose
    // relations are NOT serializable — capturing it in the fold
    // closure would fail the query at plan time instead of bailing to
    // the scan (proveAll answers None for these shapes anyway)
    if (provable.exists(_.exists(_.isInstanceOf[PlanExpression[_]]))) return None
    // the distinct min/max columns, in a stable order the accumulator
    // array indexes by
    val colAttrs = agg.aggregateExpressions.flatMap {
      case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
        case Min(a: Attribute) => Seq(a)
        case Max(a: Attribute) => Seq(a)
        case _ => Nil
      }
      case _ => Nil
    }.distinctBy(_.name)
    val cols = colAttrs.map(a => (physName(snap, a),
      a.dataType == FloatType || a.dataType == DoubleType,
      a.dataType.isInstanceOf[StringType])).toArray
    // fold the (small, driver-local) post-checkpoint tail FIRST: a
    // predicate straddling a tail file, or an unprovable shape over
    // the tail's stats, bails before the sidecar job ever launches
    var n = 0L
    val accs = freshQuads(cols)
    snap.files.foreach { f =>
      val dvCard = snap.dvs.get(f.path).map(_.cardinality).getOrElse(0L)
      if (!foldFileFiltered(f.stats, f.elementCount, dvCard, provable,
        cols, accs, n += _)) return None
    }
    // exprId-free key rendering (Expression.sql): re-running the same
    // dashboard query mints fresh exprIds, and a toString key would
    // miss the memo and re-launch the job every time
    val condKey = provable.map(c =>
      scala.util.Try(c.sql).getOrElse(c.toString)).mkString("&")
    val key = (System.identityHashCode(snap), snap.tablePath, snap.version,
      condKey, cols.map(_._1).mkString(","))
    val folded = MetadataCountRule.filteredMemo.get(key).getOrElse {
      val r = graft.log.DistributedMetadata.filteredFoldPartials(
        spark, snap, provable, cols)
      MetadataCountRule.filteredMemo.put(key, r)
      r
    }
    folded match {
      case None => None
      case Some((bulkN, bulkAccs)) =>
        // the memoized bulk accumulators are never mutated (the tail
        // accumulators merge them in)
        n += bulkN
        mergeQuads(accs, bulkAccs)
        val byName = cols.map(_._1).zipWithIndex.toMap
        val values = agg.aggregateExpressions.map {
          case Alias(ae: AggregateExpression, _) =>
            ae.aggregateFunction match {
              case _: Count => Some(n)
              case Min(a: Attribute) =>
                val (w, b, _, _) = accs(byName(physName(snap, a)))
                resolveExtreme(w, b, a.dataType)
              case Max(a: Attribute) =>
                val (_, _, w, b) = accs(byName(physName(snap, a)))
                resolveExtreme(w, b, a.dataType)
            }
          case Alias(l: Literal, _) => Some(l.value)
          case l: Literal => Some(l.value)
        }
        if (values.forall(_.isDefined))
          Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.get)))))
        else None
    }
  }

  /** Fold the aggregate into a one-row LocalRelation iff every output
   * is answerable from metadata. */
  private def rewrite(
      agg: Aggregate,
      rel: (QbeastSnapshot, Seq[Attribute])): Option[LogicalPlan] = {
    val (snap, output) = rel
    // SHAPE pre-check before any work: every output must be an
    // answerable count/min/max/literal — otherwise a sidecar-scale
    // table would launch fold jobs for the early outputs only to bail
    // on a later one
    val outIds = output.map(_.exprId).toSet
    val answerable = agg.aggregateExpressions.forall {
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(children) =>
            children.nonEmpty && children.forall(c => c.foldable && c.eval() != null)
          case Min(a: Attribute) =>
            outIds.contains(a.exprId) && MetadataCountRule.exactStatsType(a.dataType)
          case Max(a: Attribute) =>
            outIds.contains(a.exprId) && MetadataCountRule.exactStatsType(a.dataType)
          case _ => false
        }
      case Alias(_: Literal, _) | _: Literal => true
      case _ => false
    }
    if (!answerable) return None
    if (eraBlocked(snap, Nil, foldColumns(agg, snap))) return None
    // live rows = physical block counts minus deletion-vector masks
    // (vector cardinalities are exact log metadata). Sidecar-scale
    // tables sum their block counts in one Spark job over the parquet
    // sidecar — O(partitions) longs reach the driver, never the file
    // list — memoized per snapshot instance like the extreme folds.
    lazy val n = (if (snap.filesComplete) snap.files.map(_.elementCount).sum
      else {
        val key = (System.identityHashCode(snap), snap.tablePath, snap.version)
        MetadataCountRule.countMemo.get(key).getOrElse {
          val c = graft.log.DistributedMetadata.liveRowCount(spark, snap)
          MetadataCountRule.countMemo.put(key, c)
          c
        }
      }) - snap.dvMaskedRows
    // short-circuit on the first unanswerable VALUE (e.g. a stats gap
    // discovered mid-fold): later fold jobs never launch
    val values = Vector.newBuilder[Any]
    agg.aggregateExpressions.foreach { e =>
      val v: Option[Any] = e match {
        case Alias(ae: AggregateExpression, _) =>
          ae.aggregateFunction match {
            case _: Count => Some(n)
            case Min(a: Attribute) =>
              statsExtreme(snap, physName(snap, a), a.dataType, isMin = true)
            case Max(a: Attribute) =>
              statsExtreme(snap, physName(snap, a), a.dataType, isMin = false)
          }
        case Alias(l: Literal, _) => Some(l.value)
        case l: Literal => Some(l.value)
      }
      v match {
        case Some(x) => values += x
        case None => return None
      }
    }
    Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.result()))))
  }

  import MetadataCountRule.ExtremeAcc

  /** Global min/max of `column` folded over per-file stats, restricted
   * to files `surviving` admits (the filtered path passes its
   * TRUE-proved set; the unfiltered path admits everything). Returns
   * None ("can't answer") on any admitted file with missing/incomplete
   * stats; Some(null) is the legal answer for an empty or all-null
   * column.
   *
   * Deletion vectors don't automatically bail: an UNMASKED file's
   * stats extreme is achieved by a live row (the witness), while a
   * masked file's live extreme can only be ≤ its stats extreme (the
   * bound). When the witness dominates every masked file's bound, the
   * witness IS the live extreme; a fully-masked file (cardinality ==
   * elementCount) has no live rows and is skipped outright. Only a
   * masked file whose stats range could beat every witness forces the
   * scan — the extreme row there might be a deleted one.
   *
   * A TRUNCATED string side (the collector's `inexact` marker) is the
   * same situation by a different cause: the stats value bounds the
   * file's rows but no row achieves it — it folds into `bound`, never
   * `witness`.
   *
   * Sidecar-scale tables (light snapshot) run the per-file fold as ONE
   * Spark job over the parquet sidecar
   * ([[graft.log.DistributedMetadata.extremePartials]]) and merge the
   * O(partitions) partials here, then fold the post-checkpoint tail
   * driver-side — the same answer, never O(table files) of driver
   * work. The filtered path (`surviving`) stays complete-snapshot-only. */
  private def statsExtreme(
      snap: QbeastSnapshot,
      column: String,
      dt: DataType,
      isMin: Boolean,
      surviving: String => Boolean = _ => true): Option[Any] = {
    if (!MetadataCountRule.exactStatsType(dt)) return None
    val floating = dt == FloatType || dt == DoubleType
    val string = dt.isInstanceOf[StringType]
    val witness = new ExtremeAcc(isMin, floating, string)
    val bound = new ExtremeAcc(isMin, floating, string)
    if (!snap.filesComplete) {
      // executor-side fold over the sidecar bulk (tail-touched paths
      // already masked out by DistributedMetadata.liveRows), one job
      // covering BOTH sides, memoized per snapshot INSTANCE — the
      // instance comes from the fingerprint-validated snapshot cache,
      // so identity expiring is exactly log-change detection, and
      // optimizer fixpoint iterations / min+max of the same column /
      // a bailed rewrite re-optimized later all reuse the partials
      // instead of re-launching the job
      val key = (System.identityHashCode(snap), snap.tablePath, snap.version, column)
      val partials = MetadataCountRule.foldMemo.get(key).getOrElse {
        val r = graft.log.DistributedMetadata.extremePartials(
          spark, snap, column, floating, string)
        MetadataCountRule.foldMemo.put(key, r)
        r
      }
      partials match {
        case None => return None // some file was undecidable
        case Some((minW, minB, maxW, maxB)) =>
          if (isMin) { witness.mergeFrom(minW); bound.mergeFrom(minB) }
          else { witness.mergeFrom(maxW); bound.mergeFrom(maxB) }
      }
    }
    // complete snapshots fold everything here; light snapshots fold
    // only their post-checkpoint tail adds
    snap.files.foreach { f =>
      if (surviving(f.path)) {
        val dvCard = snap.dvs.get(f.path).map(_.cardinality).getOrElse(0L)
        if (!MetadataCountRule.foldFileExtreme(f.stats, f.elementCount, dvCard,
          column, isMin, witness, bound)) return None
      }
    }
    MetadataCountRule.resolveExtreme(witness, bound, dt)
  }
}

object MetadataCountRule {

  /** Memo for the sidecar-scale fold jobs, keyed by snapshot IDENTITY
   * (plus path/version against identityHashCode collisions): the
   * snapshot instance is served by QbeastLog's fingerprint-validated
   * cache, so a log change mints a new instance and retires the memo
   * entry naturally. Cleared alongside the snapshot cache
   * ([[graft.log.QbeastLog.invalidateCache]]) for out-of-band surgery. */
  private[rules] val foldMemo = new graft.core.LruCache[
    (Int, String, Long, String),
    Option[(ExtremeAcc, ExtremeAcc, ExtremeAcc, ExtremeAcc)]](256)
  private[rules] val countMemo =
    new graft.core.LruCache[(Int, String, Long), Long](64)
  // filtered-fold memo: key carries the EXPANDED conjuncts' full text
  // and the column list (never a hash alone — a collision would serve
  // a different predicate's fold)
  private[rules] val filteredMemo = new graft.core.LruCache[
    (Int, String, Long, String, String),
    Option[(Long, Array[(ExtremeAcc, ExtremeAcc, ExtremeAcc, ExtremeAcc)])]](64)

  private[graft] def invalidateFoldMemo(): Unit = {
    foldMemo.clear()
    countMemo.clear()
    filteredMemo.clear()
  }

  /** One side of the min/max fold. Float/double fold in Spark's total
   * order (-Inf < finite < +Inf < NaN): the collector records NaN/±Inf
   * as sentinel strings, so a table containing NaN answers max() = NaN
   * exactly like the scan would — folding only the numeric stats would
   * silently return the largest non-NaN instead. Serializable so the
   * sidecar-scale path can run it per executor partition and merge the
   * partials on the driver ([[graft.log.DistributedMetadata.extremePartials]]). */
  private[graft] final class ExtremeAcc(
      isMin: Boolean, floating: Boolean, string: Boolean = false)
      extends Serializable {
    private var acc: Option[BigDecimal] = None
    private var accBool: Option[Boolean] = None
    private var accD: Option[Double] = None
    // strings fold in UTF8String (UTF-8 byte = code-point) order, the
    // order the collector's bounds were computed in — NOT Java String
    // UTF-16 order, which disagrees for non-BMP chars
    private var accS: Option[org.apache.spark.unsafe.types.UTF8String] = None

    def isEmpty: Boolean =
      acc.isEmpty && accBool.isEmpty && accD.isEmpty && accS.isEmpty

    private def foldD(d: Double): Unit = {
      val keep = accD.forall { p =>
        val c = FileStatsPruning.nanCmp(d, p)
        if (isMin) c < 0 else c > 0
      }
      if (keep) accD = Some(d)
    }

    /** Fold one file's stats value; FALSE = unfoldable shape (caller
     * bails the whole rewrite). */
    def fold(value: Any): Boolean = value match {
      case b: Boolean =>
        accBool = Some(accBool.fold(b)(p => if (isMin) p && b else p || b))
        true
      case bd: BigDecimal =>
        if (floating) foldD(bd.toDouble)
        else acc = Some(acc.fold(bd)(p => if (isMin) p.min(bd) else p.max(bd)))
        true
      case s: String if floating =>
        // collector's non-finite sentinels, decoded by the single
        // shared definition
        FileStatsPruning.nonFinite(s) match {
          case Some(d) => foldD(d); true
          case None => false
        }
      case s: String if string =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        val keep = accS.forall { p =>
          val c = u.compareTo(p)
          if (isMin) c < 0 else c > 0
        }
        if (keep) accS = Some(u)
        true
      case _ => false // unexpected shape for the column's type
    }

    /** Fold another accumulator of the SAME (isMin, kind) in — the
     * driver-side merge of executor partials. */
    def mergeFrom(o: ExtremeAcc): Unit = {
      o.accBool.foreach(b =>
        accBool = Some(accBool.fold(b)(p => if (isMin) p && b else p || b)))
      o.accD.foreach(foldD)
      o.accS.foreach { u =>
        val keep = accS.forall { p =>
          val c = u.compareTo(p)
          if (isMin) c < 0 else c > 0
        }
        if (keep) accS = Some(u)
      }
      o.acc.foreach(bd =>
        acc = Some(acc.fold(bd)(p => if (isMin) p.min(bd) else p.max(bd))))
    }

    /** TRUE iff this (witness) extreme is at least as extreme as
     * `bound` — i.e. no row hidden behind `bound`'s stats can beat it.
     * Both sides are the same column, so exactly one accumulator kind
     * is populated on each. */
    def dominates(bound: ExtremeAcc): Boolean = {
      def cmpOk(c: Int): Boolean = if (isMin) c <= 0 else c >= 0
      (accBool, bound.accBool) match {
        case (Some(w), Some(b)) =>
          return cmpOk(java.lang.Boolean.compare(w, b))
        case _ =>
      }
      (accD, bound.accD) match {
        case (Some(w), Some(b)) => return cmpOk(FileStatsPruning.nanCmp(w, b))
        case _ =>
      }
      (accS, bound.accS) match {
        case (Some(w), Some(b)) => return cmpOk(w.compareTo(b))
        case _ =>
      }
      (acc, bound.acc) match {
        case (Some(w), Some(b)) => cmpOk(w.compare(b))
        case _ => false // mixed shapes between files: don't guess
      }
    }

    def result(dt: DataType): Any = dt match {
      case BooleanType => accBool.orNull
      case FloatType => accD.map[Any](_.toFloat).orNull
      case DoubleType => accD.map[Any](d => d).orNull
      case _: StringType => accS.orNull // UTF8String IS the internal value
      case _ =>
        // map[Any]: without the ascription Scala unifies the numeric
        // arms by WEAK CONFORMANCE — every branch silently widens to
        // Double, putting a boxed Double in a Long column's row slot
        acc.map[Any] { bd =>
          dt match {
            case ByteType => bd.toByteExact
            case ShortType => bd.toShortExact
            case IntegerType | DateType => bd.toIntExact
            case LongType | TimestampType | TimestampNTZType => bd.toLongExact
          }
        }.orNull
    }
  }

  /** Fold ONE file's stats contribution for `column` into the
   * witness/bound accumulators (the single definition the driver loop
   * and the executor partials both run): an unmasked file with an
   * exact side contributes a WITNESS (its extreme is achieved by a
   * live row); a dv-masked file or a truncated (inexact) side
   * contributes only a BOUND. All-null files contribute nothing.
   * FALSE = undecidable (missing stats / nulls entry / column value,
   * or an unfoldable shape) — the caller bails the whole rewrite. */
  private[graft] def foldFileExtreme(
      statsJson: Option[String],
      elementCount: Long,
      dvCard: Long,
      column: String,
      isMin: Boolean,
      witness: ExtremeAcc,
      bound: ExtremeAcc): Boolean = {
    if (elementCount <= 0L || dvCard >= elementCount) return true // no live rows
    val stats = statsJson.flatMap(FileStatsPruning.parse).getOrElse(return false)
    foldFileExtreme(stats, dvCard, column, isMin, witness, bound)
  }

  /** [[foldFileExtreme]] over ALREADY-PARSED stats — the filtered fold
   * parses each file once and folds 2×|cols| extremes through this
   * overload instead of re-probing the parse cache per column on the
   * sidecar-scale hot loop. Caller guarantees the file has live rows. */
  private[graft] def foldFileExtreme(
      stats: FileStatsPruning.Stats,
      dvCard: Long,
      column: String,
      isMin: Boolean,
      witness: ExtremeAcc,
      bound: ExtremeAcc): Boolean = {
    val nulls = stats.nulls.getOrElse(column, return false)
    if (nulls >= stats.numRecords) return true // all-null: contributes nothing
    val side = if (isMin) stats.mins else stats.maxs
    val v = side.getOrElse(column, return false)
    val target =
      if (dvCard == 0L && !stats.isInexact(column, isMin)) witness else bound
    target.fold(v)
  }

  /** Tri-state per-file proof for the FILTERED SKETCH folds
   * (approxQuantile/approxCountDistinct WHERE …), shared by the driver
   * tail loop and the sidecar executor partials: 1 = every physical
   * row matches (the file's whole HLL/KLL state belongs in the fold),
   * 0 = no row matches (the state contributes nothing), -1 =
   * undecidable (missing/stale stats or a straddling predicate — the
   * caller bails the whole fold to the scan). Mirrors
   * [[foldFileFiltered]]'s proof discipline, including the
   * stats-vs-block-count exactness gate. */
  private[graft] def proveFileForFold(
      statsJson: Option[String],
      elementCount: Long,
      provable: Seq[Expression]): Int = {
    if (elementCount <= 0L) return 0
    val stats = statsJson.flatMap(FileStatsPruning.parse).getOrElse(return -1)
    if (stats.numRecords != elementCount) return -1 // stale/odd stats
    val proofs = provable.map(c => FileStatsPruning.proveAll(stats, c))
    if (proofs.exists(_.contains(false))) 0
    else if (proofs.forall(_.contains(true))) 1
    else -1
  }

  /** One file through the FILTERED fold (the single definition the
   * driver tail loop and the executor partials both run): prove the
   * conjunction from stats; FALSE-proved files contribute nothing,
   * TRUE-proved files add their live rows and fold every requested
   * column's extremes through [[foldFileExtreme]]; an undecidable
   * file, stale stats, or a partial overlap returns FALSE (caller
   * bails the whole rewrite to the scan). */
  private[graft] def foldFileFiltered(
      statsJson: Option[String],
      elementCount: Long,
      dvCard: Long,
      provable: Seq[Expression],
      cols: Array[(String, Boolean, Boolean)],
      accs: Array[(ExtremeAcc, ExtremeAcc, ExtremeAcc, ExtremeAcc)],
      addCount: Long => Unit): Boolean = {
    if (elementCount <= 0L) return true
    val stats = statsJson.flatMap(FileStatsPruning.parse).getOrElse(return false)
    if (stats.numRecords != elementCount) return false // stale/odd stats
    val proofs = provable.map(c => FileStatsPruning.proveAll(stats, c))
    if (proofs.exists(_.contains(false))) return true // no row matches: adds 0
    if (!proofs.forall(_.contains(true))) return false // partial overlap
    // proofs hold for every PHYSICAL row, hence for every live one
    addCount(elementCount - dvCard)
    if (dvCard >= elementCount) return true // fully-masked: extremes skip
    var i = 0
    while (i < cols.length) {
      val (name, _, _) = cols(i)
      val (minW, minB, maxW, maxB) = accs(i)
      if (!foldFileExtreme(stats, dvCard, name,
        isMin = true, minW, minB)) return false
      if (!foldFileExtreme(stats, dvCard, name,
        isMin = false, maxW, maxB)) return false
      i += 1
    }
    true
  }

  private[graft] type Quad = (ExtremeAcc, ExtremeAcc, ExtremeAcc, ExtremeAcc)

  /** One (minWitness, minBound, maxWitness, maxBound) per requested
   * column — the executor partial and driver merge shape. */
  private[graft] def freshQuads(cols: Array[(String, Boolean, Boolean)]): Array[Quad] =
    cols.map { case (_, floating, string) =>
      (new ExtremeAcc(isMin = true, floating, string),
        new ExtremeAcc(isMin = true, floating, string),
        new ExtremeAcc(isMin = false, floating, string),
        new ExtremeAcc(isMin = false, floating, string))
    }

  private[graft] def mergeQuads(into: Array[Quad], from: Array[Quad]): Unit = {
    var i = 0
    while (i < into.length) {
      into(i)._1.mergeFrom(from(i)._1); into(i)._2.mergeFrom(from(i)._2)
      into(i)._3.mergeFrom(from(i)._3); into(i)._4.mergeFrom(from(i)._4)
      i += 1
    }
  }

  /** The witness/bound dominance resolution shared by every fold site:
   * no bounds → the witness is the answer (null for empty/all-null);
   * only bounds → can't prove; otherwise the witness answers iff it
   * dominates every bound. */
  private[rules] def resolveExtreme(
      witness: ExtremeAcc, bound: ExtremeAcc, dt: DataType): Option[Any] =
    if (bound.isEmpty) Some(witness.result(dt))
    else if (witness.isEmpty) None
    else if (witness.dominates(bound)) Some(witness.result(dt))
    else None

  /** Types whose stats JSON round-trip is exact (see
   * FileStatsCollector: long family as decimal text, float widened to
   * double losslessly, doubles printed round-trippably, valid-UTF-8
   * strings escaped losslessly — the collector drops bounds for
   * invalid UTF-8, whose String round-trip is not order-preserving). */
  def exactStatsType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
        BooleanType | DateType | TimestampType | TimestampNTZType => true
    // collated strings order by their collator, NOT UTF8 byte order —
    // a binary-folded min('B','a') under UTF8_LCASE would answer 'B'
    // where the scan answers 'a'; only binary-ordered strings fold
    case st: StringType => st == StringType // default UTF8_BINARY only
    case _ => false
  }
}
