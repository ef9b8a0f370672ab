package graft.rules

import graft.read.{QbeastFileIndex, QbeastIndex, SizedFileIndex}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * Filter-aware scan sizing (the planning half of Delta's
 * PrepareDeltaScan idea): a V1 relation reports its FULL table bytes to
 * the join planner, so a qbeast scan the file index will prune to a
 * sliver at execution still looks like the whole table at planning —
 * and a join against it sort-merges instead of broadcasting. This rule
 * runs the SAME file selection the index performs at execution
 * ([[QbeastFileIndex.selectFiles]]: OTree block pruning + sampling
 * weight ranges + per-file stats/bloom skipping) against a Filter's
 * condition and, when files drop out, re-wraps the relation's location
 * in a [[SizedFileIndex]] that reports the pruned byte count. Catalyst
 * then plans a BroadcastHashJoin for any pruned-or-sampled slice under
 * the broadcast threshold — at 100 TB, the difference between
 * shuffling the fact table and shipping a few megabytes.
 *
 * Sampled scans benefit too: [[SampleRule]] rewrites `.sample(f)` into
 * the weight-range filter this rule sizes, so `dim.sample(0.01)` joins
 * broadcast without a hint.
 *
 * Strictly planning-side: execution still calls the UNDERLYING index's
 * listFiles with the engine-pushed filters, so results are unaffected
 * even if the estimate were off. Conservative shape: one Filter
 * directly over one flat-index relation, no subqueries (the
 * distributed sidecar index only engages above the flat path's 200k
 * file crossover, where a planning-time selection pass would cost a
 * Spark job — those scans keep the total-size estimate).
 */
class ScanSizeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Memoized pruned-size results keyed by (table, snapshot version,
   * canonicalized condition): the optimizer's fixed-point batches (and
   * a double-registered rule in `ensureExtensions` sessions) re-run
   * apply() several times per query; the unselective no-rewrite case
   * would otherwise pay the O(#files) stats pass on every iteration.
   * Bounded: mints one entry per distinct (version, filter). */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Int), Long]()

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f @ Filter(cond, l @ LogicalRelation(
          hfs @ HadoopFsRelation(fi: QbeastFileIndex, _, _, _, _, _), _, _, _, _))
        if cond.find(_.isInstanceOf[PlanExpression[_]]).isEmpty =>
      val snapshot = fi.currentSnapshot
      val total = snapshot.totalBytes
      val key = (snapshot.tablePath, snapshot.version, cond.semanticHash())
      val pruned = memo.computeIfAbsent(key, { _ =>
        if (memo.size() > 1024) memo.clear()
        QbeastFileIndex.selectFiles(snapshot, splitConjuncts(cond)).map(_.size).sum
      })
      if (pruned < total) {
        val sized = new SizedFileIndex(fi, math.max(pruned, 1L))
        Filter(cond, l.copy(relation = hfs.copy(location = sized)(hfs.sparkSession)))
      } else f
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

}
