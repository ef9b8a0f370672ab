package graft.read

import graft.core.model._
import graft.log.{QbeastLog, QbeastSnapshot}

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Common face of the two qbeast FileIndex flavors (flat driver-side
 * scan vs sidecar-distributed), so plan rewrites ([[graft.rules.SampleRule]],
 * DML target resolution) work over either. */
trait QbeastIndex {
  def currentSnapshot: QbeastSnapshot
}

/**
 * The physical heart of the read path (reference:
 * `core/.../index/DefaultFileIndex.scala` + `QueryExecutor.scala`):
 * Catalyst hands us partition+data filters; we map them to query spaces
 * and weight ranges per revision and return only files whose blocks can
 * contain matching rows. `FileSourceScanExec` consumes the result
 * transparently, so column pruning, parquet row-group pushdown and
 * whole-stage codegen all stay stock Spark.
 *
 * Scale note: selection is a flat driver-side scan over block metadata —
 * the same O(#files) the reference pays in its metadata join, without a
 * Spark job. 100 TB at 1 GB/file ≈ 1e5 files → trivial driver work.
 */
final class QbeastFileIndex(
    spark: SparkSession,
    @volatile private var snapshot: QbeastSnapshot)
    extends FileIndex with QbeastIndex {

  private val tablePath = new Path(snapshot.tablePath)

  override def rootPaths: Seq[Path] = Seq(tablePath)

  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = math.max(snapshot.totalBytes, 1L)

  override def inputFiles: Array[String] =
    snapshot.files.map(f => new Path(tablePath, f.path).toString).toArray

  override def refresh(): Unit = {
    // a time-traveled relation re-pins to its version, never to head
    val old = snapshot
    snapshot = QbeastLog.snapshot(old.tablePath,
      spark.sparkContext.hadoopConfiguration, old.asOf)
  }

  def currentSnapshot: QbeastSnapshot = snapshot

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected = QbeastFileIndex.selectFiles(snapshot, partitionFilters ++ dataFilters)
    val statuses = selected.map { f =>
      new FileStatus(f.size, false, 1, 134217728L, f.modificationTime,
        new Path(tablePath, f.path))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }

}

object QbeastFileIndex {

  /** Pruning specs per revision, derived once from the Catalyst filters.
   * Only revisions whose specs actually constrain something get an
   * entry; files of absent revisions (staging, unknown, all-space specs)
   * are always kept. The value also carries the revision's dimension
   * count so executors can rebuild `CubeId`s from their string form —
   * this map is small (revisions, not files) and serializable, which is
   * what lets [[DistributedQbeastFileIndex]] broadcast it. */
  private[read] def revisionSpecs(
      snapshot: QbeastSnapshot,
      filters: Seq[Expression]): Map[Long, (Int, Seq[QuerySpec])] = {
    val latestColumns = snapshot.lastRevision.map(_.columnNames)
    snapshot.revisions.valuesIterator.filterNot(_.isStaging).flatMap { revision =>
      var specs = new QuerySpecBuilder(revision).build(filters)
      // the sampling hash filter is over the LATEST revision's
      // columns; block weights of a revision indexed on different
      // columns say nothing about it — drop the weight constraint
      // there (space pruning stays valid)
      if (!latestColumns.contains(revision.columnNames)) {
        specs = specs.map(_.copy(weightRange = WeightRange.All))
      }
      if (specs.forall(s => s.weightRange.isAll && s.querySpace == AllSpace)) None
      else Some(revision.revisionID ->
        (math.max(revision.dimensionCount, 1), specs))
    }.toMap
  }

  /** Block-level pruning: a file survives iff any of its blocks may hold
   * a row matching any disjunct. Staging (revision-0) files are always
   * index-candidates (unindexed, root-only data). A second, independent
   * layer then applies the per-file column stats (data skipping on
   * non-indexed columns) to every candidate, staging included. */
  def selectFiles(
      snapshot: QbeastSnapshot,
      filters0: Seq[Expression],
      alreadyPhysical: Boolean = false): Vector[IndexFile] = {
    // logical→physical rename first: revision transformers and per-file
    // stats are keyed by PHYSICAL column names. Renaming is applied
    // EXACTLY once per filter tree (`alreadyPhysical` marks pre-renamed
    // trees from the distributed index) and is additionally idempotent
    // under the ALTER-time no-clash invariant — belt and braces.
    val filters = snapshot.schema match {
      case Some(sc) if filters0.nonEmpty && !alreadyPhysical =>
        graft.core.model.ColumnMapping.toPhysicalExprs(filters0, sc)
      case _ => filters0
    }
    // monotone date-function predicates (year(ts)=…, cast-to-date,
    // trunc/date_trunc) rewrite to equivalent raw-column ranges both
    // layers below understand; idempotent, so re-expanded filters from
    // the distributed index pass through unchanged
    val expanded = if (filters.isEmpty) filters else DerivedPredicates.expand(filters)
    val pruning = revisionSpecs(snapshot, expanded)
    val indexSelected = snapshot.files.filter { f =>
      pruning.get(f.revisionId) match {
        case None => true
        case Some((_, specs)) =>
          f.blocks.exists(b => specs.exists(s => blockMatches(b, s)))
      }
    }
    if (expanded.isEmpty) indexSelected
    else {
      // era gates: a type-widened column's narrow-era min/max (unit
      // change) or bloom filters (hash at the narrow type) must not
      // prune — see TypeWidening. Identity for never-widened tables.
      val gates = snapshot.schema.map(FileStatsPruning.Gates.of)
        .getOrElse(FileStatsPruning.Gates.none)
      indexSelected.filter(f => FileStatsPruning.mayMatch(f.stats, expanded, gates))
    }
  }

  private[read] def blockMatches(block: Block, spec: QuerySpec): Boolean = {
    val wr = spec.weightRange
    val weightOk =
      (block.minWeight.value < wr.to.value || wr.to == Weight.MaxValue) &&
        block.maxWeight.value >= wr.from.value
    weightOk && spec.querySpace.intersectsWith(block.cube)
  }

}
