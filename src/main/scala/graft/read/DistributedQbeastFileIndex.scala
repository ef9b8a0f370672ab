package graft.read

import graft.core.model._
import graft.log.{CheckpointFileRow, FileCheckpoint, QbeastLog, QbeastSnapshot}

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/**
 * Metadata-scale variant of [[QbeastFileIndex]]: block-level pruning runs
 * as a Spark job over the parquet file-checkpoint sidecar instead of a
 * driver-side scan (reference shape: `core/.../query/QueryExecutor.scala:
 * 44-93`, which prunes a `Dataset[IndexFile]` built from Delta's parquet
 * checkpoint).
 *
 * The snapshot here is a LIGHT replay ([[QbeastLog.lightSnapshot]]): the
 * driver holds only schema/config/revisions plus the post-checkpoint
 * commit tail — never the consolidated file list. Executors scan the
 * sidecar, evaluate the same `QuerySpec` block matching against a
 * broadcast of the (tiny) per-revision spec map, and ship back only the
 * surviving `(path, size, modificationTime, stats)` — O(query
 * selectivity) driver memory, where the flat path is O(table files).
 * Per-file column stats pruning then runs on the driver over the
 * survivors only (catalyst `Expression`s stay driver-side; no plan
 * serialization).
 *
 * The post-checkpoint tail (≤ CheckpointInterval commits) is applied
 * exactly as the log replay would: tail adds join the candidate set
 * through the flat matcher; any path the tail touched (re-added or
 * removed) is masked out of the sidecar rows. Unconditional scans
 * (`filters = Nil`) still enumerate everything — Spark's `FileIndex`
 * contract requires the full file list for scan planning, same as any
 * format — but the enumeration is a distributed collect of paths, not a
 * driver JSON replay.
 */
final class DistributedQbeastFileIndex(
    spark: SparkSession,
    @volatile private var snapshot: QbeastSnapshot)
    extends FileIndex with QbeastIndex {

  require(!snapshot.filesComplete,
    "DistributedQbeastFileIndex expects a light snapshot; use QbeastFileIndex otherwise")

  private val tablePath = new Path(snapshot.tablePath)

  // memoized per checkpoint version: the summary is immutable for a
  // given sidecar, and sizeInBytes is consulted during PLANNING —
  // re-reading _summary.json from object storage per plan would add
  // driver round-trips for a constant
  @volatile private var summaryCache: (Long, Option[(Long, Long)]) = (Long.MinValue, None)

  private def summary(snap: QbeastSnapshot): Option[(Long, Long)] = {
    val cached = summaryCache
    if (cached._1 == snap.checkpointVersion) cached._2
    else {
      val fresh = FileCheckpoint.summary(snap.tablePath,
        spark.sparkContext.hadoopConfiguration, snap.checkpointVersion)
      summaryCache = (snap.checkpointVersion, fresh)
      fresh
    }
  }

  /** Degrade to a complete snapshot at the SAME version when the
   * sidecar was vacuumed under this (long-lived or time-traveled)
   * relation; keeps the original asOf so a later refresh() of a head
   * relation still follows head. */
  private def degradeIfSidecarGone(snap0: QbeastSnapshot): QbeastSnapshot = {
    var snap = snap0
    if (!snap.filesComplete && !FileCheckpoint.exists(snap.tablePath,
        spark.sparkContext.hadoopConfiguration, snap.checkpointVersion)) {
      val pinned = snap.asOf
      snap = QbeastLog.snapshot(snap.tablePath,
        spark.sparkContext.hadoopConfiguration, snap.version)
        .copy(asOf = pinned)
      snapshot = snap
    }
    snap
  }

  override def rootPaths: Seq[Path] = Seq(tablePath)

  override def partitionSchema: StructType = StructType(Nil)

  /** Estimate from the checkpoint summary plus tail adds. Removed-by-tail
   * checkpoint bytes are not subtracted (their sizes are unknown without
   * a scan) — a slight over-estimate, conservative for join planning. A
   * MISSING summary (sidecar vacuumed under us) must over-estimate too:
   * under-reporting would make the planner broadcast a huge table. */
  override def sizeInBytes: Long = {
    val snap = snapshot
    if (snap.filesComplete) math.max(snap.totalBytes, 1L)
    else summary(snap) match {
      case Some((_, bytes)) => math.max(bytes + snap.files.map(_.size).sum, 1L)
      case None => Long.MaxValue >> 16
    }
  }

  override def inputFiles: Array[String] = {
    // same vacuumed-sidecar degrade as listFiles — without it a pinned
    // relation crashes here with PATH_NOT_FOUND instead of falling back
    val snap = degradeIfSidecarGone(snapshot)
    if (snap.filesComplete)
      return snap.files.map(f => new Path(tablePath, f.path).toString).toArray
    // checkpointRows already masks tailTouchedPaths on the executors
    val cp = checkpointRows(snap, Nil).map(_.path)
    (cp ++ snap.files.map(_.path))
      .map(p => new Path(tablePath, p).toString).toArray
  }

  override def refresh(): Unit = {
    // re-pin to the same asOf version (never jump a time-traveled
    // relation to head); lightSnapshot degrades to a complete snapshot
    // if the sidecar vanished — listFiles handles either
    val old = snapshot
    snapshot = QbeastLog.lightSnapshot(old.tablePath,
      spark.sparkContext.hadoopConfiguration, old.asOf)
  }

  def currentSnapshot: QbeastSnapshot = snapshot

  /** Distributed index pruning over the sidecar. Returns survivors as
   * slim rows (blocks dropped before collect). When no revision has a
   * constraining spec the `blocks` column is never read at all — parquet
   * column pruning makes the unconditional enumeration a scan of four
   * scalar columns. */
  private def checkpointRows(
      snap: QbeastSnapshot,
      filters: Seq[Expression]): Seq[CheckpointFileRow] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val pruning = QbeastFileIndex.revisionSpecs(snap, filters)
    val touched = snap.tailTouchedPaths
    val touchedB = spark.sparkContext.broadcast(touched)
    val df = FileCheckpoint
      .read(spark, snap.tablePath, snap.checkpointVersion)
    try {
      if (pruning.isEmpty) {
        val slim = df
          .select(col("path"), col("size"), col("modificationTime"),
            col("revisionId"), col("stats"))
          .as[(String, Long, Long, Long, Option[String])]
        slim.mapPartitions { it =>
          val touched = touchedB.value
          it.filter(r => !touched.contains(r._1))
        }.collect().toSeq.map { case (p, size, mtime, rid, stats) =>
          CheckpointFileRow(p, size, mtime, rid, Nil, stats)
        }
      } else {
        val pruningB = spark.sparkContext.broadcast(pruning)
        try {
          df.as[CheckpointFileRow].mapPartitions { it =>
            val pruning = pruningB.value
            val touched = touchedB.value
            it.filter { r =>
              !touched.contains(r.path) && (pruning.get(r.revisionId) match {
                case None => true
                case Some((dims, specs)) =>
                  r.blocks.exists { b =>
                    val block = Block(CubeId.fromString(dims, b.cube),
                      Weight(b.minWeight), Weight(b.maxWeight), b.elementCount)
                    specs.exists(s => QbeastFileIndex.blockMatches(block, s))
                  }
              })
            }.map(r => r.copy(blocks = Nil))
          }.collect().toSeq
        } finally pruningB.destroy()
      }
    } finally touchedB.destroy() // one-shot broadcasts: don't leak per query
  }

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // capture ONCE: a concurrent refresh() must not tear this view
    // across tail, checkpoint version, and touched set
    val snap = degradeIfSidecarGone(snapshot)
    // logical→physical rename first (stats/specs are physical-keyed;
    // idempotent — selectFiles' own rename no-ops on these), then
    // expand monotone date-function predicates once here so the
    // checkpoint-side stats pruning below sees them too (selectFiles
    // re-expands its own input — a no-op on already-expanded trees)
    val renamed = snap.schema match {
      case Some(sc) => graft.core.model.ColumnMapping
        .toPhysicalExprs(partitionFilters ++ dataFilters, sc)
      case None => partitionFilters ++ dataFilters
    }
    val filters = DerivedPredicates.expand(renamed)
    if (snap.filesComplete) {
      val statuses = QbeastFileIndex.selectFiles(snap, filters, alreadyPhysical = true).map { f =>
        new FileStatus(f.size, false, 1, 134217728L, f.modificationTime,
          new Path(tablePath, f.path))
      }.toArray
      return Seq(PartitionDirectory(InternalRow.empty, statuses))
    }
    // tail adds: flat matcher over the (small) post-checkpoint commits
    val tailSelected = QbeastFileIndex
      .selectFiles(snap.copy(filesComplete = true), filters, alreadyPhysical = true)
      .map(f => (f.path, f.size, f.modificationTime))
    // checkpoint bulk: Spark job over the sidecar, then stats pruning on
    // the survivors only
    val cpCandidates = checkpointRows(snap, filters)
    val gates = snap.schema.map(FileStatsPruning.Gates.of)
      .getOrElse(FileStatsPruning.Gates.none)
    val cpSelected = (
      if (filters.isEmpty) cpCandidates
      else cpCandidates.filter(r => FileStatsPruning.mayMatch(r.stats, filters, gates))
    ).map(r => (r.path, r.size, r.modificationTime))
    val statuses = (cpSelected ++ tailSelected).map { case (p, size, mtime) =>
      new FileStatus(size, false, 1, 134217728L, mtime, new Path(tablePath, p))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }

}
