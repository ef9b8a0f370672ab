package graft.table

import graft.core.model._
import graft.log._
import graft.write.QbeastWriter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * User-facing table facade (reference: `src/.../table/QbeastTable.scala`
 * + `IndexedTable.optimize` + `ConvertToQbeastCommand`): revision
 * introspection, index metrics, optimize (indexed + staging), convert.
 */
class QbeastTable private (spark: SparkSession, tablePath: String) {

  private def conf = spark.sparkContext.hadoopConfiguration

  def snapshot: QbeastSnapshot = QbeastLog.snapshot(tablePath, conf)

  def revisionIDs: Seq[Long] = snapshot.revisions.keys.toSeq.sorted

  def latestRevisionID: Long = snapshot.lastRevisionID

  def indexedColumns(revisionID: Long = -1L): Seq[String] = {
    val s = snapshot
    val rid = if (revisionID < 0) s.lastRevisionID else revisionID
    s.revisions.get(rid).map(_.columnNames).getOrElse(Nil)
  }

  /** Table configuration as persisted in the log (includes properties
   * set via ALTER TABLE ... SET TBLPROPERTIES in either catalog mode). */
  def properties: Map[String, String] = snapshot.configuration

  def cubeSize(revisionID: Long = -1L): Int = {
    val s = snapshot
    val rid = if (revisionID < 0) s.lastRevisionID else revisionID
    s.revisions.get(rid).map(_.desiredCubeSize).getOrElse(0)
  }

  /**
   * Rewrite the files of `revisionID` whose minimum weight fraction is ≤
   * `fraction` (the sampling-hot head of the table), re-assigning rows
   * against the *frozen* cube weights so the index shape is preserved
   * while files get repacked (reference: `IndexedTable.scala:439-460`).
   */
  def optimize(revisionID: Long = -1L, fraction: Double = 1.0): Unit = {
    val s = snapshot
    val rid = if (revisionID < 0) s.lastRevisionID else revisionID
    if (rid == Revision.StagingID) { optimizeUnindexed(); return }
    val revision = s.revisions.getOrElse(rid, return)
    val candidates = s.filesOfRevision(rid)
      .filter(f => f.minWeight.fraction <= fraction)
    if (candidates.isEmpty) return

    val status = s.indexStatus(rid)
    val frozen = status.cubeStatuses.map { case (c, st) => c -> st.maxWeight }.toMap
    val paths = candidates.map(f => new Path(tablePath, f.path).toString)
    val data = spark.read.parquet(paths: _*)
    val numElements = candidates.map(_.elementCount).sum

    val newFiles = QbeastWriter.index(spark, tablePath, data, revision,
      Some(status), numElements, frozenWeights = Some(frozen))

    commitRewrite(s, newFiles, candidates)
  }

  /**
   * Collapse all earlier revisions into the latest one: their data is
   * re-indexed against the latest revision's (superset, by the
   * supersede/merge rules) space and committed as a layout-only rewrite.
   * After compaction every query plans against one revision — appends
   * that bumped the revision no longer cost a per-revision metadata walk
   * or split the sampling strata across index generations.
   */
  def compactRevisions(): Unit = {
    val s = snapshot
    val latest = s.lastRevision.filterNot(_.isStaging).getOrElse(return)
    val oldIds = s.revisions.keySet
      .filter(id => id != latest.revisionID && id != Revision.StagingID)
    val candidates = s.files.filter(f => oldIds.contains(f.revisionId))
    if (candidates.isEmpty) return

    val paths = candidates.map(f => new Path(tablePath, f.path).toString)
    val data = spark.read.parquet(paths: _*)
    val numElements = candidates.map(_.elementCount).sum
    val status = s.indexStatus(latest.revisionID)
    val newFiles = QbeastWriter.index(spark, tablePath, data, latest,
      Some(status), numElements)
    commitRewrite(s, newFiles, candidates)
  }

  /** Index the staging (revision-0) files into the latest revision
   * (reference: `IndexedTable.optimizeUnindexedFiles`). */
  def optimizeUnindexed(): Unit = {
    val s = snapshot
    val staging = s.unindexedFiles
    if (staging.isEmpty) return
    val revision = s.lastRevision.filterNot(_.isStaging).getOrElse(
      throw new IllegalStateException(
        "no indexed revision to optimize staging files into; append indexed data first"))
    val paths = staging.map(f => new Path(tablePath, f.path).toString)
    val data = spark.read.parquet(paths: _*)
    val numElements = data.count()
    val status = s.indexStatus(revision.revisionID)
    val newFiles = QbeastWriter.index(spark, tablePath, data, revision,
      Some(status), numElements)
    commitRewrite(s, newFiles, staging)
  }

  private def commitRewrite(
      s: QbeastSnapshot,
      adds: Seq[IndexFile],
      removes: Seq[IndexFile]): Unit = {
    val now = System.currentTimeMillis()
    val actions =
      adds.map(f => AddFileAction(f, dataChange = false)) ++
        removes.map(f => RemoveFileAction(RemoveFile(f.path, now)))
    var attempt = 0
    var base = s
    while (attempt >= 0) {
      try {
        QbeastLog.commit(tablePath, conf, base.version, actions)
        attempt = -1
      } catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > 3) throw e
          base = QbeastLog.snapshot(tablePath, conf)
          // Rebase safety: if a concurrent operation (another optimize,
          // an overwrite) already removed any file we are rewriting,
          // blindly re-committing would duplicate its rows (our adds
          // land, the duplicate remove replays as a no-op) or resurrect
          // overwritten data. Abort instead — the rewrite is purely a
          // layout change, so dropping it is always safe; our orphaned
          // parquet files are reclaimed by vacuum.
          val live = base.files.map(_.path).toSet
          if (!removes.forall(f => live.contains(f.path))) return
      }
    }
  }

  /** Per-depth tree statistics (reference: IndexMetrics SizeStats per
   * level): cube/block/element counts, cube-size spread and the mean
   * max-weight fraction, which shows how the sampling thresholds
   * deepen. */
  def depthMetrics(revisionID: Long = -1L): Seq[DepthStats] = {
    val s = snapshot
    val rid = if (revisionID < 0) s.lastRevisionID else revisionID
    val statuses = s.indexStatus(rid).cubeStatuses.values.toSeq
    val blocksByDepth = s.filesOfRevision(rid).flatMap(_.blocks)
      .groupBy(_.cube.depth).view.mapValues(_.size).toMap
    statuses.groupBy(_.cubeId.depth).toSeq.sortBy(_._1).map { case (depth, cubes) =>
      val counts = cubes.map(_.elementCount)
      DepthStats(
        depth = depth,
        cubeCount = cubes.size,
        blockCount = blocksByDepth.getOrElse(depth, 0),
        elementCount = counts.sum,
        minCubeElementCount = counts.min,
        maxCubeElementCount = counts.max,
        avgMaxWeightFraction =
          cubes.map(_.maxWeight.fraction).sum / cubes.size)
    }
  }

  /** Delete data files that are no longer referenced by the log (orphans
   * from lost commit races, removed files from overwrite/optimize).
   * Keeps anything newer than `retainMillis` so files a concurrent
   * writer created but has not committed yet survive (default 7 days,
   * like Delta). Retentions below [[QbeastTable.MinRetentionMillis]]
   * require `force = true` — a zero-retention vacuum racing an
   * in-flight writer silently loses that writer's data. */
  def vacuum(
      retainMillis: Long = QbeastTable.DefaultRetentionMillis,
      force: Boolean = false): Int = {
    require(retainMillis >= QbeastTable.MinRetentionMillis || force,
      s"retainMillis=$retainMillis is below the safe minimum " +
        s"${QbeastTable.MinRetentionMillis}; pass force=true to override")
    val s = snapshot
    val live = s.files.map(_.path).toSet
    val dir = new Path(tablePath)
    val fs = dir.getFileSystem(conf)
    val cutoff = System.currentTimeMillis() - retainMillis
    var deleted = 0
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") && !live.contains(name) &&
        st.getModificationTime < cutoff) {
        if (fs.delete(st.getPath, false)) deleted += 1
      }
    }
    deleted
  }

  /** Structural metrics of one revision's index (reference:
   * `core/.../spark/utils/IndexMetrics.scala:26-137` — height, fanout,
   * balance, inner/leaf cube size stats, block/file stats). */
  def indexMetrics(revisionID: Long = -1L): IndexMetrics = {
    val s = snapshot
    val rid = if (revisionID < 0) s.lastRevisionID else revisionID
    val status = s.indexStatus(rid)
    val files = s.filesOfRevision(rid)
    val cubes = status.cubeStatuses
    val counts = cubes.values.map(_.elementCount)
    val cubeSet = cubes.keySet
    // inner = has at least one materialized child; leaf = none
    val (inner, leaf) = cubes.keys.partition(c => c.children.exists(cubeSet.contains))
    def stats(cs: Iterable[CubeId]): CubeSizeStats = {
      // iterator: mapping a key SET through elementCount would dedup ties
      val sizes = cs.iterator.map(c => cubes(c).elementCount).toSeq
      if (sizes.isEmpty) CubeSizeStats(0, 0L, 0L, 0L)
      else CubeSizeStats(sizes.size, sizes.min, sizes.sum / sizes.size, sizes.max)
    }
    val height = if (cubes.isEmpty) 0 else cubes.keys.map(_.depth).max + 1
    // average materialized children per inner cube (reference avgFanout)
    val avgFanout =
      if (inner.isEmpty) 0.0
      else inner.iterator.map(c => c.children.count(cubeSet.contains)).sum.toDouble / inner.size
    // reference depthOnBalance: observed height vs the height a perfectly
    // balanced tree of this fanout would need for the same element count
    val balancedHeight =
      if (counts.sum <= 0 || avgFanout <= 1.0) 1.0
      else 1 + math.log(math.max(1.0,
        counts.sum.toDouble / status.revision.desiredCubeSize)) / math.log(avgFanout)
    IndexMetrics(
      revisionID = rid,
      elementCount = counts.sum,
      dimensionCount = status.revision.dimensionCount,
      desiredCubeSize = status.revision.desiredCubeSize,
      height = height,
      avgFanout = avgFanout,
      depthOnBalance = if (height == 0) 0.0 else height / balancedHeight,
      cubeCount = cubes.size,
      blockCount = files.map(_.blocks.size).sum,
      fileCount = files.size,
      bytes = files.map(_.size).sum,
      avgCubeElementCount = if (cubes.isEmpty) 0L else counts.sum / cubes.size,
      maxCubeElementCount = if (cubes.isEmpty) 0L else counts.max,
      innerCubeStats = stats(inner),
      leafCubeStats = stats(leaf))
  }

}

final case class DepthStats(
    depth: Int,
    cubeCount: Int,
    blockCount: Int,
    elementCount: Long,
    minCubeElementCount: Long,
    maxCubeElementCount: Long,
    avgMaxWeightFraction: Double)

/** min/avg/max element counts over a class of cubes. */
final case class CubeSizeStats(
    cubeCount: Int,
    minElementCount: Long,
    avgElementCount: Long,
    maxElementCount: Long)

final case class IndexMetrics(
    revisionID: Long,
    elementCount: Long,
    dimensionCount: Int,
    desiredCubeSize: Int,
    height: Int,
    avgFanout: Double,
    depthOnBalance: Double,
    cubeCount: Int,
    blockCount: Int,
    fileCount: Int,
    bytes: Long,
    avgCubeElementCount: Long,
    maxCubeElementCount: Long,
    innerCubeStats: CubeSizeStats,
    leafCubeStats: CubeSizeStats)

object QbeastTable {

  /** Default vacuum retention (7 days, mirroring Delta's default). */
  val DefaultRetentionMillis: Long = 7L * 24 * 60 * 60 * 1000

  /** Below this retention `vacuum` demands an explicit `force`. */
  val MinRetentionMillis: Long = 60L * 60 * 1000

  def forPath(spark: SparkSession, tablePath: String): QbeastTable =
    new QbeastTable(spark, tablePath)

  /**
   * Metadata-only adoption of a plain parquet directory (reference:
   * `ConvertToQbeastCommand`): registers existing files as the staging
   * revision 0 — no data rewrite; one count job records per-file element
   * counts for the metrics/rollup paths.
   */
  def convertFromParquet(spark: SparkSession, path: String): QbeastTable = {
    val conf = spark.sparkContext.hadoopConfiguration
    val existing = QbeastLog.snapshot(path, conf)
    if (!existing.isEmpty) return forPath(spark, path)

    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val statuses = fs.listStatus(dir).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(statuses.nonEmpty, s"no parquet files to convert at $path")

    val df = spark.read.parquet(path)
    val countsByFile = df.groupBy(input_file_name().as("f")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val root = CubeId.root(1)
    val adds = statuses.map { st =>
      val uri = st.getPath.toUri.toString
      val n = countsByFile.find { case (k, _) => k.endsWith(st.getPath.getName) }
        .map(_._2).getOrElse(0L)
      IndexFile(
        path = st.getPath.getName,
        size = st.getLen,
        modificationTime = st.getModificationTime,
        revisionId = Revision.StagingID,
        blocks = Vector(Block(root, Weight.MinValue, Weight.MaxValue, n)))
    }.toSeq

    val actions = Seq(
      MetaDataAction(df.schema.json, Map("qbeast.lastRevisionID" -> "0")),
      RevisionAction(Revision.staging(path))) ++
      adds.map(a => AddFileAction(a, dataChange = false))
    QbeastLog.commit(path, conf, existing.version, actions)
    forPath(spark, path)
  }

}
