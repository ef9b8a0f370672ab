package graft.log

import graft.core.model._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import java.nio.charset.StandardCharsets

/** Row shape of the parquet file-checkpoint sidecar. Plain types only so
 * the Dataset encoder is product-derived and the sidecar stays readable
 * by any parquet reader. A row with `size < 0` is a TOMBSTONE (the path
 * was removed since the parent sidecar); real files always have size ≥ 0. */
final case class CheckpointBlockRow(
    cube: String,
    minWeight: Int,
    maxWeight: Int,
    elementCount: Long)

final case class CheckpointFileRow(
    path: String,
    size: Long,
    modificationTime: Long,
    revisionId: Long,
    blocks: Seq[CheckpointBlockRow],
    stats: Option[String]) {

  def toIndexFile(dimensionsOf: Long => Int): IndexFile = {
    val dims = math.max(dimensionsOf(revisionId), 1)
    IndexFile(path, size, modificationTime, revisionId,
      blocks.iterator.map(b => Block(CubeId.fromString(dims, b.cube),
        Weight(b.minWeight), Weight(b.maxWeight), b.elementCount)).toVector,
      stats)
  }

}

/** `_summary.json` of one sidecar layer. `numFiles`/`totalBytes` are the
 * CONSOLIDATED table totals at this version (not the layer's row count),
 * so `sizeInBytes` estimates never need to walk the chain. `parent` < 0
 * marks a full (self-contained) layer; otherwise the layer holds only
 * the delta — adds plus tombstones — against the sidecar at `parent`. */
final case class SidecarSummary(
    numFiles: Long,
    totalBytes: Long,
    parent: Long,
    depth: Int)

/**
 * Parquet sidecar of the consolidated JSON checkpoint: the live file set
 * at one log version as a columnar table under
 * `_qbeast_log/<v>.checkpoint.parquet/`.
 *
 * This is the metadata-scale path the reference gets from Delta's
 * parquet checkpoints + `Dataset[AddFile]` (reference:
 * `core/.../query/QueryExecutor.scala:44-93` prunes a Dataset of index
 * files with a Spark job). With it, a reader never has to materialize
 * the full file list on the driver: block-level pruning runs as a Spark
 * job over the sidecar and only the *selected* files come back — O(query
 * selectivity), not O(table files), of driver memory.
 *
 * Sidecars are INCREMENTAL (the Delta multi-part-checkpoint idea turned
 * into a parent chain): when the previous sidecar is the snapshot's own
 * replay base, the new layer holds only the commit tail's adds and
 * tombstones — O(tail) write cost instead of rewriting the full file
 * list. Chains are bounded: depth past `MaxChainDepth` (or an oversized
 * delta) triggers a full compacting layer. `read` resolves the chain
 * with per-layer path masks (newest layer wins, tombstones drop) —
 * delta layers are tail-sized, so the masks are small broadcast sets
 * and no shuffle is introduced.
 *
 * Write protocol: build under a hidden temp dir, then rename into place;
 * the rename loser (or any IO failure) deletes its temp and moves on —
 * the sidecar is a pure read-side optimization, exactly like the JSON
 * checkpoint, and its content at a given version is deterministic. A
 * `_summary.json` inside the directory backs `sizeInBytes` estimates
 * without a Spark job; its presence also marks the sidecar complete
 * (written last).
 */
object FileCheckpoint {

  /** A delta layer whose chain would grow past this is written full. */
  val MaxChainDepth = 4

  /** A delta bigger than this fraction of the table is written full —
   * past that point rewriting is cheaper than chain resolution. */
  val MaxDeltaFraction = 0.2

  private def sidecarDir(tablePath: String, v: Long): Path =
    new Path(QbeastLog.logDir(tablePath), f"$v%020d.checkpoint.parquet")

  private def summaryFile(dir: Path): Path = new Path(dir, "_summary.json")

  /** A sidecar is usable once its summary marker exists. */
  def exists(tablePath: String, conf: Configuration, v: Long): Boolean = {
    val dir = sidecarDir(tablePath, v)
    val fs = dir.getFileSystem(conf)
    fs.exists(summaryFile(dir))
  }

  /** numFiles and totalBytes recorded at write time (consolidated). */
  def summary(tablePath: String, conf: Configuration, v: Long): Option[(Long, Long)] =
    readSummary(tablePath, conf, v).map(s => (s.numFiles, s.totalBytes))

  private def readSummary(
      tablePath: String,
      conf: Configuration,
      v: Long): Option[SidecarSummary] = {
    val dir = sidecarDir(tablePath, v)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(summaryFile(dir))) return None
    val in = fs.open(summaryFile(dir))
    try {
      // read to EOF: available() is only an estimate on HDFS/object stores
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(buf.toString(StandardCharsets.UTF_8.name()))
      Some(SidecarSummary(
        root.get("numFiles").asLong(),
        root.get("totalBytes").asLong(),
        // absent on layers written before incremental sidecars: full
        Option(root.get("parent")).map(_.asLong()).getOrElse(-1L),
        Option(root.get("depth")).map(_.asInt()).getOrElse(0)))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  /** Newest sidecar version on disk (regardless of JSON checkpoints). */
  private def latestSidecarVersion(
      tablePath: String,
      conf: Configuration): Option[Long] = {
    val dir = QbeastLog.logDir(tablePath)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .filter(_.endsWith(".checkpoint.parquet"))
      .map(_.stripSuffix(".checkpoint.parquet"))
      .filter(_.forall(_.isDigit))
      .map(_.toLong)
      .filter(v => exists(tablePath, conf, v))
      .maxOption
  }

  /** The ancestor chain of sidecar `v`, newest first, ending at a full
   * layer. Empty when `v` has no usable summary. */
  private def chainOf(
      tablePath: String,
      conf: Configuration,
      v: Long): Seq[(Long, SidecarSummary)] = {
    val out = Seq.newBuilder[(Long, SidecarSummary)]
    var cur = v
    var guard = 0
    while (cur >= 0 && guard <= MaxChainDepth + 1) {
      readSummary(tablePath, conf, cur) match {
        case None => return if (cur == v) Nil else out.result() // broken chain tail
        case Some(s) =>
          out += cur -> s
          cur = s.parent
      }
      guard += 1
    }
    out.result()
  }

  /** Versions that must survive a vacuum keeping sidecar `keepFrom`:
   * itself plus every ancestor its chain resolves through. */
  private def liveChainVersions(
      tablePath: String,
      conf: Configuration,
      keepFrom: Long): Set[Long] =
    chainOf(tablePath, conf, keepFrom).map(_._1).toSet

  /** Write the sidecar for `snap` (which must carry the full file list).
   * Incremental when the previous sidecar is exactly the snapshot's own
   * replay base — then the layer is the commit tail's delta, O(tail)
   * rows. Best-effort: any failure or lost race leaves the log untouched. */
  def write(spark: SparkSession, snap: QbeastSnapshot): Unit = {
    require(snap.filesComplete, "sidecar write needs a complete snapshot")
    val conf = spark.sparkContext.hadoopConfiguration
    val target = sidecarDir(snap.tablePath, snap.version)
    val fs = target.getFileSystem(conf)
    try {
      if (fs.exists(target)) return
      val parent = latestSidecarVersion(snap.tablePath, conf)
        .filter(pv => pv == snap.checkpointVersion && pv < snap.version)
      val parentSummary = parent.flatMap(pv => readSummary(snap.tablePath, conf, pv))
      val touched = snap.tailTouchedPaths
      val asDelta = parentSummary.exists { ps =>
        ps.depth < MaxChainDepth &&
          touched.size <= math.max(1000L, (snap.files.size * MaxDeltaFraction).toLong)
      }
      val rows: Seq[CheckpointFileRow] =
        if (asDelta) {
          val adds = snap.files.filter(f => touched.contains(f.path))
          val tombstones = (touched -- adds.iterator.map(_.path)).iterator
            .map(p => CheckpointFileRow(p, -1L, 0L, -1L, Nil, None))
          adds.map(toRow) ++ tombstones
        } else snap.files.map(toRow)
      val summaryJson = {
        val p = if (asDelta) parent.get else -1L
        val d = if (asDelta) parentSummary.get.depth + 1 else 0
        s"""{"numFiles":${snap.files.size},"totalBytes":${snap.totalBytes},""" +
          s""""parent":$p,"depth":$d}"""
      }
      val tmp = new Path(target.getParent,
        s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
      import spark.implicits._
      // parallelize first: encoding a LocalTableScan of millions of
      // nested rows would run single-threaded on the driver
      val slices = math.max(8, rows.size / 100000).min(256)
      spark.createDataset(spark.sparkContext.parallelize(rows, slices))
        .write.mode("overwrite").parquet(tmp.toString)
      val out = fs.create(summaryFile(tmp), true)
      try out.write(summaryJson.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, target)) fs.delete(tmp, true)
    } catch {
      case scala.util.control.NonFatal(_) =>
    }
  }

  private def toRow(f: IndexFile): CheckpointFileRow =
    CheckpointFileRow(f.path, f.size, f.modificationTime, f.revisionId,
      f.blocks.map(b => CheckpointBlockRow(b.cube.toString, b.minWeight.value,
        b.maxWeight.value, b.elementCount)),
      f.stats)

  /** The consolidated live file set at sidecar version `v` as a DataFrame
   * (schema = [[CheckpointFileRow]]). Resolves the delta chain: a path's
   * newest layer wins, tombstones drop. Delta layers are tail-sized, so
   * per-layer masks ride a broadcast closure — no shuffle, and parquet
   * predicate pushdown / column pruning still apply to each layer scan. */
  def read(spark: SparkSession, tablePath: String, v: Long): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val chain = chainOf(tablePath, conf, v)
    def layer(lv: Long): DataFrame =
      spark.read.parquet(sidecarDir(tablePath, lv).toString)
    if (chain.size <= 1) return layer(v)
    // newest-first: mask every path already decided by a newer layer
    var decided = Set.empty[String]
    var out: DataFrame = null
    chain.foreach { case (lv, summary) =>
      val isFullBase = summary.parent < 0
      // the decided-path mask is O(tail): isInCollection compiles it to
      // a codegen'd InSet probe (no UDF, no broadcast bookkeeping)
      val base = layer(lv).filter(col("size") >= 0L)
      val live =
        if (decided.isEmpty) base
        else base.filter(!col("path").isInCollection(decided))
      out = if (out == null) live else out.unionAll(live)
      if (!isFullBase) {
        // delta layers are O(tail): collecting their paths is cheap
        decided = decided ++ layer(lv).select("path")
          .collect().iterator.map(_.getString(0))
      }
    }
    out
  }

  /** Drop sidecars older than the newest one (vacuum housekeeping),
   * keeping every ancestor the newest chain still resolves through. */
  def pruneOld(fs: FileSystem, tablePath: String, keepFrom: Long, conf: Configuration): Unit = {
    val dir = QbeastLog.logDir(tablePath)
    if (!fs.exists(dir)) return
    val keep = liveChainVersions(tablePath, conf, keepFrom) + keepFrom
    fs.listStatus(dir).foreach { s =>
      val n = s.getPath.getName
      if (n.endsWith(".checkpoint.parquet")) {
        val v = n.stripSuffix(".checkpoint.parquet")
        if (v.forall(_.isDigit) && v.toLong < keepFrom && !keep.contains(v.toLong))
          fs.delete(s.getPath, true)
      }
    }
  }

}
