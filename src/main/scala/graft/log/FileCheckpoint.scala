package graft.log

import graft.core.model._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Row shape of the parquet file-checkpoint sidecar. Plain types only so
 * the Dataset encoder is product-derived and the sidecar stays readable
 * by any parquet reader. */
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
 * Write protocol: build under a hidden temp dir, then rename into place;
 * the rename loser (or any IO failure) deletes its temp and moves on —
 * the sidecar is a pure read-side optimization, exactly like the JSON
 * checkpoint, and its content at a given version is deterministic. A
 * `_summary.json` ({numFiles, totalBytes}) inside the directory backs
 * `sizeInBytes` estimates without a Spark job; its presence also marks
 * the sidecar complete (written last).
 */
object FileCheckpoint {

  private def sidecarDir(tablePath: String, v: Long): Path =
    new Path(QbeastLog.logDir(tablePath), f"$v%020d.checkpoint.parquet")

  private def summaryFile(dir: Path): Path = new Path(dir, "_summary.json")

  /** A sidecar is usable once its summary marker exists. */
  def exists(tablePath: String, conf: Configuration, v: Long): Boolean = {
    val dir = sidecarDir(tablePath, v)
    val fs = dir.getFileSystem(conf)
    fs.exists(summaryFile(dir))
  }

  /** numFiles and totalBytes recorded at write time. */
  def summary(tablePath: String, conf: Configuration, v: Long): Option[(Long, Long)] = {
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
      Some((root.get("numFiles").asLong(), root.get("totalBytes").asLong()))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  /** Write the sidecar for `snap` (which must carry the full file list).
   * Best-effort: any failure or lost race leaves the log untouched. */
  def write(spark: SparkSession, snap: QbeastSnapshot): Unit = {
    val target = sidecarDir(snap.tablePath, snap.version)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      if (fs.exists(target)) return
      val tmp = new Path(target.getParent,
        s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
      import spark.implicits._
      val rows = snap.files.map { f =>
        CheckpointFileRow(f.path, f.size, f.modificationTime, f.revisionId,
          f.blocks.map(b => CheckpointBlockRow(b.cube.toString, b.minWeight.value,
            b.maxWeight.value, b.elementCount)),
          f.stats)
      }
      // parallelize first: encoding a LocalTableScan of millions of
      // nested rows would run single-threaded on the driver
      val slices = math.max(8, rows.size / 100000).min(256)
      spark.createDataset(spark.sparkContext.parallelize(rows, slices))
        .write.mode("overwrite").parquet(tmp.toString)
      val summary =
        s"""{"numFiles":${snap.files.size},"totalBytes":${snap.totalBytes}}"""
      val out = fs.create(summaryFile(tmp), true)
      try out.write(summary.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, target)) fs.delete(tmp, true)
    } catch {
      case scala.util.control.NonFatal(_) =>
    }
  }

  /** The sidecar as a DataFrame (schema = [[CheckpointFileRow]]). */
  def read(spark: SparkSession, tablePath: String, v: Long): DataFrame =
    spark.read.parquet(sidecarDir(tablePath, v).toString)

  /** Drop sidecars older than the newest one (vacuum housekeeping). */
  def pruneOld(fs: FileSystem, tablePath: String, keepFrom: Long, conf: Configuration): Unit = {
    val dir = QbeastLog.logDir(tablePath)
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { s =>
      val n = s.getPath.getName
      if (n.endsWith(".checkpoint.parquet")) {
        val v = n.stripSuffix(".checkpoint.parquet")
        if (v.forall(_.isDigit) && v.toLong < keepFrom) fs.delete(s.getPath, true)
      }
    }
  }

}
