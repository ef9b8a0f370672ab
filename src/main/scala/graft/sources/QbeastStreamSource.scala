package graft.sources

import graft.log.{AddFileAction, QbeastLog, RemoveFileAction}

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SQLContext}

/** Log-version offset; `json` is just the version number, so restart
 * recovery parses it back with `toLong`. */
final case class QbeastSourceOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

/**
 * `spark.readStream.format("qbeast").load(path)` — a qbeast table as a
 * Structured Streaming source, consumed incrementally out of the commit
 * log (the Delta-source pattern re-expressed over the qlog; reference
 * tables delegate this to Delta —
 * `delta/src/main/scala/io/qbeast/spark/delta/...` relies on the Delta
 * commit protocol for streaming reads).
 *
 * Semantics:
 *  - offset = committed log version; batch (a, b] = the files ADDED by
 *    commits a+1..b with `dataChange = true`. Layout-only commits
 *    (optimize / compaction / convert: adds with dataChange = false)
 *    are skipped — a stream never re-reads rewritten rows.
 *  - the FIRST batch is the full table snapshot at the stream's start
 *    version (Delta's initial-snapshot behavior). `startingVersion`
 *    overrides: a number starts at that commit (no snapshot),
 *    `"latest"` streams only commits after stream start.
 *  - a data-changing commit that REMOVES files (DELETE / UPDATE /
 *    MERGE / RESTORE) breaks append-only semantics → the stream fails
 *    unless `ignoreDeletes` (skip delete-only commits) or
 *    `ignoreChanges` (emit the commit's re-added files anyway; rows
 *    that survived a copy-on-write rewrite are re-delivered —
 *    downstream must tolerate duplicates, same contract as Delta's
 *    option of the same name).
 *
 * Scale shape: per micro-batch the driver parses only the NEW commit
 * files (O(changed files), via [[QbeastLog.commitActions]]) — never a
 * full snapshot replay; the head version probe rides the fingerprinted
 * snapshot cache. Executors read only the admitted parquet files.
 */
class QbeastStreamSource(
    sqlContext: SQLContext,
    tablePath: String,
    userSchema: Option[StructType],
    parameters: Map[String, String])
    extends Source with Logging {

  private val spark = sqlContext.sparkSession
  private def hadoopConf = spark.sparkContext.hadoopConfiguration

  private def opt(name: String): Option[String] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
  private def boolOpt(name: String): Boolean =
    opt(name).exists(_.equalsIgnoreCase("true"))

  private val ignoreChanges = boolOpt("ignoreChanges")
  private val ignoreDeletes = boolOpt("ignoreDeletes") || ignoreChanges

  // light replay: the source needs schema/version/revisions here, never
  // the file bulk — on a sidecar-scale table this keeps the per-trigger
  // driver cost O(commit tail), not O(files)
  private val initialSnapshot = QbeastLog.lightSnapshot(tablePath, hadoopConf)
  require(!initialSnapshot.isEmpty, s"no qbeast table at $tablePath")

  override val schema: StructType =
    userSchema.orElse(initialSnapshot.schema).getOrElse(
      throw new IllegalStateException(s"qbeast table $tablePath has no schema"))

  /** Commits ≤ this version are NOT part of the stream (exclusive lower
   * bound of the first incremental batch). -1 = emit the initial
   * snapshot first. */
  private val startExclusive: Long = opt("startingVersion") match {
    case Some(v) if v.equalsIgnoreCase("latest") => initialSnapshot.version
    case Some(v) => v.toLong - 1L
    case None => -1L
  }

  override def getOffset: Option[Offset] = {
    val head = QbeastLog.lightSnapshot(tablePath, hadoopConf).version
    if (head < 0 && startExclusive < 0) None
    // An anchor ≥ head is still published when nothing is consumable
    // yet: the first (empty) batch checkpoints it, so a restarted
    // `startingVersion=latest` stream keeps the ORIGINAL anchor instead
    // of re-resolving "latest" against a head that moved meanwhile.
    else Some(QbeastSourceOffset(math.max(head, startExclusive)))
  }

  private def offsetVersion(o: Offset): Long = o match {
    case QbeastSourceOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset on restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = offsetVersion(end)
    val startV = start.map(offsetVersion).getOrElse(startExclusive)
    val paths: Seq[String] = startV match {
      case -1L =>
        // initial snapshot: every live file at endV, then commits > endV
        // stream incrementally. This is the one O(files) driver step; a
        // stream that must avoid it on a huge table starts from
        // `startingVersion` instead.
        QbeastLog.snapshot(tablePath, hadoopConf, endV).files.map(_.path)
      case s =>
        val revisions = QbeastLog.lightSnapshot(tablePath, hadoopConf).revisions
        (s + 1 to endV).flatMap { v =>
          val actions = QbeastLog.commitActions(tablePath, hadoopConf, v, revisions)
          val adds = actions.collect { case AddFileAction(f, dc) => (f, dc) }
          val removes = actions.collect { case r: RemoveFileAction => r }
          val dataAdds = adds.collect { case (f, true) => f.path }
          val layoutOnly = removes.nonEmpty && dataAdds.isEmpty && adds.nonEmpty
          if (removes.nonEmpty && !layoutOnly) {
            // delete-only commit → tolerated by ignoreDeletes; rewrite
            // commit (removes + dataChange adds) → needs ignoreChanges
            if (dataAdds.isEmpty) {
              if (!ignoreDeletes) throw new UnsupportedOperationException(
                s"qbeast streaming source: commit $v of $tablePath deletes data. " +
                  "Streaming a non-append-only table requires option " +
                  "'ignoreDeletes' (skip delete-only commits) or 'ignoreChanges'.")
            } else if (!ignoreChanges) throw new UnsupportedOperationException(
              s"qbeast streaming source: commit $v of $tablePath rewrites data " +
                "(UPDATE/MERGE/RESTORE). Set option 'ignoreChanges' to stream " +
                "re-added files (duplicates possible downstream).")
          }
          dataAdds
        }
    }
    logInfo(s"qbeast stream batch ($startV, $endV]: ${paths.length} files")
    val shims = org.apache.spark.sql.GraftShims
    if (paths.isEmpty) shims.emptyStreamingDataFrame(spark, schema)
    else {
      val absolute = paths.map(p => new Path(tablePath, p).toString)
      val batchDf = spark.read.schema(schema).parquet(absolute: _*)
      shims.asStreamingDataFrame(batchDf)
    }
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"QbeastStreamSource[$tablePath]"

}
