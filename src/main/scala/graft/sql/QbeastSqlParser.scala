package graft.sql

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.sql.{Row, SparkSession}

/**
 * Maintenance-statement parser for qbeast tables, layered in front of
 * the session parser via `injectParser` (the Delta SQL surface users
 * expect from a log-structured table format, re-expressed over the
 * qlog):
 *
 *   OPTIMIZE '<path>' [WHERE <predicate>]     -- index-preserving repack
 *                                             -- (WHERE scopes to files
 *                                             --  that may match)
 *   VACUUM '<path>' [RETAIN <n> HOURS]        -- unreferenced-file GC
 *   VACUUM '<path>' RETAIN 0 HOURS FORCE      -- below-minimum retention
 *   VERIFY '<path>'                           -- FSCK-shaped audit
 *   REORG ['TABLE'] '<path>' APPLY (PURGE)    -- materialize deletion vectors
 *
 * Paths are quoted string literals ('…' or "…"), matching Delta's
 * path-table form (`VACUUM '/data/tbl'`). Everything else delegates to
 * the underlying parser untouched, so the full Spark SQL surface is
 * unaffected.
 */
class QbeastSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val OptimizeRe =
    """(?is)OPTIMIZE\s+(?:'([^']+)'|"([^"]+)")(?:\s+WHERE\s+(.+))?""".r
  private val VacuumRe =
    ("""(?is)VACUUM\s+(?:'([^']+)'|"([^"]+)")""" +
      """(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?)?(\s+FORCE)?""").r
  private val HistoryRe =
    """(?is)DESCRIBE\s+HISTORY\s+(?:'([^']+)'|"([^"]+)")""".r
  private val CloneRe =
    """(?is)CLONE\s+(?:'([^']+)'|"([^"]+)")\s+TO\s+(?:'([^']+)'|"([^"]+)")""".r
  private val DetailRe =
    """(?is)DESCRIBE\s+DETAIL\s+(?:'([^']+)'|"([^"]+)")""".r
  private val RestoreRe =
    """(?is)RESTORE\s+(?:'([^']+)'|"([^"]+)")\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  private val AddConstraintRe =
    ("""(?is)ALTER\s+TABLE\s+(?:'([^']+)'|"([^"]+)")""" +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)""").r
  private val DropConstraintRe =
    ("""(?is)ALTER\s+TABLE\s+(?:'([^']+)'|"([^"]+)")""" +
      """\s+DROP\s+CONSTRAINT\s+(\w+)""").r
  private val VerifyRe =
    """(?is)VERIFY\s+(?:'([^']+)'|"([^"]+)")""".r
  private val ReorgRe =
    """(?is)REORG\s+(?:TABLE\s+)?(?:'([^']+)'|"([^"]+)")\s+APPLY\s*\(\s*PURGE\s*\)""".r

  /** Line comments, bracketed comments and trailing semicolons are
   * tolerated around the statement (a decorated statement must not
   * silently demote to the stock parser and die on the keyword). */
  private def strip(sqlText: String): String = sqlText
    .replaceAll("(?s)/\\*.*?\\*/", " ")
    .replaceAll("--[^\n]*", " ")
    .replaceAll("[;\\s]+$", "")
    .trim

  override def parsePlan(sqlText: String): LogicalPlan = strip(sqlText) match {
    case OptimizeRe(p1, p2, where) =>
      OptimizeQbeastCommand(Option(p1).getOrElse(p2),
        Option(where).map(_.trim).filter(_.nonEmpty))
    case VacuumRe(p1, p2, hours, force) =>
      VacuumQbeastCommand(Option(p1).getOrElse(p2),
        Option(hours).map(_.toDouble), force != null)
    case HistoryRe(p1, p2) =>
      DescribeHistoryQbeastCommand(Option(p1).getOrElse(p2))
    case CloneRe(s1, s2, t1, t2) =>
      CloneQbeastCommand(Option(s1).getOrElse(s2), Option(t1).getOrElse(t2))
    case DetailRe(p1, p2) =>
      DescribeDetailQbeastCommand(Option(p1).getOrElse(p2))
    case RestoreRe(p1, p2, v) =>
      RestoreQbeastCommand(Option(p1).getOrElse(p2), v.toLong)
    case AddConstraintRe(p1, p2, name, check) =>
      AlterConstraintQbeastCommand(Option(p1).getOrElse(p2), name, Some(check.trim))
    case DropConstraintRe(p1, p2, name) =>
      AlterConstraintQbeastCommand(Option(p1).getOrElse(p2), name, None)
    case VerifyRe(p1, p2) =>
      VerifyQbeastCommand(Option(p1).getOrElse(p2))
    case ReorgRe(p1, p2) =>
      ReorgQbeastCommand(Option(p1).getOrElse(p2))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

}

/** SQL `OPTIMIZE '<path>' [WHERE <predicate>]` →
 * [[graft.table.QbeastTable.optimize]] on every indexed revision, or
 * the predicate-scoped [[graft.table.QbeastTable.optimizeWhere]] when a
 * WHERE clause is given (only files that may hold matching rows are
 * repacked; rows are never filtered). Returns the table path and
 * post-optimize file count. */
final case class OptimizeQbeastCommand(path: String, where: Option[String] = None)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = graft.table.QbeastTable.forPath(spark, path)
    where match {
      case Some(cond) =>
        val expr = spark.sessionState.sqlParser.parseExpression(cond)
        t.optimizeWhere(org.apache.spark.sql.GraftShims.column(expr))
      case None =>
        t.revisionIDs.filter(_ > 0).foreach(rid => t.optimize(rid))
    }
    val files = graft.log.QbeastLog
      .snapshot(path, spark.sparkContext.hadoopConfiguration).allFilesCount
    Seq(Row(path, files))
  }

}

/** SQL `VERIFY '<path>'` → [[graft.table.QbeastTable.verifyIntegrity]]:
 * one row per problem found (empty result = healthy table). The
 * FSCK-shaped audit of log vs disk, reachable from pure SQL. */
final case class VerifyQbeastCommand(path: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("file", StringType, nullable = false)(),
    AttributeReference("issue", StringType, nullable = false)(),
    AttributeReference("detail", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    graft.table.QbeastTable.forPath(spark, path).verifyIntegrity()
      .map(i => Row(i.path, i.issue, i.detail))

}

/** SQL `REORG ['TABLE'] '<path>' APPLY (PURGE)` →
 * [[graft.table.QbeastTable.purgeDeletionVectors]]: materialize every
 * deletion vector by rewriting ONLY the masked files (Delta's REORG
 * PURGE shape) — content invariant, replaced vectors vacuumable. */
final case class ReorgQbeastCommand(path: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("purged_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val n = graft.table.QbeastTable.forPath(spark, path).purgeDeletionVectors()
    Seq(Row(path, n.toLong))
  }

}

/** SQL `DESCRIBE HISTORY '<path>'` →
 * [[graft.table.QbeastTable.history]]: one row per committed log
 * version, oldest first (Delta's DESCRIBE HISTORY shape over the
 * qlog's commitInfo actions). */
final case class DescribeHistoryQbeastCommand(path: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp_ms", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("added_files", LongType, nullable = false)(),
    AttributeReference("removed_files", LongType, nullable = false)(),
    AttributeReference("new_revision",
      org.apache.spark.sql.types.BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    graft.table.QbeastTable.forPath(spark, path).history().map { h =>
      Row(h.version, h.timestampMillis, h.operation,
        h.addedFiles.toLong, h.removedFiles.toLong, h.newRevision)
    }

}

/** SQL `CLONE '<src>' TO '<dst>'` →
 * [[graft.table.QbeastTable.cloneTo]]: metadata-only shallow clone
 * (absolute file references, zero data copied); returns the target
 * path and the number of referenced files. */
final case class CloneQbeastCommand(source: String, target: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cloned = graft.table.QbeastTable.forPath(spark, source).cloneTo(target)
    Seq(Row(target, cloned.snapshot.allFilesCount))
  }

}

/** SQL `DESCRIBE DETAIL '<path>'` — one row of table-level facts
 * (Delta's DESCRIBE DETAIL shape over the qlog): format, current
 * version, file count, total bytes, row count from block metadata,
 * indexed columns of the latest revision, and table properties. */
final case class DescribeDetailQbeastCommand(path: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)(),
    AttributeReference("indexed_columns", StringType, nullable = false)(),
    AttributeReference("cube_size", LongType, nullable = false)(),
    AttributeReference("properties", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val snap = graft.log.QbeastLog
      .snapshot(path, spark.sparkContext.hadoopConfiguration)
    require(!snap.isEmpty, s"no qbeast table at $path")
    val rev = snap.lastRevision
    Seq(Row(
      "qbeast",
      path,
      snap.version,
      snap.allFilesCount,
      snap.totalBytes,
      snap.files.map(_.elementCount).sum,
      rev.map(_.columnNames.mkString(",")).getOrElse(""),
      rev.map(_.desiredCubeSize.toLong).getOrElse(0L),
      snap.configuration.toSeq.sorted.map { case (k, v) => s"$k=$v" }
        .mkString(";")))
  }

}

/** SQL `RESTORE '<path>' TO VERSION AS OF <n>` →
 * [[graft.table.QbeastTable.restoreToVersion]] (metadata-only rollback
 * as a new commit); returns the version restored to and the new head. */
final case class RestoreQbeastCommand(path: String, version: Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("head_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = graft.table.QbeastTable.forPath(spark, path)
    t.restoreToVersion(version)
    Seq(Row(version, t.snapshot.version))
  }

}

/** SQL `ALTER TABLE '<path>' ADD CONSTRAINT name CHECK (expr)` /
 * `ALTER TABLE '<path>' DROP CONSTRAINT name` →
 * [[graft.table.QbeastTable.addConstraint]] (existing data validated
 * first) / dropConstraint. */
final case class AlterConstraintQbeastCommand(
    path: String,
    name: String,
    check: Option[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("constraint", StringType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = graft.table.QbeastTable.forPath(spark, path)
    check match {
      case Some(expr) => t.addConstraint(name, expr); Seq(Row(name, "added"))
      case None => t.dropConstraint(name); Seq(Row(name, "dropped"))
    }
  }

}

/** SQL `VACUUM '<path>' [RETAIN n HOURS] [FORCE]` →
 * [[graft.table.QbeastTable.vacuum]]; returns the number of files
 * deleted. Like the Scala API, retention below the safe minimum is
 * rejected unless FORCE is given (a zero-retention vacuum racing an
 * in-flight writer loses that writer's data). */
final case class VacuumQbeastCommand(
    path: String,
    retainHours: Option[Double],
    force: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("deleted_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val retainMillis = retainHours
      .map(h => (h * 3600 * 1000).toLong)
      .getOrElse(graft.table.QbeastTable.DefaultRetentionMillis)
    val deleted = graft.table.QbeastTable.forPath(spark, path)
      .vacuum(retainMillis, force)
    Seq(Row(path, deleted.toLong))
  }

}
