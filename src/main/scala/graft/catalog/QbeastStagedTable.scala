package graft.catalog

import graft.core.model.{QbeastOptions, RemoveFile}
import graft.log.{MetaDataAction, QbeastLog, RemoveFileAction}
import graft.write.QbeastWriter

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.util
import scala.jdk.CollectionConverters._

/**
 * Staged table for atomic `CREATE [OR REPLACE] TABLE ... USING qbeast`
 * and CTAS/RTAS (reference: `sources/v2/QbeastStagedTableImpl.scala`):
 * the AS-SELECT write is buffered and only executed inside
 * `commitStagedChanges()`, so a failed query leaves neither a catalog
 * entry nor data; a REPLACE swaps the data files in one transaction-log
 * commit, so concurrent readers see the old or the new table, never a
 * mix.
 */
final class QbeastStagedTable(
    ident: Identifier,
    declaredSchema: StructType,
    properties: Map[String, String],
    isReplace: Boolean,
    createEntry: (Identifier, StructType, Map[String, String], Boolean) => QbeastTableImpl)
    extends StagedTable
    with SupportsWrite {

  private var pending: Option[DataFrame] = None

  override def name(): String = ident.name()

  override def schema(): StructType = declaredSchema

  override def properties(): util.Map[String, String] = properties.asJava

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              // defer: data lands only if the staged commit happens
              pending = Some(data)
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    val table = createEntry(ident, declaredSchema, properties, isReplace)
    val spark = SparkSession.active
    pending match {
      case Some(data) =>
        val defaultCubeSize = spark.conf
          .getOption("spark.qbeast.index.defaultCubeSize").map(_.toInt)
          .getOrElse(QbeastOptions.DefaultCubeSize)
        // Overwrite: one log commit adds the new files and removes every
        // old one — the atomic data swap of REPLACE ... AS SELECT
        QbeastWriter.save(spark, table.location, data,
          QbeastOptions(properties, defaultCubeSize), SaveMode.Overwrite)
      case None if isReplace =>
        // REPLACE TABLE without AS SELECT: new (empty) definition — drop
        // all current data files in one commit, record the new schema
        val conf = spark.sparkContext.hadoopConfiguration
        val snapshot = QbeastLog.snapshot(table.location, conf)
        if (!snapshot.isEmpty) {
          val now = System.currentTimeMillis()
          val actions = MetaDataAction(declaredSchema.json, snapshot.configuration) +:
            snapshot.files.map(f => RemoveFileAction(RemoveFile(f.path, now)))
          QbeastLog.commit(table.location, conf, snapshot.version, actions)
        }
      case None => // plain CREATE: entry only, data comes later
    }
  }

  override def abortStagedChanges(): Unit = {
    pending = None // nothing was written or registered
  }

}
