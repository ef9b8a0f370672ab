package graft.catalog

import graft.core.model.QbeastOptions
import graft.log.QbeastLog
import graft.read.QbeastFileIndex
import graft.write.QbeastWriter

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.util
import scala.jdk.CollectionConverters._

/**
 * V2 Table for catalog-managed qbeast tables (reference:
 * `src/.../table/QbeastTableImpl.scala` + `QbeastWriteBuilder.scala`).
 * Reads are swapped to the V1 `HadoopFsRelation` by
 * [[graft.rules.QbeastAnalysis]]; writes go through the connector
 * V1Write fallback into [[QbeastWriter]] — both exactly the reference's
 * architecture (V2 surface, V1 engine).
 */
final case class QbeastTableImpl(
    identifierName: String,
    location: String,
    declaredSchema: StructType,
    tableProperties: Map[String, String])
    extends Table
    with SupportsRead
    with SupportsWrite
    with SupportsDelete {

  override def name(): String = identifierName

  /** Set via SQL `VERSION AS OF` / `TIMESTAMP AS OF` (catalog loadTable
   * overloads) — reads resolve against the historical snapshot. */
  private def asOfVersion: Long =
    tableProperties.get(QbeastTableImpl.VersionAsOfProp).map(_.toLong).getOrElse(-1L)

  override def schema(): StructType = {
    if (declaredSchema.nonEmpty && asOfVersion < 0) declaredSchema
    else {
      val spark = SparkSession.active
      QbeastLog.snapshot(location, spark.sparkContext.hadoopConfiguration, asOfVersion)
        .schema.getOrElse(declaredSchema)
    }
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  /** The analyzer rule replaces this relation before scan planning, so
   * this scan never *executes* for SELECT. It must still *plan*: SQL
   * `DELETE FROM` keeps the V2 relation and runs scan pushdown on it
   * before `DeleteFromTableExec` takes over (no rows are ever read).
   * Executing it (extension not installed) fails with a clear message. */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = schema()
          override def toBatch: org.apache.spark.sql.connector.read.Batch =
            throw new UnsupportedOperationException(
              "qbeast reads go through the V1 relation; is " +
                "graft.sql.QbeastSparkSessionExtension installed?")
        }
    }

  /** V1 relation for the analyzer swap; empty tables read as empty.
   * Same sidecar-aware branch as `QbeastDataSource.createRelation`. */
  def toV1Relation(spark: SparkSession): HadoopFsRelation = {
    val distributedOk = !spark.conf.getOption("spark.qbeast.metadata.distributed")
      .exists(_.equalsIgnoreCase("false"))
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val snapshot0 =
      if (distributedOk) QbeastLog.lightSnapshot(location, hadoopConf, asOfVersion)
      else QbeastLog.snapshot(location, hadoopConf, asOfVersion)
    val snapshot = snapshot0.copy(tablePath = location)
    val fileIndex =
      if (snapshot.filesComplete) new QbeastFileIndex(spark, snapshot)
      else new graft.read.DistributedQbeastFileIndex(spark, snapshot)
    HadoopFsRelation(
      location = fileIndex,
      partitionSchema = StructType(Nil),
      dataSchema = snapshot.schema.getOrElse(declaredSchema),
      bucketSpec = None,
      fileFormat = new graft.sources.QbeastParquetFileFormat(snapshot.schema
        .map(graft.core.model.ColumnMapping.toPhysicalMap).getOrElse(Map.empty)),
      options = tableProperties)(spark)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false

      override def truncate(): WriteBuilder = { overwrite = true; this }

      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteParam: Boolean): Unit = {
              val spark = data.sparkSession
              val mode =
                if (overwrite || overwriteParam) SaveMode.Overwrite else SaveMode.Append
              val params = tableProperties ++ info.options().asScala
              val defaultCubeSize = spark.conf
                .getOption("spark.qbeast.index.defaultCubeSize").map(_.toInt)
                .getOrElse(QbeastOptions.DefaultCubeSize)
              QbeastWriter.save(spark, location, data,
                QbeastOptions(params, defaultCubeSize), mode)
            }
          }
      }
    }

  override def properties(): util.Map[String, String] = tableProperties.asJava

  /** SQL `DELETE FROM t WHERE ...` (Spark plans it as a metadata-level
   * `SupportsDelete` call when the condition translates to source
   * filters) → the copy-on-write [[graft.table.QbeastTable.delete]]. */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean = true

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val spark = SparkSession.active
    val cond = filters.map(QbeastTableImpl.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    graft.table.QbeastTable.forPath(spark, location).deleteWhere(cond)
  }

}

object QbeastTableImpl {
  /** Internal property carrying the SQL time-travel version. */
  val VersionAsOfProp = "qbeast.internal.versionAsOf"

  /** V1 source filter → Column, for `deleteWhere`. Only filters Spark
   * itself could translate from the DELETE condition arrive here. */
  private[catalog] def filterToColumn(f: org.apache.spark.sql.sources.Filter)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => col(a) === lit(v)
      case EqualNullSafe(a, v) => col(a) <=> lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case StringStartsWith(a, v) => col(a).startsWith(v)
      case StringEndsWith(a, v) => col(a).endsWith(v)
      case StringContains(a, v) => col(a).contains(v)
      case And(l, r) => filterToColumn(l) && filterToColumn(r)
      case Or(l, r) => filterToColumn(l) || filterToColumn(r)
      case Not(c) => !filterToColumn(c)
      case _: AlwaysTrue => lit(true)
      case _: AlwaysFalse => lit(false)
      case other => throw new UnsupportedOperationException(
        s"DELETE condition not translatable to a qbeast delete: $other")
    }
  }
}
