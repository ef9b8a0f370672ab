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
    with SupportsWrite {

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

  /** The analyzer rule replaces this relation before scan planning; a
   * direct V2 scan is unsupported by design (same as the reference). */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    throw new UnsupportedOperationException(
      "qbeast reads go through the V1 relation; is graft.sql.QbeastSparkSessionExtension installed?")

  /** V1 relation for the analyzer swap; empty tables read as empty. */
  def toV1Relation(spark: SparkSession): HadoopFsRelation = {
    val snapshot = QbeastLog.snapshot(location,
      spark.sparkContext.hadoopConfiguration, asOfVersion)
    val fileIndex = new QbeastFileIndex(spark, snapshot.copy(tablePath = location))
    HadoopFsRelation(
      location = fileIndex,
      partitionSchema = StructType(Nil),
      dataSchema = snapshot.schema.getOrElse(declaredSchema),
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
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

}

object QbeastTableImpl {
  /** Internal property carrying the SQL time-travel version. */
  val VersionAsOfProp = "qbeast.internal.versionAsOf"
}
