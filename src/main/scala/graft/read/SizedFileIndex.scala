package graft.read

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/**
 * A [[QbeastFileIndex]] whose `sizeInBytes` reports the byte count of
 * the files surviving a known filter (see
 * [[graft.rules.ScanSizeRule]]) — everything else delegates, so
 * execution-time listing, sampling pushdown and the other qbeast rules
 * (which match the [[QbeastIndex]] trait) behave identically.
 */
final class SizedFileIndex(val underlying: QbeastFileIndex, bytes: Long)
    extends FileIndex with QbeastIndex {

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def partitionSchema: StructType = underlying.partitionSchema

  override def sizeInBytes: Long = bytes

  override def inputFiles: Array[String] = underlying.inputFiles

  override def refresh(): Unit = underlying.refresh()

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)

  override def metadataOpsTimeNs: Option[Long] = underlying.metadataOpsTimeNs

  override def currentSnapshot: graft.log.QbeastSnapshot =
    underlying.currentSnapshot

}
