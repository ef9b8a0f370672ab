package graft.read

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/**
 * A [[FileIndex]] over an EXPLICIT file list whose sizes are already
 * known (from the commit log), for relations constructed per streaming
 * micro-batch: `spark.read.parquet(paths)` would re-resolve a
 * DataSource and re-list every admitted file on the driver PER TRIGGER
 * — one LIST/HEAD round trip per file per batch on an object store.
 * The log already recorded each file's exact size at commit time, so
 * the relation is built from metadata alone.
 *
 * `modificationTime` is reported as 0: the qbeast streaming scans never
 * read it (splits derive from size; deletion-vector masks key on file
 * NAME), and the engine's metadata columns are not exposed through the
 * streaming source schema.
 */
final class StaticFileIndex(root: Path, files: Seq[(Path, Long)])
    extends FileIndex {

  private val statuses: Array[FileStatus] =
    files.map { case (p, size) =>
      new FileStatus(size, false, 1, 134217728L, 0L, p)
    }.toArray

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = math.max(statuses.map(_.getLen).sum, 1L)

  override def inputFiles: Array[String] = statuses.map(_.getPath.toString)

  override def refresh(): Unit = ()

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses))

}
