package graft.sources

import graft.core.model.ColumnMapping

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * ParquetFileFormat that resolves columns by their PHYSICAL names (the
 * Delta `DeltaParquetFileFormat` column-mapping pattern): the relation
 * is built with the LOGICAL schema — user-visible names, Catalyst
 * pushdown, codegen all operate on it — and only at the reader boundary
 * are the required schema and the pushed filters renamed to the
 * physical names parquet footers carry. The returned `InternalRow`s are
 * POSITIONAL, so no per-row work is added: renaming the schema handed
 * to the parquet reader is the whole trick, the data never moves.
 *
 * For identity-mapped tables (no [[ColumnMapping.PhysicalNameKey]]
 * metadata — every table until its first RENAME/DROP COLUMN) every
 * rename below is a no-op and this class behaves exactly like the stock
 * format.
 */
final class QbeastParquetFileFormat(
    /** lowercase(logical) → physical for the TABLE's schema, captured at
     * relation construction. Needed as a constructor value (the Delta
     * `DeltaParquetFileFormat.referenceSchema` pattern) because nested
     * schema pruning rebuilds the relation with a PRUNED dataSchema
     * whose fields lose their metadata — deriving the map from the
     * passed-in schemas alone silently drops the mapping there. */
    private val logicalToPhysical: Map[String, String] = Map.empty)
    extends ParquetFileFormat {

  override def shortName(): String = "qbeast-parquet"

  override def toString: String = "QbeastParquet"

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    // prefer the constructor map (survives nested pruning); fall back
    // to schema metadata for externally-constructed relations
    val map =
      if (logicalToPhysical.nonEmpty) logicalToPhysical
      else ColumnMapping.toPhysicalMap(dataSchema)
    if (map.isEmpty)
      super.buildReaderWithPartitionValues(sparkSession, dataSchema, partitionSchema,
        requiredSchema, filters, options, hadoopConf)
    else {
      // a field's OWN metadata wins (always present on mapped tables);
      // the dataSchema-derived map is the fallback in case metadata was
      // stripped from a required-schema field along the attribute flow.
      // Internal fields (row-index temp column) carry no mapping and no
      // map entry — untouched.
      def phys(f: StructField): StructField =
        f.copy(name =
          if (f.metadata.contains(ColumnMapping.PhysicalNameKey))
            f.metadata.getString(ColumnMapping.PhysicalNameKey)
          else map.getOrElse(f.name.toLowerCase(java.util.Locale.ROOT), f.name))
      super.buildReaderWithPartitionValues(
        sparkSession,
        StructType(dataSchema.fields.map(phys)),
        partitionSchema,
        StructType(requiredSchema.fields.map(phys)),
        ColumnMapping.toPhysicalFilters(filters, map),
        options,
        hadoopConf)
    }
  }

  // ParquetFileFormat.equals accepts ANY ParquetFileFormat (so the
  // stock-on-the-left comparison still reports equal — inherent, its
  // equals can't be overridden from here); restricting THIS side keeps
  // two QbeastParquetFileFormats equal to each other while our
  // relations never compare equal to a stock scan through this class's
  // own equals. Relation-level distinctness ultimately rides the
  // (location, dataSchema) pair either way.
  override def equals(other: Any): Boolean = other match {
    case q: QbeastParquetFileFormat => q.logicalToPhysical == logicalToPhysical
    case _ => false
  }

  override def hashCode(): Int =
    getClass.hashCode() * 31 + logicalToPhysical.hashCode()

}
