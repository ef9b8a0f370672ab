package graft.write

import org.apache.spark.sql.types.StructType

/**
 * Append/overwrite schema enforcement and evolution (reference:
 * `delta/src/main/scala/io/qbeast/spark/delta/DeltaMetadataWriter.scala:82-85`,
 * where `mergeSchema`/`overwriteSchema` map to Delta's
 * canMergeSchema/canOverwriteSchema).
 *
 * Semantics:
 *  - append, default: the incoming column-name set must equal the
 *    table's (order may differ — parquet resolves by name); anything
 *    else rejects with a pointer to the evolution options.
 *  - append + `mergeSchema=true`: new incoming columns are appended to
 *    the table schema as nullable; incoming may also omit existing
 *    columns (they read as null from the new files). Existing files are
 *    NEVER rewritten — old parquet lacking a merged column yields nulls
 *    through the by-name scan, so evolving a 100 TB table is a
 *    metadata-only commit.
 *  - overlapping columns must keep their exact type either way; a type
 *    clash would poison the shared parquet scan schema.
 *  - overwrite with a different column set requires
 *    `overwriteSchema=true`.
 */
object SchemaEvolution {

  /** Table schema after an append of `incoming`; throws on violations. */
  def mergeForAppend(
      existing: StructType,
      incoming: StructType,
      allowMerge: Boolean): StructType = {
    val existingByName = existing.fields.map(f => f.name.toLowerCase -> f).toMap
    val clashes = incoming.fields.flatMap { f =>
      existingByName.get(f.name.toLowerCase).collect {
        case e if e.dataType != f.dataType =>
          s"${f.name} (table: ${e.dataType.simpleString}, data: ${f.dataType.simpleString})"
      }
    }
    if (clashes.nonEmpty) {
      throw new IllegalArgumentException(
        s"cannot append: column type mismatch for ${clashes.mkString(", ")}")
    }
    val newCols = incoming.fields.filter(f => !existingByName.contains(f.name.toLowerCase))
    val incomingNames = incoming.fieldNames.map(_.toLowerCase).toSet
    val missing = existing.fieldNames.filter(n => !incomingNames.contains(n.toLowerCase))
    if (!allowMerge && (newCols.nonEmpty || missing.nonEmpty)) {
      throw new IllegalArgumentException(
        s"cannot append schema ${incoming.fieldNames.mkString(",")} to table " +
          s"with schema ${existing.fieldNames.mkString(",")}; set mergeSchema=true " +
          "to add new nullable columns, or overwrite with overwriteSchema=true " +
          "to replace the schema")
    }
    // keep the table's canonical column order; new columns go last
    StructType(existing.fields ++ newCols.map(_.copy(nullable = true)))
  }

  /** Validate an overwrite of a table whose schema is `existing`. */
  def validateOverwrite(
      existing: StructType,
      incoming: StructType,
      allowOverwriteSchema: Boolean): Unit = {
    val have = incoming.fieldNames.map(_.toLowerCase).toSet
    val want = existing.fieldNames.map(_.toLowerCase).toSet
    if (have != want && !allowOverwriteSchema) {
      throw new IllegalArgumentException(
        s"cannot overwrite table schema ${existing.fieldNames.mkString(",")} with " +
          s"${incoming.fieldNames.mkString(",")}; set overwriteSchema=true to replace it")
    }
  }

}
