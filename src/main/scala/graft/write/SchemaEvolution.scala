package graft.write

import org.apache.spark.sql.types.{StructField, StructType}

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

  /** Table schema after an append of `incoming`; throws on violations.
   *
   * Column mapping: on a mapped table every NEW column mints a fresh
   * physical name ([[graft.core.model.ColumnMapping.freshPhysicalName]])
   * so a re-added logical name can never resurrect a dropped/renamed
   * column's old data. `mintFrom` makes the minting DETERMINISTIC across
   * the commit-rebase re-merge: a field already minted in that schema
   * (the first merge, whose names the files were written under) keeps
   * its name instead of minting twice. */
  def mergeForAppend(
      existing: StructType,
      incoming: StructType,
      allowMerge: Boolean,
      mintFrom: Option[StructType] = None,
      widenAtVersion: Long = -1L,
      revisions: Iterable[graft.core.model.Revision] = Nil,
      widenBlocked: Set[String] = Set.empty): StructType = {
    import graft.core.model.TypeWidening
    val existingByName = existing.fields.map(f => f.name.toLowerCase -> f).toMap
    // overlapping columns with a different type: NARROWER incoming
    // upcasts into the table type (the writer casts the frame — no
    // schema change); WIDER incoming widens the table type under
    // mergeSchema (a metadata-only commit recording the change in the
    // field's history, exactly like ALTER COLUMN TYPE — old files keep
    // the narrow footer type and the scan upcasts); anything else is
    // the poison-the-scan case and rejects
    val widenable = scala.collection.mutable.Map.empty[String, StructField]
    val clashes = incoming.fields.flatMap { f =>
      existingByName.get(f.name.toLowerCase).flatMap {
        case e if e.dataType == f.dataType => None
        case e if TypeWidening.canWiden(f.dataType, e.dataType) => None // upcast on write
        case e if TypeWidening.canWiden(e.dataType, f.dataType) && allowMerge =>
          // columns a generated-column definition produces or references
          // never auto-widen (the enforcement cast would silently change
          // computed values) — same refusal as the explicit ALTER
          if (widenBlocked.contains(e.name.toLowerCase))
            Some(s"${f.name} (table: ${e.dataType.simpleString}, data: " +
              s"${f.dataType.simpleString} — a generated column produces or " +
              "references it, so its type cannot widen; redefine the " +
              "generated columns first)")
          else {
            // same index guard as the explicit ALTER — an auto-widen must
            // not corrupt a hash-transformed or unit-changed index that
            // QbeastTable.widenColumn refuses
            TypeWidening.requireIndexSafe(e.name,
              graft.core.model.ColumnMapping.physicalName(e),
              e.dataType, f.dataType, revisions)
            widenable.put(e.name.toLowerCase,
              TypeWidening.withTypeChange(e, f.dataType, widenAtVersion))
            None
          }
        case e if TypeWidening.canWiden(e.dataType, f.dataType) =>
          Some(s"${f.name} (table: ${e.dataType.simpleString}, data: " +
            s"${f.dataType.simpleString} — set mergeSchema=true to widen the " +
            "table column)")
        case e =>
          Some(s"${f.name} (table: ${e.dataType.simpleString}, data: ${f.dataType.simpleString})")
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
    import graft.core.model.ColumnMapping
    val base =
      if (widenable.isEmpty) existing.fields
      else existing.fields.map(f => widenable.getOrElse(f.name.toLowerCase, f))
    val mapped = ColumnMapping.isEnabled(existing)
    val minted = newCols.map { f0 =>
      val f = f0.copy(nullable = true)
      if (!mapped) f
      else {
        mintFrom.flatMap(_.fields.find(m =>
          m.name.equalsIgnoreCase(f.name) &&
            m.metadata.contains(ColumnMapping.PhysicalNameKey)))
          .map(m => f.copy(metadata =
            ColumnMapping.withPhysical(f.metadata, ColumnMapping.physicalName(m))))
          .getOrElse(ColumnMapping.mintedField(f))
      }
    }
    StructType(base ++ minted)
  }

  /** Cast the incoming frame's columns UP to the merged table schema's
   * types (the narrow-incoming half of type widening — e.g. int data
   * appended to a column already widened to long). Exact-match columns
   * pass through untouched; the cast is provably lossless because
   * [[mergeForAppend]] only reaches here via `TypeWidening.canWiden`. */
  def alignTypes(
      df: org.apache.spark.sql.DataFrame,
      table: StructType): org.apache.spark.sql.DataFrame = {
    val byName = table.fields.map(f => f.name.toLowerCase -> f).toMap
    val needs = df.schema.fields.exists(f =>
      byName.get(f.name.toLowerCase).exists(_.dataType != f.dataType))
    if (!needs) df
    else {
      import org.apache.spark.sql.functions.col
      def quoted(n: String): String = "`" + n.replace("`", "``") + "`"
      df.select(df.schema.fields.map { f =>
        byName.get(f.name.toLowerCase) match {
          case Some(t) if t.dataType != f.dataType =>
            col(quoted(f.name)).cast(t.dataType).as(f.name)
          case _ => col(quoted(f.name))
        }
      }.toIndexedSeq: _*)
    }
  }

  /** Same-column-set overwrite of a mapped table: carry the existing
   * fields' mapping metadata onto the (metadata-less) incoming schema so
   * new files keep writing the established physical names. */
  def inheritMapping(incoming: StructType, existing: StructType): StructType = {
    import graft.core.model.ColumnMapping
    if (!ColumnMapping.isEnabled(existing)) incoming
    else StructType(incoming.fields.map { f =>
      existing.fields.find(_.name.equalsIgnoreCase(f.name)) match {
        case Some(e) if e.metadata.contains(ColumnMapping.PhysicalNameKey) =>
          f.copy(metadata =
            ColumnMapping.withPhysical(f.metadata, ColumnMapping.physicalName(e)))
        case _ => f
      }
    })
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
