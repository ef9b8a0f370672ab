package graft.core.model

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.Locale

/**
 * Logical→physical column mapping (the Delta `columnMapping = name`
 * design, re-expressed over the qbeast log; the reference itself keys
 * per-file stats by column NAME and therefore refuses RENAME/DROP —
 * see `QbeastCatalog.screenColumnChanges` for the pre-mapping refusal
 * rationale).
 *
 * The LOGICAL schema (what users see and query) is the StructType
 * committed in the log's MetaDataAction. Each field may carry the
 * PHYSICAL column name in its metadata under [[PhysicalNameKey]] — the
 * immutable name under which the column lives in every parquet footer,
 * per-file stats JSON, bloom/HLL/KLL sketch key, and revision
 * transformer. A table without any such metadata is IDENTITY-mapped
 * (physical == logical) — the state of every table until its first
 * RENAME/DROP, which upgrades the schema by pinning
 * `physical := current name` on all fields (no data rewrite; parquet
 * footers already carry exactly those names).
 *
 * After the upgrade:
 *  - RENAME updates only the logical field name (one metadata commit).
 *  - DROP removes the logical field; the physical column stays in old
 *    files, unreachable (scans project only logical fields).
 *  - NEW columns (ADD COLUMNS / mergeSchema) mint a fresh physical name
 *    ([[freshPhysicalName]]), so re-adding a dropped or renamed-away
 *    logical name can never resurrect old data.
 *
 * Name rewriting is applied EXACTLY ONCE per predicate tree — the file
 * indexes mark pre-renamed trees (`alreadyPhysical`), every other layer
 * translates at its own entry only. RENAME additionally refuses a
 * target name equal to another field's physical name
 * ([[requireNoPhysicalClash]]) — chain renames would make the mapping
 * ambiguous to humans and any accidental double application unsafe;
 * ADD COLUMNS may reuse a released name freely (fresh physical mint).
 */
object ColumnMapping {

  /** StructField metadata key holding the physical column name. */
  val PhysicalNameKey = "qbeast.columnMapping.physicalName"

  private def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** True once the table carries any explicit mapping metadata. */
  def isEnabled(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(PhysicalNameKey))

  /** True when every logical name equals its physical name — the fast
   * path every pre-mapping table (and every upgraded-but-never-renamed
   * table) takes; all rewrites below no-op on it. */
  def isIdentity(schema: StructType): Boolean =
    schema.fields.forall(f => physicalName(f) == f.name)

  /** lowercase(logical) → physical, only non-identity entries. */
  def toPhysicalMap(schema: StructType): Map[String, String] =
    schema.fields.iterator.flatMap { f =>
      val p = physicalName(f)
      if (p == f.name) None else Some(lower(f.name) -> p)
    }.toMap

  /** lowercase(physical) → logical, only non-identity entries. */
  def toLogicalMap(schema: StructType): Map[String, String] =
    schema.fields.iterator.flatMap { f =>
      val p = physicalName(f)
      if (p == f.name) None else Some(lower(p) -> f.name)
    }.toMap

  /** The physical column name a logical name resolves to (identity for
   * unmapped/unknown names — callers pass through non-table columns
   * like `_change_type` unchanged). */
  def physicalOf(schema: StructType, logical: String): String =
    schema.fields.find(_.name.equalsIgnoreCase(logical))
      .map(physicalName).getOrElse(logical)

  /** The logical name a physical name reports as (identity fallback). */
  def logicalOf(schema: StructType, physical: String): String =
    schema.fields.find(f => physicalName(f).equalsIgnoreCase(physical))
      .map(_.name).getOrElse(physical)

  /** The schema as parquet files see it: fields renamed to their
   * physical names (metadata kept — it is self-consistent there). */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physicalName(f))))

  /** Pin `physical := name` on every field lacking explicit mapping
   * metadata — the upgrade step of the first RENAME/DROP. Idempotent. */
  def upgraded(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (f.metadata.contains(PhysicalNameKey)) f
      else f.copy(metadata = withPhysical(f.metadata, f.name))
    })

  /** Mint a physical name for a NEW column of a mapped table. Fresh
   * UUID (underscored — never needs quoting in expression text), so it
   * can never collide with any past logical or physical name. */
  def freshPhysicalName(): String =
    "c_" + java.util.UUID.randomUUID().toString.replace("-", "")

  def withPhysical(m: Metadata, physical: String): Metadata =
    new MetadataBuilder().withMetadata(m).putString(PhysicalNameKey, physical).build()

  /** New-column StructField for a mapped table: fresh physical name. */
  def mintedField(f: StructField): StructField =
    f.copy(metadata = withPhysical(f.metadata, freshPhysicalName()))

  /** Enforces the idempotence invariant at ALTER time: `newLogical`
   * must not equal any OTHER field's physical name. */
  def requireNoPhysicalClash(schema: StructType, newLogical: String, self: String): Unit = {
    schema.fields.foreach { f =>
      if (!f.name.equalsIgnoreCase(self) &&
        physicalName(f).equalsIgnoreCase(newLogical))
        throw new UnsupportedOperationException(
          s"cannot use column name $newLogical: it equals the physical name of " +
            s"column ${f.name} (a previous rename released it logically, but " +
            "old files still carry it physically). Pick a different name.")
    }
  }

  // ---- predicate / expression rewriting --------------------------------

  /** Rename attribute references logical→physical in a Catalyst filter
   * expression (the pruning layers — QuerySpecBuilder, FileStatsPruning,
   * derived-date expansion — all match names against physical-keyed
   * stats and revision transformers). Applied exactly once per tree —
   * see the class doc. */
  def toPhysicalExpr(e: Expression, map: Map[String, String]): Expression =
    if (map.isEmpty) e
    else e.transformUp {
      case a: AttributeReference if map.contains(lower(a.name)) =>
        a.withName(map(lower(a.name)))
      case u: UnresolvedAttribute if u.nameParts.length == 1 &&
          map.contains(lower(u.nameParts.head)) =>
        UnresolvedAttribute(Seq(map(lower(u.nameParts.head))))
    }

  def toPhysicalExprs(es: Seq[Expression], schema: StructType): Seq[Expression] = {
    val map = toPhysicalMap(schema)
    if (map.isEmpty) es else es.map(toPhysicalExpr(_, map))
  }

  /** Translate a SQL expression string's top-level column references
   * logical→physical (CHECK constraints are stored as logical-name SQL;
   * the per-row enforcement column is evaluated over physical-named
   * write frames). */
  def toPhysicalSql(spark: SparkSession, sql: String, schema: StructType): String = {
    val map = toPhysicalMap(schema)
    if (map.isEmpty) return sql
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    toPhysicalExpr(parsed, map).sql
  }

  // ---- data-source v1 filter rewriting ---------------------------------

  import org.apache.spark.sql.sources._

  /** Rename pushed-down source filters logical→physical for the parquet
   * row-group/footer filter (see QbeastParquetFileFormat). A filter
   * shape we don't know is DROPPED — conservative: less pushdown, never
   * a wrong result (Spark re-evaluates all data filters post-scan). */
  def toPhysicalFilters(filters: Seq[Filter], map: Map[String, String]): Seq[Filter] = {
    if (map.isEmpty) return filters
    def n(a: String): String = map.getOrElse(lower(a), a)
    def tr(f: Filter): Option[Filter] = f match {
      case EqualTo(a, v) => Some(EqualTo(n(a), v))
      case EqualNullSafe(a, v) => Some(EqualNullSafe(n(a), v))
      case GreaterThan(a, v) => Some(GreaterThan(n(a), v))
      case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(n(a), v))
      case LessThan(a, v) => Some(LessThan(n(a), v))
      case LessThanOrEqual(a, v) => Some(LessThanOrEqual(n(a), v))
      case In(a, vs) => Some(In(n(a), vs))
      case IsNull(a) => Some(IsNull(n(a)))
      case IsNotNull(a) => Some(IsNotNull(n(a)))
      case StringStartsWith(a, v) => Some(StringStartsWith(n(a), v))
      case StringEndsWith(a, v) => Some(StringEndsWith(n(a), v))
      case StringContains(a, v) => Some(StringContains(n(a), v))
      case And(l, r) =>
        (tr(l), tr(r)) match {
          case (Some(tl), Some(tr_)) => Some(And(tl, tr_))
          // And may keep a decidable side alone; Or/Not may not
          case (Some(tl), None) => Some(tl)
          case (None, Some(tr_)) => Some(tr_)
          case _ => None
        }
      case Or(l, r) =>
        for (tl <- tr(l); tr_ <- tr(r)) yield Or(tl, tr_)
      case Not(c) => tr(c).map(Not)
      case AlwaysTrue() => Some(f)
      case AlwaysFalse() => Some(f)
      case _ => None
    }
    filters.flatMap(tr(_))
  }

  // ---- DataFrame plumbing ----------------------------------------------

  /** Rename a logical-named frame's columns to physical for the write
   * path. Columns not in the schema (mergeSchema news resolved by the
   * caller's merged schema, writer-internal tags) pass through. */
  def toPhysicalDf(df: DataFrame, schema: StructType): DataFrame = {
    val map = toPhysicalMap(schema)
    if (map.isEmpty) df
    else df.toDF(df.columns.map(c => map.getOrElse(lower(c), c)).toIndexedSeq: _*)
  }

  /** Read parquet files of a mapped table under the LOGICAL schema:
   * resolve by physical name in the footer, then rename positionally
   * back to the logical names. Identity tables take the plain path. */
  def readParquet(spark: SparkSession, logical: StructType, paths: Seq[String]): DataFrame = {
    if (isIdentity(logical)) spark.read.schema(logical).parquet(paths: _*)
    else
      spark.read.schema(physicalSchema(logical)).parquet(paths: _*)
        .toDF(logical.fieldNames.toIndexedSeq: _*)
  }

  /** [[readParquet]] with extra trailing columns beyond the table
   * schema (the `_change_type` column of persisted change-data files —
   * CDF infrastructure names are never mapped). */
  def readParquetWith(
      spark: SparkSession,
      logical: StructType,
      extra: Seq[StructField],
      paths: Seq[String]): DataFrame = {
    if (isIdentity(logical))
      spark.read.schema(StructType(logical.fields ++ extra)).parquet(paths: _*)
    else
      spark.read.schema(StructType(physicalSchema(logical).fields ++ extra))
        .parquet(paths: _*)
        .toDF((logical.fieldNames ++ extra.map(_.name)).toIndexedSeq: _*)
  }

}
