package graft.core.model

import org.apache.spark.sql.types._

/**
 * Type widening for qbeast tables — `ALTER TABLE ... ALTER COLUMN ...
 * TYPE <wider>` as a METADATA-ONLY commit (the Delta Lake
 * `typeWidening` table-feature design, re-derived; the reference
 * refuses every column type change because old parquet footers keep
 * the written type).
 *
 * The widen commit changes only the column's LOGICAL type in the
 * schema committed with `MetaDataAction`. Old data files keep the
 * narrow physical type; Spark 4's parquet readers upcast per batch at
 * scan time. The exact supported matrix below is PROBE-VERIFIED on
 * both the vectorized and the parquet-mr reader, including filter
 * correctness near the narrow type's edge (`tools/TypeWidenProbe` —
 * e.g. `long → double` fails in BOTH readers and is therefore
 * refused, even though the value conversion itself would be lossless
 * for small values):
 *
 *  - byte → short → int → long (any upward step)
 *  - byte / short / int → double; float → double
 *  - byte / short / int / long → decimal(p, s) with
 *    p − s ≥ max(maxDigits(from), 10) — the reader refuses
 *    decimal32-backed targets (probe: short→decimal(5,0) fails
 *    vectorized), so p − s ≥ 10 even for byte/short
 *  - decimal(p, s) → decimal(p', s') with s' ≥ s and p'−s' ≥ p−s
 *  - date → timestamp_ntz (UNIT-CHANGING — see below)
 *
 * Because a widened column's old files were written — and their
 * per-file sketch state computed — under the narrow type, four
 * consumers need era gates, derived here from a type-change HISTORY
 * each widened field carries in its StructField metadata
 * ([[TypeChangesKey]], Delta's `delta.typeChanges` shape):
 *
 *  - min/max file stats: values are stored as raw JSON numbers and
 *    compared as BigDecimal, so every VALUE-PRESERVING widen is safe
 *    unchanged; `date → timestamp_ntz` changes the stored unit (days
 *    vs micros) and disables the column's min/max bounds
 *    ([[statsTrustless]]) — pruning and metadata folds fall back to
 *    conservative behaviour on exactly that column.
 *  - per-file BLOOM filters: keys are `xxhash64(col)` at the column
 *    type; Catalyst hashes byte/short/int identically (promoted int)
 *    but int and long differently, so any move outside the
 *    {byte,short,int} family disables the column's bloom probes
 *    ([[bloomTrustless]]) — a stale probe would be a FALSE NEGATIVE,
 *    i.e. wrong results, not a perf bug.
 *  - per-file HLL registers: keys hash `CAST(col AS STRING)`, so
 *    integral→integral renders identically ("5" either way) and stays
 *    foldable; everything else ([[hllTrustless]]) bails the
 *    metadata-only distinct count back to the scan (float 0.1f and
 *    double 0.1f.toDouble render differently; days vs micros differ).
 *  - per-file KLL states: store canonical doubles, value-preserving
 *    for every numeric widen; only the date unit change bails
 *    ([[kllTrustless]]).
 *
 * Indexed columns: revision transformers map through canonical
 * DOUBLES (`Transformer.canonicalColumn`), so value-preserving widens
 * keep the revision space intact and old cube assignments valid.
 * Refused for indexed columns: `date → timestamp_ntz` (the canonical
 * unit flips days→micros — old coordinates would be garbage under the
 * new type) and HASH-transformed columns (the recorded transformation
 * hashes probe literals at the narrow type — see
 * `Transformation.hashCoordinate`).
 */
object TypeWidening {

  /** StructField metadata key holding the column's type-change history
   * (array of {from, to, version} entries, oldest first). */
  val TypeChangesKey = "qbeast.typeChanges"

  /** One applied widen: `from → to`, committed at table `version`
   * (informational — the gates below are version-independent). */
  final case class TypeChange(from: DataType, to: DataType, version: Long)

  private def intDigits(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(3)
    case ShortType => Some(5)
    case IntegerType => Some(10)
    case LongType => Some(20)
    case _ => None
  }

  private def integralRank(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(0)
    case ShortType => Some(1)
    case IntegerType => Some(2)
    case LongType => Some(3)
    case _ => None
  }

  /** True iff the probe-verified matrix supports reading files written
   * as `from` under a requested schema of `to` (strictly widening —
   * `from == to` is false). */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => false
    case (f, t) if integralRank(f).isDefined && integralRank(t).isDefined =>
      integralRank(f).get < integralRank(t).get
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (FloatType, DoubleType) => true
    case (f, d: DecimalType) if intDigits(f).isDefined =>
      d.precision - d.scale >= math.max(intDigits(f).get, 10) &&
        d.precision <= DecimalType.MAX_PRECISION
    // decimal growth works across ALL parquet backings, int32-backed
    // targets and rescales included (probe cells: (5,2)->(9,2),
    // (5,2)->(9,3), (12,2)->(14,4), (5,2)->(10,2)/(12,5)/(38,10)) —
    // only the INTEGRAL->decimal32 cell is unsupported, hence the
    // p - s >= 10 floor above
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
    case (DateType, TimestampNTZType) => true
    case _ => false
  }

  /** The widen changes the STORED UNIT of the value (days → micros):
   * old min/max/KLL stats are meaningless under the new type. */
  def unitChanging(from: DataType, to: DataType): Boolean =
    from == DateType && to == TimestampNTZType

  /** xxhash64 hashes these identically (promoted to int) — the only
   * moves that keep old per-file bloom filters probe-able. */
  private def bloomCompatible(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (ByteType | ShortType | IntegerType, ByteType | ShortType | IntegerType) => true
      case _ => false
    }

  /** `CAST(col AS STRING)` renders these identically — the only moves
   * that keep old per-file HLL registers foldable. */
  private def hllCompatible(from: DataType, to: DataType): Boolean =
    integralRank(from).isDefined && integralRank(to).isDefined

  // ---- per-field history -------------------------------------------------

  def typeChanges(f: StructField): Seq[TypeChange] =
    if (!f.metadata.contains(TypeChangesKey)) Nil
    else f.metadata.getMetadataArray(TypeChangesKey).toSeq.flatMap { m =>
      try {
        Some(TypeChange(
          DataType.fromDDL(m.getString("from")),
          DataType.fromDDL(m.getString("to")),
          if (m.contains("version")) m.getLong("version") else -1L))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Append one change to the field's history. */
  def withTypeChange(f: StructField, to: DataType, version: Long): StructField = {
    val entry = new MetadataBuilder()
      .putString("from", f.dataType.sql)
      .putString("to", to.sql)
      .putLong("version", version)
      .build()
    val prior =
      if (f.metadata.contains(TypeChangesKey)) f.metadata.getMetadataArray(TypeChangesKey)
      else Array.empty[Metadata]
    f.copy(
      dataType = to,
      metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putMetadataArray(TypeChangesKey, prior :+ entry).build())
  }

  /** True once any column of the schema carries widen history. */
  def isEnabled(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(TypeChangesKey))

  // ---- era gates (all keyed by PHYSICAL column name) -----------------------

  private def trustless(schema: StructType, bad: (DataType, DataType) => Boolean): Set[String] =
    schema.fields.iterator.flatMap { f =>
      if (typeChanges(f).exists(c => bad(c.from, c.to))) Some(ColumnMapping.physicalName(f))
      else None
    }.toSet

  /** Columns whose per-file min/max bounds must be IGNORED. */
  def statsTrustless(schema: StructType): Set[String] =
    trustless(schema, unitChanging)

  /** Columns whose per-file bloom filters must be IGNORED. */
  def bloomTrustless(schema: StructType): Set[String] =
    trustless(schema, (f, t) => !bloomCompatible(f, t))

  /** Columns whose per-file HLL registers cannot be folded. */
  def hllTrustless(schema: StructType): Set[String] =
    trustless(schema, (f, t) => !hllCompatible(f, t))

  /** Columns whose per-file KLL states cannot be folded. */
  def kllTrustless(schema: StructType): Set[String] =
    trustless(schema, unitChanging)

  /** Refuse widening a column some ACTIVE REVISION indexes when the
   * revision space cannot survive it: HASH transformations hash lookup
   * literals at the RECORDED narrow type (new long literals would miss
   * every old row — or throw casting the boxed value), and a
   * unit-changing widen flips the canonical coordinates (date DAYS vs
   * timestamp MICROS). Linear/quantile transformers map through
   * canonical doubles and survive every value-preserving widen. THE
   * single guard for both widen entry points — the explicit ALTER
   * (QbeastTable.widenColumn) and the mergeSchema auto-widen
   * (SchemaEvolution.mergeForAppend): an append must not corrupt an
   * index an ALTER refuses to. */
  def requireIndexSafe(
      logical: String,
      physical: String,
      from: DataType,
      to: DataType,
      revisions: Iterable[Revision]): Unit = {
    revisions.filterNot(_.isStaging).foreach { rev =>
      rev.columnTransformers.foreach { t =>
        if (t.columnName.equalsIgnoreCase(physical)) {
          if (t.kind == "hashing") throw new UnsupportedOperationException(
            s"cannot widen hash-indexed column $logical: revision " +
              s"${rev.revisionID} hashes lookup values at the recorded " +
              s"type ${from.simpleString}, so widened literals would no " +
              "longer match old files. Re-index first (overwrite with " +
              "different columnsToIndex).")
          if (unitChanging(from, to))
            throw new UnsupportedOperationException(
              s"cannot widen indexed column $logical from " +
                s"${from.simpleString} to ${to.simpleString}: the index " +
                "coordinates are date DAYS, timestamp predicates are " +
                "MICROSECONDS — old files would prune wrongly. " +
                "Re-index first (overwrite).")
        }
      }
    }
  }

  /** True when stats-based PROOFS over `conjuncts` (physical-named
   * Catalyst expressions) would be unsound on this schema: any
   * reference to a unit-changed column (incomparable narrow-era
   * min/max), or an equality/IN shape on a bloom-gated column (the
   * proofs that consult bloom filters hashed at the narrow type). The
   * single definition behind QbeastTable's DML classifier / filtered
   * sketch folds and MetadataCountRule's rewrites. */
  def proofBlocked(
      schema: StructType,
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, InSet}
    if (!isEnabled(schema)) return false
    val statsOff = statsTrustless(schema)
    val bloomOff = bloomTrustless(schema) -- statsOff
    (statsOff.nonEmpty &&
      conjuncts.exists(_.references.exists(a => statsOff.contains(a.name)))) ||
    (bloomOff.nonEmpty && conjuncts.exists(_.exists {
      case EqualTo(a: AttributeReference, _) if bloomOff.contains(a.name) => true
      case EqualTo(_, a: AttributeReference) if bloomOff.contains(a.name) => true
      case In(a: AttributeReference, _) if bloomOff.contains(a.name) => true
      case InSet(a: AttributeReference, _) if bloomOff.contains(a.name) => true
      case _ => false
    }))
  }

  /** Named refusal when `from → to` is outside the verified matrix. */
  def requireWidenable(column: String, from: DataType, to: DataType): Unit = {
    if (from == to) return
    if (!canWiden(from, to)) throw new UnsupportedOperationException(
      s"cannot change column $column from ${from.simpleString} to " +
        s"${to.simpleString}: old parquet files keep the written type, and " +
        "Spark's parquet readers only upcast byte<short<int<long, " +
        "byte/short/int->double, float->double, integral->decimal(>=10 " +
        "integer digits), decimal growth, and date->timestamp_ntz " +
        "(probe-verified matrix, tools/TypeWidenProbe). Rewrite the table " +
        "(overwriteSchema=true) to change the type any other way.")
  }

}
