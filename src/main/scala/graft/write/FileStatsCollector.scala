package graft.write

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-file column statistics accumulated during the write
 * (Delta-style data skipping stats: numRecords, minValues, maxValues,
 * nullCount). Ride in `IndexFile.stats` — the slot the reference
 * reserved for exactly this (`QbeastFiles.scala:58`) — and feed
 * file-level pruning for predicates on NON-indexed columns, which the
 * OTree block metadata cannot see.
 *
 * Eligible columns: numeric, boolean, string, date, timestamp — capped
 * at [[FileStatsCollector.MaxStatsColumns]] (Delta's
 * dataSkippingNumIndexedCols default). String values longer than
 * [[FileStatsCollector.MaxStringLen]] contribute TRUNCATED bounds
 * (Delta's trick) instead of invalidating the column: the code-point
 * prefix is a valid lower bound as-is, and [[FileStatsCollector.bumpUpper]]
 * increments the prefix's last bumpable code point into a valid upper
 * bound — so a document body still prunes range/prefix predicates at
 * 64 chars of log weight. Sides whose winning bound came from a
 * truncated value are marked in an `"inexact"` JSON section: pruning
 * ignores it (a bound is a bound), but the metadata min/max fold
 * ([[graft.rules.MetadataCountRule]]) must not return a string that
 * exists in no row. Invalid UTF-8 drops the column's bounds outright —
 * its JSON round-trip through String is not order-preserving.
 *
 * The row loop is allocation-free: numeric extrema live in primitive
 * arrays (no boxing), string extrema clone only when a row actually
 * sets a new min/max (UnsafeRow-backed UTF8Strings are reused buffers,
 * so keeping a reference without cloning would corrupt).
 */
final class FileStatsCollector(schema: StructType) {

  import FileStatsCollector._

  // type tags: 0=long-family, 1=double-family, 2=boolean, 3=string
  private val fieldIdx: Array[Int] = schema.fields.zipWithIndex
    .collect { case (f, i) if eligible(f.dataType) => i }
    .take(MaxStatsColumns)
  private val names: Array[String] = fieldIdx.map(i => schema.fields(i).name)
  private val tags: Array[Int] = fieldIdx.map(i => tagOf(schema.fields(i).dataType))
  private val kinds: Array[Int] = fieldIdx.map(i => kindOf(schema.fields(i).dataType))

  private val n = fieldIdx.length
  private val longMin = Array.fill(n)(Long.MaxValue)
  private val longMax = Array.fill(n)(Long.MinValue)
  private val dblMin = Array.fill(n)(Double.PositiveInfinity)
  private val dblMax = Array.fill(n)(Double.NegativeInfinity)
  // NaN sorts ABOVE +Infinity in Spark's total order (nanSafeCompare*),
  // but primitive </> never registers it — track it separately so a
  // file containing NaN reports max=NaN instead of the largest non-NaN
  // (which would let `col > huge` wrongly prune the file and would make
  // a metadata-answered max() silently drop the NaN)
  private val hasNaN = new Array[Boolean](n)
  private val dblSeen = new Array[Boolean](n)
  private val strMin = new Array[UTF8String](n)
  private val strMax = new Array[UTF8String](n)
  // per-side exactness: false when the current winner is a truncated
  // lower bound / bumped upper bound rather than an actual row value
  private val minExact = Array.fill(n)(true)
  private val maxExact = Array.fill(n)(true)
  private val nulls = new Array[Long](n)
  private val seen = new Array[Boolean](n)
  // cleared only for strings: invalid UTF-8 (round-trip not
  // order-preserving) or an unbumpable prefix (all U+10FFFF)
  private val valid = Array.fill(n)(true)
  private var numRecords = 0L

  def update(row: InternalRow): Unit = {
    numRecords += 1
    var j = 0
    while (j < n) {
      val i = fieldIdx(j)
      if (row.isNullAt(i)) nulls(j) += 1
      else if (valid(j)) {
        tags(j) match {
          case 0 =>
            val v = kinds(j) match {
              case KByte => row.getByte(i).toLong
              case KShort => row.getShort(i).toLong
              case KInt => row.getInt(i).toLong
              case _ => row.getLong(i)
            }
            if (v < longMin(j)) longMin(j) = v
            if (v > longMax(j)) longMax(j) = v
          case 1 =>
            val v = if (kinds(j) == KFloat) row.getFloat(i).toDouble else row.getDouble(i)
            if (java.lang.Double.isNaN(v)) hasNaN(j) = true
            else {
              dblSeen(j) = true
              if (v < dblMin(j)) dblMin(j) = v
              if (v > dblMax(j)) dblMax(j) = v
            }
          case 2 =>
            val v = if (row.getBoolean(i)) 1L else 0L
            if (v < longMin(j)) longMin(j) = v
            if (v > longMax(j)) longMax(j) = v
          case _ =>
            val s = row.getUTF8String(i)
            // once invalidated, the `else if (valid(j))` gate above
            // skips this column entirely on every subsequent row — the
            // nulled bounds can never be repopulated
            if (!s.isValid) { valid(j) = false; strMin(j) = null; strMax(j) = null }
            else if (s.numChars() > MaxStringLen) {
              // truncated bounds: the prefix is ≤ the value (lower
              // bound); the bumped prefix is > any extension of it
              // (upper bound). Either winning marks its side inexact.
              // ALLOCATION GUARD, so document-body columns stay cheap
              // per row: stored bounds are ≤ MaxStringLen code points,
              // so s ≥ strMin implies prefix(s) ≥ strMin (the prefix
              // can't dive below an existing ≤-cap bound the full
              // value beats), and s < strMax implies bump(prefix(s))
              // can never strictly exceed strMax (the bump position is
              // at or after the first differing code point) — both
              // sides then skip without allocating.
              val minLoses = strMin(j) != null && s.compareTo(strMin(j)) >= 0
              val maxLoses = strMax(j) != null && s.compareTo(strMax(j)) < 0
              if (!minLoses || !maxLoses) {
                val pfx = s.substring(0, MaxStringLen).clone()
                if (!minLoses && (strMin(j) == null || pfx.compareTo(strMin(j)) < 0)) {
                  strMin(j) = pfx; minExact(j) = false
                }
                if (!maxLoses) {
                  val ub = bumpUpper(pfx)
                  if (ub == null) { valid(j) = false; strMin(j) = null; strMax(j) = null }
                  else if (strMax(j) == null || ub.compareTo(strMax(j)) > 0) {
                    strMax(j) = ub; maxExact(j) = false
                  }
                }
              }
            } else {
              if (strMin(j) == null || s.compareTo(strMin(j)) < 0) {
                strMin(j) = s.clone(); minExact(j) = true
              }
              if (strMax(j) == null || s.compareTo(strMax(j)) > 0) {
                strMax(j) = s.clone(); maxExact(j) = true
              }
            }
        }
        seen(j) = true
      }
      j += 1
    }
  }

  /** Delta-shaped JSON: {"numRecords":N,"minValues":{},"maxValues":{},"nullCount":{}} */
  def toJson: String = toJson(None)

  def toJson(bloomSection: Option[String]): String = toJson(bloomSection, None)

  def toJson(bloomSection: Option[String], hllSection: Option[String]): String =
    toJson(bloomSection, hllSection, None)

  /** Same, with optional extra `"bloomFilters"` / `"hll"` / `"kll"`
   * sections (see [[BloomCollector.toJsonSection]] /
   * [[HllCollector.toJsonSection]] / [[KllCollector.toJsonSection]])
   * appended — readers that don't know a key
   * ([[graft.read.FileStatsPruning.parse]] pre-bloom, any external
   * Delta-stats consumer) skip it untouched. */
  def toJson(
      bloomSection: Option[String],
      hllSection: Option[String],
      kllSection: Option[String]): String = {
    val sb = new StringBuilder(256)
    sb.append("{\"numRecords\":").append(numRecords)
    def section(name: String, isMin: Boolean): Unit = {
      sb.append(",\"").append(name).append("\":{")
      var first = true
      var j = 0
      while (j < n) {
        if (valid(j) && seen(j) && !(tags(j) == 3 && (if (isMin) strMin(j) else strMax(j)) == null)) {
          if (!first) sb.append(',')
          first = false
          sb.append('"').append(names(j)).append("\":")
          tags(j) match {
            case 0 => sb.append(if (isMin) longMin(j) else longMax(j))
            case 1 =>
              // Spark total order: min is the smallest non-NaN (NaN only
              // when the column is all-NaN); max is NaN whenever any row
              // was NaN. Non-finite doubles are not legal JSON numbers —
              // emit the sentinel strings the reader maps back
              // (FileStatsPruning.nonFinite / MetadataCountRule)
              val v =
                if (isMin) { if (dblSeen(j)) dblMin(j) else Double.NaN }
                else { if (hasNaN(j)) Double.NaN else dblMax(j) }
              if (java.lang.Double.isFinite(v)) sb.append(v.toString)
              else sb.append('"').append(
                if (java.lang.Double.isNaN(v)) "NaN"
                else if (v > 0) "Infinity" else "-Infinity").append('"')
            case 2 => sb.append(if ((if (isMin) longMin(j) else longMax(j)) == 1L) "true" else "false")
            case _ => appendJsonString(sb, (if (isMin) strMin(j) else strMax(j)).toString)
          }
        }
        j += 1
      }
      sb.append('}')
    }
    section("minValues", isMin = true)
    section("maxValues", isMin = false)
    sb.append(",\"nullCount\":{")
    var first = true
    var j = 0
    while (j < n) {
      if (!first) sb.append(',')
      first = false
      sb.append('"').append(names(j)).append("\":").append(nulls(j))
      j += 1
    }
    sb.append('}')
    // inexact-bound markers (truncated strings only): which side(s) of
    // a column's min/max are bounds rather than actual row values —
    // pruning ignores this section, the metadata min/max fold bails on it
    var anyInexact = false
    j = 0
    while (j < n && !anyInexact) {
      anyInexact = valid(j) && tags(j) == 3 &&
        ((strMin(j) != null && !minExact(j)) || (strMax(j) != null && !maxExact(j)))
      j += 1
    }
    if (anyInexact) {
      sb.append(",\"inexact\":{")
      first = true
      j = 0
      while (j < n) {
        if (valid(j) && tags(j) == 3) {
          val im = strMin(j) != null && !minExact(j)
          val ix = strMax(j) != null && !maxExact(j)
          if (im || ix) {
            if (!first) sb.append(',')
            first = false
            sb.append('"').append(names(j)).append("\":\"")
              .append(if (im && ix) "minmax" else if (im) "min" else "max")
              .append('"')
          }
        }
        j += 1
      }
      sb.append('}')
    }
    bloomSection.foreach(b => sb.append(",\"bloomFilters\":").append(b))
    hllSection.foreach(h => sb.append(",\"hll\":").append(h))
    kllSection.foreach(k => sb.append(",\"kll\":").append(k))
    sb.append('}')
    sb.toString
  }

}

object FileStatsCollector {

  /** Delta's `dataSkippingNumIndexedCols` default. */
  val MaxStatsColumns = 32

  /** Bound-truncation length for string values (longer values
   * contribute truncated bounds instead of exact extremes). */
  val MaxStringLen = 64

  /** The smallest-effort string STRICTLY GREATER than every extension
   * of `pfx` in UTF-8 byte order (= code-point order): increment the
   * last bumpable code point (skipping the surrogate gap) and drop the
   * tail. Null only when every code point is U+10FFFF (no upper bound
   * exists at this length — the caller invalidates the column). */
  private[graft] def bumpUpper(pfx: UTF8String): UTF8String = {
    val cps = pfx.toString.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) < 0x10FFFF) {
        var next = cps(i) + 1
        // the surrogate range is not encodable as a code point
        if (next >= 0xD800 && next <= 0xDFFF) next = 0xE000
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < i) { sb.appendCodePoint(cps(k)); k += 1 }
        sb.appendCodePoint(next)
        return UTF8String.fromString(sb.toString)
      }
      i -= 1
    }
    null
  }

  private val KByte = 0
  private val KShort = 1
  private val KInt = 2
  private val KLong = 3
  private val KFloat = 4
  private val KDouble = 5

  def eligible(dt: DataType): Boolean = dt match {
    // DecimalType is excluded: JSON round-trip through double-precision
    // parsing could shift a min/max boundary and mis-prune
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
        BooleanType | DateType | TimestampType | TimestampNTZType => true
    // collated strings compare by their collator: binary min/max would
    // both MIS-PRUNE (predicates evaluate under the collation) and
    // mis-fold — only binary-ordered strings carry bounds
    case st: StringType => st == StringType // default UTF8_BINARY only
    case _ => false
  }

  private def tagOf(dt: DataType): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType => 0
    case FloatType | DoubleType => 1
    case BooleanType => 2
    case _ => 3
  }

  private def kindOf(dt: DataType): Int = dt match {
    case ByteType => KByte
    case ShortType => KShort
    case IntegerType | DateType => KInt
    case FloatType => KFloat
    case DoubleType => KDouble
    case _ => KLong
  }

  private def appendJsonString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

}
