package graft.write

import graft.expressions.KllState

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/**
 * Per-file KLL quantile-sketch states over the configured `kllColumns`
 * (the percentile analogue of [[HllCollector]]'s per-file NDV
 * registers): each data file carries one serialized
 * [[graft.expressions.KllState]] per column in its stats JSON, and
 * [[graft.table.QbeastTable.approxQuantile]] folds them driver-side
 * into a whole-table quantile estimate with ZERO data files read — the
 * p99-latency / median-doc-length dashboard as a metadata fold.
 *
 * The state is built over each file's rows at write time with the same
 * deterministic compaction the aggregate kit uses, so merging the
 * per-file states is EXACTLY sketching the union of their rows: while
 * a file holds ≤ k rows its state is the exact level-0 multiset, and
 * while the merged total stays ≤ k the folded answer equals DuckDB
 * `quantile_disc` bit-for-bit (the q95 oracle regime). Beyond capacity
 * the usual KLL rank-error bound applies.
 *
 * Cost: ≤ ~8·k bytes per file per column (k = `kllK`, default
 * [[KllCollector.DefaultK]] = 256 → ≤ ~2 KB), a deliberate order of
 * magnitude under the aggregate kit's default — this state rides the
 * commit log, and at 1e5 files × 2 KB it stays a ~200 MB sidecar-scale
 * section, not a driver hazard. NULLs are skipped; NaN is skipped too
 * (a NaN coordinate would poison every compaction sort), matching how
 * `quantile_disc`/`percentile` ignore NULLs.
 */
final class KllCollector(
    names: Array[String],
    srcIdx: Array[Int],
    kinds: Array[Int],
    k: Int) {

  private val states: Array[KllState] = Array.fill(names.length)(new KllState(k))

  def update(row: InternalRow): Unit = {
    var j = 0
    while (j < names.length) {
      val i = srcIdx(j)
      if (!row.isNullAt(i)) {
        val v: Double = kinds(j) match {
          case KllCollector.KByte => row.getByte(i).toDouble
          case KllCollector.KShort => row.getShort(i).toDouble
          case KllCollector.KInt => row.getInt(i).toDouble
          case KllCollector.KLong => row.getLong(i).toDouble
          case KllCollector.KFloat => row.getFloat(i).toDouble
          case _ => row.getDouble(i)
        }
        if (!java.lang.Double.isNaN(v)) states(j).add(v)
      }
      j += 1
    }
  }

  /** `{"col":"<base64 serialized KllState>"}` — the value of the stats
   * JSON's `kll` key. */
  def toJsonSection: String = {
    val sb = new StringBuilder(64)
    sb.append('{')
    var j = 0
    while (j < names.length) {
      if (j > 0) sb.append(',')
      sb.append('"').append(names(j)).append("\":\"")
        .append(java.util.Base64.getEncoder.encodeToString(states(j).serialize()))
        .append('"')
      j += 1
    }
    sb.append('}')
    sb.toString
  }

}

object KllCollector {

  /** Default per-file capacity (see the class doc's size budget). */
  val DefaultK = 256

  val KByte = 0
  val KShort = 1
  val KInt = 2
  val KLong = 3
  val KFloat = 4
  val KDouble = 5

  /** Numeric, date and timestamp columns sketch faithfully: the state
   * stores doubles, and date days / timestamp micros (< 2^53) are
   * exact in a double. */
  def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
        DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  def kindOf(dt: DataType): Int = dt match {
    case ByteType => KByte
    case ShortType => KShort
    case IntegerType | DateType => KInt
    case LongType | TimestampType | TimestampNTZType => KLong
    case FloatType => KFloat
    case _ => KDouble
  }

}
