package graft.write

import graft.expressions.HllDistinctAgg

import org.apache.spark.sql.catalyst.InternalRow

/**
 * Per-file HyperLogLog register states over the configured
 * `hllColumns` (Snowflake's per-micro-partition NDV idea, folded into
 * the per-file stats JSON like the bloom filters): 256 bytes per file
 * per column buy a METADATA-ONLY approximate distinct count for the
 * whole table — registers are folded over each file's rows at write
 * time, and elementwise-max across files equals the registers over the
 * union of their rows, so the driver fold answers exactly what one
 * full-scan sketch would. At 100 TB, "how many distinct user_ids"
 * becomes a per-file byte-array union instead of a scan — and the
 * register state is integer-exact, so the estimate is bit-for-bit the
 * one the t36 oracle replays.
 *
 * The key is the same engine-portable md5-derived 32-bit hash as the
 * sketch kit ([[graft.ops.Sketch.portableHash32]]), computed by the
 * write projection as an extra codegen column — dearer than the bloom
 * collector's xxhash64, which is why `hllColumns` is opt-in and
 * separate. NULLs are skipped (distinct counts non-null values, like
 * the aggregate kit).
 */
final class HllCollector(
    names: Array[String],
    srcIdx: Array[Int],
    hashIdx: Array[Int]) {

  private val regs: Array[Array[Byte]] =
    Array.fill(names.length)(new Array[Byte](HllDistinctAgg.M))

  def update(row: InternalRow): Unit = {
    var j = 0
    while (j < names.length) {
      if (!row.isNullAt(srcIdx(j)) && !row.isNullAt(hashIdx(j)))
        HllDistinctAgg.updateRegisters(regs(j), row.getLong(hashIdx(j)))
      j += 1
    }
  }

  /** `{"col":"<base64 256-byte registers>"}` — the value of the stats
   * JSON's `hll` key. */
  def toJsonSection: String = {
    val sb = new StringBuilder(64)
    sb.append('{')
    var j = 0
    while (j < names.length) {
      if (j > 0) sb.append(',')
      sb.append('"').append(names(j)).append("\":\"")
        .append(java.util.Base64.getEncoder.encodeToString(regs(j)))
        .append('"')
      j += 1
    }
    sb.append('}')
    sb.toString
  }

}
