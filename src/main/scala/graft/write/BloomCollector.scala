package graft.write

import graft.expressions.BloomImpl

import org.apache.spark.sql.catalyst.InternalRow

/**
 * Per-file bloom filters over the configured `bloomFilterColumns`
 * (Delta's bloom-filter-index idea, folded into the per-file stats
 * JSON instead of separate index files): point lookups on
 * high-cardinality NON-indexed columns — the one predicate shape
 * min/max ranges cannot prune (every file's [min, max] spans the
 * probe) — skip every file whose filter proves the value absent. At
 * 100 TB, `WHERE request_id = 'x'` becomes a driver-side bitset probe
 * per file instead of a full scan.
 *
 * The key is `xxhash64(col)` — computed by the WRITE PROJECTION as an
 * extra codegen column (position `hashIdx(j)` of the tagged row), so
 * the per-row cost here is one `getLong` + k bit-sets; the read side
 * ([[graft.read.FileStatsPruning]]) hashes its literal through the
 * same Catalyst XxHash64, so write and probe agree bit-for-bit on
 * every atomic type. NULLs are not inserted (an equality filter never
 * matches NULL); probe positions are [[BloomImpl]]'s Kirsch–
 * Mitzenmacher double hashing — the same math as the
 * `graft_bloom_bits` / `graft_might_contain` SQL kit.
 */
final class BloomCollector(
    names: Array[String],
    srcIdx: Array[Int],
    hashIdx: Array[Int],
    numBits: Long,
    numHashes: Int) {

  private val words: Array[Array[Long]] =
    Array.fill(names.length)(new Array[Long](((numBits + 63) / 64).toInt))

  def update(row: InternalRow): Unit = {
    var j = 0
    while (j < names.length) {
      if (!row.isNullAt(srcIdx(j)))
        BloomImpl.set(words(j), row.getLong(hashIdx(j)), numHashes)
      j += 1
    }
  }

  /** `{"col":{"k":7,"b64":"<little-endian longs>"}}` — the value of the
   * stats JSON's `bloomFilters` key. */
  def toJsonSection: String = {
    val sb = new StringBuilder(64)
    sb.append('{')
    var j = 0
    while (j < names.length) {
      if (j > 0) sb.append(',')
      val w = words(j)
      val bb = java.nio.ByteBuffer.allocate(w.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.asLongBuffer().put(w)
      sb.append('"').append(names(j)).append("\":{\"k\":").append(numHashes)
        .append(",\"b64\":\"")
        .append(java.util.Base64.getEncoder.encodeToString(bb.array()))
        .append("\"}")
      j += 1
    }
    sb.append('}')
    sb.toString
  }

}

object BloomCollector {

  /** ~10 bits/key with k=7 probes ≈ 0.8% false-positive rate — the
   * classic sizing; fp only costs a wasted file read, never
   * correctness. */
  val DefaultBitsPerKey = 10

  val NumHashes = 7

  /** Per-file filter sizing from the expected rows per file (the rollup
   * target): clamped so a tiny write still gets a useful filter and a
   * huge rollup cannot bloat the log (1 MiB of bitset per file per
   * column at the cap; an overfull filter degrades fp rate, not
   * correctness). */
  def numBitsFor(expectedRows: Long, bitsPerKey: Int): Long =
    math.min(1L << 23, math.max(1024L, expectedRows * bitsPerKey))

}
