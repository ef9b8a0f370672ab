package graft.ops

/**
 * Deterministic, engine-portable hashing for the signature operators
 * (minhash, simhash, LSH hyperplanes, fingerprints). Everything derives
 * from MD5 so the exact same integers/doubles are computable in ANSI SQL
 * (`('0x' || substr(md5(s), 1, n))::BIGINT`) — the DuckDB oracles
 * re-derive every signature bit-for-bit instead of trusting the engine.
 */
object HashUtils {

  private val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def md5Bytes(s: String): Array[Byte] = {
    val d = digest.get()
    d.reset()
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** First 8 hex chars of md5 as unsigned 32-bit in a Long (0..2^32-1). */
  def h32(s: String): Long = {
    val b = md5Bytes(s)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** First 15 hex chars of md5 as a 60-bit non-negative Long. */
  def h60(s: String): Long = {
    val b = md5Bytes(s)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4 // 16 hex nibbles collected, drop the last → first 15
  }

}
