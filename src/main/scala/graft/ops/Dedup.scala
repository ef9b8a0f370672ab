package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/**
 * Deduplication operators for large-scale training-data pipelines.
 *
 * Scale design: every signature (minhash, simhash) is computed in ONE
 * map-side pass per row (no explode of shingles across the cluster —
 * at 100 TB exploding 5-gram shingles would multiply the shuffle by
 * ~text length). Only compact signatures and band keys shuffle; the
 * candidate-pair join is an equi-join on (band, bucket) that Spark
 * executes as a hash join over a tiny projected relation.
 */
object Dedup {

  // ---- exact --------------------------------------------------------------

  /** Exact dedup: one representative (min id) per distinct content. */
  def exactDedup(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  // ---- minhash + LSH ------------------------------------------------------

  val DefaultNumHashes = 64
  val DefaultShingleSize = 5

  /** MinHash signature of the character-shingle set: shingles hashed once
   * with murmur3, then each of the `numHashes` permutations is the
   * classic (a_i*h + b_i) universal family; min per permutation. */
  def minHashUdf(numHashes: Int = DefaultNumHashes, shingleSize: Int = DefaultShingleSize) = {
    val rnd = new scala.util.Random(42)
    val as = Array.fill(numHashes)(rnd.nextInt() | 1)
    val bs = Array.fill(numHashes)(rnd.nextInt())
    udf { (text: String) =>
      val sig = Array.fill(numHashes)(Int.MaxValue)
      if (text != null && text.length >= shingleSize) {
        var i = 0
        val n = text.length - shingleSize
        while (i <= n) {
          val h = MurmurHash3.stringHash(text.substring(i, i + shingleSize), 42)
          var j = 0
          while (j < numHashes) {
            val p = as(j) * h + bs(j)
            if (p < sig(j)) sig(j) = p
            j += 1
          }
          i += 1
        }
      }
      sig
    }
  }

  /** LSH band keys: signature split into `bands` rows-per-band groups,
   * each hashed to one bucket id. */
  def bandKeysUdf(numHashes: Int = DefaultNumHashes, bands: Int = 16) = {
    val rowsPerBand = numHashes / bands
    udf { (sig: Seq[Int]) =>
      (0 until bands).map { b =>
        MurmurHash3.orderedHash(sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand), b)
      }.toArray
    }
  }

  /**
   * Candidate near-duplicate pairs with estimated Jaccard ≥ `threshold`.
   * Pipeline: signature (map) → band explode (rows × bands, compact) →
   * self equi-join on (band, bucket) → signature agreement estimate.
   */
  def minHashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      numHashes: Int = DefaultNumHashes,
      bands: Int = 16): DataFrame = {
    val sig = minHashUdf(numHashes)
    val bkeys = bandKeysUdf(numHashes, bands)
    val sigs = df.select(col(idCol).as("id"), sig(col(textCol)).as("sig"))
      .withColumn("bands", bkeys(col("sig")))
    val exploded = sigs.select(col("id"), col("sig"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val a = exploded.alias("a")
    val b = exploded.alias("b")
    val est = aggregate(
      zip_with(col("a.sig"), col("b.sig"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / numHashes
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), est.as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  // ---- simhash ------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens (murmur3 token hashes). */
  def simHashUdf = udf { (text: String) =>
    if (text == null) 0L
    else {
      val counts = new Array[Int](64)
      text.split("\\s+").foreach { tok =>
        if (tok.nonEmpty) {
          val h1 = MurmurHash3.stringHash(tok, 42).toLong & 0xffffffffL
          val h2 = MurmurHash3.stringHash(tok, 1337).toLong & 0xffffffffL
          val h = (h1 << 32) | h2
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
            bit += 1
          }
        }
      }
      var res = 0L
      var bit = 0
      while (bit < 64) {
        if (counts(bit) > 0) res |= (1L << bit)
        bit += 1
      }
      res
    }
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDistance, blocked by
   * 16-bit chunks (pigeonhole: any pair within distance 3 shares at least
   * one of 4 chunks) so the join is an equi-join, not a cross product. */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3): DataFrame = {
    val hashes = df.select(col(idCol).as("id"), simHashUdf(col(textCol)).as("sh"))
    val chunks = hashes.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "ckey")))
    val a = chunks.alias("a")
    val b = chunks.alias("b")
    val hamming = bit_count(col("a.sh").bitwiseXOR(col("b.sh")))
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming.cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  // ---- exact n-gram jaccard ----------------------------------------------

  /** Distinct token set of a text column (unigram shingles). */
  def tokenSet(c: Column): Column = array_distinct(split(trim(c), "\\s+"))

  /** Exact token-set Jaccard for candidate pairs; `pairs` must provide
   * text_a / text_b columns. Pure `functions._` — codegen, no UDF. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - size(array_intersect(a, b))
    inter / union
  }

  // ---- embedding cosine near-dup -----------------------------------------

  /** Cosine similarity of two float-array columns, computed in double
   * with a sequential fold (deterministic, matches the DuckDB oracle). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

}
