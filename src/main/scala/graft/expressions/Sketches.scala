package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Distributed sketch aggregates. Both are `TypedImperativeAggregate`s,
 * so Spark runs them with map-side partial aggregation: each task folds
 * its partition into one small buffer, the shuffle carries buffers (not
 * rows), and the final merge is a tree of buffer unions — the shape
 * that makes a sketch over 100 TB cost one scan plus a few KB per task.
 *
 * Same custom-expression position as the scalar kit (reference
 * precedent for native expressions:
 * `core/src/main/scala/io/qbeast/core/internal/expressions/QbeastMurmur3Hash.scala`);
 * the reference itself has no sketch aggregates — these extend the
 * engine for corpus-statistics jobs (distinct-count per group, join
 * pre-filtering) a training-data pipeline needs.
 */
object SketchHash {

  /** splitmix64 finalizer — deterministic 64-bit mix, cheap enough for
   * per-row codegen and self-contained (no engine hash dependency). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

}

// ---------------------------------------------------------------------------
// KMV (k-minimum-values) distinct-count sketch
// ---------------------------------------------------------------------------

/** Bounded buffer of the k smallest DISTINCT hash values seen. */
final class KmvState(val k: Int) {
  // TreeSet keeps (size ≤ k) sorted uniques; add/evict are O(log k)
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
  }

  def mergeIn(o: KmvState): KmvState = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
    this
  }
}

/**
 * KMV distinct-count sketch over a LongType hash column (the caller
 * supplies the hash — e.g. the first 8 md5 hex chars as an unsigned
 * 32-bit value — so an external engine can replay the estimate
 * bit-for-bit). Returns `struct<est: double, kth: bigint>`:
 *
 *  - fewer than k distinct hashes seen → `est` is the exact distinct
 *    count, `kth` the largest kept hash;
 *  - otherwise `est = (k-1) · 2^32 / kth` where `kth` is the k-th
 *    smallest distinct hash (Bar-Yossef et al.'s unbiased KMV
 *    estimator over hashes normalized to [0,1); 32-bit hashes keep
 *    the double arithmetic exact so the estimate is deterministic).
 */
final case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv sketch expects a bigint hash input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType =
    StructType(Seq(StructField("est", DoubleType, nullable = false),
      StructField("kth", LongType, nullable = false)))

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvState, other: KmvState): KmvState =
    buffer.mergeIn(other)

  override def eval(buffer: KmvState): Any = {
    val n = buffer.set.size
    val kth = if (n == 0) 0L else buffer.set.last.longValue()
    val est =
      if (n < k) n.toDouble
      else ((k - 1).toDouble * 4294967296.0) / kth.toDouble
    InternalRow(est, kth)
  }

  override def serialize(buffer: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.set.size)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new KmvState(k)
    var i = 0
    while (i < n) { s.set.add(bb.getLong); i += 1 }
    s
  }

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kmv_distinct"

}

// ---------------------------------------------------------------------------
// HyperLogLog distinct-count sketch (fixed 256 registers)
// ---------------------------------------------------------------------------

/**
 * HyperLogLog over a LongType 32-bit hash column (same caller-supplied
 * hash contract as [[KmvDistinctAgg]], so an external engine replays the
 * register state bit-for-bit). Fixed p = 8 → 256 byte registers: the
 * buffer is 256 bytes per group REGARDLESS of cardinality — where KMV
 * carries k longs, HLL carries a quarter of that and merges by
 * elementwise max, the textbook sketch for billions of groups at 100 TB.
 *
 * Register update: bucket = low 8 hash bits, rho = position of the
 * highest set bit in the remaining 24 (`25 - bitLength(h >>> 8)`, 25
 * for a zero remainder). Returns `struct<est: double, scaled: bigint,
 * zeros: bigint>`:
 *
 *  - `scaled = Σ_b 2^(25 - reg[b])` — the harmonic denominator as an
 *    EXACT integer (≤ 2^33), and `zeros` the empty-register count;
 *    both replay in integer SQL with no floating-point at all;
 *  - `est` applies Flajolet's standard corrections to the raw estimate
 *    `alpha·m²·2^25 / scaled`: linear counting below 2.5·m when any
 *    register is empty, the 32-bit hash-collision correction above
 *    2^32/30. The raw path is one IEEE division (bit-exact across
 *    engines); the correction paths go through ln(), where engines may
 *    differ in the last ulp — 8 orders of magnitude below the
 *    comparator's 1e-6 rounding.
 */
final case class HllDistinctAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllDistinctAgg._

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll sketch expects a bigint hash input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = HllDistinctAgg.OutputType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) updateRegisters(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    mergeRegisters(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = evalRegisters(buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllDistinctAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_hll_distinct"

}

object HllDistinctAgg {

  /** Register count (p = 8). */
  val M = 256

  /** alpha_256 · 256² · 2^25 — the raw-estimate numerator, precomputed
   * so eval is a single division. The SAME decimal literal appears in
   * the t36 oracle SQL; both engines parse it to the identical double. */
  val AlphaNum: Double = 1579498136381.3938

  /** 2^32 — the hash value space (portableHash32 is 32-bit). */
  val HashSpace: Double = 4294967296.0

  /** Fold a 32-bit hash into the register array (shared by the direct
   * and state-producing aggregates). */
  def updateRegisters(buffer: Array[Byte], h: Long): Unit = {
    val bucket = (h & (M - 1)).toInt
    val w = h >>> 8
    val rho = if (w == 0L) 25 else 25 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
  }

  /** Elementwise-max merge of two register arrays (into `buffer`). */
  def mergeRegisters(buffer: Array[Byte], other: Array[Byte]): Unit = {
    var i = 0
    while (i < M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
  }

  /** The corrected estimate + exact integer state from a register
   * array (the single definition both finishing aggregates share). */
  def evalRegisters(buffer: Array[Byte]): InternalRow = {
    var scaled = 0L
    var zeros = 0L
    var i = 0
    while (i < M) {
      scaled += 1L << (25 - buffer(i))
      if (buffer(i) == 0) zeros += 1
      i += 1
    }
    val raw = AlphaNum / scaled.toDouble
    val est =
      if (zeros > 0 && raw <= 2.5 * M) M.toDouble * StrictMath.log(M.toDouble / zeros)
      else if (raw > HashSpace / 30.0) -HashSpace * StrictMath.log(1.0 - raw / HashSpace)
      else raw
    InternalRow(est, scaled, zeros)
  }

  val OutputType: DataType =
    StructType(Seq(StructField("est", DoubleType, nullable = false),
      StructField("scaled", LongType, nullable = false),
      StructField("zeros", LongType, nullable = false)))

}

/**
 * The state-producing half of a mergeable HLL rollup: same register
 * fold as [[HllDistinctAgg]], but eval returns the RAW 256-byte
 * register array (BinaryType) instead of an estimate. Persist it per
 * fine-grained group (per day, per shard); [[HllMergeAgg]] later
 * combines states into any coarser rollup WITHOUT rescanning the data —
 * the pre-aggregated cube pattern that makes distinct-count dashboards
 * affordable at 100 TB (a year = 365 tiny states, not a year of rows).
 */
final case class HllStateAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllDistinctAgg._

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll state expects a bigint hash input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) updateRegisters(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    mergeRegisters(buffer, other)
    buffer
  }

  // the buffer is also the result — clone on eval so the returned value
  // cannot alias a buffer Spark may keep mutating
  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllStateAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): HllStateAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllStateAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_hll_state"

}

/**
 * The finishing half of the rollup: merges [[HllStateAgg]] register
 * arrays (elementwise max — associative, commutative, idempotent, so
 * re-merging overlapping states never double-counts) and returns the
 * same `struct<est, scaled, zeros>` as [[HllDistinctAgg]]. Merging the
 * per-fine-group states equals running the sketch over the raw union:
 * the t37 oracle pins that equivalence end-to-end.
 */
final case class HllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllDistinctAgg._

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll merge expects binary register states, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = HllDistinctAgg.OutputType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val state = v.asInstanceOf[Array[Byte]]
      require(state.length == M,
        s"hll state must be $M bytes, got ${state.length}")
      mergeRegisters(buffer, state)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    mergeRegisters(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = evalRegisters(buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_hll_merge"

}

// ---------------------------------------------------------------------------
// Bloom filter: bitset aggregate + codegen membership probe
// ---------------------------------------------------------------------------

object BloomImpl {

  /** Double hashing (Kirsch–Mitzenmacher): k probe positions derived
   * from two splitmix64 values — h2 forced odd so the stride cycles
   * the whole table. */
  def probe(v: Long, i: Int, numBits: Long): Long = {
    val h1 = SketchHash.mix64(v)
    val h2 = SketchHash.mix64(v ^ 0x9e3779b97f4a7c15L) | 1L
    java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
  }

  def set(words: Array[Long], v: Long, numHashes: Int): Unit = {
    val numBits = words.length.toLong * 64L
    var i = 0
    while (i < numHashes) {
      val pos = probe(v, i, numBits)
      words((pos >>> 6).toInt) |= (1L << (pos & 63L).toInt)
      i += 1
    }
  }

  def mightContain(words: ArrayData, v: Long, numHashes: Int): Boolean = {
    val numBits = words.numElements().toLong * 64L
    var i = 0
    while (i < numHashes) {
      val pos = probe(v, i, numBits)
      if ((words.getLong((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Driver-side probe over a plain word array (file-skipping path). */
  def mightContain(words: Array[Long], v: Long, numHashes: Int): Boolean = {
    val numBits = words.length.toLong * 64L
    var i = 0
    while (i < numHashes) {
      val pos = probe(v, i, numBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }

}

/**
 * Builds a bloom-filter bitset (`array<bigint>`, `numBits` bits) over a
 * LongType key column. Partial buffers are plain long arrays merged by
 * bitwise OR, so the aggregate is one scan + an O(numBits/64) reduce —
 * the build side of a hand-rolled runtime join filter: aggregate the
 * small side, embed the bitset as a literal in a [[BloomMightContain]]
 * predicate on the big side, and the filter prunes BEFORE the join
 * shuffle.
 */
final case class BloomBitsAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & 63) == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom agg expects a bigint key input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomImpl.set(buffer, v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitsAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_bloom_bits"

}

/**
 * `might_contain(bits, key)` — true iff every probe bit for `key` is
 * set in the bitset. False positives only (rate set by the builder's
 * numBits/numHashes); never false negatives, so filtering a join's big
 * side with it before the exact join preserves the join result. Stays
 * inside whole-stage codegen (static helper call, same pattern as
 * [[TokenSetJaccard]]).
 */
final case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && right.dataType == LongType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"might_contain expects (array<bigint>, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(bits: Any, v: Any): Any =
    BloomImpl.mightContain(bits.asInstanceOf[ArrayData], v.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = graft.expressions.BloomImpl.mightContain($b, $v, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_might_contain"

}

// ---------------------------------------------------------------------------
// Count-min sketch: counter-matrix aggregate + codegen point estimate
// ---------------------------------------------------------------------------

object CmsImpl {

  /** Row-r probe column for key hash `v`: splitmix64 re-mix salted by
   * the row index, reduced mod width. Internal-only (the heavy-hitter
   * pipeline re-confirms candidates exactly, so the oracle never needs
   * to replay these probes). */
  def probe(v: Long, row: Int, width: Int): Int =
    java.lang.Long.remainderUnsigned(
      SketchHash.mix64(v + row.toLong * 0xc2b2ae3d27d4eb4fL), width.toLong).toInt

  def update(counters: Array[Long], v: Long, depth: Int, width: Int): Unit = {
    var r = 0
    while (r < depth) {
      counters(r * width + probe(v, r, width)) += 1L
      r += 1
    }
  }

  /** Point estimate = min over rows; an OVERestimate of the true count
   * (counters only ever collide upward), hence no false negatives when
   * thresholding. */
  def estimate(counters: ArrayData, v: Long, depth: Int, width: Int): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counters.getLong(r * width + probe(v, r, width))
      if (c < min) min = c
      r += 1
    }
    min
  }

}

/**
 * Count-min sketch aggregate over a LongType key hash: a depth×width
 * counter matrix flattened to `array<bigint>`. Partial buffers merge by
 * elementwise addition (the sketch is a linear projection of the count
 * vector), so map-side combine applies and the shuffle carries
 * depth·width longs per task — for the default 4×4096 that is 128 KiB
 * regardless of input size. The driver-side result is small enough to
 * re-broadcast as a literal into a [[CmsEstimate]] predicate: the
 * frequency analogue of the bloom join pre-filter.
 */
final case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"cms depth must be in [1,16], got $depth")
  require(width >= 16, s"cms width must be >= 16, got $width")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms agg expects a bigint key input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CmsImpl.update(buffer, v.asInstanceOf[Long], depth, width)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): CmsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_cms"

}

/**
 * `cms_estimate(counters, keyHash)` — count-min point estimate of the
 * key's frequency (always ≥ the true count). Stays inside whole-stage
 * codegen via a static helper call, like [[BloomMightContain]].
 */
final case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && right.dataType == LongType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (array<bigint>, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(counters: Any, v: Any): Any =
    CmsImpl.estimate(counters.asInstanceOf[ArrayData], v.asInstanceOf[Long], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, v) =>
      s"${ev.value} = graft.expressions.CmsImpl.estimate($c, $v, $depth, $width);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cms_estimate"

}
