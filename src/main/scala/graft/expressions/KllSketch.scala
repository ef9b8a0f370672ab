package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Mergeable quantile sketch (KLL-style compactor hierarchy), completing
 * the sketch kit alongside distinct-count (KMV/HLL), frequency (CMS)
 * and membership (bloom): fixed-size states through the shuffle, any
 * coarser rollup computable from persisted fine-grained states without
 * rescanning the raw rows — the shape that makes percentile dashboards
 * affordable at 100 TB (a year of p99s = 365 small states, not a year
 * of rows).
 *
 * Structure: a hierarchy of buffers ("levels"); an item at level i
 * represents 2^i original rows. Rows append to level 0; when a level
 * exceeds `k` items it is sorted and every other item survives to the
 * next level with doubled weight (an odd straggler stays behind, so
 * TOTAL WEIGHT IS ALWAYS EXACTLY n — the spec pins this). The survivor
 * offset alternates deterministically per level (no RNG), so a given
 * fold order is bit-reproducible.
 *
 * Exactness contract: while a group holds at most `k` rows nothing ever
 * compacts, every row sits in level 0 with weight 1, and quantile
 * extraction reduces to the exact sorted-rank rule (below) — which is
 * how the t38/t39 oracles replay it. Past `k` rows the estimate's rank
 * error grows as O(log(n/k)·n/k) (Manku-style uniform-capacity
 * compaction; KllSketchSpec measures the empirical bound at n=200k).
 *
 * Extraction rule (matches DuckDB `quantile_disc` exactly when weights
 * are all 1): sort retained items by value; target rank
 * r = max(1, ceil(q·W)) over total weight W; answer the smallest value
 * whose cumulative weight reaches r. No interpolation — the answer is
 * always a value that occurred in the input.
 *
 * Same custom-expression position as the scalar kit (reference
 * precedent for native expressions:
 * `core/src/main/scala/io/qbeast/core/internal/expressions/QbeastMurmur3Hash.scala`);
 * the reference itself has no sketch aggregates.
 */
final class KllState(private var k0: Int) {

  /** Capacity. Mutable only through [[mergeIn]], which adopts the
   * larger side's capacity so merging states built with a bigger k
   * keeps their exactness guarantee (a k=DefaultK merge buffer must
   * not silently compact k=100000 exact states). */
  def k: Int = k0

  import scala.collection.mutable.ArrayBuffer

  /** levels(i): retained values of weight 2^i, unsorted between
   * compactions. */
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])

  /** Deterministic survivor-offset coin per level (bit i flips each
   * time level i compacts). */
  var flips: Long = 0L

  def add(v: Double): Unit = {
    levels(0) += v
    if (levels(0).length > k) compact(0)
  }

  /** Sort level i; pair up items and keep one per pair (offset
   * alternating 0/1 per compaction), promoting survivors to level i+1
   * with implicit doubled weight. An odd straggler (the largest) stays
   * at level i: m paired items of weight w become m/2 of weight 2w, so
   * total weight is preserved exactly. */
  private def compact(i: Int): Unit = {
    val buf = levels(i)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val m = arr.length - (arr.length % 2)
    val offset = ((flips >>> i) & 1L).toInt
    flips ^= (1L << i)
    if (levels.length == i + 1) levels += ArrayBuffer.empty[Double]
    val up = levels(i + 1)
    var j = offset
    while (j < m) { up += arr(j); j += 2 }
    buf.clear()
    if (m < arr.length) buf += arr(m) // straggler keeps its weight
    if (up.length > k) compact(i + 1)
  }

  def mergeIn(o: KllState): KllState = {
    if (o.k > k0) k0 = o.k
    var i = 0
    while (i < o.levels.length) {
      if (levels.length == i) levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      levels(i) ++= o.levels(i)
      i += 1
    }
    // cascade: a concatenated level may now exceed capacity
    i = 0
    while (i < levels.length) {
      if (levels(i).length > k) compact(i)
      i += 1
    }
    this
  }

  def totalWeight: Long = {
    var w = 0L
    var i = 0
    while (i < levels.length) { w += levels(i).length.toLong << i; i += 1 }
    w
  }

  /** The weighted sorted-rank extraction described in the class doc. */
  def quantiles(qs: Array[Double]): Array[Double] = {
    val n = levels.iterator.map(_.length).sum
    if (n == 0) return Array.fill(qs.length)(Double.NaN)
    val vals = new Array[Double](n)
    val wts = new Array[Long](n)
    var p = 0
    var i = 0
    while (i < levels.length) {
      val buf = levels(i)
      val w = 1L << i
      var j = 0
      while (j < buf.length) { vals(p) = buf(j); wts(p) = w; p += 1; j += 1 }
      i += 1
    }
    // indirect sort by value (stable; weights ride along)
    val idx = Array.range(0, n).sortBy(i => vals(i))(Ordering.Double.TotalOrdering)
    val total = totalWeight
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var j = 0
      var ans = vals(idx(n - 1))
      var found = false
      while (j < n && !found) {
        cum += wts(idx(j))
        if (cum >= target) { ans = vals(idx(j)); found = true }
        j += 1
      }
      ans
    }
  }

  def serialize(): Array[Byte] = {
    var bytes = 4 + 8 + 4
    levels.foreach(l => bytes += 4 + 8 * l.length)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(k)
    bb.putLong(flips)
    bb.putInt(levels.length)
    levels.foreach { l =>
      bb.putInt(l.length)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

}

object KllState {

  val DefaultK = 8192

  def deserialize(bytes: Array[Byte]): KllState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt)
    st.flips = bb.getLong
    val nLevels = bb.getInt
    st.levels.clear()
    var i = 0
    while (i < nLevels) {
      val sz = bb.getInt
      val buf = new scala.collection.mutable.ArrayBuffer[Double](sz)
      var j = 0
      while (j < sz) { buf += bb.getDouble; j += 1 }
      st.levels += buf
      i += 1
    }
    if (st.levels.isEmpty) st.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    st
  }

}

/** Shared TypedImperativeAggregate plumbing for the KLL trio. Spark
 * runs these with map-side partial aggregation: each task folds its
 * partition into one bounded state, the shuffle carries states (not
 * rows), and the final merge is a tree of state unions. */
sealed trait KllAggBase extends TypedImperativeAggregate[KllState] {

  def k: Int

  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllState = new KllState(k)
  override def merge(buffer: KllState, other: KllState): KllState =
    buffer.mergeIn(other)
  override def serialize(buffer: KllState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllState =
    KllState.deserialize(bytes)

}

/**
 * Direct per-group quantiles: `graft_kll_quantiles(value, qs, k)` →
 * `array<double>` aligned with `qs`. Input rows fold straight into the
 * sketch (no state materialization).
 */
final case class KllQuantilesAgg(
    child: Expression,
    qs: Seq[Double],
    k: Int = KllState.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends KllAggBase {

  require(k >= 8, s"kll sketch needs k >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must lie in [0,1], got $qs")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll sketch expects a double input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def update(buffer: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def eval(buffer: KllState): Any =
    new GenericArrayData(buffer.quantiles(qs.toArray))

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantilesAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_quantiles"

}

/**
 * The state-producing half of a mergeable quantile rollup: folds rows
 * and evals to the serialized sketch (BinaryType). Persist it per
 * fine-grained group; [[KllMergeAgg]] later combines states into any
 * coarser rollup without rescanning the data.
 */
final case class KllStateAgg(
    child: Expression,
    k: Int = KllState.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends KllAggBase {

  require(k >= 8, s"kll sketch needs k >= 8, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll state expects a double input, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType

  override def update(buffer: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def eval(buffer: KllState): Any = buffer.serialize()

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllStateAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KllStateAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllStateAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_state"

}

/**
 * The finishing half of the rollup: merges [[KllStateAgg]] sketches
 * (level-wise concatenation + the same deterministic compaction) and
 * returns the same `array<double>` as [[KllQuantilesAgg]]. While the
 * merged row count stays within `k`, merging the fine-grained states
 * is EXACTLY sketching the raw union — the t39 oracle pins that
 * equivalence end-to-end.
 */
final case class KllMergeAgg(
    child: Expression,
    qs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends KllAggBase {

  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must lie in [0,1], got $qs")

  // the merge buffer starts at the default capacity and ADOPTS the
  // largest incoming state's k on merge (KllState.mergeIn), so states
  // built with a bigger k keep their exactness guarantee; a roomier
  // buffer only defers compaction, and memory stays bounded at
  // max(k) doubles per level
  override def k: Int = KllState.DefaultK

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll merge expects binary sketch states, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def update(buffer: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buffer.mergeIn(KllState.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def eval(buffer: KllState): Any =
    new GenericArrayData(buffer.quantiles(qs.toArray))

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_merge"

}
