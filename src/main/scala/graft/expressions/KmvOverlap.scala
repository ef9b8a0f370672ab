package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/**
 * Corpus-overlap analysis from persisted KMV sketch states: how many
 * distinct values (documents, shingles, vocabulary terms) two groups
 * share, without ever joining the raw rows. The state half
 * ([[KmvSetStateAgg]]) folds each group's k smallest distinct 32-bit
 * hashes into a serialized sorted set — O(k) longs per group through
 * the shuffle and into a persistable sketch table; the pair half
 * ([[KmvOverlapExpr]]) compares two states and answers
 * `(inter, uni, jaccard)`.
 *
 * Exactness contract (the t40 oracle's regime): while BOTH groups hold
 * fewer than k distinct hashes the states are their complete hash
 * sets, so intersection/union/Jaccard are exact integer counts an
 * external engine replays bit-for-bit (same md5-derived hash as
 * [[KmvDistinctAgg]]). Past capacity the answer degrades to the
 * standard k-minimum-values coordinated-sample estimate: Jaccard from
 * the shared fraction of the combined k-min sample, union from the
 * Bar-Yossef estimator, intersection as their product — fixed error
 * O(1/sqrt(k)) regardless of corpus size.
 *
 * At 100 TB this is the cross-corpus dashboard shape: persist one
 * small state per (crawl, day, source), then answer any pairwise
 * overlap question from states alone — no rescan, no O(rows) join.
 * The reference has no sketch surface (this extends the engine; same
 * native-expression position as
 * `core/src/main/scala/io/qbeast/core/internal/expressions/QbeastMurmur3Hash.scala`).
 */
final case class KmvSetStateAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv state expects a bigint hash input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvState, other: KmvState): KmvState =
    buffer.mergeIn(other)

  /** `[k: int][size: int][sorted hashes: long...]` — k rides the state
   * so the pair expression needs no out-of-band configuration. */
  override def eval(buffer: KmvState): Any = serialize(buffer)

  override def serialize(buffer: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buffer.set.size)
    bb.putInt(k)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sk = bb.getInt
    val n = bb.getInt
    val s = new KmvState(sk)
    var i = 0
    while (i < n) { s.set.add(bb.getLong); i += 1 }
    s
  }

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSetStateAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KmvSetStateAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSetStateAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kmv_state"

}

/**
 * Pairwise overlap of two [[KmvSetStateAgg]] states. Returns
 * `struct<inter: double, uni: double, jaccard: double>`; see the file
 * doc for the exact-vs-estimate contract. NaN for two empty states.
 */
final case class KmvOverlapExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv overlap expects two binary states, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  // BinaryExpression's default (left.nullable || right.nullable): a
  // null state (outer-joined pair) must answer null, and codegen must
  // keep the null guards — forcing false here would NPE in generated
  // code while the interpreted path returned null
  override def dataType: DataType = KmvOverlapExpr.OutputType

  private def parse(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    (k, arr)
  }

  def overlap(aBytes: Array[Byte], bBytes: Array[Byte]): InternalRow = {
    val (ka, a) = parse(aBytes)
    val (kb, b) = parse(bBytes)
    val k = math.min(ka, kb)
    // one two-pointer pass over the sorted arrays: merged distinct
    // size m, the both-present count over ALL of it (the exact
    // branch), and the both-present count within the k smallest union
    // values (the coordinated-sample branch)
    var i = 0
    var j = 0
    var m = 0
    var fullRho = 0
    var rhoK = 0
    while (i < a.length || j < b.length) {
      val both = i < a.length && j < b.length && a(i) == b(j)
      if (both) {
        fullRho += 1
        if (m < k) rhoK += 1
      }
      if (both) { i += 1; j += 1 }
      else if (j >= b.length || (i < a.length && a(i) < b(j))) i += 1
      else j += 1
      m += 1
    }
    if (m == 0)
      return InternalRow(0.0, 0.0, Double.NaN)
    if (a.length < ka && b.length < kb) {
      // BOTH states are complete hash sets (neither ever evicted), so
      // the exact answer is computable regardless of the union's size:
      // exact integer counts, and one IEEE division the oracle replays
      // bit-for-bit
      InternalRow(fullRho.toDouble, m.toDouble, fullRho.toDouble / m.toDouble)
    } else {
      // at least one side evicted: coordinated k-min sample — jaccard
      // from the shared fraction of the k smallest union values, union
      // from the Bar-Yossef estimator over that sample. The sample has
      // full size k here (a saturated side alone contributes >= k >=
      // min(k) values), so rhoK/k is the unbiased shared fraction.
      val jac = rhoK.toDouble / k.toDouble
      val kth = KmvOverlapExpr.kthOfUnion(a, b, k)
      val uniEst = ((k - 1).toDouble * 4294967296.0) / kth.toDouble
      InternalRow(jac * uniEst, uniEst, jac)
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    overlap(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  // reference-object call, same pattern as the other sketch
  // expressions: the pair computation is O(k) per ROW-PAIR and stays
  // inside whole-stage codegen
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kmvov", this, classOf[KmvOverlapExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.overlap($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvOverlapExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_kmv_overlap"

}

object KmvOverlapExpr {

  val OutputType: StructType = StructType(Seq(
    StructField("inter", DoubleType, nullable = false),
    StructField("uni", DoubleType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))

  /** k-th smallest distinct value of the union of two sorted arrays. */
  def kthOfUnion(a: Array[Long], b: Array[Long], k: Int): Long = {
    var i = 0
    var j = 0
    var seen = 0
    var last = 0L
    while (seen < k) {
      if (i < a.length && j < b.length && a(i) == b(j)) {
        last = a(i); i += 1; j += 1
      } else if (j >= b.length || (i < a.length && a(i) < b(j))) {
        last = a(i); i += 1
      } else {
        last = b(j); j += 1
      }
      seen += 1
    }
    last
  }

}
