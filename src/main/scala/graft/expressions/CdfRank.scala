package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The [0,1] CDF coordinate for quantile/histogram-indexed columns — the
 * codegen replacement for the ingest projection's last boxed UDFs
 * (`index/ColumnIndexer`'s quantile/histogram arms): a binary search
 * over the revision's sorted bounds, emitted as a plain JVM call inside
 * whole-stage codegen, same discipline as [[CubeFileAssign]].
 *
 * Three modes, each numerically identical to its read-side literal
 * transform (the pruning-correctness invariant —
 * `core/transform/Transformation.scala`; reference semantics:
 * `core/src/main/scala/io/qbeast/core/transform/CDFQuantilesTransformation.scala`,
 * `.../StringHistogramTransformation.scala:55-70`):
 *
 *  - [[CdfRank.NumericQuantiles]]: exact hit → i/(n-1), miss → clamped
 *    insertion rank; null → 0.0. Compares via `Double.compare`, so NaN
 *    ordering matches the read side.
 *  - [[CdfRank.StringQuantiles]]: same rank over string bounds with
 *    JAVA `String.compareTo` (UTF-16 code-unit order — byte-comparing
 *    the `UTF8String` would diverge on supplementary characters);
 *    null → 0.0.
 *  - [[CdfRank.StringHistogram]]: exact hit → i/(n-1), miss → the bin
 *    LEFT of the insertion point, edges clamp; null ranks as the
 *    literal string "null" (reference behavior).
 *
 * The expression never returns null (`nullable = false`), so the
 * generated code branches on the child's null flag directly instead of
 * routing through `nullSafeCodeGen`.
 */
final case class CdfRank(
    child: Expression,
    mode: Int,
    numBounds: IndexedSeq[Double],
    strBounds: IndexedSeq[String])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val expected = if (mode == CdfRank.NumericQuantiles) DoubleType else StringType
    if (child.dataType == expected)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdf_rank(mode=$mode) expects ${expected.simpleString}, got " +
        child.dataType.simpleString)
  }

  // flat arrays for the per-row search (the IndexedSeq stays in the
  // case class for structural equality/serialization)
  @transient private lazy val num: Array[Double] = numBounds.toArray
  @transient private lazy val str: Array[String] = strBounds.toArray

  def rankD(v: Double): Double = {
    val n = num.length
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Double.compare(v, num(mid))
      if (c == 0) return mid.toDouble / (n - 1)
      else if (c < 0) hi = mid - 1
      else lo = mid + 1
    }
    math.min(1.0, math.max(0.0, lo.toDouble / (n - 1)))
  }

  def rankS(u: UTF8String): Double = {
    val v = u.toString
    val n = str.length
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = v.compareTo(str(mid))
      if (c == 0) return mid.toDouble / (n - 1)
      else if (c < 0) hi = mid - 1
      else lo = mid + 1
    }
    math.min(1.0, math.max(0.0, lo.toDouble / (n - 1)))
  }

  def rankH(u: UTF8String): Double = {
    val v = if (u == null) "null" else u.toString
    val n = str.length
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = v.compareTo(str(mid))
      if (c == 0) return mid.toDouble / (n - 1)
      else if (c < 0) hi = mid - 1
      else lo = mid + 1
    }
    if (lo == 0) 0.0 else math.min(1.0, (lo - 1).toDouble / (n - 1))
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    mode match {
      case CdfRank.NumericQuantiles =>
        if (v == null) 0.0 else rankD(v.asInstanceOf[Double])
      case CdfRank.StringQuantiles =>
        if (v == null) 0.0 else rankS(v.asInstanceOf[UTF8String])
      case _ =>
        rankH(if (v == null) null else v.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdfrank", this, classOf[CdfRank].getName)
    val c = child.genCode(ctx)
    val call = mode match {
      case CdfRank.NumericQuantiles => s"${c.isNull} ? 0.0 : $ref.rankD(${c.value})"
      case CdfRank.StringQuantiles => s"${c.isNull} ? 0.0 : $ref.rankS(${c.value})"
      case _ => s"$ref.rankH(${c.isNull} ? null : ${c.value})"
    }
    ev.copy(
      code = code"""
        ${c.code}
        double ${ev.value} = $call;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CdfRank =
    copy(child = newChild)

  override def prettyName: String = "cdf_rank"

}

object CdfRank {

  val NumericQuantiles = 0
  val StringQuantiles = 1
  val StringHistogram = 2

}
