package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Sign-projection LSH bucket id of an embedding column — the codegen
 * replacement for `Similarity.lshBucketUdf`, which was the last Scala
 * UDF on the ANN hot path: a UDF boxes every vector into `Seq[Float]`
 * per row and blocks whole-stage codegen for the enclosing projection,
 * and bucketing runs once per row on EVERY side of the LSH joins
 * (base corpus, query multi-probe explode, per-level hot-bucket
 * refinement).
 *
 * The plane bank is not serialized: it is re-derived on each node from
 * `(planeOffset, bits, dim)` via the md5-seeded generator the SQL
 * oracle also unrolls, so results are bit-identical to the UDF (same
 * sequential fold, float widened to double per element, `dot >= 0`
 * sign test, min(dim, len) prefix).
 *
 * Same custom-expression position as [[CosineSimilarity]]; reference
 * precedent `core/src/main/scala/io/qbeast/core/internal/expressions/
 * QbeastMurmur3Hash.scala:33-49`.
 */
final case class LshBucket(
    child: Expression,
    bits: Int,
    dim: Int,
    planeOffset: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  private def elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket expects an array<float|double> arg, got ${other.simpleString}")
    }

  @transient private lazy val planes: Array[Array[Double]] =
    graft.ops.Similarity.hyperplanesFrom(planeOffset, bits, dim)

  override protected def nullSafeEval(a: Any): Any =
    LshBucketImpl.bucket(a.asInstanceOf[ArrayData], planes, elementIsFloat)

  // The per-plane dot loop lives in a JVM static (as fast as inlined
  // generated Java); emitting the call via nullSafeCodeGen keeps the
  // enclosing stage inside whole-stage codegen. The plane bank rides
  // along as a codegen reference object — no per-row derivation.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val isFloat = elementIsFloat
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.LshBucketImpl.bucket($x, $planesRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)

}

/** Not the expression's companion: Scala suppresses static forwarders on
 * companion classes, and generated Java needs a plain static call. */
object LshBucketImpl {

  def bucket(arr: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    val len = arr.numElements()
    var out = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(p.length, len)
      var dot = 0.0
      var i = 0
      if (isFloat) {
        while (i < n) { dot += p(i) * arr.getFloat(i); i += 1 }
      } else {
        while (i < n) { dot += p(i) * arr.getDouble(i); i += 1 }
      }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

}
