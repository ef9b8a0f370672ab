package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for cosine similarity of two array columns
 * (float or double elements), with whole-stage codegen.
 *
 * Replaces the `aggregate(zip_with(...))` higher-order formulation: HOFs
 * evaluate a lambda per element outside codegen, while this compiles to
 * one fused primitive loop inside the generated code. The arithmetic is
 * the identical sequential fold (dot/norm accumulators added in index
 * order, products of double-widened elements), so results are
 * bit-for-bit the same as the HOF version and the DuckDB `list_reduce`
 * oracles.
 *
 * Reference precedent for a custom expression in this position:
 * `core/src/main/scala/io/qbeast/core/internal/expressions/
 * QbeastMurmur3Hash.scala:33-49` (the reference's only custom
 * expression, also a codegen'd scalar).
 */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elementIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(
        s"cosine_similarity expects array<float|double>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = elementIsFloat(left)
    val yf = elementIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    var na = 0.0
    i = 0
    val nx = x.numElements()
    while (i < nx) {
      val v = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      na += v * v
      i += 1
    }
    var nb = 0.0
    i = 0
    val ny = y.numElements()
    while (i < ny) {
      val v = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      nb += v * v
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elementIsFloat(left)) "getFloat" else "getDouble"
    val yGet = if (elementIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $x.$xGet($i)) * ((double) $y.$yGet($i));
         |}
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  double v = (double) $x.$xGet($i);
         |  $na += v * v;
         |}
         |for (int $i = 0; $i < $y.numElements(); $i++) {
         |  double v = (double) $y.$yGet($i);
         |  $nb += v * v;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

}
