package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Set Jaccard of two array&lt;string&gt; token columns in a single pass —
 * the codegen replacement for
 * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b)))`,
 * which builds a hash set AND materializes the intersection array twice
 * per candidate pair. This runs once per pair in the blocked pairwise
 * join (t04) where it is the hottest scalar; one hash-set membership
 * pass, no intermediate arrays.
 *
 * Semantics: arrays are treated as sets (elements deduplicated), so for
 * the element-distinct inputs produced by [[graft.ops.Dedup.tokenSet]]
 * the value is bit-identical to the `array_intersect` formulation and
 * the DuckDB oracle; `0/0` yields NaN exactly like double division in
 * the old form. Same custom-expression position as [[CosineSimilarity]];
 * reference precedent
 * `core/src/main/scala/io/qbeast/core/internal/expressions/QbeastMurmur3Hash.scala:33-49`.
 */
final case class TokenSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_set_jaccard expects array<string> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenSetJaccardImpl.setJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // The hash-set walk stays in a JVM helper (a static call is as fast as
  // inlined generated Java here); emitting it via nullSafeCodeGen keeps
  // the enclosing stage inside whole-stage codegen instead of falling
  // back to an interpreted projection.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.TokenSetJaccardImpl.setJaccard($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSetJaccard =
    copy(left = newLeft, right = newRight)

}

/** Not the expression's companion: Scala suppresses static forwarders on
 * companion classes, and generated Java needs a plain static call. */
object TokenSetJaccardImpl {

  def setJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[AnyRef](math.max(8, na * 2))
    var i = 0
    while (i < na) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[AnyRef](math.max(8, nb * 2))
    var inter = 0
    i = 0
    while (i < nb) {
      val e = b.getUTF8String(i)
      if (setB.add(e) && setA.contains(e)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    inter.toDouble / union
  }

}
