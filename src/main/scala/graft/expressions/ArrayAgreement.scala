package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Count of positions where two array&lt;bigint&gt; columns agree, over the
 * common prefix — the codegen replacement for
 * `aggregate(zip_with(a, b, (x,y) => if(x==y,1,0)), 0, _+_)` in the
 * minhash estimated-jaccard step, which otherwise runs an interpreted
 * lambda per signature element for every candidate pair and blocks
 * whole-stage codegen. Same custom-expression position as
 * [[CosineSimilarity]] / [[IntegerDotProduct]].
 */
final case class ArrayAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_agreement expects array<bigint> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAgreement =
    copy(left = newLeft, right = newRight)

}
