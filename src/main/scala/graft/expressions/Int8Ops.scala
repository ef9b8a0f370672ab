package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native codegen expressions for the int8-quantized ANN path (e06).
 *
 * The `functions.transform/aggregate/zip_with` formulation evaluates an
 * interpreted lambda per array element and blocks whole-stage codegen
 * for the enclosing stage; these compile to fused primitive loops and
 * re-enable codegen's common-subexpression elimination, so a projection
 * that references the quantized vector several times (dot, norm,
 * rounded score) computes it once. Arithmetic is identical to the HOF
 * version and the DuckDB oracle: scale = 127/max|v| (0 when the vector
 * is all zeros), elements rounded with floor(x*scale + 0.5) — the
 * rounding that agrees between Java and SQL on negative ties.
 *
 * Same custom-expression position as [[CosineSimilarity]]; reference
 * precedent `core/.../internal/expressions/QbeastMurmur3Hash.scala:33-49`.
 */
final case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(
        s"int8_quantize expects array<float|double>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quantize expects array<float|double>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val f = elementIsFloat
    val n = x.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(if (f) x.getFloat(i).toDouble else x.getDouble(i))
      if (v > amax) amax = v
      i += 1
    }
    val scale = if (amax > 0) 127.0 / amax else 0.0
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = math.floor(v * scale + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elementIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val amax = ctx.freshName("amax")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = java.lang.Math.abs((double) $x.$get($i));
         |  if (v > $amax) $amax = v;
         |}
         |double $scale = $amax > 0 ? 127.0 / $amax : 0.0;
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (long) java.lang.Math.floor(((double) $x.$get($i)) * $scale + 0.5);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)

}

/** Exact integer dot product of two array&lt;long&gt; columns over the
 * common prefix — the codegen replacement for
 * `aggregate(zip_with(a, b, _*_), 0L, _+_)`. */
final case class IntegerDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_dot expects array<bigint> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $x.getLong($i) * $y.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntegerDotProduct =
    copy(left = newLeft, right = newRight)

}

/**
 * Nearest-centroid assignment for [[graft.ops.Similarity.kmeansInt8]]:
 * argmin over `centroids` of the exact integer squared distance to the
 * input `array<bigint>` vector, ties broken by the smaller centroid
 * index — identical semantics to the
 * `array_min(transform(..., struct(dist, cid)))` HOF formulation, but
 * compiled to one fused primitive loop (HOF lambdas evaluate
 * interpreted per row and block whole-stage codegen; measured ~10× on
 * the sf0.1 assignment pass). The centroid matrix rides into generated
 * code as a referenced `long[][]` — k·d longs, broadcast with the
 * plan.
 */
final case class KMeansAssign(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "kmeans_assign needs at least one centroid")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmeans_assign expects array<bigint>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var best = 0
    var bestDist = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(x.numElements(), cv.length)
      var dist = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - cv(i)
        dist += d * d
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      s"""
         |int $best = 0;
         |long $bestDist = java.lang.Long.MAX_VALUE;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  long[] $cv = $cents[$c];
         |  int $n = java.lang.Math.min($x.numElements(), $cv.length);
         |  long $dist = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $x.getLong($i) - $cv[$i];
         |    $dist += $d * $d;
         |  }
         |  if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): KMeansAssign =
    copy(child = newChild)

  // Array[Array[Long]] has identity equals; the semantic identity for
  // plan equality is the centroid CONTENT
  override def equals(other: Any): Boolean = other match {
    case k: KMeansAssign =>
      child == k.child &&
        centroids.length == k.centroids.length &&
        centroids.zip(k.centroids).forall { case (a, b) => a.sameElements(b) }
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + centroids.map(java.util.Arrays.hashCode).toSeq.hashCode()

}
