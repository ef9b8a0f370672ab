package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.HashUtils

/**
 * Native codegen expressions for the text-signature operators (minhash,
 * LSH band keys, simhash, winnowing fingerprints) — the codegen
 * replacements for the Scala UDFs in [[graft.ops.Dedup]]. A UDF here
 * pays row boxing per document AND drops the whole corpus-scan stage
 * out of whole-stage codegen; these run as static calls inside the
 * generated projection, like [[TokenSetJaccard]] / [[LshBucket]].
 *
 * Semantics are bit-identical to the UDF formulations (which remain in
 * [[graft.ops.Dedup]] as the tested parity reference): same
 * `trim.split("\\s+")` tokenization via `String`, same md5-derived
 * [[HashUtils]] gram hashes, so the DuckDB oracles keep re-deriving
 * every signature bit-for-bit. Null text is null-out (every call site
 * filters or explodes, where null and the UDFs' empty/sentinel results
 * produce identical frames).
 *
 * Same custom-expression position as [[CosineSimilarity]]; reference
 * precedent `core/src/main/scala/io/qbeast/core/internal/expressions/
 * QbeastMurmur3Hash.scala:33-49`.
 */
final case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash expects a string arg, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextSignaturesImpl.minhash(a.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSignaturesImpl.minhash($x, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

}

/** LSH band keys of a minhash signature: `bands` groups of
 * numHashes/bands values, each joined with '_' (reproducible in SQL,
 * unlike a second-level hash). */
final case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_keys expects an array<bigint> arg, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextSignaturesImpl.bandKeys(a.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSignaturesImpl.bandKeys($x, $numHashes, $bands);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)

}

/** 60-bit SimHash over whitespace tokens (60 bits = 15 hex chars, so
 * the same value is a plain BIGINT in the SQL oracle). */
final case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects a string arg, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextSignaturesImpl.simhash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSignaturesImpl.simhash($x);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

}

/** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken): k-token gram
 * hashes, sliding window of `w`, per-window minimum, first-seen order. */
final case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  // analysis-time guard: a non-positive window/shingle would otherwise
  // surface as a per-row ArrayIndexOutOfBoundsException at task runtime
  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow expects a string arg, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextSignaturesImpl.winnow(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.TextSignaturesImpl.winnow($x, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

}

/** Not the expressions' companions: Scala suppresses static forwarders
 * on companion classes, and generated Java needs plain static calls. */
object TextSignaturesImpl {

  import graft.ops.Dedup.{MinHashMod, DefaultShingleTokens}

  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def params(numHashes: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(numHashes, graft.ops.Dedup.minHashParams(_))

  /** Identical arithmetic to [[graft.ops.Dedup.minHashUdf]]: word-3-gram
   * shingles hashed once (md5 → 32-bit), (a*h+b) mod p per permutation,
   * min per permutation; all-MOD sentinel for docs with < 3 tokens. */
  def minhash(text: UTF8String, numHashes: Int): ArrayData = {
    val (as, bs) = params(numHashes)
    val sig = Array.fill(numHashes)(MinHashMod)
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    var i = 0
    val n = toks.length - DefaultShingleTokens
    while (i <= n) {
      val h = HashUtils.h32(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      var j = 0
      while (j < numHashes) {
        val p = (as(j) * h + bs(j)) % MinHashMod
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  def bandKeys(sig: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val rowsPerBand = numHashes / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(rowsPerBand * 8)
      var j = b * rowsPerBand
      val end = math.min((b + 1) * rowsPerBand, sig.numElements())
      while (j < end) {
        if (j > b * rowsPerBand) sb.append('_')
        sb.append(sig.getLong(j))
        j += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  def simhash(text: UTF8String): Long = {
    val counts = new Array[Int](60)
    text.toString.trim.split("\\s+").foreach { tok =>
      if (tok.nonEmpty) {
        val h = HashUtils.h60(tok)
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
    }
    var res = 0L
    var bit = 0
    while (bit < 60) {
      if (counts(bit) > 0) res |= (1L << bit)
      bit += 1
    }
    res
  }

  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    val n = toks.length - k + 1
    if (n <= 0) UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    else {
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        hs(i) = HashUtils.h32(sb.toString)
        i += 1
      }
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      var p = 0
      val lastStart = math.max(n - w, 0)
      while (p <= lastStart) {
        var best = hs(p)
        var q = p + 1
        val end = math.min(p + w, n)
        while (q < end) { if (hs(q) < best) best = hs(q); q += 1 }
        out += best
        p += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out.toArray)
    }
  }

}
