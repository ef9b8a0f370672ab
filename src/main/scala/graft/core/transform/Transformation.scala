package graft.core.transform

import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Space transformation for one indexed column: maps values onto [0,1].
 *
 * Counterpart of the reference's `core/src/main/scala/io/qbeast/core/
 * transform` family (LinearTransformation.scala:61-113,
 * HashTransformation.scala:26-58, CDFQuantilesTransformation.scala:69-100),
 * re-derived for Spark 4.
 *
 * Values reaching `transform` are in *canonical numeric form* (see
 * [[CanonicalForm]]): numerics as Double, timestamps as microseconds,
 * dates as days — matching both the write-side Column expressions and
 * Catalyst's internal literal representation on the read side.
 */
sealed trait Transformation extends Serializable {

  /** Map a canonical value to [0,1]. `null` maps to a deterministic
   * in-range coordinate so null rows cluster in one cube. */
  def transform(value: Any): Double

  /** True iff `other` covers values this transformation cannot place
   * faithfully (e.g. a wider min/max range): triggers a new revision. */
  def isSupersededBy(other: Transformation): Boolean

  /** Least transformation covering both domains. */
  def merge(other: Transformation): Transformation

}

object Transformation {

  /** Murmur3 (seed 42) of a value in Catalyst internal form, folded to a
   * [0,1] coordinate. Must match the write-side Column expression in
   * [[graft.index.ColumnIndexer]]. */
  def hashCoordinate(value: Any, dataType: DataType): Double = {
    val h = Murmur3HashFunction.hash(value, dataType, 42L).toInt
    (h & 0x7fffffff).toDouble / Int.MaxValue
  }

  def toCanonicalDouble(value: Any): Double = value match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case d: BigDecimal => d.doubleValue
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"not an ordered value: $other")
  }

}

/** `(v - min) / (max - min)`, clamped: values outside the revision range
 * (possible on reads against superseded revisions) clamp to the border. */
final case class LinearTransformation(min: Double, max: Double, nullCoordinate: Double)
    extends Transformation {

  override def transform(value: Any): Double = {
    if (value == null) return nullCoordinate
    val v = Transformation.toCanonicalDouble(value)
    // NaN sorts ABOVE every value in Spark's total order; the
    // write-side Column clamps it to the TOP border the same way
    // (greatest(NaN, 0) = NaN, least(NaN, 1) = 1). Without this a NaN
    // comparison literal would produce a NaN coordinate, and a NaN
    // query-space bound intersects NOTHING — every file pruned, NaN
    // rows silently missing from `c = double('NaN')` and IN-lists.
    if (java.lang.Double.isNaN(v)) 1.0
    else if (v <= min) 0.0
    else if (v >= max) 1.0
    // same op shape as the write-side Column ((v-min)/(max-min)) so both
    // sides agree to the last bit
    else (v - min) / (max - min)
  }

  override def isSupersededBy(other: Transformation): Boolean = other match {
    case LinearTransformation(omin, omax, _) => omin < min || omax > max
    case _: IdentityTransformation => false
    case _ => true
  }

  override def merge(other: Transformation): Transformation = other match {
    case LinearTransformation(omin, omax, onull) =>
      LinearTransformation(math.min(min, omin), math.max(max, omax), onull)
    case IdentityTransformation(Some(v)) =>
      LinearTransformation(math.min(min, v), math.max(max, v), nullCoordinate)
    case _ => other
  }

}

/** Domain with a single distinct value (or empty): everything maps to 0.
 * Upgraded to Linear once a second distinct value arrives. */
final case class IdentityTransformation(value: Option[Double]) extends Transformation {

  override def transform(v: Any): Double = 0.0

  override def isSupersededBy(other: Transformation): Boolean = other match {
    case IdentityTransformation(ov) => ov != value && ov.nonEmpty && value.nonEmpty
    case LinearTransformation(omin, omax, _) =>
      value.forall(v => omin < v || omax > v) || value.isEmpty
    case _ => true
  }

  override def merge(other: Transformation): Transformation = (other, value) match {
    case (IdentityTransformation(Some(ov)), Some(v)) if ov != v =>
      LinearTransformation(math.min(v, ov), math.max(v, ov), (v + ov) / 2)
    case (IdentityTransformation(None), _) => this
    case (o, _) => o.merge(this) match {
      case m: LinearTransformation => m
      case _ => o
    }
  }

}

/** murmur3(value) & 0x7fffffff / Int.MaxValue — for un-ordered (string)
 * columns; supports only point (equality) pruning. */
final case class HashTransformation(dataTypeName: String) extends Transformation {

  @transient private lazy val dataType: DataType =
    HashTransformation.typeFromName(dataTypeName)

  override def transform(value: Any): Double = {
    if (value == null) return 0.0
    val internal = value match {
      case s: String => UTF8String.fromString(s)
      case other => other
    }
    Transformation.hashCoordinate(internal, dataType)
  }

  override def isSupersededBy(other: Transformation): Boolean = other match {
    case _: HashTransformation => false
    case _ => true
  }

  override def merge(other: Transformation): Transformation = this

}

object HashTransformation {
  def typeFromName(name: String): DataType = name match {
    case "string" => StringType
    case "int" | "integer" => IntegerType
    case "long" | "bigint" => LongType
    case "double" => DoubleType
    case "float" => FloatType
    case other => DataType.fromDDL(other)
  }
}

/** Relative rank of the value among user-provided sorted quantiles
 * (the CDF), via binary search. */
final case class CDFNumericQuantilesTransformation(quantiles: IndexedSeq[Double])
    extends Transformation {
  require(quantiles.size > 1, "quantiles need at least 2 points")

  override def transform(value: Any): Double = {
    if (value == null) return 0.0
    val v = Transformation.toCanonicalDouble(value)
    CDFQuantiles.rank(quantiles.length, i => java.lang.Double.compare(v, quantiles(i)))
  }

  override def isSupersededBy(other: Transformation): Boolean = other match {
    case CDFNumericQuantilesTransformation(oq) => oq.nonEmpty && oq != quantiles
    case _: IdentityTransformation | _: LinearTransformation => false
    case _ => true
  }

  override def merge(other: Transformation): Transformation = other match {
    case o: CDFNumericQuantilesTransformation => o
    case _ => this
  }

}

final case class CDFStringQuantilesTransformation(quantiles: IndexedSeq[String])
    extends Transformation {
  require(quantiles.size > 1, "quantiles need at least 2 points")

  override def transform(value: Any): Double = {
    if (value == null) return 0.0
    val v = value match {
      case s: UTF8String => s.toString
      case s: String => s
      case other => other.toString
    }
    CDFQuantiles.rank(quantiles.length, i => v.compareTo(quantiles(i)))
  }

  override def isSupersededBy(other: Transformation): Boolean = other match {
    case CDFStringQuantilesTransformation(oq) => oq.nonEmpty && oq != quantiles
    case _ => true
  }

  override def merge(other: Transformation): Transformation = other match {
    case o: CDFStringQuantilesTransformation => o
    case _ => this
  }

}

private[transform] object CDFQuantiles {

  /** Binary-search rank in [0,1]: `cmp(i)` compares the probe against
   * quantile i. Exact hits return i/(n-1); misses the insertion point's
   * relative rank, clamped. */
  def rank(n: Int, cmp: Int => Int): Double = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = cmp(mid)
      if (c == 0) return mid.toDouble / (n - 1)
      else if (c < 0) hi = mid - 1
      else lo = mid + 1
    }
    math.min(1.0, math.max(0.0, lo.toDouble / (n - 1)))
  }

}

/** Bin placement among sorted string bounds (reference:
 * `core/.../transform/StringHistogramTransformation.scala:55-70` —
 * deprecated upstream in favor of CDF quantiles, kept for format
 * compatibility): exact hits map to i/(n-1); misses fall into the bin
 * LEFT of the insertion point ((ip-1)/(n-1)); below-range 0, above 1.
 * Nulls rank as the literal string "null", as the reference does (vs
 * the quantile transformations' null→0.0). */
final case class StringHistogramTransformation(histogram: IndexedSeq[String])
    extends Transformation {
  require(histogram.size > 1, "histogram needs at least 2 bounds")

  def isDefault: Boolean = histogram == StringHistogramTransformation.DefaultHistogram

  override def transform(value: Any): Double = {
    val v = value match {
      case null => "null"
      case s: UTF8String => s.toString
      case s: String => s
      case other => other.toString
    }
    val n = histogram.length
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = v.compareTo(histogram(mid))
      if (c == 0) return mid.toDouble / (n - 1)
      else if (c < 0) hi = mid - 1
      else lo = mid + 1
    }
    if (lo == 0) 0.0 else math.min(1.0, (lo - 1).toDouble / (n - 1))
  }

  /** Reference semantics: the default histogram yields to any custom
   * one; a custom histogram never falls back to the default. */
  override def isSupersededBy(other: Transformation): Boolean = other match {
    case o: StringHistogramTransformation =>
      if (isDefault) !o.isDefault
      else if (o.isDefault) false
      else histogram != o.histogram
    case EmptyTransformation => false
    case _ => true
  }

  override def merge(other: Transformation): Transformation = other match {
    case EmptyTransformation => this
    case _ => other
  }

}

object StringHistogramTransformation {

  /** Reference default: one bin per lowercase ascii letter
   * (`HistogramTransformer.defaultStringHistogram`). */
  val DefaultHistogram: IndexedSeq[String] = (97 to 122).map(_.toChar.toString)

}

/** Placeholder for staging (revision 0) columns; always superseded. */
case object EmptyTransformation extends Transformation {
  override def transform(value: Any): Double = 0.0
  override def isSupersededBy(other: Transformation): Boolean = true
  override def merge(other: Transformation): Transformation = other
}
