package graft.core.model

/**
 * A row's sampling weight: a uniformly distributed Int (the murmur3 hash
 * of the indexed columns, seed 42). `fraction` maps the Int range onto
 * [0,1] so that `weight.fraction <= f` selects an f-fraction of rows.
 *
 * Mirrors the semantics of the reference's
 * `core/src/main/scala/io/qbeast/core/model/Weight.scala`.
 */
final case class Weight(value: Int) extends Ordered[Weight] with Serializable {

  def fraction: Double =
    (value.toLong - Int.MinValue).toDouble / Weight.Range

  override def compare(that: Weight): Int = Integer.compare(value, that.value)

  def max(that: Weight): Weight = if (this >= that) this else that
  def min(that: Weight): Weight = if (this <= that) this else that

}

object Weight {

  /** Size of the Int range as a Double (2^32). */
  val Range: Double = Int.MaxValue.toLong - Int.MinValue.toLong

  val MinValue: Weight = Weight(Int.MinValue)
  val MaxValue: Weight = Weight(Int.MaxValue)

  /** Weight whose `fraction` is (approximately) `f`, clamped to range. */
  def fromFraction(f: Double): Weight = {
    if (f <= 0.0) MinValue
    else if (f >= 1.0) MaxValue
    else Weight((Int.MinValue + f * Range).toLong.min(Int.MaxValue).toInt)
  }

}

/** `[from, to)` interval of weights used for sampling pushdown. */
final case class WeightRange(from: Weight, to: Weight) extends Serializable {
  def isAll: Boolean = from == Weight.MinValue && to == Weight.MaxValue
}

object WeightRange {
  val All: WeightRange = WeightRange(Weight.MinValue, Weight.MaxValue)
}

/**
 * Normalized cube weight in [0,1]: the fraction of the global weight
 * range whose rows land in a cube or its ancestors. Values > 1 mark
 * under-filled leaf cubes (desiredCubeSize / elementCount, like the
 * reference's `NormalizedWeight.scala`).
 */
object NormalizedWeight {

  def apply(desiredCubeSize: Int, elementCount: Long): Double =
    if (elementCount == 0) 1.0 else desiredCubeSize.toDouble / elementCount

  def toWeight(nw: Double): Weight =
    if (nw >= 1.0) Weight.MaxValue else Weight.fromFraction(nw)

}
