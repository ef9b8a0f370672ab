package graft.core.model

import scala.collection.mutable.ArrayBuffer

/**
 * A node of the 2^n-ary OTree over the normalized space [0,1)^n.
 *
 * Design (original, Spark-first re-derivation of the concept in the
 * reference's `core/src/main/scala/io/qbeast/core/model/CubeId.scala`):
 * instead of z-order interleaved bit masks we keep one binary path per
 * dimension. `coords(d)` holds the `depth` most significant bits of the
 * d-th coordinate, i.e. the cube covers
 * `[coords(d)/2^depth, (coords(d)+1)/2^depth)` on dimension d.
 *
 * Total order = pre-order DFS over the tree (ancestors before
 * descendants, siblings by child index), which makes `SortedMap[CubeId, _]`
 * iterate the index tree top-down.
 *
 * Max depth is 62 (binary path per dimension must fit a Long); the tree
 * is logarithmic in (rows / desiredCubeSize) so real depths stay tiny.
 */
final case class CubeId(dimensionCount: Int, depth: Int, coords: Array[Long])
    extends Ordered[CubeId]
    with Serializable {

  require(depth >= 0 && depth <= CubeId.MaxDepth, s"invalid depth $depth")
  require(coords.length == dimensionCount, "coords/dimension mismatch")

  def isRoot: Boolean = depth == 0

  def parent: Option[CubeId] =
    if (isRoot) None
    else Some(CubeId(dimensionCount, depth - 1, coords.map(_ >> 1)))

  /** Child index (0 until 2^n) of this cube within its parent. */
  def childIndex: Int = {
    var idx = 0
    var d = 0
    while (d < dimensionCount) {
      idx = (idx << 1) | (coords(d) & 1L).toInt
      d += 1
    }
    idx
  }

  /** The j-th child, j in [0, 2^dimensionCount). Bit (n-1-d) of j selects
   * the upper half of dimension d. */
  def child(j: Int): CubeId = {
    val next = new Array[Long](dimensionCount)
    var d = 0
    while (d < dimensionCount) {
      val bit = (j >> (dimensionCount - 1 - d)) & 1
      next(d) = (coords(d) << 1) | bit
      d += 1
    }
    CubeId(dimensionCount, depth + 1, next)
  }

  def children: Iterator[CubeId] =
    Iterator.range(0, 1 << dimensionCount).map(child)

  /** The child of this cube whose region contains `point`. */
  def childContaining(point: Array[Double]): CubeId = {
    val next = new Array[Long](dimensionCount)
    var d = 0
    while (d < dimensionCount) {
      // coordinate's bit at level depth+1
      val scaled = math.min((point(d) * (1L << (depth + 1))).toLong, (1L << (depth + 1)) - 1)
      val bit = scaled & 1L
      next(d) = (coords(d) << 1) | bit
      d += 1
    }
    CubeId(dimensionCount, depth + 1, next)
  }

  def isAncestorOf(other: CubeId): Boolean =
    other.dimensionCount == dimensionCount && other.depth > depth && {
      val shift = other.depth - depth
      var d = 0
      while (d < dimensionCount) {
        if ((other.coords(d) >>> shift) != coords(d)) return false
        d += 1
      }
      true
    }

  /** Lower corner of the cube region (inclusive), in [0,1)^n. */
  def from: Array[Double] = {
    val scale = 1.0 / (1L << depth)
    coords.map(_ * scale)
  }

  /** Upper corner of the cube region (exclusive). */
  def to: Array[Double] = {
    val scale = 1.0 / (1L << depth)
    coords.map(c => (c + 1) * scale)
  }

  def contains(point: Array[Double]): Boolean = {
    val f = from
    val t = to
    var d = 0
    while (d < dimensionCount) {
      // the top edge of the space (1.0) belongs to the last cube
      val inside = point(d) >= f(d) && (point(d) < t(d) || (t(d) >= 1.0 && point(d) <= 1.0))
      if (!inside) return false
      d += 1
    }
    true
  }

  /** Pre-order DFS comparison: ancestors first, then siblings by child
   * index at the first differing level. */
  override def compare(that: CubeId): Int = {
    require(that.dimensionCount == dimensionCount, "dimension mismatch")
    val minDepth = math.min(depth, that.depth)
    var level = 1
    while (level <= minDepth) {
      val a = childIndexAt(level)
      val b = that.childIndexAt(level)
      if (a != b) return Integer.compare(a, b)
      level += 1
    }
    Integer.compare(depth, that.depth)
  }

  /** Child index taken at `level` (1-based) along the path from root. */
  private def childIndexAt(level: Int): Int = {
    val shift = depth - level
    var idx = 0
    var d = 0
    while (d < dimensionCount) {
      idx = (idx << 1) | ((coords(d) >>> shift) & 1L).toInt
      d += 1
    }
    idx
  }

  /** Compact binary form stored in the transient `_qbeastCube` column and
   * shuffled during writes: [depth: u8][coords: i64 BE each]. */
  def bytes: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(1 + 8 * dimensionCount)
    buf.put(depth.toByte)
    coords.foreach(buf.putLong)
    buf.array()
  }

  /** Human/log-friendly form, also used in the commit log JSON. */
  override def toString: String = s"$depth:${coords.mkString(",")}"

  override def equals(obj: Any): Boolean = obj match {
    case other: CubeId =>
      other.dimensionCount == dimensionCount && other.depth == depth &&
        java.util.Arrays.equals(coords, other.coords)
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * dimensionCount + depth) + java.util.Arrays.hashCode(coords)

}

object CubeId {

  val MaxDepth: Int = 62

  def root(dimensionCount: Int): CubeId =
    CubeId(dimensionCount, 0, new Array[Long](dimensionCount))

  /** The cube at `depth` containing `point` in [0,1]^n. */
  def containerAt(point: Array[Double], depth: Int): CubeId = {
    val coords = new Array[Long](point.length)
    val max = (1L << depth) - 1
    var d = 0
    while (d < point.length) {
      coords(d) = math.min((point(d) * (1L << depth)).toLong, max)
      d += 1
    }
    CubeId(point.length, depth, coords)
  }

  /** All containers of `point`, from the root downwards (infinite up to
   * MaxDepth; callers take while needed). */
  def containers(point: Array[Double]): Iterator[CubeId] =
    new Iterator[CubeId] {
      private var current = root(point.length)
      private var first = true
      override def hasNext: Boolean = first || current.depth < MaxDepth
      override def next(): CubeId = {
        if (first) { first = false }
        else { current = current.childContaining(point) }
        current
      }
    }

  def fromBytes(dimensionCount: Int, bytes: Array[Byte]): CubeId = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val depth = buf.get().toInt
    val coords = new Array[Long](dimensionCount)
    var d = 0
    while (d < dimensionCount) { coords(d) = buf.getLong; d += 1 }
    CubeId(dimensionCount, depth, coords)
  }

  def fromString(dimensionCount: Int, s: String): CubeId = {
    val Array(d, rest @ _*) = s.split(":"): @unchecked
    val depth = d.toInt
    val coords =
      if (depth == 0 && (rest.isEmpty || rest.head.isEmpty)) new Array[Long](dimensionCount)
      else rest.head.split(",").map(_.toLong)
    CubeId(dimensionCount, depth, coords)
  }

}
