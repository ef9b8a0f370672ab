package graft.core.model

/**
 * Normalized query hyperrectangle in transformed space (reference:
 * `core/.../model/QuerySpace.scala:78-165`). Bounds are treated as the
 * CLOSED box [from, to] — deliberately conservative: file pruning may
 * over-include (Spark re-applies row filters) but must never exclude a
 * matching file.
 */
sealed trait QuerySpace extends Serializable {
  def intersectsWith(cube: CubeId): Boolean
  /** true iff `other` selects a subset of this space (OR-branch dedup) */
  def contains(other: QuerySpace): Boolean
}

case object AllSpace extends QuerySpace {
  override def intersectsWith(cube: CubeId): Boolean = true
  override def contains(other: QuerySpace): Boolean = true
}

case object EmptySpace extends QuerySpace {
  override def intersectsWith(cube: CubeId): Boolean = false
  override def contains(other: QuerySpace): Boolean = other == EmptySpace
}

final case class QuerySpaceFromTo(from: Array[Double], to: Array[Double])
    extends QuerySpace {

  override def intersectsWith(cube: CubeId): Boolean = {
    // per-dimension bounds computed inline (coords(d)·scale), not via
    // cube.from/cube.to: those allocate a fresh array each, and this
    // runs once per block per query disjunct across the whole metadata
    // scan — the pruning hot path
    val scale = 1.0 / (1L << cube.depth)
    val coords = cube.coords
    var d = 0
    while (d < from.length) {
      val cFrom = coords(d) * scale
      val cTo = (coords(d) + 1) * scale
      // cube region is [cFrom, cTo); query box is closed [from, to];
      // the top edge of the space belongs to the last cube. A query at
      // exactly the column max transforms to coordinate 1.0 and only
      // cubes whose region touches the top edge (cTo == 1.0) hold such
      // rows — without the special case every file would be pruned and
      // max-value rows silently lost (reference QuerySpace adds the
      // same clause).
      val overlaps =
        (from(d) < cTo || (from(d) == 1.0 && cTo == 1.0)) && to(d) >= cFrom
      if (!overlaps) return false
      d += 1
    }
    true
  }

  override def contains(other: QuerySpace): Boolean = other match {
    case EmptySpace => true
    case QuerySpaceFromTo(of, ot) =>
      from.indices.forall(d => from(d) <= of(d) && ot(d) <= to(d))
    case _ => false
  }

  // value equality over the bound arrays: the case-class default
  // compares Array references, which made QuerySpecBuilder's
  // `.distinct` over expanded disjuncts a no-op — duplicate branches
  // like `(a > 1 AND b) OR (a > 1 AND c)` then pay blockMatches twice
  // per block across the whole metadata scan
  override def equals(obj: Any): Boolean = obj match {
    case QuerySpaceFromTo(of, ot) =>
      java.util.Arrays.equals(from, of) && java.util.Arrays.equals(to, ot)
    case _ => false
  }

  override def hashCode(): Int =
    31 * java.util.Arrays.hashCode(from) + java.util.Arrays.hashCode(to)

}

object QuerySpace {

  /** Build from per-dimension optional bounds (None = unbounded). */
  def apply(
      dims: Int,
      lower: Array[Option[Double]],
      upper: Array[Option[Double]]): QuerySpace = {
    if (lower.forall(_.isEmpty) && upper.forall(_.isEmpty)) return AllSpace
    val from = new Array[Double](dims)
    val to = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      from(d) = lower(d).getOrElse(0.0)
      to(d) = upper(d).getOrElse(1.0)
      if (from(d) > to(d)) return EmptySpace
      d += 1
    }
    QuerySpaceFromTo(from, to)
  }

}
