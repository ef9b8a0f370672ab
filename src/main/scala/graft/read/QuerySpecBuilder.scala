package graft.read

import graft.core.model._
import graft.core.transform._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.{InSubqueryExec, ScalarSubquery}

/** One disjunct of the query: a hyperrectangle in transformed space plus
 * a weight (sampling) range (reference: `core/.../index/query/
 * QuerySpec.scala`, `QuerySpecBuilder.scala:51-217`). */
final case class QuerySpec(weightRange: WeightRange, querySpace: QuerySpace)

/**
 * Extracts QuerySpecs for one revision from Catalyst data filters.
 * Deliberately conservative: anything unrecognized simply contributes no
 * constraint (files are over-selected, never under-selected; Spark
 * re-applies every row filter after the scan).
 */
final class QuerySpecBuilder(revision: Revision) {

  private val columnIndex: Map[String, Int] =
    revision.columnNames.map(_.toLowerCase).zipWithIndex.toMap

  private val MaxDisjuncts = 32

  def build(filters: Seq[Expression]): Seq[QuerySpec] = {
    val weightRange = extractWeightRange(filters)
    val branches = expandDisjunctions(filters)
    branches.map(conjuncts => QuerySpec(weightRange, extractQuerySpace(conjuncts))).distinct
  }

  /** Expand OR nodes into up-to-MaxDisjuncts conjunct lists; overflow
   * drops the offending filter (conservative over-selection). */
  private def expandDisjunctions(filters: Seq[Expression]): Seq[Seq[Expression]] = {
    var branches: Seq[Seq[Expression]] = Seq(Nil)
    filters.flatMap(splitConjuncts).foreach { conjunct =>
      val options = splitDisjuncts(conjunct)
      if (options.size * branches.size <= MaxDisjuncts) {
        branches = for (b <- branches; o <- options) yield b ++ splitConjuncts(o)
      }
    }
    branches
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def splitDisjuncts(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => splitDisjuncts(l) ++ splitDisjuncts(r)
    case other => Seq(other)
  }

  // ---- weight (sampling) range -------------------------------------------

  /** Recognize the `murmur3(cols, seed=42)` comparisons the SampleRule
   * emits (stock Murmur3Hash doubles as the reference's QbeastMurmur3Hash
   * marker — same algorithm, same seed, so pruning on any such filter is
   * semantically sound). */
  private def extractWeightRange(filters: Seq[Expression]): WeightRange = {
    var from = Weight.MinValue
    var to = Weight.MaxValue
    filters.flatMap(splitConjuncts).foreach {
      case LessThan(SamplingHash(), Literal(v: Int, _)) => to = to.min(Weight(v))
      // `hash <= v` keeps rows of weight exactly v, but `to` is an
      // EXCLUSIVE bound (blockMatches needs minWeight < to) — map to
      // v+1 with overflow guard so such blocks are not under-selected
      case LessThanOrEqual(SamplingHash(), Literal(v: Int, _)) =>
        to = to.min(if (v == Int.MaxValue) Weight.MaxValue else Weight(v + 1))
      case GreaterThanOrEqual(SamplingHash(), Literal(v: Int, _)) => from = from.max(Weight(v))
      case GreaterThan(SamplingHash(), Literal(v: Int, _)) => from = from.max(Weight(v))
      case _ =>
    }
    WeightRange(from, to)
  }

  private object SamplingHash {
    /** Only murmur3(exactly the revision's indexed columns, seed 42) is
     * the row weight; a user's own hash() over other columns says
     * nothing about block weights and must not prune. */
    def unapply(e: Expression): Boolean = e match {
      case m: Murmur3Hash if m.seed == 42 =>
        val names = m.children.collect { case a: Attribute => a.name.toLowerCase }
        names.length == m.children.length &&
          names == revision.columnNames.map(_.toLowerCase)
      case _ => false
    }
  }

  // ---- query space ---------------------------------------------------------

  private final class Bounds(dims: Int) {
    val lower = Array.fill[Option[Double]](dims)(None)
    val upper = Array.fill[Option[Double]](dims)(None)
    def tightenLower(dim: Int, coord: Double): Unit =
      lower(dim) = Some(lower(dim).fold(coord)(math.max(_, coord)))
    def tightenUpper(dim: Int, coord: Double): Unit =
      upper(dim) = Some(upper(dim).fold(coord)(math.min(_, coord)))
  }

  private def extractQuerySpace(conjuncts: Seq[Expression]): QuerySpace = {
    val dims = revision.dimensionCount
    val bounds = new Bounds(dims)

    def dimOf(a: Attribute): Option[Int] = columnIndex.get(a.name.toLowerCase)

    /** `isLower`: Some(true)=lower bound, Some(false)=upper, None=point. */
    def constrain(dim: Int, value: Any, isLower: Option[Boolean]): Unit = {
      val t = revision.transformations(dim)
      val monotonic = t match {
        case _: LinearTransformation | _: IdentityTransformation |
            _: CDFNumericQuantilesTransformation |
            _: CDFStringQuantilesTransformation |
            _: StringHistogramTransformation => true
        case _ => false
      }
      if (!monotonic && isLower.nonEmpty) return // hash: ranges can't prune
      val coord =
        try t.transform(value)
        catch { case _: Exception => return }
      isLower match {
        case Some(true) => bounds.tightenLower(dim, coord)
        case Some(false) => bounds.tightenUpper(dim, coord)
        case None =>
          bounds.tightenLower(dim, coord)
          bounds.tightenUpper(dim, coord)
      }
    }

    def constrainIn(a: Attribute, values: Seq[Any]): Unit = dimOf(a).foreach { dim =>
      val t = revision.transformations(dim)
      val coords = values.map { v =>
        try t.transform(v)
        catch { case _: Exception => return } // any failure → no constraint
      }
      if (coords.nonEmpty) {
        // covering range of the transformed points (reference:
        // QueryFiltersUtils.scala IN→range); correct for hash too since
        // every matching row's coordinate is one of the points
        bounds.tightenLower(dim, coords.min)
        bounds.tightenUpper(dim, coords.max)
      }
    }

    /** Literal, or an already-executed scalar subquery. NOTE (measured,
     * tools/SubqProbe): Spark's FileSourceStrategy strips every filter
     * containing a subquery from a V1 scan's dataFilters before they
     * reach any FileIndex — on Spark 3.5 AND 4.1 — so this branch (and
     * the reference's InSubqueryExec handling it mirrors,
     * QueryFiltersUtils.scala:197) only fires if Spark ever starts
     * passing them; defense-in-depth, not a live pruning path. */
    object ConstVal {
      def unapply(e: Expression): Option[Any] = e match {
        case Literal(v, _) => Option(v)
        case s: ScalarSubquery =>
          scala.util.Try(s.eval(InternalRow.empty)).toOption.flatMap(Option(_))
        case _ => None
      }
    }

    def constrainInSubquery(in: InSubqueryExec): Unit = in.child match {
      case a: Attribute =>
        scala.util.Try(in.values()).toOption.flatten
          .foreach(vs => constrainIn(a, vs.toSeq.filter(_ != null)))
      case _ =>
    }

    conjuncts.foreach {
      case GreaterThan(a: Attribute, ConstVal(v)) => dimOf(a).foreach(constrain(_, v, Some(true)))
      case GreaterThanOrEqual(a: Attribute, ConstVal(v)) => dimOf(a).foreach(constrain(_, v, Some(true)))
      case LessThan(a: Attribute, ConstVal(v)) => dimOf(a).foreach(constrain(_, v, Some(false)))
      case LessThanOrEqual(a: Attribute, ConstVal(v)) => dimOf(a).foreach(constrain(_, v, Some(false)))
      case EqualTo(a: Attribute, ConstVal(v)) => dimOf(a).foreach(constrain(_, v, None))
      case EqualTo(ConstVal(v), a: Attribute) => dimOf(a).foreach(constrain(_, v, None))
      case EqualNullSafe(a: Attribute, Literal(v, _)) if v != null => dimOf(a).foreach(constrain(_, v, None))
      case GreaterThan(ConstVal(v), a: Attribute) => dimOf(a).foreach(constrain(_, v, Some(false)))
      case GreaterThanOrEqual(ConstVal(v), a: Attribute) => dimOf(a).foreach(constrain(_, v, Some(false)))
      case LessThan(ConstVal(v), a: Attribute) => dimOf(a).foreach(constrain(_, v, Some(true)))
      case LessThanOrEqual(ConstVal(v), a: Attribute) => dimOf(a).foreach(constrain(_, v, Some(true)))
      case In(a: Attribute, values) if values.nonEmpty && values.forall(_.isInstanceOf[Literal]) =>
        constrainIn(a, values.map(_.asInstanceOf[Literal].value).filter(_ != null))
      case InSet(a: Attribute, values) if values.nonEmpty =>
        constrainIn(a, values.toSeq.filter(_ != null))
      // materialized IN-subquery (reference QueryFiltersUtils.scala:197).
      // On Spark 4 plain `IN (SELECT ...)` rewrites to a semi join, but
      // DPP-style injected filters still carry InSubqueryExec.
      case in: InSubqueryExec => constrainInSubquery(in)
      case DynamicPruningExpression(in: InSubqueryExec) => constrainInSubquery(in)
      case _ => // no constraint
    }

    QuerySpace(dims, bounds.lower, bounds.upper)
  }

}
