package graft.index

import graft.core.transform._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Write-side [0,1] coordinate expressions, one per indexed column —
 * plain `functions._` (and the codegen [[graft.expressions.CdfRank]]
 * binary search for quantile/histogram transformers) so the whole
 * ingest projection runs inside whole-stage codegen, UDF-free. Each
 * must agree numerically with the read-side
 * [[Transformation.transform]] on non-null values.
 */
object ColumnIndexer {

  def coordinateColumn(t: Transformer, transformation: Transformation): Column =
    transformation match {
      case LinearTransformation(min, max, nullCoord) =>
        val c = Transformer.canonicalColumn(t.columnName, dataTypeName(t))
        val scaled = (c - lit(min)) / lit(max - min)
        val clamped = least(greatest(scaled, lit(0.0)), lit(1.0))
        when(col(t.columnName).isNull, lit(nullCoord)).otherwise(clamped)

      case IdentityTransformation(_) | EmptyTransformation => lit(0.0)

      case HashTransformation(_) =>
        // murmur3 seed 42 (functions.hash) folded to [0,1]; matches
        // Transformation.hashCoordinate
        when(col(t.columnName).isNull, lit(0.0))
          .otherwise(
            hash(col(t.columnName)).bitwiseAND(lit(0x7fffffff)).cast(DoubleType) /
              lit(Int.MaxValue.toDouble))

      case tr: CDFNumericQuantilesTransformation =>
        cdfRank(graft.expressions.CdfRank.NumericQuantiles,
          Transformer.canonicalColumn(t.columnName, dataTypeName(t)),
          numBounds = tr.quantiles)

      case tr: CDFStringQuantilesTransformation =>
        cdfRank(graft.expressions.CdfRank.StringQuantiles,
          col(t.columnName).cast("string"), strBounds = tr.quantiles)

      case tr: StringHistogramTransformation =>
        // CdfRank.rankH handles null itself (ranks as "null", reference
        // behavior), so no null guard here
        cdfRank(graft.expressions.CdfRank.StringHistogram,
          col(t.columnName).cast("string"), strBounds = tr.histogram)
    }

  /** The quantile/histogram [0,1] projection as a codegen binary-search
   * expression ([[graft.expressions.CdfRank]]) — the former boxed UDFs
   * here were the last non-codegen step in the ingest projection. */
  private def cdfRank(
      mode: Int,
      input: Column,
      numBounds: IndexedSeq[Double] = Vector.empty,
      strBounds: IndexedSeq[String] = Vector.empty): Column = {
    val shims = org.apache.spark.sql.GraftShims
    shims.column(graft.expressions.CdfRank(
      shims.expression(input), mode, numBounds, strBounds))
  }

  private def dataTypeName(t: Transformer): String = t match {
    case LinearTransformer(_, dt) => dt
    case HashTransformer(_, dt) => dt
    case QuantilesTransformer(_, dt) => dt
    case StringHistogramTransformer(_, dt) => dt
    case EmptyTransformer(_, dt) => dt
  }

  /** The row weight: murmur3 (seed 42) over the indexed columns — the
   * same expression the SampleRule rebuilds at read time, so write- and
   * read-side weights are bit-identical (reference:
   * `OTreeDataAnalyzer.scala:60-65` / `QbeastMurmur3Hash.scala`). */
  def weightColumn(columnNames: Seq[String]): Column =
    hash(columnNames.map(col): _*)

}
