package graft.index

import graft.core.transform._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Write-side [0,1] coordinate expressions, one per indexed column —
 * plain `functions._` so they run inside whole-stage codegen (UDFs only
 * for the rare quantile transformer). Each must agree numerically with
 * the read-side [[Transformation.transform]] on non-null values.
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
        val f = udf((v: java.lang.Double) =>
          if (v == null) 0.0 else tr.transform(v.doubleValue()))
        f(Transformer.canonicalColumn(t.columnName, dataTypeName(t)))

      case tr: CDFStringQuantilesTransformation =>
        val f = udf((v: String) => if (v == null) 0.0 else tr.transform(v))
        f(col(t.columnName).cast("string"))

      case tr: StringHistogramTransformation =>
        // tr.transform handles null itself (ranks as "null", reference
        // behavior), so no null guard here
        val f = udf((v: String) => tr.transform(v))
        f(col(t.columnName).cast("string"))
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
