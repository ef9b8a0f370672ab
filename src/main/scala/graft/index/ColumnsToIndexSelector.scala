package graft.index

import graft.core.transform.Transformer

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Automatic index-column selection (reference:
 * `core/.../index/SparkColumnsToIndexSelector.scala:33-160`): pick up to
 * `maxColumns` columns with the lowest average absolute Pearson
 * correlation — mutually independent dimensions spread the OTree best.
 * Runs on a bounded sample, so cost is constant w.r.t. table size.
 */
object ColumnsToIndexSelector {

  def selectColumnsToIndex(df: DataFrame, maxColumns: Int = 3): Seq[String] = {
    val numericFields = df.schema.fields.collect {
      case f @ StructField(_, _: NumericType, _, _) => f
      case f @ StructField(_, TimestampType | DateType, _, _) => f
    }.toSeq
    val numericCols = numericFields.map(_.name)
    require(numericCols.nonEmpty, "no indexable (numeric/temporal) columns found")
    if (numericCols.size <= maxColumns) return numericCols

    // canonicalColumn, not a bare cast: Spark rejects date→double (the
    // same mapping the transformers use — dates to days, timestamps to
    // micros). Nulls coalesce to 0 instead of dropping the ROW: one
    // all-null column would otherwise empty the whole sample and crash
    // the correlation (and a 90%-null column would bias it to the
    // sparse minority).
    val sample = df.select(numericFields.map(f =>
        coalesce(
          Transformer.canonicalColumn(f.name, f.dataType.simpleString)
            .cast(DoubleType),
          lit(0.0)).as(f.name)): _*)
      .limit(10000)
    if (sample.isEmpty) return numericCols.take(maxColumns)
    val assembler = new VectorAssembler()
      .setInputCols(numericCols.toArray).setOutputCol("features")
    val vectors = assembler.transform(sample).select("features")
    val corr: Matrix = Correlation.corr(vectors, "features").head.getAs[Matrix](0)

    val avgAbs = numericCols.indices.map { i =>
      val others = numericCols.indices.filter(_ != i)
      val s = others.map(j => math.abs(corr(i, j))).filterNot(_.isNaN)
      // all-NaN correlations mean ZERO VARIANCE (a constant column):
      // every row would land on one coordinate — rank it LAST, not
      // first (an average of 0.0 would make useless constants the
      // "best" candidates)
      numericCols(i) -> (if (s.isEmpty) Double.MaxValue else s.sum / s.size)
    }
    avgAbs.sortBy(_._2).take(maxColumns).map(_._1)
  }

}
