package graft.index

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
    val numericCols = df.schema.fields.collect {
      case StructField(name, _: NumericType, _, _) => name
      case StructField(name, TimestampType | DateType, _, _) => name
    }.toSeq
    require(numericCols.nonEmpty, "no indexable (numeric/temporal) columns found")
    if (numericCols.size <= maxColumns) return numericCols

    val sample = df.select(numericCols.map(c => col(c).cast(DoubleType).as(c)): _*)
      .na.drop()
      .limit(10000)
    val assembler = new VectorAssembler()
      .setInputCols(numericCols.toArray).setOutputCol("features")
    val vectors = assembler.transform(sample).select("features")
    val corr: Matrix = Correlation.corr(vectors, "features").head.getAs[Matrix](0)

    val avgAbs = numericCols.indices.map { i =>
      val others = numericCols.indices.filter(_ != i)
      val s = others.map(j => math.abs(corr(i, j))).filterNot(_.isNaN)
      numericCols(i) -> (if (s.isEmpty) 0.0 else s.sum / s.size)
    }
    avgAbs.sortBy(_._2).take(maxColumns).map(_._1)
  }

}
