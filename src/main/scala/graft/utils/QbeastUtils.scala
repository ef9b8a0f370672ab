package graft.utils

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * User utilities (reference: `src/.../utils/QbeastUtils.scala:125-151`):
 * compute the `columnStats` quantile arrays for CDF-quantile indexing.
 */
object QbeastUtils {

  /** Approximate numeric quantiles as a JSON array string for
   * `columnStats`: `{"<col>_quantiles": [...]}`.  Uses
   * `df.stat.approxQuantile` (Greenwald-Khanna; one pass, no sort). */
  def computeQuantilesForColumn(
      df: DataFrame,
      columnName: String,
      numQuantiles: Int = 50,
      relativeError: Double = 0.1): String = {
    val dt = df.schema(columnName).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$columnName is ${dt.simpleString}; use computeStringQuantilesForColumn for strings")
    val probs = (0 to numQuantiles).map(_.toDouble / numQuantiles).toArray
    val qs = df.stat.approxQuantile(columnName, probs, relativeError)
    qs.distinct.sorted.mkString("[", ",", "]")
  }

  /** String quantiles: sorted deterministic sample boundaries. At scale
   * this is a sample + sort of ~numQuantiles·1000 values, not a global
   * sort. */
  def computeStringQuantilesForColumn(
      df: DataFrame,
      columnName: String,
      numQuantiles: Int = 50): String = {
    val sampled = df.select(col(columnName).cast("string"))
      .filter(col(columnName).isNotNull)
      .sample(withReplacement = false, fraction = 1.0, seed = 42)
      .limit(numQuantiles * 1000)
      .collect().map(_.getString(0)).sorted
    require(sampled.nonEmpty, s"no values to compute quantiles for $columnName")
    val n = math.min(numQuantiles, sampled.length - 1)
    val bounds = (0 to n).map(i => sampled((i.toLong * (sampled.length - 1) / n).toInt))
      .distinct
    bounds.map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
  }

  /** Equi-height histogram bounds for a string column (reference:
   * `utils/QbeastUtils.computeHistogramForColumn` — deprecated upstream
   * together with the histogram transformer, kept for compatibility):
   * the min of each of `numBins` ordered partitions of the DISTINCT
   * values, as a JSON array for `columnStats {"<col>_histogram": ...}`.
   * Strictly ascending by construction, so it always passes the
   * write-side bound validation. */
  def computeHistogramForColumn(
      df: org.apache.spark.sql.DataFrame,
      columnName: String,
      numBins: Int = 50): String = {
    import org.apache.spark.sql.expressions.Window
    require(df.columns.exists(_.equalsIgnoreCase(columnName)),
      s"column $columnName does not exist in the dataframe")
    val distinct = df.select(col(columnName).cast("string").as("v"))
      .filter(col("v").isNotNull).distinct()
    val tiled = distinct
      .withColumn("t", ntile(numBins).over(Window.orderBy(col("v"))))
    val bounds = tiled.groupBy("t").agg(min("v").as("b"))
      .orderBy("t").collect().map(_.getString(1)).toVector
    require(bounds.size > 1,
      s"column $columnName needs at least 2 distinct values for a histogram")
    bounds.map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
  }

}
