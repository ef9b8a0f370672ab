package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: left points joined to right intervals
 * containing them (`lo <= p < hi`). Spark plans a raw inequality join as
 * a broadcast-nested-loop — O(n·m); here intervals and points are
 * bucketized on a fixed grid so the heavy lifting is an equi-join on
 * bucket id (intervals explode only into ceil(len/bucket)+1 buckets),
 * then the exact predicate trims the candidates. Scales to arbitrary
 * table sizes as a plain shuffle join.
 */
object RangeJoin {

  /**
   * @param points     DataFrame with a numeric point column
   * @param intervals  DataFrame with numeric lo/hi columns (half-open)
   * @param bucketSize grid step; choose ≈ median interval length
   */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketSize: Double): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val p = points.withColumn("_bucket",
      floor(col(pointCol) / bucketSize).cast("long"))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol) / bucketSize).cast("long"),
        floor((col(hiCol) - lit(1e-9)) / bucketSize).cast("long"))))
    p.join(iv, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }

}
