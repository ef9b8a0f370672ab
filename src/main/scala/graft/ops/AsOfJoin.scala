package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, the most recent right row with
 * `right.ts <= left.ts` per key — the canonical time-series enrichment
 * operator (absent from both Spark and the reference).
 *
 * Spark-first composition instead of a custom physical operator: tag
 * both sides, union, and take `last(right value ignoring nulls)` over a
 * (key, ts, side) window. ONE shuffle on the key — the same cost as any
 * join on that key — and whole-stage-codegen'd; no per-key cross
 * products, no range explosion, so it scales to arbitrary key
 * cardinality and history length.
 */
object AsOfJoin {

  /**
   * @param left      rows to enrich; must have `keyCol` and `tsCol`
   * @param right     reference series; same `keyCol`/`tsCol`
   * @param payload   right columns carried to the output (renamed as given)
   * @return left rows (all columns) + matched right ts as `asof_ts` +
   *         payload columns; unmatched left rows are dropped (inner
   *         as-of semantics, like DuckDB's ASOF JOIN)
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns
    val sides = left
      .withColumn("_side", lit(1))
      .withColumn("_asof_ts", lit(null).cast("long"))
      .withColumns(payload.map { case (src, dst) =>
        dst -> lit(null).cast(right.schema(src).dataType)
      })
      .select((leftCols.map(col) ++
        Seq(col("_side"), col("_asof_ts")) ++ payload.values.map(col)): _*)
      .unionByName(
        right
          .withColumn("_side", lit(0))
          .withColumn("_asof_ts", col(tsCol))
          .withColumns(payload.map { case (src, dst) => dst -> col(src) })
          .select((leftCols.map(c =>
            if (c == keyCol || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
            Seq(col("_side"), col("_asof_ts")) ++ payload.values.map(col)): _*))

    // right rows sort before left rows at equal ts, so an exact-ts match
    // is visible to the left row (DuckDB ASOF `>=` semantics)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = sides
      .withColumn("asof_ts", last(col("_asof_ts"), ignoreNulls = true).over(w))
      .withColumns(payload.values.map { dst =>
        dst -> last(col(dst), ignoreNulls = true).over(w)
      }.toMap)
    filled
      .filter(col("_side") === 1 && col("asof_ts").isNotNull)
      .select((leftCols.map(col) :+ col("asof_ts")) ++ payload.values.map(col): _*)
  }

}
