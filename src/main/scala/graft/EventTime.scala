package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Schema-adaptive access to the events `ts` column.
 *
 * The driver fixtures have shipped `ts` under two different parquet
 * encodings across rounds:
 *
 *   - TIMESTAMP(NANOS), which Spark's vectorized reader only loads with
 *     `spark.sql.legacy.parquet.nanosAsLong=true` → arrives as LongType
 *     epoch-nanos;
 *   - timestamp[us] (no UTC adjustment) → arrives as TIMESTAMP_NTZ
 *     (or TIMESTAMP, depending on `inferTimestampNTZ`).
 *
 * Every consumer (streaming builders, as-of join, session windows) goes
 * through these two accessors instead of assuming an encoding, so a
 * fixture regeneration can never break analysis again. All sessions in
 * this repo run with `spark.sql.session.timeZone=UTC`, under which NTZ
 * micros equal TZ micros, matching DuckDB's `epoch_us(ts)` oracle
 * semantics on the same files.
 */
object EventTime {

  /** Epoch micros (BIGINT) from `tsCol`, whatever its encoding. Integer
   * arithmetic only — nanos ≈ 1.7e18 would lose precision through a
   * double. */
  def micros(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType => expr(s"$tsCol div 1000")
      case TimestampType => unix_micros(col(tsCol))
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case dt => throw new IllegalArgumentException(
        s"unsupported event-time type for column '$tsCol': $dt")
    }

  /** `tsCol` as a session-TZ TIMESTAMP (event-time for windows and
   * watermarks), whatever its encoding. */
  def timestamp(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType => timestamp_micros(expr(s"$tsCol div 1000"))
      case TimestampType => col(tsCol)
      case TimestampNTZType => col(tsCol).cast(TimestampType)
      case dt => throw new IllegalArgumentException(
        s"unsupported event-time type for column '$tsCol': $dt")
    }

}
