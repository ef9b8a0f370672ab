package graft

import org.apache.spark.sql.Column

/** Public Column API (reference: `core/.../internal/QbeastFunctions.scala`). */
object functions {

  /** murmur3_32 (seed 42) of the given columns — the row weight used by
   * the sampling pushdown. Identical to Spark's `hash(...)` expression
   * (Murmur3Hash, seed 42), which is exactly the reference's
   * `qbeast_hash` algorithm; same bits at write and read time. */
  def qbeast_hash(columns: Column*): Column =
    org.apache.spark.sql.functions.hash(columns: _*)

}
