package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation operators for hot keys at scale. A low-cardinality or
 * Zipf-distributed join/agg key sends most rows to a few reducers; AQE
 * skew-join splitting handles sort-merge joins, but explicit salting is
 * the general tool (works for aggregations, any join strategy, and
 * streaming state partitioning). The salt NEVER changes results — only
 * the shuffle distribution — so both operators are verified against the
 * unsalted formulation's oracle.
 */
object SkewOps {

  /** Deterministic salt in [0, salts): hashed from `saltFrom` (any
   * well-distributed sibling column) rather than rand(), so retried
   * tasks and the correctness oracle see identical rows. */
  def saltCol(saltFrom: Column, salts: Int): Column =
    pmod(hash(saltFrom), lit(salts))

  /**
   * Salted equi-join of a skewed large side against a small build side:
   * the large side gets a deterministic salt, the build side is
   * replicated once per salt value (`explode(sequence(...))` — build
   * rows × salts, cheap because the build side is small), and the join
   * key becomes (key, salt). Each hot key now spreads over `salts`
   * reducers instead of one.
   */
  def saltedJoin(
      large: DataFrame,
      build: DataFrame,
      key: String,
      saltFrom: String,
      salts: Int): DataFrame = {
    val salted = large.withColumn("_salt", saltCol(col(saltFrom), salts))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /**
   * Two-phase (salted) aggregation for skewed group keys: pre-aggregate
   * on (key, salt), then combine per key. The second shuffle carries at
   * most `salts` rows per key. Callers supply partial/final aggregate
   * pairs that compose exactly (count→sum, sum→sum, min→min, ...);
   * doubles should accumulate as decimals for order-independence.
   */
  def saltedAgg(
      df: DataFrame,
      key: String,
      saltFrom: String,
      salts: Int,
      partials: Seq[(Column, String)],
      finals: Seq[(Column, String)]): DataFrame = {
    val pre = df.withColumn("_salt", saltCol(col(saltFrom), salts))
      .groupBy(col(key), col("_salt"))
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    pre.groupBy(col(key))
      .agg(finals.head._1.as(finals.head._2),
        finals.tail.map { case (c, n) => c.as(n) }: _*)
  }

}
