package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the hot paths: broadcast joins
 * stay broadcast, filters reach the parquet scan, top-k never does a
 * global sort, aggregations combine map-side. These lock in the
 * plan-quality properties the 100 TB design depends on. */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** collect() that also descends into materialized AQE query stages
   * (QueryStageExec wraps its stage plan as a member, not a child). */
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    p.collect(pf) ++
      (p.collect { case q: QueryStageExec => q.plan }
        ++ p.collect { case r: ReusedExchangeExec => r.child })
        .flatMap(collectAll(_)(pf))
  }

  test("small-dimension join executes as a broadcast hash join") {
    val li = QTables.qbeast(spark, sf, "lineitem")
    val o = QTables.qbeast(spark, sf, "orders")
    val joined = li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)))
    val plan = finalPlan(joined)
    assert(collectAll(plan) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected BroadcastHashJoin:\n$plan")
  }

  test("range predicates reach the parquet scan as pushed filters") {
    val df = QTables.qbeast(spark, sf, "lineitem")
      .filter(col("l_orderkey").between(100, 400) && col("l_extendedprice") < 50000)
      .select("l_orderkey", "l_extendedprice")
    val plan = finalPlan(df)
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "[]")
    assert(pushed.contains("GreaterThanOrEqual(l_orderkey") &&
      pushed.contains("LessThan(l_extendedprice"),
      s"filters not pushed to scan: $pushed")
    // column pruning: only the two projected columns are read
    val readSchema = scans.head.metadata.getOrElse("ReadSchema", "")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_returnflag"),
      s"scan reads more columns than projected: $readSchema")
  }

  test("order-by + limit executes as distributed top-k, not a global sort") {
    val df = QTables.qbeast(spark, sf, "lineitem")
      .orderBy(col("l_extendedprice").desc).limit(10)
    val plan = finalPlan(df)
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject:\n$plan")
  }

  test("exact dedup aggregates map-side before the shuffle (partial agg)") {
    val df = ops.Dedup.exactDedup(QTables.raw(spark, sf, "documents"), "doc_id", "text")
    val plan = finalPlan(df)
    val aggs = collectAll(plan) { case h: HashAggregateExec => h }
    // partial + final pair around the exchange
    assert(aggs.size >= 2, s"expected partial+final HashAggregate:\n$plan")
  }

  test("sampling pushdown turns sample() into a hash-filter scan (no Sample node)") {
    val df = QTables.qbeast(spark, sf, "lineitem").sample(0.1)
      .agg(count(lit(1)))
    val plan = finalPlan(df)
    assert(!plan.toString.contains("Sample"), s"Sample survived pushdown:\n$plan")
    assert(plan.toString.contains("hash("), s"expected weight hash filter:\n$plan")
  }

}
