package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage co-location: joining two tables bucketed on the join key must
 * not shuffle either side — the plan-shape guarantee that makes the
 * write-once bucketing pay off at scale. */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed orderkey join runs with zero shuffle exchanges") {
    val (liT, oT) = QTables.bucketedTables(spark, sf)
    val joined = spark.table(liT)
      .join(spark.table(oT), col("l_orderkey") === col("o_orderkey"))
    joined.collect() // finalize any adaptive plan
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n$plan")
    // and the result matches the plain (shuffled) join
    val expected = QTables.raw(spark, sf, "lineitem")
      .join(QTables.raw(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() == expected)
  }

}
