package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling over non-linear plans must keep stock Spark semantics: the
 * pushdown only applies to Project/Filter chains over one relation. */
class SampleSemanticsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("sample over a join keeps ~f of the join, not f^2") {
    val li = QTables.qbeast(spark, sf, "lineitem")
    val o = QTables.qbeast(spark, sf, "orders")
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
    val total = joined.count().toDouble
    val sampled = joined.sample(0.5).count().toDouble
    // f^2 would give ~0.25·total; correct semantics give ~0.5·total
    assert(math.abs(sampled - 0.5 * total) < 0.1 * total,
      s"join sample: got $sampled of $total (f=0.5)")
  }

  test("sample over project/filter chain still gets the pushdown") {
    val li = QTables.qbeast(spark, sf, "lineitem")
    val plan = li.select("l_orderkey", "l_extendedprice", "l_quantity")
      .filter(col("l_quantity") > 10)
      .sample(0.2)
    val optimized = plan.queryExecution.optimizedPlan.toString
    assert(optimized.contains("hash(") && optimized.contains("42"),
      s"expected weight filter in:\n$optimized")
    assert(!optimized.contains("Sample"), "Sample node should be rewritten")
  }

  test("a user's own hash() filter on other columns must not mis-prune") {
    val li = QTables.qbeast(spark, sf, "lineitem")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    val cond = hash(col("l_quantity"), col("l_tax")) < lit(0)
    assert(li.filter(cond).count() === raw.filter(cond).count())
  }

  test("qbeast_hash is callable from SQL and equals the sampling predicate") {
    val li = QTables.qbeast(spark, sf, "lineitem")
    li.createOrReplaceTempView("li_qh")
    val t = graft.core.model.Weight.fromFraction(0.2).value
    val viaSql = spark.sql(
      s"SELECT count(*) FROM li_qh WHERE qbeast_hash(l_orderkey, l_extendedprice) < $t")
      .head.getLong(0)
    val viaSample = li.sample(0.2).count()
    assert(viaSql === viaSample,
      s"SQL qbeast_hash filter ($viaSql) must equal sample(0.2) ($viaSample)")
  }

  test("sample over an aggregate is NOT pushed (stock semantics)") {
    val li = QTables.qbeast(spark, sf, "lineitem")
    val agg = li.groupBy("l_orderkey").count().sample(0.5)
    val optimized = agg.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Sample"), "Sample over agg must stay a Sample node")
    val n = li.groupBy("l_orderkey").count().count().toDouble
    val s = agg.count().toDouble
    assert(math.abs(s - 0.5 * n) < 0.15 * n)
  }

}
