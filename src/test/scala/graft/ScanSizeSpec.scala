package graft

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScanSizeRule: a Filter over a qbeast relation reports the PRUNED
 * byte count to the planner, so thin slices and samples broadcast in
 * joins without hints — the planning half of the file-index pruning. */
class ScanSizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def relationBytes(df: org.apache.spark.sql.DataFrame): BigInt = {
    val rels = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.stats.sizeInBytes
    }
    assert(rels.nonEmpty, "no LogicalRelation in plan")
    rels.sum
  }

  private def writeTable(dir: String): Unit = {
    import spark.implicits._
    (1 to 50000).map(i => (i.toLong, i * 3.0, s"payload_${"y" * 40}_$i"))
      .toDF("id", "v", "body")
      .write.format("qbeast")
      .option("columnsToIndex", "id,v")
      .option("cubeSize", "2000")
      .save(dir)
  }

  test("filtered scans report pruned bytes; samples too; results unchanged") {
    QTables.ensureExtensions(spark)
    val dir = TestSpark.tmpDir("scansize")
    writeTable(dir)
    val tbl = spark.read.format("qbeast").load(dir)

    val full = relationBytes(tbl)
    val slice = relationBytes(tbl.filter(col("id") < 500))
    assert(slice * 5 < full * 2,
      s"thin indexed slice must shrink the planning estimate: $slice vs $full")

    // sampling pushdown (SampleRule) rewrites into the weight filter
    // this rule sizes — a 1% sample plans as a sliver
    val sampled = relationBytes(tbl.sample(0.01))
    assert(sampled < full / 2,
      s"sampled scan must shrink the planning estimate: $sampled vs $full")

    // execution still uses the engine-pushed filters: counts exact
    assert(tbl.filter(col("id") < 500).count() == 499)

    // an unselective filter keeps the honest (total) estimate
    val wide = relationBytes(tbl.filter(col("id") >= 0))
    assert(wide == full, s"unselective filter must not shrink: $wide vs $full")
  }

  test("a pruned slice auto-broadcasts in a join (no hint)") {
    QTables.ensureExtensions(spark)
    val dir = TestSpark.tmpDir("scansize-join")
    writeTable(dir)
    val tbl = spark.read.format("qbeast").load(dir)
    val full = relationBytes(tbl).toLong

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // threshold far below the table size but above the thin slice
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (full / 2).toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val slice = tbl.filter(col("id") < 500).select("id", "v")
      val joined = tbl.select(col("id"), col("body")).join(slice, "id")
      val hasBhj = joined.queryExecution.executedPlan.collect {
        case b: BroadcastHashJoinExec => b
      }.nonEmpty
      assert(hasBhj,
        "pruned slice under the broadcast threshold must plan a broadcast join:\n" +
          joined.queryExecution.executedPlan.treeString.take(2000))
      assert(joined.count() == 499)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

}
