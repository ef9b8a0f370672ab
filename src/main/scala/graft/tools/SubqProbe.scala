package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Probe: subquery-driven file pruning (VERDICT r1 item 5). Findings on
 * Spark 4.1 (and verified the same in 3.5's FileSourceStrategy):
 * 1. `IN (SELECT ...)` always rewrites to a semi join — the 3.x
 *    IN-runtime-filter config was removed ("runtime filter cannot be an
 *    IN subquery now"), so InSubqueryExec never appears for it;
 * 2. FileSourceStrategy drops EVERY filter containing a subquery from a
 *    V1 scan's dataFilters (`filterNot(SubqueryExpression.hasSubquery)`),
 *    so neither scalar- nor IN-subquery comparisons ever reach a
 *    FileIndex; they are applied post-scan only. The reference's
 *    InSubqueryExec branch is equally unreachable on its empty-partition
 *    V1 relations. QuerySpecBuilder still handles both shapes
 *    defensively; this probe records the measured reality. */
object SubqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.QTables.qbeast(spark, "/root/testdata/sf0.01", "lineitem")
    val total = li.inputFiles.length
    li.createOrReplaceTempView("li_sq")
    graft.QTables.raw(spark, "/root/testdata/sf0.01", "orders").createOrReplaceTempView("o_sq")

    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }

    def numFilesRead(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val n = df.collect().length.toLong // executes THIS queryExecution
      val scans = allScans(graft.write.QbeastWriter.classic(df).queryExecution.executedPlan)
      val files = scans
        .find(_.relation.location.isInstanceOf[graft.read.QbeastFileIndex])
        .map(_.metrics("numFiles").value).getOrElse(-1L)
      (n, files)
    }

    val (n1, f1) = numFilesRead(spark.sql(
      "SELECT * FROM li_sq WHERE l_orderkey <= (SELECT min(o_orderkey) + 300 FROM o_sq)"))
    println(s"[subq] scalar-subquery range: rows=$n1 filesRead=$f1 of $total " +
      s"(subquery filters never reach the FileIndex on Spark 4 V1 scans)")
    // same predicate as a literal: the pruning the index CAN do once the
    // value is known — what a user gets by resolving the subquery first
    val lo = spark.sql("SELECT min(o_orderkey) + 300 FROM o_sq").head.getLong(0)
    val (n2, f2) = numFilesRead(spark.sql(s"SELECT * FROM li_sq WHERE l_orderkey <= $lo"))
    println(s"[subq] same-range literal: rows=$n2 filesRead=$f2 of $total (pruned=${f2 < total})")
    spark.stop()
  }
}
