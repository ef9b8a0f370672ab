package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for column mapping: a filter on a RENAMED column must
 * reach the parquet scan as a pushed filter under the PHYSICAL name,
 * stay inside WholeStageCodegen, and prune files. Prints the formatted
 * plan's scan section. */
object MappingPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("mapping-plan-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mapping-plan").toString
    (0 until 100000).map(i => (i.toLong, i.toDouble, s"s$i")).toDF("k", "v", "s")
      .repartition(8)
      .write.format("qbeast").option("columnsToIndex", "k")
      .option("cubeSize", "5000").save(dir)
    graft.table.QbeastTable.forPath(spark, dir).renameColumn("v", "value")
    val df = spark.read.format("qbeast").load(dir)
      .filter(col("value") < 100.0 && col("k") < 5000L).select("k", "value")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted.split("\n").filter(l =>
      l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("WholeStageCodegen") || l.contains("Scan parquet"))
      .foreach(l => println(s"[mapplan] ${l.trim.take(160)}"))
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val total = spark.read.format("qbeast").load(dir).inputFiles.length
    println(s"[mapplan] filesRead=${scan.metrics("numFiles").value} of $total")
  }
}
