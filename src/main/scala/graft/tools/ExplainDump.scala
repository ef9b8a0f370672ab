package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dump `.explain("formatted")` for named SparkEntry queries to files —
 * the plan evidence the optimization rounds commit under `plans/`.
 *
 * Run: sbt "runMain graft.tools.ExplainDump <outDir> <suffix> [names...]"
 * (no names = every declared query). Uses the bench session shape
 * (same master/core/partition config via SPARK_GRAFT_CPUS) so the
 * captured plans are the plans the bench executes.
 */
object ExplainDump {

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Set[String] = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.qbeast.stream.partitions", "2")
      .config("spark.sql.streaming.checkpointLocation", graft.ops.Streaming.fastCheckpointDir())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable =>
            System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
