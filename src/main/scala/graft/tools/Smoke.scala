package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives the library end-to-end through its public surface: write an
 * indexed table, read it back, sample it, filter it. Prints observable
 * evidence (counts, files read, plan fragments). Usage:
 *   sbt "runMain graft.tools.Smoke /root/testdata/sf0.001 /tmp/smoketbl"
 */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val table = if (args.length > 1) args(1) else
      java.nio.file.Files.createTempDirectory("qbeast-smoke").toString

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println(s"[smoke] source rows: ${li.count()}")

    li.write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "500")
      .mode("overwrite")
      .save(table)
    println(s"[smoke] wrote qbeast table at $table")

    val back = spark.read.format("qbeast").load(table)
    println(s"[smoke] readback rows: ${back.count()} files: ${back.inputFiles.length}")

    val s1 = back.sample(0.1)
    val filesRead = s1.select(input_file_name()).distinct().count()
    println(s"[smoke] sample(0.1) rows: ${s1.count()} filesRead: $filesRead of ${back.inputFiles.length}")
    println("[smoke] sample(0.1) plan:")
    s1.queryExecution.optimizedPlan.toString.linesIterator.take(6).foreach(l => println(s"    $l"))

    val avgAll = back.agg(avg("l_extendedprice")).head.getDouble(0)
    val avgSampled = s1.agg(avg("l_extendedprice")).head.getDouble(0)
    println(f"[smoke] avg(l_extendedprice) exact=$avgAll%.4f sampled(10%%)=$avgSampled%.4f err=${math.abs(avgSampled - avgAll) / avgAll * 100}%.3f%%")

    val q = back.filter("l_orderkey <= 600").agg(count(lit(1)), sum("l_quantity"))
    val e = li.filter("l_orderkey <= 600").agg(count(lit(1)), sum("l_quantity"))
    println(s"[smoke] filter agg qbeast=${q.head} parquet=${e.head}")

    spark.stop()
  }
}
