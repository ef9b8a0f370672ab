package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused write-pipeline A/B probe: N repeated indexed writes of the
 * SF's lineitem table in ONE warm JVM, reporting per-write seconds and
 * the minimum (the stable signal on this drift-prone host). Isolates
 * the QbeastWriter pipeline — stats pass, assignment, the write
 * exchange, physical write — from the bench's one-shot cold warm-up,
 * where a single measurement cannot resolve a 10-20% move.
 *
 * Run: sbt "runMain graft.tools.WriteBenchProbe [iters] [planDumpPath]"
 */
object WriteBenchProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(6)
    val planDump = args.lift(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    planDump.foreach(p => spark.conf.set("spark.qbeast.debug.writePlanDump", p))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.write.format("noop").mode("overwrite").save() // warm the page cache
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val times = (1 to iters).map { i =>
      val t = s"/tmp/write-bench-probe-$i"
      fs.delete(new org.apache.hadoop.fs.Path(t), true)
      spark.sparkContext.setJobDescription(s"writebench: indexed write $i")
      val t0 = System.nanoTime()
      li.write.format("qbeast")
        .option("columnsToIndex", "l_orderkey,l_extendedprice")
        .option("cubeSize", "5000").save(t)
      val sec = (System.nanoTime() - t0) / 1e9
      fs.delete(new org.apache.hadoop.fs.Path(t), true)
      sec
    }
    println(f"[writebench] rows=${li.count()} per-write: " +
      times.map(x => f"$x%.3f").mkString(", ") +
      f"; min ${times.min}%.3f s; sf=$sfDir cpus=$cpus")
    spark.stop()
  }
}
