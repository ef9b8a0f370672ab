package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: index shape + write cost on clustered key spaces.
 *
 * The 10× scale fixtures replicate keys at 1e10 spacing, which turns
 * each indexed dimension into a comb of 10 dense micro-clusters in an
 * almost-empty [0,1] domain — the worst case for a multidimensional
 * index (realistic too: tenant- or epoch-prefixed ids cluster the same
 * way). This measures what that does to tree height, cube count and
 * write throughput vs the evenly-spread sf0.1 original.
 *
 *   sbt "runMain graft.tools.DepthProbe <srcParquetDir> [cols] [cubeSize]"
 */
object DepthProbe {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val cols = args.lift(1).getOrElse("o_orderkey,o_custkey")
    val cubeSize = args.lift(2).getOrElse("5000")
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(src)
    val n = df.count()
    val dir = java.nio.file.Files.createTempDirectory("depthprobe").toString
    val t0 = System.nanoTime()
    df.write.format("qbeast")
      .option("columnsToIndex", cols).option("cubeSize", cubeSize)
      .mode("overwrite").save(dir)
    val dt = (System.nanoTime() - t0) / 1e9
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val m = t.indexMetrics()
    val depths = t.depthMetrics()
    println(f"[depth] rows=$n write=${dt}%.1fs (${n / dt / 1e6}%.3fM rows/s) " +
      f"height=${m.height} cubes=${m.cubeCount} files=${m.fileCount} avgFanout=${m.avgFanout}%.2f")
    depths.foreach(d => println(
      f"[depth]   d=${d.depth}%2d cubes=${d.cubeCount}%7d elems=${d.elementCount}%10d " +
        f"avgMaxW=${d.avgMaxWeightFraction}%.4f"))
    spark.stop()
  }
}
