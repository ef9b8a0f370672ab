package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    // probe 1: write without columnsToIndex
    try { li.write.format("qbeast").save("/tmp/probe-noidx") ; println("[probe1] NO ERROR (bad)") }
    catch { case e: Exception => println(s"[probe1] error: ${e.getMessage.linesIterator.next()}") }

    // probe 2: read a non-table path
    try { spark.read.format("qbeast").load("/tmp/probe-empty-dir-xyz").count(); println("[probe2] NO ERROR (bad)") }
    catch { case e: Exception => println(s"[probe2] error: ${e.getMessage.linesIterator.next()}") }

    // probe 3: append then count
    val half1 = li.filter("l_orderkey % 2 = 0")
    val half2 = li.filter("l_orderkey % 2 = 1")
    val t = java.nio.file.Files.createTempDirectory("probe-append").toString
    half1.write.format("qbeast").option("columnsToIndex","l_orderkey,l_extendedprice").option("cubeSize","500").save(t)
    half2.write.format("qbeast").option("columnsToIndex","l_orderkey,l_extendedprice").option("cubeSize","500").mode("append").save(t)
    val back = spark.read.format("qbeast").load(t)
    println(s"[probe3] append total=${back.count()} expected=${li.count()} sample(0.2)=${back.sample(0.2).count()}")

    // probe 4: overwrite mode twice (idempotent table state)
    half1.write.format("qbeast").option("columnsToIndex","l_orderkey,l_extendedprice").mode("overwrite").save(t)
    println(s"[probe4] after overwrite rows=${spark.read.format("qbeast").load(t).count()} expected=${half1.count()}")

    spark.stop()
  }
}

/** Driver-contract smoke: entry() rows>0 + Bench-style timing. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry] rows=${rows.length} sample=${rows.take(2).mkString("; ")}")
    spark.stop()
  }
}

/** Probe: run the stateful streaming query twice in one session (memory
 * sink name uniqueness + repeated state init). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = "/root/testdata/sf0.001/events.parquet"
    val a = graft.ops.Streaming.sessionize(spark, p).count()
    val b = graft.ops.Streaming.sessionize(spark, p).count()
    val w = graft.ops.Streaming.windowedAgg(spark, p).count()
    println(s"[streamprobe] sessions1=$a sessions2=$b windows=$w")
    spark.stop()
  }
}
