package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused A/B probe for the CDF-enabled keyed DML paths (upsert,
 * deleteMatched, general merge): each op runs `iters` times against a
 * freshly built CDF table in ONE warm JVM, reporting per-op seconds and
 * minima. These paths are invisible in the bench at sf0.1 (their
 * fixtures are /tmp-cached), so this is the honest measurement surface
 * for changes to their change-data computation.
 *
 * Run: sbt "runMain graft.tools.DmlCdfProbe [iters] [sfDir]"
 */
object DmlCdfProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    o.write.format("noop").mode("overwrite").save() // warm page cache
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val times = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    def time(tag: String)(body: => Any): Unit = {
      spark.sparkContext.setJobDescription(s"dmlcdf: $tag")
      val t0 = System.nanoTime()
      body
      times.getOrElseUpdate(tag, scala.collection.mutable.ArrayBuffer.empty) +=
        (System.nanoTime() - t0) / 1e9
    }
    (1 to iters).foreach { i =>
      val dir = s"/tmp/dml-cdf-probe-$i"
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      o.write.format("qbeast")
        .option("columnsToIndex", "o_orderkey,o_totalprice")
        .option("cubeSize", "5000")
        .option("enableChangeDataFeed", "true").save(dir)
      val t = graft.table.QbeastTable.forPath(spark, dir)
      // ~10% of keys, values shifted — the upsert replaces those rows
      val src = o.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      time("upsert")(t.upsert(src, Seq("o_orderkey")))
      time("deleteMatched")(t.deleteMatched(
        o.filter(col("o_orderkey") % 10 === 7).select("o_orderkey"),
        Seq("o_orderkey")))
      time("merge")(t.merge(
        o.filter(col("o_orderkey") % 10 === 4)
          .withColumn("o_totalprice", col("o_totalprice") + 2.0),
        Seq("o_orderkey"),
        matched = Seq(graft.table.MergeClause(None,
          Some(Map("o_totalprice" -> (col("__src_o_totalprice") + 1.0))))),
        notMatched = Seq.empty,
        notMatchedBySource = Seq.empty))
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    times.foreach { case (tag, vs) =>
      println(f"[dmlcdf] $tag%-14s per-op: " +
        vs.map(v => f"$v%.3f").mkString(", ") + f"; min ${vs.min}%.3f s")
    }
    spark.stop()
  }
}
