package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures streaming-query constant overheads at sf0.1 under different
 * shuffle-partition settings, to pick the state-op partition count. */
object StreamPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = s"$sfDir/events.parquet"

    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[streamprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }

    // warm the JVM/codegen once
    graft.ops.Streaming.windowedAgg(spark, events).count()

    spark.conf.set("spark.qbeast.stream.partitions", "2")
    for (ckpt <- Seq("disk:/tmp", "shm:/dev/shm")) {
      val Array(tag, base) = ckpt.split(":")
      spark.conf.set("spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(base), "graft-ckpt").toString)
      time(s"s01 window    $tag") { graft.ops.Streaming.windowedAgg(spark, events).count() }
      time(s"s04 watermark $tag") { graft.ops.Streaming.windowedAggWatermarked(spark, events).count() }
      time(s"s08 dedup     $tag") { graft.ops.Streaming.streamingDedup(spark, events).count() }
      time(s"s09 ss-join   $tag") { graft.ops.Streaming.streamStreamJoin(spark, events).count() }
      time(s"s02 sessions  $tag") { graft.ops.Streaming.sessionize(spark, events).count() }
    }
    spark.stop()
  }
}
