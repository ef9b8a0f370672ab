package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for the stream-stream joins (s09/s18) and the
 * rate-limited qbeast source drain (s17):
 *
 *  - s09/s18: per-batch state-store metrics (rows kept, memory, rows
 *    REMOVED by watermark eviction) from StreamingQueryProgress — the
 *    boundedness evidence that the interval-join state is evicted as
 *    the watermark advances, i.e. state is O(watermark window), not
 *    O(stream).
 *  - s17: the per-trigger duration breakdown (addBatch = plan+execute,
 *    latestOffset/getBatch = source driver work, commitOffsets/walCommit
 *    = checkpoint I/O) — attributing the per-micro-batch constant.
 *
 * Run: sbt "runMain graft.tools.StreamStateProbe [sfDir]"
 */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.qbeast.stream.partitions", "2")
      .config("spark.sql.streaming.checkpointLocation",
        graft.ops.Streaming.fastCheckpointDir())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = s"$sfDir/events.parquet"

    // ---- s09/s18 shape: interval join with watermarks on both sides ----
    def ssJoin(joinType: String): Unit = {
      val errors0 = graft.ops.Streaming.eventsStream(spark, events)
      val errors = errors0
        .withColumn("err_ts", graft.EventTime.timestamp(errors0))
        .filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("err_ts"))
        .withWatermark("err_ts", "1 hour")
      val clicks0 = graft.ops.Streaming.eventsStream(spark, events)
      val clicks = clicks0
        .withColumn("click_ts", graft.EventTime.timestamp(clicks0))
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
          col("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val joined = errors.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("err_ts") - expr("INTERVAL 30 minutes") &&
          col("click_ts") <= col("err_ts"), joinType)
        .select(col("err_id"), col("click_id"), col("user_id"))
      val q = joined.writeStream.format("memory")
        .queryName(s"probe_ss_$joinType${System.nanoTime()}")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      q.recentProgress.foreach { p =>
        p.stateOperators.foreach { so =>
          println(s"[ssjoin $joinType] batch=${p.batchId} " +
            s"op=${so.operatorName} rowsTotal=${so.numRowsTotal} " +
            s"updated=${so.numRowsUpdated} removed=${so.numRowsRemoved} " +
            s"memMB=${so.memoryUsedBytes / 1024 / 1024.0}")
        }
      }
    }
    ssJoin("inner")
    ssJoin("leftOuter")

    // ---- s17 shape: rate-limited qbeast source drain ----
    val conf = spark.sparkContext.hadoopConfiguration
    val tableDir = "/tmp/probe-s17-table"
    val sinkDir = "/tmp/probe-s17-sink"
    Seq(tableDir, sinkDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).delete(p, true)
    }
    val ev = spark.read.parquet(events)
    def write(slice: org.apache.spark.sql.DataFrame, mode: String): Unit =
      slice.write.format("qbeast")
        .option("columnsToIndex", "user_id,event_id").option("cubeSize", "5000")
        .mode(mode).save(tableDir)
    write(ev.filter(col("event_id") % 3 === 0), "overwrite")
    write(ev.filter(col("event_id") % 3 === 1), "append")
    write(ev.filter(col("event_id") % 3 === 2), "append")
    val q = spark.readStream.format("qbeast")
      .option("maxFilesPerTrigger", "8").load(tableDir)
      .writeStream.format("parquet")
      .option("checkpointLocation", graft.ops.Streaming.fastCheckpointDir())
      .option("path", sinkDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val ps = q.recentProgress
    println(s"[s17] micro-batches=${ps.length}")
    def stat(name: String): Unit = {
      val vs = ps.flatMap(p => Option(p.durationMs.get(name)).map(_.toLong))
      if (vs.nonEmpty)
        println(f"[s17] $name%-16s total=${vs.sum}%6d ms  mean=${vs.sum.toDouble / vs.length}%7.1f ms  n=${vs.length}")
    }
    Seq("triggerExecution", "addBatch", "getBatch", "latestOffset",
      "queryPlanning", "walCommit", "commitOffsets").foreach(stat)
    spark.stop()
  }
}
