package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Attributes the s19/s20-class streaming change-feed floor (flat ~19 s
 * at sf1 for three rounds): how much is FIXTURE construction (indexed
 * writes + copy-on-write DML), how much is the micro-batch machinery
 * (per component, from StreamingQueryProgress.durationMs), and how much
 * is per-micro-batch LOG REPLAY — verified against the snapshot cache's
 * miss counter, not guessed.
 *
 * Run: sbt "runMain graft.tools.CdfStreamProbe [sfDir]"
 */
object CdfStreamProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.qbeast.stream.partitions", "2")
      .config("spark.sql.streaming.checkpointLocation",
        graft.ops.Streaming.fastCheckpointDir())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tableDir = java.nio.file.Files.createTempDirectory("cdfprobe-t").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("cdfprobe-s").toString

    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    def phase[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[cdfprobe] $tag%-34s ${sec(t0)}%6.2f s")
      out
    }

    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    def write(filter: String, mode: String): Unit =
      o.filter(filter).write.format("qbeast")
        .option("columnsToIndex", "o_orderkey,o_totalprice")
        .option("cubeSize", "5000")
        .option("enableChangeDataFeed", "true")
        .mode(mode).save(tableDir)

    // ---- fixture phases (identical shape to ops.Streaming.streamChangeFeed)
    phase("v0 overwrite (indexed write)")(write("o_orderkey % 10 < 5", "overwrite"))
    val t = graft.table.QbeastTable.forPath(spark, tableDir)

    // ONE checkpoint shared by both drains, like the benched fixture:
    // drain2 must RESUME from drain1's offsets (v1..v3 only), not
    // reprocess v0 — a fresh dir per drain would overstate restart cost
    val ckpt = graft.ops.Streaming.fastCheckpointDir()
    def drain(tag: String): Unit = {
      val replays0 = graft.log.QbeastLog.uncachedReplays.get()
      val t0 = System.nanoTime()
      val q = spark.readStream.format("qbeast")
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load(tableDir)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", sinkDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination()
      finally q.stop()
      val total = sec(t0)
      val replays = graft.log.QbeastLog.uncachedReplays.get() - replays0
      val prog = q.recentProgress
      // sum each duration component across micro-batches
      val comps = scala.collection.mutable.LinkedHashMap[String, Long]()
      prog.foreach(_.durationMs.forEach { (k, v) =>
        comps(k) = comps.getOrElse(k, 0L) + v.longValue()
      })
      val trig = comps.getOrElse("triggerExecution", 0L) / 1e3
      println(f"[cdfprobe] $tag%-34s $total%6.2f s " +
        f"(batches=${prog.length}%d, inTrigger=$trig%.2f s, " +
        f"uncachedReplays=$replays%d)")
      comps.foreach { case (k, v) =>
        if (k != "triggerExecution")
          println(f"[cdfprobe]   $k%-32s ${v / 1e3}%6.2f s")
      }
    }

    drain("drain1 (v0 inserts)")
    phase("v1 append")(write("o_orderkey % 10 IN (5, 6)", "append"))
    phase("v2 copy-on-write DELETE")(
      t.delete("o_orderstatus = 'F' AND o_orderkey % 100 < 50"))
    phase("v3 copy-on-write UPDATE")(
      t.update("o_orderkey % 7 = 0", Map("o_totalprice" -> "o_totalprice + 1")))
    drain("drain2 (v1..v3 restart)")
    phase("final sink read + agg")(
      spark.read.parquet(sinkDir)
        .groupBy("_commit_version", "_change_type").count().collect())

    // ---- WARM repeats on fresh dirs (same JVM): the bench's minima
    // come from post-warmup iterations, and single-shot numbers swing
    // 2-4x with ambient host load — report per-phase MINIMA over 3
    // warm repeats, the same statistic the bench publishes ----
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def minPhase[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      val sec0 = sec(t0)
      if (mins.get(tag).forall(sec0 < _)) mins(tag) = sec0
      out
    }
    (1 to 3).foreach { rep =>
      val tableDir2 = java.nio.file.Files.createTempDirectory(s"cdfprobe-t$rep").toString
      val sinkDir2 = java.nio.file.Files.createTempDirectory(s"cdfprobe-s$rep").toString
      def write2(filter: String, mode: String): Unit =
        o.filter(filter).write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000")
          .option("enableChangeDataFeed", "true")
          .mode(mode).save(tableDir2)
      val ckpt2 = graft.ops.Streaming.fastCheckpointDir()
      def drain2(tag: String): Unit = minPhase(tag) {
        val q = spark.readStream.format("qbeast")
          .option("readChangeFeed", "true").option("startingVersion", "0")
          .load(tableDir2)
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt2)
          .option("path", sinkDir2)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        try q.awaitTermination()
        finally q.stop()
      }
      minPhase("v0 overwrite (warm)")(write2("o_orderkey % 10 < 5", "overwrite"))
      val t2 = graft.table.QbeastTable.forPath(spark, tableDir2)
      drain2("drain1 (warm)")
      minPhase("v1 append (warm)")(write2("o_orderkey % 10 IN (5, 6)", "append"))
      minPhase("v2 DELETE (warm)")(
        t2.delete("o_orderstatus = 'F' AND o_orderkey % 100 < 50"))
      minPhase("v3 UPDATE (warm)")(
        t2.update("o_orderkey % 7 = 0", Map("o_totalprice" -> "o_totalprice + 1")))
      drain2("drain2 (warm)")
      minPhase("final sink read + agg (warm)")(
        spark.read.parquet(sinkDir2)
          .groupBy("_commit_version", "_change_type").count().collect())
    }
    println("[cdfprobe] ---- warm minima over 3 repeats ----")
    mins.foreach { case (tag, v) =>
      println(f"[cdfprobe] $tag%-34s $v%6.2f s")
    }

    spark.stop()
  }

}
