package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Change data feed, persisted flavor: with the table property
 * `enableChangeDataFeed` set, DML commits write their net row changes
 * under `_change_data/` (cdc log action). Batch `changes()` then reads
 * the persisted diff (surviving vacuum of the rewritten originals), and
 * `readStream.option("readChangeFeed", true)` streams the feed —
 * snapshot/appends as inserts, DML from the change files, delete-only
 * commits from the removed files. */
class ChangeFeedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeSlice(tbl: String, lo: Long, hi: Long, mode: String,
      cdf: Boolean = true): Unit = {
    val w = (lo until hi).map(i => (i, i % 10 * 1.0)).toDF("a", "b")
      .write.format("qbeast")
      .option("columnsToIndex", "a,b").option("cubeSize", "100")
    (if (cdf) w.option("enableChangeDataFeed", "true") else w).mode(mode).save(tbl)
  }

  private def feedCounts(df: org.apache.spark.sql.DataFrame): Map[(Long, String), Long] =
    df.groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("CDF-enabled DML persists change files; batch changes() survives vacuum") {
    val tbl = TestSpark.tmpDir("cdf-tbl")
    writeSlice(tbl, 0, 100, "overwrite") // v0, property set
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.properties.get("qbeast.enableChangeDataFeed").contains("true"))
    t.delete("a >= 90") // v1 — writes _change_data
    t.update("a < 5", Map("b" -> "b + 100")) // v2 — writes _change_data
    val cdcDir = new java.io.File(tbl, "_change_data")
    assert(cdcDir.isDirectory && cdcDir.listFiles().nonEmpty)

    val expected = Map(
      (1L, "delete") -> 10L,
      (2L, "delete") -> 5L,
      (2L, "insert") -> 5L)
    assert(feedCounts(t.changes(1)) == expected)

    // the persisted diff — not a file re-diff — serves the feed: with
    // the v1-removed originals physically gone (as after a vacuum of
    // the data files), the fallback would die but the feed still reads
    val removed = graft.log.QbeastLog
      .commitActions(tbl, spark.sparkContext.hadoopConfiguration, 1L,
        t.snapshot.revisions)
      .collect { case graft.log.RemoveFileAction(r) => r.path }
    assert(removed.nonEmpty)
    removed.foreach(p => assert(new java.io.File(tbl, p).delete()))
    assert(feedCounts(t.changes(1)) == expected)
    // the updated rows carry post-image values on insert
    val v2ins = t.changes(2, 2).filter(col("_change_type") === "insert")
      .select("a", "b").as[(Long, Double)].collect().toMap
    assert(v2ins.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(v2ins.forall { case (k, v) => v == k % 10 + 100 })

    // vacuum expires change files with the data-file retention: the
    // feed past the window degrades to an explicit error, and storage
    // is reclaimed rather than leaking one diff per DML forever
    t.vacuum(0L, force = true)
    assert(cdcDir.listFiles() == null || cdcDir.listFiles().isEmpty)
    val e = intercept[IllegalArgumentException] { t.changes(1, 1).collect() }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("streaming readChangeFeed: full history from startingVersion 0") {
    val tbl = TestSpark.tmpDir("cdf-stream-tbl")
    val ckpt = TestSpark.tmpDir("cdf-stream-ckpt")
    val out = TestSpark.tmpDir("cdf-stream-out")
    writeSlice(tbl, 0, 50, "overwrite") // v0
    writeSlice(tbl, 50, 70, "append") // v1
    val t = table.QbeastTable.forPath(spark, tbl)
    t.delete("a >= 60") // v2: 10 deletes via change file
    t.update("a < 5", Map("b" -> "b + 100")) // v3: 5+5 via change file

    def drain(): Unit = {
      val q = spark.readStream.format("qbeast")
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load(tbl)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      finally q.stop()
    }
    drain()
    val feed = spark.read.parquet(out)
    assert(feedCounts(feed) == Map(
      (0L, "insert") -> 50L,
      (1L, "insert") -> 20L,
      (2L, "delete") -> 10L,
      (3L, "delete") -> 5L,
      (3L, "insert") -> 5L))

    // continuation across restart: later commits arrive exactly once
    writeSlice(tbl, 70, 80, "append") // v4
    t.delete("a >= 75") // v5
    drain()
    val feed2 = feedCounts(spark.read.parquet(out))
    assert(feed2((4L, "insert")) == 10L && feed2((5L, "delete")) == 5L)
    assert(feed2.values.sum == 50 + 20 + 10 + 10 + 10 + 5)

    // replaying the feed reconstructs the table content
    val all = spark.read.parquet(out)
    val net = all.filter(col("_change_type") === "insert").select("a", "b")
      .exceptAll(all.filter(col("_change_type") === "delete").select("a", "b"))
    val current = spark.read.format("qbeast").load(tbl).select("a", "b")
    assert(net.exceptAll(current).count() == 0 && current.exceptAll(net).count() == 0)
  }

  test("streaming readChangeFeed: snapshot mode streams current content as inserts") {
    val tbl = TestSpark.tmpDir("cdf-snap-tbl")
    val ckpt = TestSpark.tmpDir("cdf-snap-ckpt")
    val out = TestSpark.tmpDir("cdf-snap-out")
    writeSlice(tbl, 0, 40, "overwrite") // v0
    table.QbeastTable.forPath(spark, tbl).delete("a >= 30") // v1
    val q = spark.readStream.format("qbeast").option("readChangeFeed", "true")
      .load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val feed = spark.read.parquet(out)
    // snapshot at head (v1): the 30 surviving rows, all inserts
    assert(feedCounts(feed) == Map((1L, "insert") -> 30L))
  }

  test("rewrite without a change file fails the CDF stream; delete-only streams") {
    val tbl = TestSpark.tmpDir("cdf-nocdc-tbl")
    writeSlice(tbl, 0, 30, "overwrite", cdf = false) // property NOT set
    val t = table.QbeastTable.forPath(spark, tbl)
    t.update("a < 10", Map("b" -> "b + 1")) // v1: rewrite, no cdc
    val ckpt = TestSpark.tmpDir("cdf-nocdc-ckpt")
    val out = TestSpark.tmpDir("cdf-nocdc-out")
    val q = spark.readStream.format("qbeast")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("enableChangeDataFeed") ||
      Option(e.getCause).exists(_.getMessage.contains("enableChangeDataFeed")))

    // a delete matching EVERY row of the table produces a delete-only
    // commit (no survivors), streamable without a change file
    val tbl2 = TestSpark.tmpDir("cdf-delonly-tbl")
    writeSlice(tbl2, 0, 25, "overwrite", cdf = false)
    table.QbeastTable.forPath(spark, tbl2).delete("a >= 0") // v1: delete-only
    val ckpt2 = TestSpark.tmpDir("cdf-delonly-ckpt")
    val out2 = TestSpark.tmpDir("cdf-delonly-out")
    val q2 = spark.readStream.format("qbeast")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(tbl2)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt2).option("path", out2)
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    assert(feedCounts(spark.read.parquet(out2)) == Map(
      (0L, "insert") -> 25L, (1L, "delete") -> 25L))
  }
}
