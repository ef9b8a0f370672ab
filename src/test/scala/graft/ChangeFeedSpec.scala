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

  test("rewrite without a change file streams as a whole-commit diff; " +
    "delete-only streams") {
    // a copy-on-write UPDATE on a non-CDF table has no persisted change
    // file: the stream replays the commit ATOMICALLY as the same
    // after ∖ before / before ∖ after diff batch changes() builds (the
    // 'x' unit), instead of killing the query
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
    try q.awaitTermination() finally q.stop()
    val streamed = feedCounts(spark.read.parquet(out))
    assert(streamed == Map((1L, "delete") -> 10L, (1L, "insert") -> 10L),
      s"whole-commit diff must equal the batch exceptAll feed: $streamed")
    assert(feedCounts(t.changes(1L, 1L)) == streamed)
    // the post-image values stream correctly
    val ins = spark.read.parquet(out)
      .filter(col("_change_type") === "insert")
      .select("a", "b").as[(Long, Double)].collect().toMap
    assert(ins.keySet == (0L until 10L).toSet &&
      ins.forall { case (k, v) => v == k % 10 * 1.0 + 1 })

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

  test("restore on a dv table replays exactly: clear-by-re-add and vector shrink") {
    // shrunk from a FuzzSpec find (seq=5, seed=628085270): RESTORE
    // clears a file's deletion vector by RE-ADDING it — the feed must
    // insert only the RESURRECTED rows, not the whole file (still-live
    // rows would double in any downstream replay); and a restore that
    // resets a vector to an earlier, SMALLER one must emit inserts for
    // the newly unmasked rows (ordinary DML only ever grows a vector,
    // so only restore hits this direction).
    val tbl = TestSpark.tmpDir("cdf-dv-restore")
    (0L until 100L).map(i => (i, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "200") // ONE file: the mask and re-add hit it
      .option("deletionVectors", "true").save(tbl) // v0
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.delete("a < 10") == 10L) // v1: dv masks 10 rows
    assert(t.delete("a >= 90") == 10L) // v2: vector GROWS to 20 rows
    require(t.snapshot.dvs.nonEmpty, "fixture must mask, not rewrite")

    // restore to v1: same file, smaller vector — 10 rows resurrect
    t.restoreToVersion(1L) // v3
    assert(spark.read.format("qbeast").load(tbl).count() == 90L)
    val shrink = feedCounts(t.changes(3L, 3L))
    assert(shrink == Map((3L, "insert") -> 10L),
      s"vector-shrink restore must insert exactly the resurrected rows: $shrink")

    // restore to v0: the mask clears entirely — replay clears a dv on
    // re-add, so the commit re-ADDS the file; only the 10 still-masked
    // rows are new content
    t.restoreToVersion(0L) // v4
    assert(spark.read.format("qbeast").load(tbl).count() == 100L)
    val clear = feedCounts(t.changes(4L, 4L))
    assert(clear == Map((4L, "insert") -> 10L),
      s"dv-clearing re-add must insert only previously-masked rows: $clear")

    // full replay from v0 reconstructs the final content (multiset)
    val ch = t.changes(1L).select("_change_type", "a").collect()
    val net = ch.foldLeft(Map.empty[Long, Long]) { (m, r) =>
      val d = if (r.getString(0) == "insert") 1L else -1L
      m + (r.getLong(1) -> (m.getOrElse(r.getLong(1), 0L) + d))
    }.filter(_._2 != 0)
    assert(net.values.forall(_ == 0L) || net.isEmpty,
      s"v1..v4 must cancel exactly (table is back at v0): $net")

    // the STREAMING feed replays the same history identically (its 'a'
    // re-add and 'v' vector-delta units have their own replay code)
    val out = TestSpark.tmpDir("cdf-dv-restore-sink")
    val q = spark.readStream.format("qbeast")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", TestSpark.tmpDir("cdf-dv-restore-ckpt"))
      .option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val streamed = feedCounts(
      spark.read.parquet(out).filter(col("_commit_version") >= 1))
    val batch = feedCounts(t.changes(1L))
    assert(streamed == batch,
      s"stream feed must match batch changes(): $streamed vs $batch")
  }

  test("changes() replays across an ADD COLUMNS commit in the widened schema") {
    val tbl = TestSpark.tmpDir("cdf-addcol")
    writeSlice(tbl, 0, 40, "overwrite") // v0
    val t = table.QbeastTable.forPath(spark, tbl)
    // v1: metadata-only widening (the ALTER TABLE ADD COLUMNS shape)
    val tc = org.apache.spark.sql.connector.catalog.TableChange
      .addColumn(Array("x"), org.apache.spark.sql.types.IntegerType)
    graft.catalog.QbeastCatalog.persistAddColumnsToLog(tbl,
      Seq(tc.asInstanceOf[org.apache.spark.sql.connector.catalog.TableChange.AddColumn]))
    t.delete("a >= 30") // v2: DML on pre-widening files
    (40L until 45L).map(i => (i, i % 10 * 1.0, i.toInt)).toDF("a", "b", "x")
      .write.format("qbeast").mode("append").save(tbl) // v3: x populated

    // the feed replays in the WIDENED schema: the metadata commit
    // itself emits nothing, pre-widening rows read x as null, and
    // post-widening inserts carry their x values
    val feed = t.changes(1L)
    assert(feed.columns.toSet ==
      Set("a", "b", "x", "_change_type", "_commit_version"))
    assert(feedCounts(feed) == Map((2L, "delete") -> 10L, (3L, "insert") -> 5L))
    val deleted = feed.filter(col("_change_type") === "delete")
      .select("a", "x").collect()
    assert(deleted.forall(_.isNullAt(1)) &&
      deleted.map(_.getLong(0)).sorted.toSeq == (30L until 40L).toSeq)
    val inserted = feed.filter(col("_change_type") === "insert")
      .select("a", "x").as[(Long, Int)].collect().toMap
    assert(inserted == (40L until 45L).map(i => i -> i.toInt).toMap)
  }

  test("restore resurrecting a dropped file that is MASKED at the target " +
    "version feeds only its live rows (add + dv action, same commit)") {
    // mask → drop → restore: the restore commit re-ADDS the file and
    // re-attaches the target version's deletion vector in the SAME
    // commit (add + DvFileAction, no removes). The file was dead at
    // v-1, so its vector is NOT a delta — the feed must insert exactly
    // the rows live under that vector and emit no deletes at all. The
    // old batch replay emitted whole-file inserts plus masked-row
    // deletes (net right, spurious pair); the old STREAM replay
    // inserted only live rows but still emitted the masked deletes,
    // net-diverging from batch by the vector's cardinality.
    val tbl = TestSpark.tmpDir("cdf-dv-resurrect")
    (0L until 100L).map(i => (i, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "200") // ONE file
      .option("deletionVectors", "true").save(tbl) // v0
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.delete("a < 10") == 10L) // v1: dv masks 10 rows
    require(t.snapshot.dvs.nonEmpty, "fixture must mask, not rewrite")
    assert(t.delete("a >= 0") == 90L) // v2: drops the file whole
    require(t.snapshot.files.isEmpty, "fixture must drop the file")
    t.restoreToVersion(1L) // v3: add + dv action, no removes
    assert(spark.read.format("qbeast").load(tbl).count() == 90L)

    val v3 = feedCounts(t.changes(3L, 3L))
    assert(v3 == Map((3L, "insert") -> 90L),
      s"resurrect-with-mask must insert exactly the live rows: $v3")
    // the inserted VALUES are the unmasked rows, not just the count
    val ins = t.changes(3L, 3L).select("a").as[Long].collect().toSet
    assert(ins == (10L until 100L).toSet)

    // stream parity across the whole history
    val out = TestSpark.tmpDir("cdf-dv-resurrect-sink")
    val q = spark.readStream.format("qbeast")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", TestSpark.tmpDir("cdf-dv-resurrect-ckpt"))
      .option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val streamed = feedCounts(
      spark.read.parquet(out).filter(col("_commit_version") >= 1))
    val batch = feedCounts(t.changes(1L))
    assert(streamed == batch,
      s"stream feed must match batch changes(): $streamed vs $batch")
    // and both reconstruct the table: net multiset == current content
    val all = spark.read.parquet(out)
    val net = all.filter(col("_change_type") === "insert").select("a", "b")
      .exceptAll(all.filter(col("_change_type") === "delete").select("a", "b"))
    val current = spark.read.format("qbeast").load(tbl).select("a", "b")
    assert(net.exceptAll(current).count() == 0 && current.exceptAll(net).count() == 0)
  }
}
