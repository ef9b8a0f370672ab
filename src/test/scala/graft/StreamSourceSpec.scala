package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** readStream.format("qbeast"): a qbeast table as a Structured
 * Streaming source — initial snapshot, incremental append consumption
 * across restarts, layout-only commit skipping, and the non-append-only
 * failure contract. */
class StreamSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeSlice(tbl: String, lo: Long, hi: Long, mode: String): Unit =
    (lo until hi).map(i => (i, i * 10.0, s"p$i")).toDF("id", "price", "tag")
      .write.format("qbeast")
      .option("columnsToIndex", "id,price").option("cubeSize", "100")
      .mode(mode).save(tbl)

  /** Drain everything currently available into a parquet sink dir. */
  private def drain(tbl: String, ckpt: String, out: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("qbeast")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination()
    finally q.stop()
  }

  private def ids(out: String): Seq[Long] =
    // an all-empty-batches sink has no parquet footer to infer from
    try spark.read.parquet(out).select("id").collect().map(_.getLong(0)).toSeq.sorted
    catch { case e: org.apache.spark.sql.AnalysisException
        if e.getMessage.contains("Unable to infer schema") => Seq.empty }

  test("initial snapshot + incremental appends across restarts, exactly once") {
    val tbl = TestSpark.tmpDir("qss-tbl")
    val ckpt = TestSpark.tmpDir("qss-ckpt")
    val out = TestSpark.tmpDir("qss-out")
    writeSlice(tbl, 0, 50, "overwrite")
    writeSlice(tbl, 50, 80, "append")

    drain(tbl, ckpt, out) // snapshot batch: both committed versions
    assert(ids(out) == (0L until 80L))

    writeSlice(tbl, 80, 100, "append")
    writeSlice(tbl, 100, 110, "append")
    drain(tbl, ckpt, out) // restart from checkpoint: only the new commits
    assert(ids(out) == (0L until 110L), "appended rows must arrive exactly once")

    drain(tbl, ckpt, out) // nothing new → no duplicates
    assert(ids(out) == (0L until 110L))
  }

  test("startingTimestamp bounds the stream like startingVersion") {
    val tbl = TestSpark.tmpDir("qss-ts-tbl")
    writeSlice(tbl, 0, 30, "overwrite") // v0
    Thread.sleep(1100) // distinct commit-file mtimes
    writeSlice(tbl, 30, 50, "append") // v1
    val hist = table.QbeastTable.forPath(spark, tbl).history()
    // a timestamp strictly between the two commits → only v1 streams;
    // a timestamp exactly AT v1 must still include v1
    val isoT = new java.sql.Timestamp(hist(1).timestampMillis - 500).toString
      .replace(' ', 'T') + "Z" // ISO 'T' + zone suffix must parse too
    for (ts <- Seq(
        new java.sql.Timestamp(hist(1).timestampMillis - 500).toString,
        new java.sql.Timestamp(hist(1).timestampMillis).toString,
        isoT)) {
      val out = TestSpark.tmpDir("qss-ts-out")
      drain(tbl, TestSpark.tmpDir("qss-ts-ckpt"), out,
        Map("startingTimestamp" -> ts))
      assert(ids(out) == (30L until 50L), s"for startingTimestamp=$ts")
    }
    // a timestamp before everything replays the full history
    val out3 = TestSpark.tmpDir("qss-ts-out3")
    drain(tbl, TestSpark.tmpDir("qss-ts-ckpt3"), out3,
      Map("startingTimestamp" -> new java.sql.Timestamp(hist(0).timestampMillis - 1000).toString))
    assert(ids(out3) == (0L until 50L))
  }

  test("layout-only commits (optimize) are skipped, not re-delivered") {
    val tbl = TestSpark.tmpDir("qss-opt-tbl")
    val ckpt = TestSpark.tmpDir("qss-opt-ckpt")
    val out = TestSpark.tmpDir("qss-opt-out")
    writeSlice(tbl, 0, 60, "overwrite")
    drain(tbl, ckpt, out)
    assert(ids(out) == (0L until 60L))

    // compaction rewrites files with dataChange = false
    graft.table.QbeastTable.forPath(spark, tbl).optimize()
    writeSlice(tbl, 60, 70, "append")
    drain(tbl, ckpt, out)
    assert(ids(out) == (0L until 70L),
      "optimize must contribute nothing; the append must still flow")
  }

  test("data-rewriting commit fails the stream unless ignoreChanges") {
    val tbl = TestSpark.tmpDir("qss-del-tbl")
    writeSlice(tbl, 0, 40, "overwrite")
    val ckpt1 = TestSpark.tmpDir("qss-del-ckpt1")
    val out1 = TestSpark.tmpDir("qss-del-out1")
    drain(tbl, ckpt1, out1)
    assert(ids(out1) == (0L until 40L))

    // copy-on-write delete: removes + dataChange re-adds
    graft.table.QbeastTable.forPath(spark, tbl).delete("id < 5")

    val ex = intercept[StreamingQueryException] {
      drain(tbl, ckpt1, out1)
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("ignoreChanges") || msgs.contains("ignoreDeletes"),
      s"expected the append-only contract error, got: $msgs")

    // with ignoreChanges the rewrite's re-added files flow (duplicates
    // allowed by contract); a FRESH sink sees the current table content
    val ckpt2 = TestSpark.tmpDir("qss-del-ckpt2")
    val out2 = TestSpark.tmpDir("qss-del-out2")
    drain(tbl, ckpt2, out2, Map("ignoreChanges" -> "true"))
    assert(ids(out2) == (5L until 40L))
  }

  test("a mid-stream schema change stops the LIVE source; a restart picks it up") {
    val tbl = TestSpark.tmpDir("qss-schema-tbl")
    writeSlice(tbl, 0, 30, "overwrite")
    // a source instance pinned to the pre-evolution schema...
    val src = new graft.sources.QbeastStreamSource(
      spark.sqlContext, tbl, None, Map("startingVersion" -> "0"))
    // ...then the table evolves and receives evolved data
    (30 until 40).map(i => (i.toLong, i * 10.0, s"p$i", i))
      .toDF("id", "price", "tag", "extra")
      .write.format("qbeast").option("mergeSchema", "true")
      .mode("append").save(tbl)
    val head = graft.log.QbeastLog
      .snapshot(tbl, spark.sparkContext.hadoopConfiguration).version
    val e = intercept[UnsupportedOperationException] {
      src.getBatch(None, graft.sources.QbeastSourceOffset(head))
    }
    assert(e.getMessage.contains("changed the table schema") &&
      e.getMessage.contains("Restart"))
    // a fresh drain (= restarted query, new source) reads the evolved
    // schema cleanly
    val ckpt = TestSpark.tmpDir("qss-schema-ckpt")
    val out = TestSpark.tmpDir("qss-schema-out")
    drain(tbl, ckpt, out)
    assert(ids(out) == (0L until 40L))
  }

  test("a fully-admitted batch delivers even when the NEXT commit's guard throws") {
    val tbl = TestSpark.tmpDir("qss-guard-tbl")
    val ckpt = TestSpark.tmpDir("qss-guard-ckpt")
    val out = TestSpark.tmpDir("qss-guard-out")
    writeSlice(tbl, 0, 10, "overwrite") // v0
    drain(tbl, ckpt, out)
    writeSlice(tbl, 10, 20, "append") // v1: clean append
    graft.table.QbeastTable.forPath(spark, tbl).delete("id >= 0") // v2: delete-only
    // v1's file count fits exactly in one trigger; admission must stop
    // at the v1 boundary instead of peeking into v2 and dying there
    val files1 = graft.log.QbeastLog
      .snapshot(tbl, spark.sparkContext.hadoopConfiguration).version
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(tbl, ckpt, out, Map("maxFilesPerTrigger" -> "1"))
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("ignoreDeletes"), s"unexpected failure: $msg")
    assert(ids(out) == (0L until 20L),
      "every v1 row must have been delivered in bounded batches before the v2 guard fired")
    assert(files1 == 2L)
  }

  test("CDF whole-commit diff ('x') units admit atomically under rate limits") {
    // a rewrite commit without a persisted change file replays as ONE
    // pseudo-unit: under maxFilesPerTrigger=1 every unit is its own
    // microbatch, so the diff's before/after sides can never be split
    // across batches — and the drained feed must equal batch changes()
    val tbl = TestSpark.tmpDir("qss-x-tbl")
    writeSlice(tbl, 0, 30, "overwrite") // v0
    writeSlice(tbl, 30, 40, "append") // v1
    val t = graft.table.QbeastTable.forPath(spark, tbl)
    assert(t.update("id < 5", Map("price" -> "price + 1")) == 5L) // v2: 'x'
    writeSlice(tbl, 40, 45, "append") // v3: plain 'a' units after the diff
    val ckpt = TestSpark.tmpDir("qss-x-ckpt")
    val out = TestSpark.tmpDir("qss-x-out")
    val q = spark.readStream.format("qbeast")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .option("maxFilesPerTrigger", "1").load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("_commit_version", "_change_type").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamed = counts(spark.read.parquet(out))
    val batch = counts(t.changes(0))
    assert(streamed == batch,
      s"rate-limited 'x' replay must equal batch changes(): $streamed vs $batch")
    assert(streamed((2L, "insert")) == 5L && streamed((2L, "delete")) == 5L)
    // the updated rows stream their post-image values
    val ins = spark.read.parquet(out)
      .filter(col("_commit_version") === 2 && col("_change_type") === "insert")
      .select("id", "price").as[(Long, Double)].collect().toMap
    assert(ins == (0L until 5L).map(i => i -> (i * 10.0 + 1)).toMap)
  }

  test("readChangeFeed rejects tables that already use the reserved column names") {
    val tbl = TestSpark.tmpDir("qss-reserved-tbl")
    (1 to 5).map(i => (i.toLong, s"t$i")).toDF("_commit_version", "_change_type")
      .write.format("qbeast").option("columnsToIndex", "_commit_version")
      .option("cubeSize", "100").save(tbl)
    val e = intercept[Exception] {
      spark.readStream.format("qbeast").option("readChangeFeed", "true")
        .load(tbl)
        .writeStream.format("parquet")
        .option("checkpointLocation", TestSpark.tmpDir("qss-res-ckpt"))
        .option("path", TestSpark.tmpDir("qss-res-out"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        .awaitTermination()
    }
    assert(e.getMessage.contains("reserves column names") ||
      Option(e.getCause).exists(_.getMessage.contains("reserves column names")))
  }

  test("startingVersion=latest streams only commits after stream start") {
    val tbl = TestSpark.tmpDir("qss-lat-tbl")
    val ckpt = TestSpark.tmpDir("qss-lat-ckpt")
    val out = TestSpark.tmpDir("qss-lat-out")
    writeSlice(tbl, 0, 30, "overwrite")

    drain(tbl, ckpt, out, Map("startingVersion" -> "latest"))
    assert(ids(out).isEmpty, "no commits after stream start yet")

    writeSlice(tbl, 30, 45, "append")
    drain(tbl, ckpt, out, Map("startingVersion" -> "latest"))
    assert(ids(out) == (30L until 45L))
  }

  test("CDF delete-only commits carry sizes and fail NAMED after vacuum") {
    val tbl = TestSpark.tmpDir("qss-cdfvac-tbl")
    writeSlice(tbl, 0, 50, "overwrite") // version 0
    val t = table.QbeastTable.forPath(spark, tbl)
    t.delete("id >= 0") // every file's rows go: delete-only commit (no adds)

    // the remove actions carry the files' byte sizes so
    // maxBytesPerTrigger can budget delete-only units
    val conf = spark.sparkContext.hadoopConfiguration
    val snap = graft.log.QbeastLog.lightSnapshot(tbl, conf)
    val removes = graft.log.QbeastLog
      .commitActions(tbl, conf, snap.version, snap.revisions)
      .collect { case graft.log.RemoveFileAction(r) => r }
    assert(removes.nonEmpty && removes.forall(_.size > 0L),
      s"remove actions must carry sizes: $removes")

    // pre-vacuum: the delete-only commit replays as delete rows
    def drainCdf(): org.apache.spark.sql.DataFrame = {
      val ckpt = TestSpark.tmpDir("qss-cdfvac-ckpt")
      val out = TestSpark.tmpDir("qss-cdfvac-out")
      val q = spark.readStream.format("qbeast")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load(tbl)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      spark.read.parquet(out)
    }
    val res = drainCdf()
    assert(res.filter(col("_change_type") === "delete").count() == 50)

    // vacuum reclaims the tombstoned files; replaying the range must
    // fail with the vacuumed file NAMED, not a raw FileNotFoundException
    assert(t.vacuum(retainMillis = 0L, force = true) > 0)
    val e = intercept[StreamingQueryException] { drainCdf() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("vacuumed"), msgs)
  }

  test("CDF replays dv commits as vector deltas; adds stream unmasked by later DML") {
    val tbl = TestSpark.tmpDir("qss-dvcdf-tbl")
    (0L until 50L).map(i => (i, i * 10.0, s"p$i")).toDF("id", "price", "tag")
      .write.format("qbeast").option("columnsToIndex", "id,price")
      .option("cubeSize", "100").option("deletionVectors", "true")
      .mode("overwrite").save(tbl) // v0
    writeSlice(tbl, 50, 80, "append") // v1
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.delete("id % 10 = 3") == 8L) // v2: dv masks (opaque predicate)
    t.update("id % 25 = 1", Map("price" -> "price + 0.5")) // v3: dv + adds
    // fixture guard: the DML commits persisted vectors, NOT change files
    val conf = spark.sparkContext.hadoopConfiguration
    val snap = graft.log.QbeastLog.lightSnapshot(tbl, conf)
    (2L to 3L).foreach { v =>
      val acts = graft.log.QbeastLog.commitActions(tbl, conf, v, snap.revisions)
      assert(acts.exists(_.isInstanceOf[graft.log.DvFileAction]), s"commit $v: no dv")
      assert(!acts.exists(_.isInstanceOf[graft.log.CdcFileAction]), s"commit $v: cdc")
    }

    val ckpt = TestSpark.tmpDir("qss-dvcdf-ckpt")
    val out = TestSpark.tmpDir("qss-dvcdf-out")
    val q = spark.readStream.format("qbeast")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val res = spark.read.parquet(out)

    def idsOf(v: Long, kind: String): Seq[Long] = res
      .filter(col("_commit_version") === v && col("_change_type") === kind)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    // insert feeds are the files AS COMMITTED — a later mask must not
    // thin them (the rows it kills arrive as that commit's deletes)
    assert(idsOf(0, "insert") == (0L until 50L), "v0 insert feed was masked")
    assert(idsOf(1, "insert") == (50L until 80L), "v1 insert feed was masked")
    // the dv DELETE streams exactly its newly masked rows
    assert(idsOf(2, "delete") == (0L until 80L).filter(_ % 10 == 3))
    // the merge-on-read UPDATE streams pre-images as deletes (vector
    // delta) and new images as inserts (its adds)
    val updated = (0L until 80L).filter(_ % 25 == 1)
    assert(idsOf(3, "delete") == updated && idsOf(3, "insert") == updated)
    val post = res.filter(col("_commit_version") === 3)
      .groupBy("_change_type").agg(sum("price").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(post("insert") - post("delete") - 0.5 * updated.size) < 1e-9)

    // a purged+vacuumed range must fail NAMED, not raw FileNotFound
    assert(t.purgeDeletionVectors() > 0)
    assert(t.vacuum(retainMillis = 0L, force = true) > 0)
    val e = intercept[StreamingQueryException] {
      val ck2 = TestSpark.tmpDir("qss-dvcdf-ckpt2")
      val out2 = TestSpark.tmpDir("qss-dvcdf-out2")
      val q2 = spark.readStream.format("qbeast")
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load(tbl)
        .writeStream.format("parquet")
        .option("checkpointLocation", ck2).option("path", out2)
        .trigger(Trigger.AvailableNow()).start()
      try q2.awaitTermination() finally q2.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("vacuumed"), msgs)
  }

  test("CDF snapshot inserts are masked at the ANCHOR, not at (re)start time") {
    // a dv DELETE that lands while a CDF stream is stopped mid-snapshot
    // must NOT thin the remaining snapshot insert feed (the delete
    // streams separately as that commit's 'v' vector delta); masking
    // with the restart-time dv state would double-drop those rows
    val tbl = TestSpark.tmpDir("qss-anchor-tbl")
    (0L until 600L).map(i => (i, i * 10.0, s"p$i")).toDF("id", "price", "tag")
      .write.format("qbeast").option("columnsToIndex", "id,price")
      .option("cubeSize", "50").option("deletionVectors", "true")
      .mode("overwrite").save(tbl) // v0: several snapshot files
    assert(graft.log.QbeastLog
      .snapshot(tbl, spark.sparkContext.hadoopConfiguration).files.size >= 3)

    val ckpt = TestSpark.tmpDir("qss-anchor-ckpt")
    val out = TestSpark.tmpDir("qss-anchor-out")
    // one file per batch on a slow trigger: stopping after the first
    // committed batch deterministically leaves the checkpoint
    // mid-snapshot (the second trigger is 60 s away)
    val q = spark.readStream.format("qbeast")
      .option("readChangeFeed", "true").option("maxFilesPerTrigger", "1")
      .load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.ProcessingTime("60 seconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (batchCount(ckpt) < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(batchCount(ckpt) >= 1, "no batch committed within timeout")
    } finally q.stop()

    // while stopped: a dv DELETE over rows spread across every file
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.delete("id % 10 = 3") == 60L) // v1: masks, opaque predicate

    // resume: the rest of the snapshot + the v1 vector delta
    val q2 = spark.readStream.format("qbeast")
      .option("readChangeFeed", "true").load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()

    val res = spark.read.parquet(out)
    val inserts = res.filter(col("_change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    val deletes = res.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(inserts == (0L until 600L),
      "snapshot insert feed was thinned by a post-anchor dv state")
    assert(deletes == (0L until 600L).filter(_ % 10 == 3),
      "the dv DELETE must stream exactly once as its own vector delta")
  }

  test("CDF change-file ('c') units behind vacuum also fail NAMED") {
    import org.apache.spark.sql.functions.expr
    val tbl = TestSpark.tmpDir("qss-cdfvac-c-tbl")
    (0L until 50L).map(i => (i, i * 10.0, s"p$i")).toDF("id", "price", "tag")
      .write.format("qbeast")
      .option("columnsToIndex", "id,price").option("cubeSize", "100")
      .option("enableChangeDataFeed", "true").save(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    t.update("id < 10", Map("price" -> "price + 1")) // commit 1: 'c' change files
    // vacuum expires the _change_data files with the data retention
    t.vacuum(retainMillis = 0L, force = true)
    val e = intercept[StreamingQueryException] {
      val ckpt = TestSpark.tmpDir("qss-cdfvac-c-ckpt")
      val out = TestSpark.tmpDir("qss-cdfvac-c-out")
      val q = spark.readStream.format("qbeast")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load(tbl)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("vacuumed"), msgs)
  }

  test("startingVersion=N skips the snapshot and starts at commit N") {
    val tbl = TestSpark.tmpDir("qss-sv-tbl")
    val ckpt = TestSpark.tmpDir("qss-sv-ckpt")
    val out = TestSpark.tmpDir("qss-sv-out")
    writeSlice(tbl, 0, 20, "overwrite") // version 0
    writeSlice(tbl, 20, 30, "append") // version 1
    writeSlice(tbl, 30, 40, "append") // version 2
    drain(tbl, ckpt, out, Map("startingVersion" -> "1"))
    assert(ids(out) == (20L until 40L))
  }

  /** Committed batch count = offset-log entries in the checkpoint. */
  private def batchCount(ckpt: String): Int =
    Option(new java.io.File(s"$ckpt/offsets").listFiles())
      .map(_.count(f => f.getName.forall(_.isDigit))).getOrElse(0)

  test("maxFilesPerTrigger splits snapshot and backlog into bounded batches") {
    val tbl = TestSpark.tmpDir("qss-rl-tbl")
    val ckpt = TestSpark.tmpDir("qss-rl-ckpt")
    val out = TestSpark.tmpDir("qss-rl-out")
    // small cubeSize → several files per commit
    writeSlice(tbl, 0, 60, "overwrite")
    writeSlice(tbl, 60, 90, "append")
    writeSlice(tbl, 90, 120, "append")
    val nFiles = graft.log.QbeastLog
      .snapshot(tbl, spark.sparkContext.hadoopConfiguration).files.size
    assert(nFiles >= 3, s"fixture should span several files, got $nFiles")

    // one AvailableNow run must drain EVERYTHING, in ≥ ceil(nFiles/2)
    // bounded batches (2 files per trigger), exactly once
    drain(tbl, ckpt, out, Map("maxFilesPerTrigger" -> "2"))
    assert(ids(out) == (0L until 120L),
      "rate limiting must change batch boundaries, never content")
    val batches = batchCount(ckpt)
    assert(batches >= (nFiles + 1) / 2,
      s"expected >= ${(nFiles + 1) / 2} bounded batches for $nFiles files, got $batches")

    // appends after the drain flow through the same checkpoint
    writeSlice(tbl, 120, 130, "append")
    drain(tbl, ckpt, out, Map("maxFilesPerTrigger" -> "2"))
    assert(ids(out) == (0L until 130L))
  }

  test("Trigger.Once overrides per-trigger limits and drains everything") {
    // the engine passes ReadLimit.allAvailable() for Once — honoring the
    // parameter over the configured options is the FileStreamSource/
    // Delta contract; otherwise Once would silently under-consume
    val tbl = TestSpark.tmpDir("qss-once-tbl")
    val ckpt = TestSpark.tmpDir("qss-once-ckpt")
    val out = TestSpark.tmpDir("qss-once-out")
    writeSlice(tbl, 0, 60, "overwrite")
    writeSlice(tbl, 60, 90, "append")
    @annotation.nowarn("cat=deprecation")
    val q = spark.readStream.format("qbeast")
      .option("maxFilesPerTrigger", "1").load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.Once()).start()
    try q.awaitTermination()
    finally q.stop()
    assert(ids(out) == (0L until 90L),
      "Trigger.Once must process ALL available data in its single batch")
    assert(batchCount(ckpt) == 1)
  }

  test("maxBytesPerTrigger bounds batches; a restart resumes mid-snapshot") {
    val tbl = TestSpark.tmpDir("qss-rb-tbl")
    val out = TestSpark.tmpDir("qss-rb-out")
    writeSlice(tbl, 0, 400, "overwrite") // cubeSize 100 → several files
    val files = graft.log.QbeastLog
      .snapshot(tbl, spark.sparkContext.hadoopConfiguration).files
    assert(files.size >= 2)

    // budget of one smallest file → every batch is a single file
    val ckpt = TestSpark.tmpDir("qss-rb-ckpt")
    drain(tbl, ckpt, out, Map("maxBytesPerTrigger" -> files.map(_.size).min.toString))
    assert(ids(out) == (0L until 400L))
    assert(batchCount(ckpt) >= files.size,
      s"expected >= ${files.size} single-file batches, got ${batchCount(ckpt)}")

    // restart from a checkpoint whose last offset is mid-snapshot: run a
    // fresh stream one batch at a time (Trigger.Once-like: AvailableNow
    // latches head, so stopping after the first batch leaves the
    // checkpoint mid-snapshot), then resume unlimited
    val ckpt2 = TestSpark.tmpDir("qss-rb2-ckpt")
    val out2 = TestSpark.tmpDir("qss-rb2-out")
    val q = spark.readStream.format("qbeast")
      .option("maxFilesPerTrigger", "1").load(tbl)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt2).option("path", out2)
      .trigger(Trigger.AvailableNow()).start()
    try {
      // wait for ≥1 committed batch, then stop mid-drain
      val deadline = System.currentTimeMillis() + 60000
      while (batchCount(ckpt2) < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(batchCount(ckpt2) >= 1, "no batch committed within timeout")
    } finally q.stop()
    // usually partial here (stopped mid-drain); either way the resume
    // below must land on exactly-once totals — sorted-equality catches
    // both loss and duplication
    drain(tbl, ckpt2, out2) // resume WITHOUT rate limit: finish in one go
    assert(ids(out2) == (0L until 400L),
      "mid-snapshot resume must deliver the remainder exactly once")
  }

}
