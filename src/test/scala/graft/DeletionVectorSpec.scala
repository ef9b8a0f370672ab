package graft

import graft.table.QbeastTable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Injected between an optimize's rewrite and its commit: a dv delete
 * lands on the files being rewritten — the optimize must then abort
 * its layout commit (its rewrite was materialized with the old mask). */
class MidOptimizeDvDeleteHook extends graft.write.PreCommitHook {
  override def name: String = "race-dv-delete"
  override def run(
      spark: org.apache.spark.sql.SparkSession,
      files: Seq[graft.core.model.IndexFile]): Map[String, String] = {
    QbeastTable.forPath(spark, MidOptimizeDvDeleteHook.tableDir.get())
      .delete("k = 47")
    Map.empty
  }
}

object MidOptimizeDvDeleteHook {
  val tableDir = new java.util.concurrent.atomic.AtomicReference[String]()
}

/** Merge-on-read DELETE via deletion vectors (`deletionVectors=true`):
 * small deletes write row-index vectors instead of rewriting files;
 * every read path masks; rewrites materialize; vacuum reclaims. */
class DeletionVectorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeTable(dir: String, rows: Int = 10000): Unit = {
    (1 to rows).map(i => (i.toLong, i % 97, i * 2.0)).toDF("id", "k", "v")
      .write.format("qbeast")
      .option("columnsToIndex", "id,v")
      .option("cubeSize", "1000")
      .option("deletionVectors", "true")
      .save(dir)
  }

  private def back(dir: String): DataFrame =
    spark.read.format("qbeast").load(dir)

  test("small DELETE writes vectors, rewrites nothing, reads mask exactly") {
    val dir = TestSpark.tmpDir("dv-basic")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    val filesBefore = t.snapshot.files.map(_.path).toSet
    val deleted = t.delete("k = 13") // ~1% of rows, spread over files
    assert(deleted === (1 to 10000).count(_ % 97 == 13).toLong)
    val s = t.snapshot
    assert(s.files.map(_.path).toSet === filesBefore, "no file rewritten")
    assert(s.dvs.nonEmpty, "vectors attached")
    assert(s.dvMaskedRows === deleted)
    // read parity with the logical expectation, via the normal scan
    val got = back(dir).agg(count(lit(1)), sum("id")).head()
    val exp = (1 to 10000).filter(_ % 97 != 13)
    assert(got.getLong(0) === exp.size.toLong)
    assert(got.getLong(1) === exp.map(_.toLong).sum)
    // filters and sampling still work over the masked scan
    assert(back(dir).filter(col("k") === 13).count() === 0L)
    assert(back(dir).filter(col("id") <= 100).count() ===
      (1 to 100).count(_ % 97 != 13).toLong)
  }

  test("a second DELETE on the same files unions into replacement vectors") {
    val dir = TestSpark.tmpDir("dv-union")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 5") > 0L)
    val cardAfterFirst = t.snapshot.dvMaskedRows
    assert(t.delete("k = 7") > 0L)
    val s = t.snapshot
    assert(s.dvMaskedRows ===
      (1 to 10000).count(i => i % 97 == 5 || i % 97 == 7).toLong)
    assert(s.dvMaskedRows > cardAfterFirst)
    assert(back(dir).count() ===
      (1 to 10000).count(i => i % 97 != 5 && i % 97 != 7).toLong)
    // already-deleted rows never re-match (delete of k=5 again is a no-op)
    assert(t.delete("k = 5") === 0L)
  }

  test("a large DELETE falls back to copy-on-write and materializes existing masks") {
    val dir = TestSpark.tmpDir("dv-fallback")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 3") > 0L) // small: vectors
    assert(t.snapshot.dvs.nonEmpty)
    val big = t.delete("id <= 9000") // way past the masked-fraction cap
    assert(big === (1 to 9000).count(i => i % 97 != 3).toLong)
    val s = t.snapshot
    assert(s.dvs.isEmpty, "rewrite cleared the masks")
    assert(back(dir).count() === (9001 to 10000).count(i => i % 97 != 3).toLong)
  }

  test("optimize materializes deletes; vacuum reclaims dead vectors") {
    val dir = TestSpark.tmpDir("dv-optimize")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 11") > 0L)
    val expect = (1 to 10000).count(_ % 97 != 11).toLong
    t.optimize()
    val s = t.snapshot
    assert(s.dvs.isEmpty, "optimize rewrote the masked files unmasked")
    assert(back(dir).count() === expect)
    val reclaimed = t.vacuum(retainMillis = 0L, force = true)
    assert(reclaimed > 0, "dead vectors + rewritten files reclaimed")
    val dvDir = new java.io.File(dir, "_deletion_vectors")
    assert(!dvDir.exists() || dvDir.listFiles().isEmpty)
    assert(back(dir).count() === expect)
    assert(t.verifyIntegrity().isEmpty)
  }

  test("UPDATE on a masked table preserves the earlier masks and never resurrects") {
    val dir = TestSpark.tmpDir("dv-update")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 17") > 0L)
    val updated = t.update("k = 19", Map("v" -> "v + 0.5"))
    assert(updated === (1 to 10000).count(_ % 97 == 19).toLong)
    val n = back(dir).count()
    assert(n === (1 to 10000).count(i => i % 97 != 17).toLong)
    assert(back(dir).filter(col("k") === 17).count() === 0L)
  }

  test("changes() replays a dv commit as delete rows") {
    val dir = TestSpark.tmpDir("dv-changes")
    writeTable(dir, rows = 2000)
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 23") > 0L)
    val feed = t.changes(0L)
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") === 2000L)
    assert(byType("delete") === (1 to 2000).count(_ % 97 == 23).toLong)
    // the delete rows are exactly the masked rows
    val del = feed.filter(col("_change_type") === "delete")
    assert(del.agg(sum("id")).head().getLong(0) ===
      (1 to 2000).filter(_ % 97 == 23).map(_.toLong).sum)
  }

  test("time travel sees the pre-delete state; vectors survive a checkpoint") {
    val dir = TestSpark.tmpDir("dv-travel")
    writeTable(dir, rows = 3000)
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 31") > 0L)
    val expect = (1 to 3000).count(_ % 97 != 31).toLong
    assert(spark.read.format("qbeast").option("versionAsOf", 0).load(dir)
      .count() === 3000L, "version 0 predates the vectors")
    assert(back(dir).count() === expect)
    // the dv state must ride the JSON checkpoint (replay starts there)
    t.checkpoint()
    assert(QbeastTable.forPath(spark, dir).snapshot.dvs.nonEmpty)
    assert(back(dir).count() === expect)
  }

  test("metadata-only count subtracts vector cardinalities; min/max bail") {
    val dir = TestSpark.tmpDir("dv-metacount")
    writeTable(dir, rows = 3000)
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 37") > 0L)
    val expect = (1 to 3000).count(_ % 97 != 37).toLong
    // count(*) still folds to metadata: vector cardinalities are exact
    val df = back(dir).agg(count(lit(1)).as("cnt"))
    val folded = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.isEmpty
    assert(folded, "masked count(*) must fold: live = blocks - masks")
    assert(df.head().getLong(0) === expect)
    // min/max cannot: the extreme row might be a masked one
    val mm = back(dir).agg(max("id").as("m"))
    val mmFolded = mm.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.isEmpty
    assert(!mmFolded, "masked min/max must bail to the scan")
    assert(mm.head().getLong(0) === 3000L)
  }

  test("a running stream refuses a dv commit without ignoreDeletes, skips with it") {
    val dir = TestSpark.tmpDir("dv-stream-guard")
    writeTable(dir, rows = 2000)
    val t = QbeastTable.forPath(spark, dir)

    def drain(opts: Map[String, String], out: String, ckpt: String): Option[Throwable] = {
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        val r = spark.readStream.format("qbeast")
          .options(opts).load(dir)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q = r
        r.awaitTermination(120000)
        None
      } catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        Some(e)
      } finally if (q != null && q.isActive) q.stop()
    }

    // drain the snapshot, then land a dv delete and drain again
    val out1 = TestSpark.tmpDir("dv-guard-out"); val ck1 = TestSpark.tmpDir("dv-guard-ck")
    assert(drain(Map.empty, out1, ck1).isEmpty)
    assert(t.delete("k = 41") > 0L)
    val err = drain(Map.empty, out1, ck1)
    assert(err.nonEmpty, "dv commit must stop a stream without ignoreDeletes")
    assert(err.get.getMessage.contains("deletion vector") ||
      err.get.getCause.getMessage.contains("deletion vector"))
    // with ignoreDeletes the commit is skipped (no new rows, no error)
    val out2 = TestSpark.tmpDir("dv-guard-out2"); val ck2 = TestSpark.tmpDir("dv-guard-ck2")
    assert(drain(Map("ignoreDeletes" -> "true"), out2, ck2).isEmpty)
    assert(spark.read.parquet(out2).count() ===
      (1 to 2000).count(_ % 97 != 41).toLong,
      "fresh stream's snapshot phase masks; the dv commit itself adds nothing")
  }

  test("restore reconciles vectors: back past a delete, and forward onto one") {
    val dir = TestSpark.tmpDir("dv-restore")
    writeTable(dir, rows = 3000)                  // v0
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 43") > 0L)               // v1: dv commit
    val maskedCount = (1 to 3000).count(_ % 97 != 43).toLong
    val maskedVersion = t.snapshot.version
    t.restoreToVersion(0)                         // back past the delete
    assert(QbeastTable.forPath(spark, dir).snapshot.dvs.isEmpty,
      "restore to v0 must clear the later mask")
    assert(back(dir).count() === 3000L)
    t.restoreToVersion(maskedVersion)             // forward onto the mask
    assert(QbeastTable.forPath(spark, dir).snapshot.dvs.nonEmpty,
      "restore to the masked version must re-attach its vector")
    assert(back(dir).count() === maskedCount)
  }

  test("an optimize racing a dv delete drops its rewrite instead of resurrecting") {
    val dir = TestSpark.tmpDir("dv-race")
    writeTable(dir, rows = 4000)
    val t = QbeastTable.forPath(spark, dir)
    // pre-commit hook fires after optimize has indexed its rewrite but
    // before its commit: land a dv delete in that window
    val expect = (1 to 4000).count(_ % 97 != 47).toLong
    MidOptimizeDvDeleteHook.tableDir.set(dir)
    t.optimize(options =
      Map("hook.race" -> classOf[MidOptimizeDvDeleteHook].getName))
    // the delete won; the optimize either rebased safely or dropped its
    // layout commit — under NO outcome do the deleted rows come back
    assert(back(dir).count() === expect)
    assert(spark.read.format("qbeast").load(dir)
      .filter(col("k") === 47).count() === 0L)
  }

  test("shallow clone carries the masks; streaming guards fire") {
    val dir = TestSpark.tmpDir("dv-clone")
    writeTable(dir, rows = 3000)
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("k = 29") > 0L)
    val expect = (1 to 3000).count(_ % 97 != 29).toLong
    val cloneDir = TestSpark.tmpDir("dv-clone-target") + "/t"
    t.cloneTo(cloneDir)
    assert(back(cloneDir).count() === expect)

    // a stream started AFTER the delete masks the snapshot phase
    val outDir = TestSpark.tmpDir("dv-stream-out")
    val ckpt = TestSpark.tmpDir("dv-stream-ckpt")
    val q = spark.readStream.format("qbeast").load(dir)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(outDir).count() === expect)
  }

  test("broadcastFor caches per (table, state): alternating states both stay hot") {
    val dvs = graft.write.DeletionVectors
    val a = Map("f1.parquet" -> "dv/a1.bin", "f2.parquet" -> "dv/a2.bin")
    val b = Map("f1.parquet" -> "dv/b1.bin") // the CDF 'v' branch probes
    val tbl = "/tmp/bc-cache-probe" //          state-at-v AND state-at-(v-1)
    val bcA = dvs.broadcastFor(spark, tbl, a)
    val bcB = dvs.broadcastFor(spark, tbl, b)
    // a single-slot-per-table cache would re-broadcast on every flip
    assert(dvs.broadcastFor(spark, tbl, a) eq bcA)
    assert(dvs.broadcastFor(spark, tbl, b) eq bcB)
    assert(bcA.value == a && bcB.value == b)
  }

  test("broadcastFor eviction is LRU: the hot entry survives cache churn") {
    val dvs = graft.write.DeletionVectors
    val hot = Map("hot.parquet" -> "dv/hot.bin")
    val tbl = "/tmp/bc-lru-probe"
    val bcHot = dvs.broadcastFor(spark, tbl, hot)
    // cycle 100 distinct (table, state) pairs — well past the 64-entry
    // bound — touching the hot entry between inserts. A clear()-on-
    // overflow cache would wipe it; LRU must keep it resident.
    (1 to 100).foreach { i =>
      dvs.broadcastFor(spark, s"$tbl-churn-$i", Map(s"f$i.parquet" -> s"dv/$i.bin"))
      assert(dvs.broadcastFor(spark, tbl, hot) eq bcHot,
        s"hot entry was evicted after $i churn inserts")
    }
    // the hot broadcast is still fully usable after all the evictions
    assert(bcHot.value == hot)
  }

}
