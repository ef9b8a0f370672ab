package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Change data feed (QbeastTable.changes — per-commit row diffs from
 * the log's file diff) and shallow clone (QbeastTable.cloneTo —
 * metadata-only table copy with absolute file references). */
class ChangesCloneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String = {
    val dir = TestSpark.tmpDir("qbeast-cdf")
    spark.range(100).select(col("id").as("a"), (col("id") % 10).cast("double").as("b"))
      .write.format("qbeast")
      .option("columnsToIndex", "a,b").option("cubeSize", "50").save(dir)
    dir
  }

  private def changeCounts(df: org.apache.spark.sql.DataFrame): Map[(Long, String), Long] =
    df.groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("append, delete and update each emit exactly their net row changes") {
    val dir = freshTable() // v0: 100 inserts
    spark.range(100, 120).select(col("id").as("a"), lit(0.0).as("b"))
      .write.format("qbeast").mode("append").save(dir) // v1: 20 inserts
    val t = table.QbeastTable.forPath(spark, dir)
    t.delete("a >= 110") // v2: 10 deletes (rewrite survivors cancel)
    t.update("a < 5", Map("b" -> "b + 100")) // v3: 5 delete + 5 insert

    val counts = changeCounts(t.changes(0))
    assert(counts == Map(
      (0L, "insert") -> 100L,
      (1L, "insert") -> 20L,
      (2L, "delete") -> 10L,
      (3L, "insert") -> 5L,
      (3L, "delete") -> 5L))

    // update rows carry the NEW values on insert, OLD on delete
    val v3 = t.changes(3, 3)
    val inserted = v3.filter(col("_change_type") === "insert")
      .select("a", "b").as[(Long, Double)].collect().toMap
    val deleted = v3.filter(col("_change_type") === "delete")
      .select("a", "b").as[(Long, Double)].collect().toMap
    assert(inserted.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(inserted.forall { case (k, v) => v == k % 10 + 100 })
    assert(deleted.forall { case (k, v) => v == k % 10 })

    // replaying the feed reconstructs the table: inserts minus deletes
    val replayed = t.changes(0)
    val net = replayed.filter(col("_change_type") === "insert").select("a", "b")
      .exceptAll(replayed.filter(col("_change_type") === "delete").select("a", "b"))
    val current = spark.read.format("qbeast").load(dir).select("a", "b")
    assert(net.exceptAll(current).count() == 0 && current.exceptAll(net).count() == 0)
  }

  test("optimize commits emit no changes; version ranges slice the feed") {
    val dir = freshTable()
    val t = table.QbeastTable.forPath(spark, dir)
    spark.range(100, 150).select(col("id").as("a"), lit(1.0).as("b"))
      .write.format("qbeast").mode("append").save(dir) // v1
    t.optimize() // v2: dataChange=false rearrangement
    t.delete("a < 10") // v3
    val counts = changeCounts(t.changes(1))
    assert(counts == Map((1L, "insert") -> 50L, (3L, "delete") -> 10L))
    assert(t.changes(2, 2).count() == 0)
    assert(changeCounts(t.changes(3, 3)) == Map((3L, "delete") -> 10L))
  }

  test("changes behind vacuum fail with the missing file named") {
    val dir = freshTable()
    val t = table.QbeastTable.forPath(spark, dir)
    t.delete("a < 50") // v1 rewrites: v0 originals become garbage
    t.vacuum(0L, force = true)
    val e = intercept[IllegalArgumentException] { t.changes(1, 1).collect() }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("vacuum retention keys on removal time, not file age") {
    val dir = freshTable()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    // age every data file far beyond the default 7-day retention
    val old = System.currentTimeMillis() - 10L * 24 * 3600 * 1000
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .foreach(st => fs.setTimes(st.getPath, old, -1))
    val t = table.QbeastTable.forPath(spark, dir)
    t.delete("a < 50") // v1: removes/rewrites 10-day-old files NOW
    // an orphan file (never committed) with an old mtime
    val orphan = new org.apache.hadoop.fs.Path(dir, "orphan-test.parquet")
    val out = fs.create(orphan, true); out.write(1); out.close()
    fs.setTimes(orphan, old, -1)

    // default retention: the files removed a second ago are INSIDE the
    // window (their removal timestamp is now) even though their mtime
    // is 10 days old — only the orphan is reclaimed by mtime fallback
    val deleted = t.vacuum()
    assert(!fs.exists(orphan), "old orphan must be reclaimed")
    assert(deleted == 1, s"only the orphan should go, got $deleted")
    // readers pinned before the delete still work
    assert(spark.read.format("qbeast").option("versionAsOf", "0").load(dir)
      .count() == 100)

    // zero retention reclaims the tombstoned files too
    val deleted2 = t.vacuum(0L, force = true)
    assert(deleted2 > 0)
    assert(spark.read.format("qbeast").load(dir).count() == 50)
  }

  test("shallow clone reads identically and diverges independently") {
    val dir = freshTable()
    val cloneDir = TestSpark.tmpDir("qbeast-clone")
    val src = table.QbeastTable.forPath(spark, dir)
    val cloned = src.cloneTo(cloneDir)

    val a = spark.read.format("qbeast").load(dir)
    val b = spark.read.format("qbeast").load(cloneDir)
    assert(b.exceptAll(a).count() == 0 && a.exceptAll(b).count() == 0)
    // no data was copied: the clone dir holds no parquet
    val cloneFiles = new java.io.File(cloneDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(cloneFiles.isEmpty)

    // pruned reads work through absolute references (sample + filter)
    assert(b.filter(col("a") < 10).count() == 10)
    assert(b.sample(0.5).count() > 0)

    // writes to the clone never touch the source
    spark.range(100, 130).select(col("id").as("a"), lit(2.0).as("b"))
      .write.format("qbeast").mode("append").save(cloneDir)
    cloned.delete("a < 20")
    assert(spark.read.format("qbeast").load(cloneDir).count() == 110)
    assert(spark.read.format("qbeast").load(dir).count() == 100)

    // clone vacuum reclaims only clone-local garbage, not source files
    cloned.vacuum(0L, force = true)
    assert(spark.read.format("qbeast").load(dir).count() == 100)
    assert(spark.read.format("qbeast").load(cloneDir).count() == 110)

    // and the source evolving doesn't move the clone
    src.delete("a >= 90")
    assert(spark.read.format("qbeast").load(cloneDir).count() == 110)
  }

  test("clone metadata: metrics, metadata-count and manifest see through") {
    val dir = freshTable()
    val cloneDir = TestSpark.tmpDir("qbeast-clone-meta")
    val cloned = table.QbeastTable.forPath(spark, dir).cloneTo(cloneDir)
    assert(spark.read.format("qbeast").load(cloneDir).count() == 100) // metadata count
    assert(cloned.indexMetrics().elementCount == 100)
    val n = cloned.generateSymlinkManifest()
    assert(n > 0)
    val manifest = new java.io.File(cloneDir, "_symlink_format_manifest/manifest")
    val lines = scala.io.Source.fromFile(manifest).getLines().filter(_.nonEmpty).toList
    assert(lines.nonEmpty && lines.forall(l => new java.io.File(new java.net.URI(l).getPath).exists()))
    val viaManifest = spark.read.parquet(lines: _*)
    assert(viaManifest.count() == 100)
    // cloning into an existing table is rejected
    val e = intercept[IllegalArgumentException] {
      table.QbeastTable.forPath(spark, dir).cloneTo(cloneDir)
    }
    assert(e.getMessage.contains("already exists"))
  }
}
