package graft

import graft.log.QbeastLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LogCheckpointSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("many commits trigger a checkpoint; snapshot state is identical") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("ckpt-log")
    val df0 = (1 to 50).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
    df0.write.format("qbeast").option("columnsToIndex", "a,b")
      .option("cubeSize", "1000").save(dir)
    (1 to QbeastLog.CheckpointInterval + 2).foreach { k =>
      (1 to 10).map(i => ((k * 100 + i).toLong, i * 1.0)).toDF("a", "b")
        .write.format("qbeast").mode("append").save(dir)
    }
    // a checkpoint file must exist now
    val logFiles = new java.io.File(dir, "_qbeast_log").list().toSeq
    assert(logFiles.exists(_.endsWith(".checkpoint.json")),
      s"no checkpoint in $logFiles")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 50 + (QbeastLog.CheckpointInterval + 2) * 10)
    // sanity: snapshot from checkpoint equals full state
    val snap = QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    assert(snap.files.map(_.elementCount).sum == back.count())
  }

  test("vacuum deletes unreferenced files only") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("vacuum")
    val df = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
    df.write.format("qbeast").option("columnsToIndex", "a,b")
      .option("cubeSize", "200").save(dir)
    // overwrite leaves the first write's files as removed-but-present
    df.filter("a <= 10").write.format("qbeast").mode("overwrite").save(dir)
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val before = new java.io.File(dir).list().count(_.endsWith(".parquet"))
    val deleted = t.vacuum(retainMillis = 0L, force = true)
    val after = new java.io.File(dir).list().count(_.endsWith(".parquet"))
    assert(deleted > 0 && after == before - deleted)
    assert(spark.read.format("qbeast").load(dir).count() == 10)
  }

  test("symlink manifest lists exactly the live snapshot, atomically replaced") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("manifest")
    val df = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
    df.write.format("qbeast").option("columnsToIndex", "a,b")
      .option("cubeSize", "100").save(dir)
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val n1 = t.generateSymlinkManifest()
    def manifestLines(): Seq[String] = {
      val src = scala.io.Source.fromFile(s"$dir/_symlink_format_manifest/manifest")
      try src.getLines().filter(_.nonEmpty).toList finally src.close()
    }
    val conf = spark.sparkContext.hadoopConfiguration
    def liveNames(): Set[String] =
      QbeastLog.snapshot(dir, conf).files.map(_.path).toSet
    assert(manifestLines().size == n1)
    assert(manifestLines().map(_.split('/').last).toSet == liveNames())
    // reading ONLY the manifest files (no log) equals the table
    assert(spark.read.parquet(manifestLines(): _*).count() == 500)

    // an overwrite makes the manifest stale until regenerated — the
    // Delta contract; regeneration republishes the new snapshot
    df.filter("a <= 20").write.format("qbeast").mode("overwrite").save(dir)
    val stale = manifestLines()
    assert(stale.size == n1, "manifest must not change until regenerated")
    val n2 = t.generateSymlinkManifest()
    assert(manifestLines().map(_.split('/').last).toSet == liveNames())
    assert(spark.read.parquet(manifestLines(): _*).count() == 20)
    assert(n2 == liveNames().size)
  }

  test("snapshot cache: warm hits reuse the instance, any commit invalidates") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("snapcache")
    val conf = spark.sparkContext.hadoopConfiguration
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "100").save(dir)
    // warm access returns the SAME assembled snapshot (no replay)
    val s1 = QbeastLog.snapshot(dir, conf)
    val s2 = QbeastLog.snapshot(dir, conf)
    assert(s1 eq s2, "warm access must reuse the cached snapshot instance")
    // a concurrent commit (append) invalidates through the fingerprint
    (101 to 120).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(dir)
    val s3 = QbeastLog.snapshot(dir, conf)
    assert(!(s3 eq s1), "a commit must invalidate the cached snapshot")
    assert(s3.version > s1.version)
    assert(s3.files.map(_.elementCount).sum == 120L)
    // an OUT-OF-BAND rewrite of the newest commit file (same version,
    // different bytes) invalidates too: the fingerprint carries
    // length+mtime, not just the version number
    val logDir = new org.apache.hadoop.fs.Path(dir, "_qbeast_log")
    val fs = logDir.getFileSystem(conf)
    val newest = fs.listStatus(logDir).map(_.getPath)
      .filter(p => p.getName.endsWith(".json") && !p.getName.contains("checkpoint"))
      .maxBy(_.getName)
    val bytes = {
      val in = fs.open(newest)
      try { val b = new Array[Byte](fs.getFileStatus(newest).getLen.toInt)
        in.readFully(b); b } finally in.close()
    }
    val out = fs.create(newest, true)
    try { out.write(bytes); out.write('\n') } finally out.close()
    val s4 = QbeastLog.snapshot(dir, conf)
    assert(!(s4 eq s3), "an out-of-band log rewrite must invalidate")
    // LRU: a REPEATEDLY-ACCESSED table survives churn from 100 other
    // keys (a clear-on-overflow cache would drop it mid-loop)
    val hot = QbeastLog.snapshot(dir, conf)
    (1 to 100).foreach { i =>
      QbeastLog.snapshot(s"$dir-miss-$i", conf) // distinct churn keys
      assert(QbeastLog.snapshot(dir, conf) eq hot,
        s"hot snapshot evicted after $i churn keys")
    }
  }

  test("same-version surgery: invalidateCache retires the memoized folds") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("surgery-memo")
    val conf = spark.sparkContext.hadoopConfiguration
    (1 to 50).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "1000").save(dir)
    spark.conf.set("spark.qbeast.metadata.sidecar.minFiles", "0")
    try {
      graft.table.QbeastTable.forPath(spark, dir).checkpoint()
      // a post-checkpoint tail commit of exactly 10 rows in one file
      (1 to 10).map(i => ((1000 + i).toLong, i * 1.0)).toDF("a", "b")
        .write.format("qbeast").mode("append").save(dir)
      def cnt(): Long = spark.read.format("qbeast").load(dir).count()
      assert(cnt() == 60L) // populates the light snapshot + fold memos
      // SURGERY the fingerprint cannot see: rewrite the newest commit
      // in place, SAME byte length and SAME mtime, inflating the tail
      // file's element count 10 → 90. This is exactly the out-of-band
      // shape the identityHashCode-keyed fold memos cannot detect on
      // their own — the contract (documented on invalidateCache) is
      // that any same-version surgery path must route through it.
      val logDir = new org.apache.hadoop.fs.Path(dir, "_qbeast_log")
      val fs = logDir.getFileSystem(conf)
      val newest = fs.listStatus(logDir).map(_.getPath)
        .filter(p => p.getName.endsWith(".json") && !p.getName.contains("checkpoint"))
        .maxBy(_.getName)
      val st0 = fs.getFileStatus(newest)
      val text = {
        val in = fs.open(newest)
        try {
          val b = new Array[Byte](st0.getLen.toInt); in.readFully(b)
          new String(b, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      }
      assert(text.contains("\"elementCount\":10"), "fixture: tail commit holds 10 rows")
      val out = fs.create(newest, true)
      try out.write(text.replace("\"elementCount\":10", "\"elementCount\":90")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      new java.io.File(newest.toUri.getPath).setLastModified(st0.getModificationTime)
      assert(fs.getFileStatus(newest).getLen == st0.getLen,
        "fixture: surgery must preserve the byte length")
      // undetectable by design: the cached snapshot instance (same
      // fingerprint) keeps serving the memoized pre-surgery fold
      assert(cnt() == 60L, "same-fingerprint surgery must hit the memo (by design)")
      // ... until the mandated invalidateCache, which clears snapshot
      // cache AND fold memos AND the sidecar-usable memo together
      QbeastLog.invalidateCache()
      assert(cnt() == 140L, "post-invalidate fold must see the surgically " +
        "rewritten element counts (50 bulk + 90 tail)")
    } finally spark.conf.unset("spark.qbeast.metadata.sidecar.minFiles")
  }

}
