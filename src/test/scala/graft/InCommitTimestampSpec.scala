package graft

import graft.log.QbeastLog
import graft.table.QbeastTable

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/**
 * In-commit timestamps (Delta's `inCommitTimestamp` design): each
 * commit records its timestamp INSIDE the payload (the leading
 * commitInfo line), clamped monotonic against its predecessor, so
 * `TIMESTAMP AS OF`, DESCRIBE HISTORY and retention accounting survive
 * object-store migrations that rewrite file mtimes and writer clock
 * skew. Pre-feature commits fall back to mtime.
 */
class InCommitTimestampSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def freshTable(prefix: String, commits: Int): String = {
    val dir = TestSpark.tmpDir(prefix)
    (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .write.format("qbeast")
      .option("columnsToIndex", "k").option("cubeSize", "50").save(dir)
    (1 until commits).foreach { c =>
      Seq((1000L + c, c * 1.0)).toDF("k", "v")
        .write.format("qbeast").mode("append").save(dir)
    }
    dir
  }

  test("rapid commits carry strictly increasing in-commit timestamps") {
    val dir = freshTable("ict-monotonic", 6)
    val ts = (0L until 6L).map(v =>
      QbeastLog.inCommitTimestamp(dir, conf, v).getOrElse(fail(s"v$v has no ICT")))
    assert(ts == ts.sorted, s"not monotonic: $ts")
    assert(ts.distinct.size == ts.size, s"not strictly increasing: $ts")
    // history reports the recorded timestamps, in the same order
    val hist = QbeastTable.forPath(spark, dir).history().sortBy(_.version)
    assert(hist.map(_.timestampMillis) == ts)
  }

  test("TIMESTAMP AS OF rides in-commit timestamps, surviving mtime rewrites") {
    val dir = TestSpark.tmpDir("ict-mtime")
    (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .write.format("qbeast")
      .option("columnsToIndex", "k").option("cubeSize", "50").save(dir)
    val t0 = QbeastLog.inCommitTimestamp(dir, conf, 0L).get
    Thread.sleep(15)
    Seq((2000L, 1.0)).toDF("k", "v").write.format("qbeast").mode("append").save(dir)
    val t1 = QbeastLog.inCommitTimestamp(dir, conf, 1L).get
    assert(t1 > t0)
    // simulate an object-store migration: every commit file's mtime is
    // rewritten to a bogus ancient instant
    val fs = new Path(dir).getFileSystem(conf)
    fs.listStatus(new Path(dir, "_qbeast_log"))
      .filter(_.getPath.getName.endsWith(".json"))
      .foreach(st => fs.setTimes(st.getPath, 1000L, -1))
    // resolution still follows the recorded timestamps
    assert(QbeastLog.versionAt(dir, conf, t0) == Some(0L))
    assert(QbeastLog.versionAt(dir, conf, t1 - 1) == Some(0L))
    assert(QbeastLog.versionAt(dir, conf, t1) == Some(1L))
    assert(QbeastLog.versionAt(dir, conf, t0 - 1000) == None)
    assert(spark.read.format("qbeast")
      .option("versionAsOf", 0).load(dir).count() == 100)
    // the reader's timestampAsOf path resolves through the same search
    // (a post-head instant must see the head despite the bogus mtimes)
    val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID))
    val after = java.time.LocalDateTime.now(zone).plusMinutes(1)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(spark.read.format("qbeast")
      .option("timestampAsOf", after).load(dir).count() == 101)
  }

  test("pre-feature commits (no commitInfo line) fall back to mtime; the chain resumes") {
    val dir = freshTable("ict-mixed", 3)
    val fs = new Path(dir).getFileSystem(conf)
    // strip v1's commitInfo line — the shape of a log written before
    // the feature existed
    val p1 = new Path(QbeastLog.logDir(dir), f"${1L}%020d.json")
    assert(fs.exists(p1), s"expected commit file $p1")
    val lines = {
      val in = fs.open(p1)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    val stripped = lines.filterNot(_.startsWith("{\"commitInfo\":"))
    fs.delete(p1, false)
    val out = fs.create(p1, true)
    try out.write((stripped.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()

    assert(QbeastLog.inCommitTimestamp(dir, conf, 1L).isEmpty)
    // effective timestamp falls back to the (fresh) mtime — still
    // non-decreasing relative to v0's ICT, so the search stays ordered
    val t1 = QbeastLog.commitTimestamp(dir, conf, 1L)
    assert(t1 >= QbeastLog.commitTimestamp(dir, conf, 0L))
    // a new commit resumes the chain (prev has no ICT → now)
    Seq((3000L, 1.0)).toDF("k", "v").write.format("qbeast").mode("append").save(dir)
    assert(QbeastLog.inCommitTimestamp(dir, conf, 3L).isDefined)
    // content under time travel is unaffected by the stripped line
    assert(spark.read.format("qbeast")
      .option("versionAsOf", 1).load(dir).count() == 101)
  }

}
