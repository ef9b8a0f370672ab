package graft

import graft.table.QbeastTable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Metadata-only DELETE via per-file stats proofs (the q89 surface):
 * files whose min/max/nullCount PROVE the predicate on every row drop
 * whole — no read, no rewrite, one driver-side commit. The 100 TB
 * retention-delete shape.
 */
class StatsDeleteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 200 rows in two boundary-aligned appends: a ∈ [1,100] then
   * a ∈ [101,200] — every file's `a` range lies on one side of 100. */
  private def splitTable(prefix: String, extra: Map[String, String] = Map.empty): String = {
    import spark.implicits._
    val dir = TestSpark.tmpDir(prefix)
    def write(lo: Int, hi: Int, mode: String): Unit = {
      var w = (lo to hi).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
        .write.format("qbeast").option("columnsToIndex", "a,b")
        .option("cubeSize", "50").mode(mode)
      extra.foreach { case (k, v) => w = w.option(k, v) }
      w.save(dir)
    }
    write(1, 100, "error")
    write(101, 200, "append")
    dir
  }

  /** Run `body` under a unique job group; returns the number of Spark
   * jobs IT launched (other suites run concurrently on the shared
   * session, so a global job count would race — the job group is
   * thread-local and inherited by every job `body` submits). */
  private def jobsLaunchedBy(body: => Unit): Int = {
    val group = s"stats-delete-${java.util.UUID.randomUUID()}"
    spark.sparkContext.setJobGroup(group, "stats-delete spec")
    try body finally spark.sparkContext.clearJobGroup()
    spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
  }

  test("boundary-aligned DELETE drops files with zero Spark jobs") {
    val dir = splitTable("statsdel-pure")
    val t = QbeastTable.forPath(spark, dir)
    val before = t.snapshot.files.map(_.path).toSet
    var deleted = -1L
    val jobs = jobsLaunchedBy { deleted = t.delete("a <= 100") }
    assert(deleted == 100L)
    assert(jobs == 0, s"metadata-only DELETE must launch no Spark jobs, saw $jobs")
    val after = t.snapshot.files.map(_.path).toSet
    assert(after.subsetOf(before) && after.size < before.size,
      "proved files must be DROPPED, none rewritten")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 100L)
    assert(back.agg(min("a"), max("a")).head() ==
      org.apache.spark.sql.Row(101L, 200L))
  }

  test("trivially-true DELETE empties the table metadata-only") {
    val dir = splitTable("statsdel-all")
    val t = QbeastTable.forPath(spark, dir)
    var deleted = -1L
    val jobs = jobsLaunchedBy { deleted = t.delete("true") }
    assert(deleted == 200L)
    assert(jobs == 0, s"delete-all must be metadata-only, saw $jobs jobs")
    assert(t.snapshot.files.isEmpty)
    assert(spark.read.format("qbeast").load(dir).count() == 0L)
  }

  test("boundary-crossing DELETE drops proved files and rewrites only the straddlers") {
    import spark.implicits._
    // four appends of 100 rows each: every file's `a` range stays
    // inside its batch, so with the cut at 250: batches 1–2 TRUE-prove
    // (drop whole), batch 3 straddles (survivor rewrite), batch 4
    // FALSE-proves (untouched)
    val dir = TestSpark.tmpDir("statsdel-mixed")
    (0 until 4).foreach { b =>
      (b * 100 + 1 to b * 100 + 100).map(i => (i.toLong, i * 2.0))
        .toDF("a", "b")
        .write.format("qbeast").option("columnsToIndex", "a,b")
        .option("cubeSize", "50")
        .mode(if (b == 0) "error" else "append").save(dir)
    }
    val t = QbeastTable.forPath(spark, dir)
    val before = t.snapshot.files
    val deleted = t.delete("a <= 250")
    assert(deleted == 250L)
    val after = t.snapshot.files
    val beforePaths = before.map(_.path).toSet
    val untouched = after.map(_.path).toSet.intersect(beforePaths)
    assert(untouched.nonEmpty,
      "FALSE-proved files must survive the mixed delete untouched")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 150L)
    assert(back.agg(min("a")).head().getLong(0) == 251L)
  }

  test("nulls in the predicate column block the TRUE-proof (three-valued logic)") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("statsdel-nulls")
    // one file whose non-null `a` values ALL satisfy a < 100 but which
    // also holds NULL rows: dropping it whole would delete rows the
    // predicate does NOT match (NULL → UNKNOWN → kept)
    (1 to 50).map(i => (if (i % 5 == 0) None else Some(i.toLong), i * 2.0))
      .toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "b")
      .option("cubeSize", "100").save(dir)
    val t = QbeastTable.forPath(spark, dir)
    val deleted = t.delete("a < 100")
    assert(deleted == 40L)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 10L, "NULL-condition rows must survive the delete")
    assert(back.filter(col("a").isNull).count() == 10L)
  }

  test("deletion-vector mode still prefers whole-file drops when proofs decide everything") {
    val dir = splitTable("statsdel-dv", Map("deletionVectors" -> "true"))
    val t = QbeastTable.forPath(spark, dir)
    val before = t.snapshot.files.map(_.path).toSet
    val deleted = t.delete("a <= 100")
    assert(deleted == 100L)
    val s = t.snapshot
    assert(s.dvs.isEmpty, "a fully-proved delete must drop files, not mask them")
    assert(s.files.map(_.path).toSet.subsetOf(before) && s.files.size < before.size)
    assert(spark.read.format("qbeast").load(dir).count() == 100L)
  }

  test("dv mode drops proved files and masks only the straddlers in one commit") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("statsdel-dvmixed")
    (0 until 4).foreach { b =>
      (b * 100 + 1 to b * 100 + 100).map(i => (i.toLong, i * 2.0))
        .toDF("a", "b")
        .write.format("qbeast").option("columnsToIndex", "a,b")
        .option("cubeSize", "50").option("deletionVectors", "true")
        .mode(if (b == 0) "error" else "append").save(dir)
    }
    val t = QbeastTable.forPath(spark, dir)
    val before = t.snapshot.files.map(_.path).toSet
    val v0 = t.snapshot.version
    // a <= 220: batches 1–2 TRUE-prove (drop whole files, metadata
    // only); batch 3's straddler masks its ~20% matched rows instead
    // of forcing the whole delete back to a copy-on-write rewrite
    val deleted = t.delete("a <= 220")
    assert(deleted == 220L)
    val s = t.snapshot
    assert(s.version == v0 + 1, "drops + masks must land in ONE commit")
    assert(s.files.map(_.path).toSet.subsetOf(before),
      "merge-on-read mixed delete must never write new files")
    assert(s.files.size < before.size, "proved files must be DROPPED")
    assert(s.dvs.nonEmpty, "the straddling file must be MASKED, not rewritten")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 180L)
    assert(back.agg(min("a")).head().getLong(0) == 221L)
  }

  test("stats-proved drop of an already-masked file counts only live rows") {
    val dir = splitTable("statsdel-dvcount", Map("deletionVectors" -> "true"))
    val t = QbeastTable.forPath(spark, dir)
    // first a sparse merge-on-read delete masks 10 rows of batch 1
    assert(t.delete("a % 10 = 3 AND a <= 100") == 10L)
    assert(t.snapshot.dvs.nonEmpty, "fixture: the sparse delete must have masked")
    // then the retention delete drops batch-1 files whole: the count
    // must EXCLUDE the 10 rows the vector already removed
    val deleted = t.delete("a <= 100")
    assert(deleted == 90L, s"expected 90 live rows deleted, got $deleted")
    assert(spark.read.format("qbeast").load(dir).count() == 100L)
  }

  test("change data feed emits the dropped files' live rows as deletes") {
    val dir = splitTable("statsdel-cdf",
      Map("enableChangeDataFeed" -> "true"))
    val t = QbeastTable.forPath(spark, dir)
    val v = t.snapshot.version
    assert(t.delete("a <= 100") == 100L)
    val changes = t.changes(v + 1)
    val dels = changes.filter(col("_change_type") === "delete")
    assert(dels.count() == 100L)
    assert(dels.agg(max("a")).head().getLong(0) == 100L)
  }
}
