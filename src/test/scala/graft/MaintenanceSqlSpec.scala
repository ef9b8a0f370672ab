package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL maintenance statements (injectParser): OPTIMIZE '<path>' and
 * VACUUM '<path>' [RETAIN n HOURS] [FORCE] — the Delta-style surface
 * over the qlog; every other statement must delegate untouched. */
class MaintenanceSqlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(rows: Int = 1000): String = {
    val dir = TestSpark.tmpDir("maint-sql")
    (1 to rows).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b")
      .option("cubeSize", "100").save(dir)
    dir
  }

  test("SQL OPTIMIZE repacks and preserves content") {
    val dir = freshTable()
    // several appends → plenty of small files for optimize to repack
    (1 to 3).foreach { k =>
      (1 to 200).map(i => ((k * 10000 + i).toLong, i * 3.0)).toDF("a", "b")
        .write.format("qbeast").mode("append").save(dir)
    }
    val before = spark.read.format("qbeast").load(dir)
      .agg(org.apache.spark.sql.functions.sum("a")).head.getLong(0)
    val out = spark.sql(s"OPTIMIZE '$dir'").collect()
    assert(out.length == 1 && out.head.getString(0) == dir)
    assert(out.head.getLong(1) > 0)
    val after = spark.read.format("qbeast").load(dir)
      .agg(org.apache.spark.sql.functions.sum("a")).head.getLong(0)
    assert(after == before, "OPTIMIZE must not change table content")
  }

  test("SQL OPTIMIZE WHERE repacks only files that may match") {
    val dir = TestSpark.tmpDir("maint-optwhere")
    def batch(lo: Int, hi: Int) = (lo to hi).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
    // two boundary-split ingest batches: a <= 1000 and a > 1000
    batch(1, 1000).write.format("qbeast").option("columnsToIndex", "a,b")
      .option("cubeSize", "100").save(dir)
    batch(1001, 2000).write.format("qbeast").mode("append").save(dir)
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val before = t.snapshot.files.map(_.path).toSet
    spark.sql(s"OPTIMIZE '$dir' WHERE a <= 1000").collect()
    val after = t.snapshot.files.map(_.path).toSet
    val untouched = after.intersect(before)
    assert(untouched.nonEmpty, "non-matching files must survive untouched")
    assert(untouched.size < before.size, "matching files must be repacked")
    // content invariant: the predicate scopes the repack, never the rows
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === 2000L)
    assert(back.agg(org.apache.spark.sql.functions.sum("a")).head.getLong(0) ===
      (1L to 2000L).sum)
    // an unselective predicate is a full repack; a non-matching one is a no-op
    val files0 = t.snapshot.files.map(_.path).toSet
    assert(t.optimizeWhere(org.apache.spark.sql.functions.col("a") > 999999L) === 0)
    assert(t.snapshot.files.map(_.path).toSet === files0)
    // a condition folding to FALSE matches zero files: a no-op answer,
    // not an error claiming the user supplied no condition
    assert(t.optimizeWhere(org.apache.spark.sql.functions.lit(false)) === 0)
    assert(t.snapshot.files.map(_.path).toSet === files0)
    // a SUBQUERY condition rewrites to a join the file-selection layer
    // can't prune by: refused with an HONEST message (it must not claim
    // "requires a filtering condition" when the user supplied one)
    spark.range(1, 5).toDF("id").createOrReplaceTempView("optwhere_keys")
    val e = intercept[IllegalArgumentException] {
      t.optimizeWhere(org.apache.spark.sql.functions.expr(
        "a IN (SELECT id FROM optwhere_keys)"))
    }
    assert(e.getMessage.contains("subquery"), s"got: ${e.getMessage}")
  }

  test("SQL VACUUM reclaims dead files; retention guard needs FORCE") {
    val dir = freshTable()
    // overwrite leaves the first write's files dead
    (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("overwrite").save(dir)

    // below-minimum retention without FORCE → rejected
    val ex = intercept[Exception](spark.sql(s"VACUUM '$dir' RETAIN 0 HOURS").collect())
    assert(ex.getMessage.contains("force"), s"expected the retention guard: ${ex.getMessage}")

    val deleted = spark.sql(s"VACUUM '$dir' RETAIN 0 HOURS FORCE")
      .collect().head.getLong(1)
    assert(deleted > 0, "the overwritten files should have been reclaimed")
    assert(spark.read.format("qbeast").load(dir).count() == 50)

    // default retention (7 days): everything is younger → no deletions
    val deleted2 = spark.sql(s"VACUUM '$dir'").collect().head.getLong(1)
    assert(deleted2 == 0)
  }

  test("decorated statements (comments, trailing semicolons) still match") {
    val dir = freshTable(200)
    (1 to 20).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("overwrite").save(dir)
    val out = spark.sql(
      s"-- nightly maintenance\n/* repack */ VACUUM '$dir' RETAIN 0 HOURS FORCE ;;\n")
      .collect()
    assert(out.head.getLong(1) > 0)
    assert(spark.sql(s"OPTIMIZE '$dir';").collect().head.getString(0) == dir)
  }

  test("DESCRIBE HISTORY returns one row per commit, oldest first") {
    val dir = freshTable(200)
    (1 to 20).map(i => ((10000 + i).toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(dir)
    table.QbeastTable.forPath(spark, dir).delete("a <= 10")
    val rows = spark.sql(s"DESCRIBE HISTORY '$dir'").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getString(2)).toSeq == Seq("WRITE", "WRITE", "DELETE"))
    assert(rows.forall(_.getLong(3) > 0)) // every commit added files
    assert(rows.last.getLong(4) > 0) // the delete removed files
  }

  test("SQL CLONE TO creates a metadata-only copy; table_changes reads the feed") {
    val dir = freshTable(300)
    val cloneDir = TestSpark.tmpDir("maint-sql-clone")
    val out = spark.sql(s"CLONE '$dir' TO '$cloneDir'").collect()
    assert(out.head.getString(0) == cloneDir && out.head.getLong(1) > 0)
    assert(spark.read.format("qbeast").load(cloneDir).count() == 300)
    assert(new java.io.File(cloneDir).listFiles()
      .forall(f => !f.getName.endsWith(".parquet")))
    // cloning over an existing table is rejected
    val ex = intercept[Exception](spark.sql(s"CLONE '$dir' TO '$cloneDir'").collect())
    assert(ex.getMessage.contains("already exists"))

    // CDF through the TVF: v0 = 300 inserts on the source table
    val feed = spark.sql(s"SELECT _change_type, count(*) AS n " +
      s"FROM table_changes('$dir', 0) GROUP BY 1").collect()
    assert(feed.map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("insert" -> 300L))
    // version range + non-literal args are rejected cleanly
    val ex2 = intercept[Exception](
      spark.sql(s"SELECT * FROM table_changes('$dir', 0, 99)").collect())
    assert(ex2.getMessage.contains("version"))
  }

  test("DESCRIBE DETAIL and SQL RESTORE round out the maintenance surface") {
    val dir = freshTable(400)
    (1 to 50).map(i => ((20000 + i).toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").option("cubeSize", "100").mode("append").save(dir)

    val d = spark.sql(s"DESCRIBE DETAIL '$dir'").collect().head
    assert(d.getString(0) == "qbeast" && d.getString(1) == dir)
    assert(d.getLong(2) == 1L) // two commits: v0, v1
    assert(d.getLong(3) > 0 && d.getLong(4) > 0)
    assert(d.getLong(5) == 450L) // row count from block metadata
    assert(d.getString(6) == "a,b" && d.getLong(7) == 100L)
    assert(d.getString(8).contains("qbeast.lastRevisionID"))

    val r = spark.sql(s"RESTORE '$dir' TO VERSION AS OF 0").collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 2L)
    assert(spark.read.format("qbeast").load(dir).count() == 400L)
  }

  test("every other statement delegates to the stock parser") {
    assert(spark.sql("SELECT 1 + 1 AS x").head.getInt(0) == 2)
    // a statement CONTAINING the keywords but not matching the grammar
    (1 to 3).map(i => (i, s"OPTIMIZE 'x$i'")).toDF("id", "optimize")
      .createOrReplaceTempView("maint_kw")
    assert(spark.sql("SELECT count(*) FROM maint_kw WHERE optimize LIKE 'OPT%'")
      .head.getLong(0) == 3)
  }

}
