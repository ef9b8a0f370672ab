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

  test("every other statement delegates to the stock parser") {
    assert(spark.sql("SELECT 1 + 1 AS x").head.getInt(0) == 2)
    // a statement CONTAINING the keywords but not matching the grammar
    (1 to 3).map(i => (i, s"OPTIMIZE 'x$i'")).toDF("id", "optimize")
      .createOrReplaceTempView("maint_kw")
    assert(spark.sql("SELECT count(*) FROM maint_kw WHERE optimize LIKE 'OPT%'")
      .head.getLong(0) == 3)
  }

}
