package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pre-commit hook that lands a schema-widening append (new column d)
 * between the host write's snapshot read and its commit — the
 * deterministic way to force a commit conflict against a concurrent
 * schema evolution. */
class ConcurrentEvolveHook extends graft.write.PreCommitHook {
  override def name: String = "race"
  override def run(
      spark: org.apache.spark.sql.SparkSession,
      files: Seq[graft.core.model.IndexFile]): Map[String, String] = {
    import spark.implicits._
    Seq((99L, 99.0, 9L)).toDF("a", "b", "d").write.format("qbeast")
      .option("mergeSchema", "true").mode("append")
      .save(ConcurrentEvolveHook.tableDir.get())
    Map.empty
  }
}

object ConcurrentEvolveHook {
  val tableDir = new java.util.concurrent.atomic.AtomicReference[String]()
}

/** Schema evolution on append/overwrite (reference:
 * `delta/.../DeltaMetadataWriter.scala:82-85` — mergeSchema /
 * overwriteSchema). Evolution is metadata-only: old files are never
 * rewritten, the widened column reads as null from them. */
class SchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String = {
    val dir = TestSpark.tmpDir("qbeast-evolve")
    Seq((1L, 1.0), (2L, 2.0)).toDF("a", "b").write.format("qbeast")
      .option("columnsToIndex", "a,b").option("cubeSize", "100").save(dir)
    dir
  }

  test("append with a new column rejects by default, pointing at mergeSchema") {
    val dir = freshTable()
    val e = intercept[IllegalArgumentException] {
      Seq((3L, 3.0, "x")).toDF("a", "b", "c").write.format("qbeast")
        .mode("append").save(dir)
    }
    assert(e.getMessage.contains("mergeSchema"))
  }

  test("append with missing columns rejects by default") {
    // a missing INDEXED column is unplaceable — mergeSchema cannot
    // help, so the error names the indexed column instead
    val dir = freshTable()
    val e = intercept[IllegalArgumentException] {
      Seq(3L).toDF("a").write.format("qbeast").mode("append").save(dir)
    }
    assert(e.getMessage.contains("indexed column"))
    // a missing NON-indexed column points at mergeSchema
    val dir2 = TestSpark.tmpDir("qbeast-evolve3")
    Seq((1L, 1.0, "x")).toDF("a", "b", "c").write.format("qbeast")
      .option("columnsToIndex", "a,b").option("cubeSize", "100").save(dir2)
    val e2 = intercept[IllegalArgumentException] {
      Seq((2L, 2.0)).toDF("a", "b").write.format("qbeast")
        .mode("append").save(dir2)
    }
    assert(e2.getMessage.contains("mergeSchema"))
  }

  test("mergeSchema append widens the table; old files read null") {
    val dir = freshTable()
    Seq((3L, 3.0, "x"), (4L, 4.0, "y")).toDF("a", "b", "c")
      .write.format("qbeast").option("mergeSchema", "true")
      .mode("append").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema.fieldNames.toSeq === Seq("a", "b", "c"))
    assert(back.schema("c").nullable)
    assert(back.count() === 4)
    assert(back.filter(col("c").isNull).select("a").as[Long].collect().sorted
      === Array(1L, 2L))
    assert(back.filter(col("c").isNotNull).select("c").as[String].collect().sorted
      === Array("x", "y"))
    // the indexed read path (sampling pushdown) still works post-evolution
    assert(back.sample(0.99).count() > 0)
  }

  test("mergeSchema append may also omit existing columns (nulls in new files)") {
    val dir = freshTable()
    Seq((5L, 5.0, "z")).toDF("a", "b", "c").write.format("qbeast")
      .option("mergeSchema", "true").mode("append").save(dir)
    // next wave lacks c entirely — allowed under mergeSchema
    Seq((6L, 6.0)).toDF("a", "b").write.format("qbeast")
      .option("mergeSchema", "true").mode("append").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === 4)
    assert(back.filter(col("a") === 6L).select("c").head().isNullAt(0))
  }

  test("type clash on an overlapping column rejects even with mergeSchema") {
    val dir = freshTable()
    val e = intercept[IllegalArgumentException] {
      Seq(("oops", 7.0)).toDF("a", "b").write.format("qbeast")
        .option("mergeSchema", "true").mode("append").save(dir)
    }
    assert(e.getMessage.contains("type mismatch"))
  }

  test("overwrite with a different schema requires overwriteSchema") {
    val dir = freshTable()
    val e = intercept[IllegalArgumentException] {
      Seq((1L, "s")).toDF("a", "s").write.format("qbeast")
        .option("columnsToIndex", "a").mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("overwriteSchema"))
    Seq((1L, "s")).toDF("a", "s").write.format("qbeast")
      .option("columnsToIndex", "a").option("overwriteSchema", "true")
      .mode("overwrite").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema.fieldNames.toSeq === Seq("a", "s"))
    assert(back.count() === 1)
  }

  test("session-level autoMerge flag enables evolution without the option") {
    val dir = freshTable()
    spark.conf.set("spark.qbeast.schema.autoMerge.enabled", "true")
    try {
      Seq((7L, 7.0, 42L)).toDF("a", "b", "d").write.format("qbeast")
        .mode("append").save(dir)
      val back = spark.read.format("qbeast").load(dir)
      assert(back.schema.fieldNames.toSeq === Seq("a", "b", "d"))
      assert(back.count() === 3)
    } finally spark.conf.unset("spark.qbeast.schema.autoMerge.enabled")
  }

  test("concurrent schema-evolving appends merge BOTH columns (no metadata lost-update)") {
    // Deterministic race via a pre-commit hook: after the outer append
    // has read its snapshot and written files, the hook lands ANOTHER
    // append that widens the schema with col d. The outer commit then
    // hits the conflict, rebases, and must RE-MERGE its schema against
    // the new base — committing the stale merge would silently drop d.
    val dir = freshTable()
    ConcurrentEvolveHook.tableDir.set(dir)
    Seq((5L, 5.0, "x")).toDF("a", "b", "c").write.format("qbeast")
      .option("mergeSchema", "true")
      .option("hook.race", classOf[ConcurrentEvolveHook].getName)
      .mode("append").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema.fieldNames.toSet === Set("a", "b", "c", "d"),
      s"lost a concurrently-added column: ${back.schema.fieldNames.mkString(",")}")
    assert(back.count() === 4) // 2 base + 1 hook append + 1 outer append
    assert(back.filter(col("c") === "x").count() === 1)
    assert(back.filter(col("d") === 9L).count() === 1)
  }

  test("concurrent widening fails an enforced (no-mergeSchema) append instead of clobbering") {
    val dir = freshTable()
    ConcurrentEvolveHook.tableDir.set(dir)
    val e = intercept[IllegalArgumentException] {
      // same-schema append, schema enforcement on; the hook widens the
      // table underneath it → the rebase re-merge must reject
      Seq((6L, 6.0)).toDF("a", "b").write.format("qbeast")
        .option("hook.race", classOf[ConcurrentEvolveHook].getName)
        .mode("append").save(dir)
    }
    assert(e.getMessage.contains("mergeSchema"))
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema.fieldNames.toSet === Set("a", "b", "d"),
      "the hook's widening must survive; the enforced append must not commit")
    assert(back.count() === 3)
  }

  test("DML rewrites on an evolved table preserve the widened column's data") {
    // DELETE/UPDATE/optimize read affected files with spark.read over a
    // MIX of pre- and post-evolution files; without the pinned table
    // schema a sampled old footer would drop the widened column from
    // the rewritten survivors — silent data loss. Regression for that.
    val dir = freshTable() // (a, b): rows 1, 2
    Seq((3L, 3.0, "x3"), (4L, 4.0, "x4"), (5L, 5.0, "x5")).toDF("a", "b", "c")
      .write.format("qbeast").option("mergeSchema", "true")
      .mode("append").save(dir)
    val t = table.QbeastTable.forPath(spark, dir)

    // delete touches old AND new files; survivors must keep column c
    t.delete("a = 1 OR a = 4")
    val afterDelete = spark.read.format("qbeast").load(dir)
      .orderBy("a").collect().map(r => (r.getLong(0), Option(r.getString(2))))
    assert(afterDelete.toSeq ==
      Seq((2L, None), (3L, Some("x3")), (5L, Some("x5"))))

    // update across the mix keeps c too (and assigns through it)
    t.update("a = 3", Map("c" -> "concat(c, '!')"))
    assert(spark.read.format("qbeast").load(dir)
      .filter(col("a") === 3).select("c").head.getString(0) == "x3!")

    // optimize rewrites everything; the evolved column survives
    t.optimize()
    val afterOpt = spark.read.format("qbeast").load(dir)
      .orderBy("a").collect().map(r => (r.getLong(0), Option(r.getString(2))))
    assert(afterOpt.toSeq ==
      Seq((2L, None), (3L, Some("x3!")), (5L, Some("x5"))))
  }

  test("column order on append follows the table, not the incoming frame") {
    val dir = freshTable()
    // reordered append keeps the canonical (a, b) schema
    Seq((8.0, 8L)).toDF("b", "a").write.format("qbeast")
      .mode("append").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema.fieldNames.toSeq === Seq("a", "b"))
    assert(back.filter(col("a") === 8L).select("b").as[Double].head() === 8.0)
  }

  // ---- ALTER TABLE column changes vs name-keyed stats ----------------------

  private def catalogTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    val dir = TestSpark.tmpDir(s"evolve-$name")
    spark.sql(s"DROP TABLE IF EXISTS qbeast_catalog.default.$name")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.$name
      (a BIGINT, b DOUBLE) USING qbeast
      OPTIONS ('columnsToIndex'='a') LOCATION '$dir'""")
    Seq((1L, 1.0), (2L, 2.0)).toDF("a", "b")
      .writeTo(s"qbeast_catalog.default.$name").append()
    dir
  }

  test("ALTER COLUMN TYPE is refused outside the widening matrix; RENAME/DROP work via column mapping") {
    // NON-WIDENING type changes stay refused — old parquet footers keep
    // the written type and the shared scan schema would poison.
    // Widening moves (TypeWideningSpec) pass through as metadata-only
    // commits. RENAME and DROP are metadata-only commits under
    // logical→physical column mapping (ColumnMappingSpec covers the
    // full behavior; this pins the SQL surface through the catalog).
    catalogTable("alt_refuse")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE qbeast_catalog.default.alt_refuse ALTER COLUMN b TYPE STRING")
    }
    assert(e.getMessage.contains("cannot change column") ||
      e.getMessage.contains("column changes") ||
      e.getMessage.contains("not supported"), e.getMessage)
    // schema and data untouched after the refusal
    assert(spark.sql("SELECT * FROM qbeast_catalog.default.alt_refuse")
      .schema.fieldNames.toSeq == Seq("a", "b"))
    // RENAME via SQL: logical-only; data still reads under the new name
    spark.sql("ALTER TABLE qbeast_catalog.default.alt_refuse RENAME COLUMN b TO z")
    val renamed = spark.sql("SELECT * FROM qbeast_catalog.default.alt_refuse")
    assert(renamed.schema.fieldNames.toSeq == Seq("a", "z"))
    assert(renamed.select(sum(col("z"))).as[Double].head() === 3.0)
    // the indexed column cannot be dropped (appends must place rows)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE qbeast_catalog.default.alt_refuse DROP COLUMN a")
    }
    assert(e2.getMessage.contains("indexed"), e2.getMessage)
    // DROP via SQL: the column disappears; rows remain
    spark.sql("ALTER TABLE qbeast_catalog.default.alt_refuse DROP COLUMN z")
    val dropped = spark.sql("SELECT * FROM qbeast_catalog.default.alt_refuse")
    assert(dropped.schema.fieldNames.toSeq == Seq("a"))
    assert(dropped.count() == 2L)
  }

  test("ALTER TABLE ADD COLUMNS is a metadata-only schema commit") {
    val dir = catalogTable("alt_add")
    val before = graft.table.QbeastTable.forPath(spark, dir).snapshot
    spark.sql("ALTER TABLE qbeast_catalog.default.alt_add ADD COLUMNS (c STRING)")
    val after = graft.table.QbeastTable.forPath(spark, dir).snapshot
    // no file rewritten — same physical set, one metadata commit
    assert(after.files.map(_.path).toSet == before.files.map(_.path).toSet)
    assert(after.version == before.version + 1)
    val back = spark.sql("SELECT * FROM qbeast_catalog.default.alt_add")
    assert(back.schema.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(back.filter(col("c").isNull).count() == 2L)
    // new appends can fill the column; filters on it stay correct
    Seq((3L, 3.0, "x")).toDF("a", "b", "c")
      .writeTo("qbeast_catalog.default.alt_add").append()
    assert(spark.sql(
      "SELECT a FROM qbeast_catalog.default.alt_add WHERE c = 'x'")
      .as[Long].collect().toSeq == Seq(3L))
    // re-adding an existing name is refused (Spark's analyzer or our
    // type-conflict screen, whichever sees it first)
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE qbeast_catalog.default.alt_add ADD COLUMNS (b STRING)")
    }
    assert(dup.getMessage.toLowerCase.contains("exist"))
    // the log-side widening is IDEMPOTENT for a same-type retry: the
    // delegate-failure replay path (log committed, catalog didn't) must
    // converge instead of wedging on "already exists"
    val t2 = graft.table.QbeastTable.forPath(spark, dir)
    val vBefore = t2.snapshot.version
    graft.catalog.QbeastCatalog.persistAddColumnsToLog(dir, Seq(
      org.apache.spark.sql.connector.catalog.TableChange
        .addColumn(Array("c"), org.apache.spark.sql.types.StringType)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableChange.AddColumn]))
    assert(t2.snapshot.version == vBefore, "same-type retry must be a no-op")
    // a different type under the same name is a real conflict
    val clash = intercept[IllegalArgumentException] {
      graft.catalog.QbeastCatalog.persistAddColumnsToLog(dir, Seq(
        org.apache.spark.sql.connector.catalog.TableChange
          .addColumn(Array("c"), org.apache.spark.sql.types.LongType)
          .asInstanceOf[org.apache.spark.sql.connector.catalog.TableChange.AddColumn]))
    }
    assert(clash.getMessage.contains("already exists with type"))
  }

  test("a released name re-added at a different type never consults stale stats") {
    // the one legal way to release a column name is overwriteSchema,
    // which replaces the FILE SET in the same commit — so when a later
    // mergeSchema append re-adds the name at a different type, no live
    // file carries stats recorded under the old type
    val dir = TestSpark.tmpDir("evolve-readd")
    // v0: tag is DOUBLE with wide numeric stats
    (1 to 100).map(i => (i.toLong, i * 100.0)).toDF("k", "tag")
      .write.format("qbeast").option("columnsToIndex", "k")
      .option("cubeSize", "30").save(dir)
    // v1: schema replaced, name released, all v0 files removed
    (1 to 100).map(i => (i.toLong, s"name-$i")).toDF("k", "c")
      .write.format("qbeast").mode("overwrite")
      .option("overwriteSchema", "true")
      .option("columnsToIndex", "k").option("cubeSize", "30").save(dir)
    val v1 = graft.table.QbeastTable.forPath(spark, dir).snapshot
    // v2: tag re-added as STRING
    (101 to 150).map(i => (i.toLong, s"name-$i", if (i % 2 == 0) "even" else "odd"))
      .toDF("k", "c", "tag")
      .write.format("qbeast").mode("append")
      .option("mergeSchema", "true").save(dir)
    val t = graft.table.QbeastTable.forPath(spark, dir)
    // no live file predates the overwrite (stale DOUBLE stats are gone)
    val v1Paths = v1.files.map(_.path).toSet
    assert(t.snapshot.files.map(_.path).toSet.intersect(v1Paths) == v1Paths,
      "v1 files must survive") // v1 files carry c, no tag — fine
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema("tag").dataType.typeName == "string")
    // string-comparison filters over the re-added column: the v1 files
    // have NO tag stats (kept conservatively), the v2 files have STRING
    // stats — a stale DOUBLE bound under the name would mis-prune
    assert(back.filter(col("tag") >= "odd").count() == 25L)
    assert(back.filter(col("tag") === "even").count() == 25L)
    assert(back.filter(col("tag").isNull).count() == 100L)
    // DML classification through the same stats path
    assert(t.delete("tag = 'odd'") == 25L)
    assert(spark.read.format("qbeast").load(dir).count() == 125L)
    // time travel still reads v0 with its own schema and files
    val v0 = spark.read.format("qbeast").option("versionAsOf", "0").load(dir)
    assert(v0.schema("tag").dataType.typeName == "double")
    assert(v0.count() == 100L)
  }

}
