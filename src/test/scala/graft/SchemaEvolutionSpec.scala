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

}
