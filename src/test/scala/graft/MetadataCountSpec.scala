package graft

import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only count(*) (rules/MetadataCountRule.scala): an
 * unfiltered global count over a qbeast table must come from log
 * metadata (no file scan in the plan), stay exact across appends,
 * copy-on-write DML and convert, and NOT fire for any shape where
 * metadata can't answer (filters, sampling, grouping, distinct). */
class MetadataCountSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(n: Int = 500): String = {
    val dir = TestSpark.tmpDir("qbeast-metacount")
    spark.range(n).select(col("id").as("a"), (col("id") % 7).cast("double").as("b"))
      .write.format("qbeast")
      .option("columnsToIndex", "a,b").option("cubeSize", "100").save(dir)
    dir
  }

  /** True iff the executed plan is a pure local scan — no file source. */
  private def isMetadataOnly(df: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    var local = false
    var scan = false
    plan.foreach {
      case _: LocalTableScanExec => local = true
      case f if f.nodeName.contains("Scan") && !f.nodeName.contains("LocalTableScan") =>
        scan = true
      case _ =>
    }
    local && !scan
  }

  test("count(*) over a qbeast scan folds to a metadata LocalRelation") {
    val dir = freshTable()
    val df = spark.read.format("qbeast").load(dir).agg(count(lit(1)).as("cnt"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(500L))
    assert(isMetadataOnly(df), df.queryExecution.executedPlan.toString)
    // Dataset.count() rides the same rewrite
    assert(spark.read.format("qbeast").load(dir).count() == 500L)
  }

  test("SQL count(*) and multiple count-star aggregates fold too") {
    val dir = freshTable()
    spark.read.format("qbeast").load(dir).createOrReplaceTempView("mc_t")
    val df = spark.sql("SELECT count(*) AS c1, count(1) AS c2, 7 AS k FROM mc_t")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((500L, 500L, 7)))
    assert(isMetadataOnly(df), df.queryExecution.executedPlan.toString)
  }

  test("stays exact across append, delete, update and optimize") {
    val dir = freshTable()
    spark.range(500, 600).select(col("id").as("a"), lit(0.0).as("b"))
      .write.format("qbeast").mode("append").save(dir)
    def cnt(): Long = spark.read.format("qbeast").load(dir).count()
    assert(cnt() == 600L)
    val t = table.QbeastTable.forPath(spark, dir)
    t.delete("a >= 550")
    assert(cnt() == 550L)
    t.update("a < 10", Map("b" -> "b + 1"))
    assert(cnt() == 550L)
    t.optimize()
    assert(cnt() == 550L)
    val df = spark.read.format("qbeast").load(dir).agg(count(lit(1)).as("cnt"))
    assert(isMetadataOnly(df))
  }

  test("converted (staging) tables count from the recorded file counts") {
    val dir = TestSpark.tmpDir("qbeast-metacount-conv")
    spark.range(321).select(col("id").as("a")).repartition(3)
      .write.mode("overwrite").parquet(dir)
    table.QbeastTable.convertFromParquet(spark, dir)
    val df = spark.read.format("qbeast").load(dir).agg(count(lit(1)).as("cnt"))
    assert(df.collect().head.getLong(0) == 321L)
    assert(isMetadataOnly(df))
  }

  test("does NOT fire under filters, sampling, grouping or distinct") {
    val dir = freshTable()
    val base = spark.read.format("qbeast").load(dir)
    val filtered = base.filter(col("a") < 100).agg(count(lit(1)).as("cnt"))
    assert(filtered.collect().head.getLong(0) == 100L)
    assert(!isMetadataOnly(filtered))
    val sampled = base.sample(0.5).agg(count(lit(1)).as("cnt"))
    assert(!isMetadataOnly(sampled))
    val grouped = base.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    assert(!isMetadataOnly(grouped))
    val distinct = base.agg(countDistinct(col("a")).as("cnt"))
    assert(distinct.collect().head.getLong(0) == 500L)
    assert(!isMetadataOnly(distinct))
    val nonLit = base.agg(count(col("b")).as("cnt"))
    assert(!isMetadataOnly(nonLit))
  }

  test("min/max fold from file stats, stay exact across DML, bail without stats") {
    val dir = freshTable()
    val base = spark.read.format("qbeast").load(dir)
    val df = base.agg(min(col("a")).as("mn"), max(col("a")).as("mx"),
      min(col("b")).as("mnb"), max(col("b")).as("mxb"), count(lit(1)).as("cnt"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getLong(4))).toSeq == Seq((0L, 499L, 0.0, 6.0, 500L)))
    assert(isMetadataOnly(df), df.queryExecution.executedPlan.toString)

    // DML rewrites keep stats exact: delete the current max, update the min
    val t = table.QbeastTable.forPath(spark, dir)
    t.delete("a >= 490")
    t.update("a < 10", Map("b" -> "b + 50"))
    val df2 = spark.read.format("qbeast").load(dir)
      .agg(min(col("a")).as("mn"), max(col("a")).as("mx"), max(col("b")).as("mxb"))
    assert(df2.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq == Seq((0L, 489L, 56.0)))
    assert(isMetadataOnly(df2))

    // string min/max folds from metadata when every bound is exact
    val dir2 = TestSpark.tmpDir("qbeast-metacount-str")
    spark.range(50).select(col("id").as("a"), concat(lit("v"), col("id")).as("s"))
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "100").save(dir2)
    val dfs = spark.read.format("qbeast").load(dir2)
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    assert(dfs.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("v0", "v9")))
    assert(isMetadataOnly(dfs), dfs.queryExecution.executedPlan.toString)

    // converted tables carry no stats → min/max must scan (count folds)
    val dir3 = TestSpark.tmpDir("qbeast-metacount-conv2")
    spark.range(77).select(col("id").as("a")).write.mode("overwrite").parquet(dir3)
    table.QbeastTable.convertFromParquet(spark, dir3)
    val dfc = spark.read.format("qbeast").load(dir3).agg(min(col("a")).as("mn"))
    assert(dfc.collect().head.getLong(0) == 0L)
    assert(!isMetadataOnly(dfc))
  }

  test("string min/max: truncated bounds fold only when an exact witness dominates") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("qbeast-metacount-trunc")
    // two ingest batches → disjoint files: one all-short (exact
    // bounds), one all-oversized (truncated bounds, marked inexact)
    (1 to 300).map(i => (i.toLong, s"a_short_$i")).toDF("a", "s")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "200").save(dir)
    (301 to 600).map(i => (i.toLong, "m_long_" + ("q" * 80) + i)).toDF("a", "s")
      .write.format("qbeast").mode("append").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    // min: the exact witness "a_short_1" dominates the truncated
    // lower bound "m_long_q…" → folds to metadata, answer exact
    val mn = back.agg(min(col("s")).as("mn"))
    assert(mn.head().getString(0) == "a_short_1")
    assert(isMetadataOnly(mn), mn.queryExecution.executedPlan.toString)
    // max: the winner is a BUMPED truncated bound (no exact witness
    // above it) → must bail to the scan, answer still exact
    val mx = back.agg(max(col("s")).as("mx"))
    assert(mx.head().getString(0) == "m_long_" + ("q" * 80) + "600")
    assert(!isMetadataOnly(mx))
  }

  test("collated string columns never fold or carry stats bounds (binary order lies)") {
    val dir = TestSpark.tmpDir("qbeast-metacount-collate")
    // UTF8_LCASE orders 'a' < 'B'; binary orders 'B' < 'a' — a
    // binary-folded min would answer 'B' where the scan answers 'a'
    spark.range(1, 101).selectExpr("id AS a",
      "collate(CASE WHEN id % 2 = 0 THEN 'B' ELSE 'a' END, 'UTF8_LCASE') AS s")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "50").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    val agg = back.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    assert(!isMetadataOnly(agg), "collated min/max must scan")
    assert(agg.head().getString(0) == "a", "collation min is 'a', not binary 'B'")
    // the collector writes NO bounds for the collated column (binary
    // bounds would also mis-prune collation-aware predicates)...
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    snap.files.flatMap(_.stats).map(graft.read.FileStatsPruning.parse(_).get)
      .foreach { st =>
        assert(!st.mins.contains("s") && !st.maxs.contains("s"),
          "collated column must carry no binary bounds")
      }
    // ...so collation-aware filters stay exact (conservative keep)
    assert(back.filter("s = 'b'").count() === 50L)
    assert(back.filter("s = 'A'").count() === 50L)
  }

  test("NaN and Infinity fold in Spark's total order (max = NaN, not largest finite)") {
    val dir = TestSpark.tmpDir("qbeast-metacount-nan")
    // NaN only in one slice; +Inf/-Inf elsewhere; plenty of finite rows
    spark.range(400).select(col("id").as("a"),
      when(col("id") === 7, lit(Double.NaN))
        .when(col("id") === 13, lit(Double.PositiveInfinity))
        .when(col("id") === 21, lit(Double.NegativeInfinity))
        .otherwise(col("id").cast("double")).as("b"))
      .write.format("qbeast")
      .option("columnsToIndex", "a").option("cubeSize", "100").save(dir)
    val base = spark.read.format("qbeast").load(dir)
    val df = base.agg(min(col("b")).as("mn"), max(col("b")).as("mx"))
    // the scan's answer is the spec: Spark's Max returns NaN, Min -Inf
    val expected = base.groupBy().agg(min(col("b")), max(col("b"))).collect().head
    val got = df.collect().head
    assert(got.getDouble(0) == expected.getDouble(0)) // -Infinity
    assert(got.getDouble(1).isNaN && expected.getDouble(1).isNaN,
      s"metadata max must be NaN, got ${got.getDouble(1)}")
    assert(isMetadataOnly(df), df.queryExecution.executedPlan.toString)

    // all-NaN column: both extremes are NaN
    val dir2 = TestSpark.tmpDir("qbeast-metacount-allnan")
    spark.range(50).select(col("id").as("a"), lit(Double.NaN).as("b"))
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "100").save(dir2)
    val df2 = spark.read.format("qbeast").load(dir2)
      .agg(min(col("b")).as("mn"), max(col("b")).as("mx"))
    val r2 = df2.collect().head
    assert(r2.getDouble(0).isNaN && r2.getDouble(1).isNaN)
    assert(isMetadataOnly(df2))
  }

  test("filtered count(*) folds when every file decides; bails on partial overlap") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("qbeast-metacount-filt")
    // body nulls every 50th row; category flips mid-range (so an
    // equality on it cuts through the boundary file)
    val df = (1 to 20000).map { i =>
      (i.toLong, if (i <= 10000) "alpha" else "beta",
        if (i % 50 == 0) null else s"v$i", i * 1.5)
    }.toDF("id", "category", "maybe", "value")
    df.write.format("qbeast")
      .option("columnsToIndex", "id,value").option("cubeSize", "1000").save(dir)
    val base = spark.read.format("qbeast").load(dir)

    // every-file-decides shapes fold to metadata
    val all = base.filter(col("id") >= 1).agg(count(lit(1)).as("cnt"))
    assert(all.collect().head.getLong(0) == 20000L)
    assert(isMetadataOnly(all), all.queryExecution.executedPlan.toString)
    val none = base.filter(col("id") < 0).agg(count(lit(1)).as("cnt"))
    assert(none.collect().head.getLong(0) == 0L)
    assert(isMetadataOnly(none))
    val noNulls = base.filter(col("value").isNotNull).agg(count(lit(1)).as("cnt"))
    assert(noNulls.collect().head.getLong(0) == 20000L)
    assert(isMetadataOnly(noNulls))

    // partial overlap bails to the scan but stays correct
    val partial = base.filter(col("id") <= 10000).agg(count(lit(1)).as("cnt"))
    assert(partial.collect().head.getLong(0) == 10000L)
    assert(!isMetadataOnly(partial))
    val catEq = base.filter(col("category") === "alpha").agg(count(lit(1)).as("cnt"))
    assert(catEq.collect().head.getLong(0) == 10000L)
    assert(!isMetadataOnly(catEq)) // boundary file holds both categories
    // nulls scattered through every file: IS NULL is undecidable per file
    val nullable = base.filter(col("maybe").isNull).agg(count(lit(1)).as("cnt"))
    assert(nullable.collect().head.getLong(0) == 400L)
    assert(!isMetadataOnly(nullable))
    // sampling must never fold (the weight predicate is opaque to stats)
    val sampled = base.filter(col("id") >= 1).sample(0.5).agg(count(lit(1)).as("cnt"))
    assert(!isMetadataOnly(sampled))

    // append-boundary shape: second batch on the other side of a cut —
    // the ingest pattern the rewrite exists for
    val dir2 = TestSpark.tmpDir("qbeast-metacount-batches")
    (1 to 5000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("qbeast").option("columnsToIndex", "id")
      .option("cubeSize", "1000").save(dir2)
    (5001 to 8000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("qbeast").option("cubeSize", "1000").mode("append").save(dir2)
    val batch2 = spark.read.format("qbeast").load(dir2)
      .filter(col("id") > 5000).agg(count(lit(1)).as("cnt"))
    assert(batch2.collect().head.getLong(0) == 3000L)
    assert(isMetadataOnly(batch2), batch2.queryExecution.executedPlan.toString)
  }

  test("filtered min/max fold over TRUE-proved files; partial overlap bails") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("qbeast-metacount-filtmm")
    (1 to 5000).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      .write.format("qbeast").option("columnsToIndex", "id")
      .option("cubeSize", "1000").save(dir)
    (5001 to 8000).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      .write.format("qbeast").option("cubeSize", "1000").mode("append").save(dir)
    val base = spark.read.format("qbeast").load(dir)

    // batch-2 slice: every file decides, min/max fold from the
    // surviving files' stats alongside the count
    val df = base.filter(col("id") > 5000)
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"),
        min(col("v")).as("mnv"), max(col("v")).as("mxv"), count(lit(1)).as("cnt"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getLong(4))).toSeq ==
      Seq((5001L, 8000L, 5001 * 1.5, 8000 * 1.5, 3000L)))
    assert(isMetadataOnly(df), df.queryExecution.executedPlan.toString)

    // zero surviving files: min/max of nothing is null, still folded
    val none = base.filter(col("id") < 0)
      .agg(min(col("id")).as("mn"), count(lit(1)).as("cnt"))
    val r0 = none.collect().head
    assert(r0.isNullAt(0) && r0.getLong(1) == 0L)
    assert(isMetadataOnly(none))

    // a file straddling the cut is undecidable: bail to the scan
    val partial = base.filter(col("id") > 4500)
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    assert(partial.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((4501L, 8000L)))
    assert(!isMetadataOnly(partial))

    // string min/max under a decidable filter folds too (exact bounds)
    val dirS = TestSpark.tmpDir("qbeast-metacount-filtstr")
    (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .write.format("qbeast").option("columnsToIndex", "id")
      .option("cubeSize", "5000").save(dirS)
    val dfs = spark.read.format("qbeast").load(dirS)
      .filter(col("id") >= 1).agg(min(col("s")).as("mn"))
    assert(dfs.collect().head.getString(0) == "v1")
    assert(isMetadataOnly(dfs), dfs.queryExecution.executedPlan.toString)
  }

  test("min/max over masked tables: unmasked witness must dominate the masked bound") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("qbeast-metacount-dvmm")
    (1 to 5000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("qbeast").option("columnsToIndex", "id")
      .option("cubeSize", "1000").option("deletionVectors", "true").save(dir)
    (5001 to 8000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("qbeast").option("cubeSize", "1000").mode("append").save(dir)
    val t = table.QbeastTable.forPath(spark, dir)
    // sparse masks inside batch 1 only (id % 100 is opaque to stats, so
    // these rows mask instead of dropping whole files)
    assert(t.delete("id % 100 = 7 AND id <= 5000") == 50L)
    assert(t.snapshot.dvs.nonEmpty, "fixture: the sparse delete must mask")
    val base = spark.read.format("qbeast").load(dir)

    // max(id): the witness (unmasked batch 2, max 8000) dominates every
    // masked file's stats bound (≤5000) → folds without a scan
    val mx = base.agg(max(col("id")).as("mx"))
    assert(mx.collect().head.getLong(0) == 8000L)
    assert(isMetadataOnly(mx), mx.queryExecution.executedPlan.toString)

    // min(id): the global minimum lives in a MASKED file (bound 1 beats
    // the unmasked witness 5001) — the extreme row might be deleted, so
    // the rule must leave the scan alone; id=1 survives (1 % 100 != 7)
    val mn = base.agg(min(col("id")).as("mn"))
    assert(mn.collect().head.getLong(0) == 1L)
    assert(!isMetadataOnly(mn))

    // filtered variant: surviving set is batch 2 only → no masked file
    // among the candidates, folds as usual
    val fmx = base.filter(col("id") > 5000)
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"), count(lit(1)).as("cnt"))
    assert(fmx.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((5001L, 8000L, 3000L)))
    assert(isMetadataOnly(fmx))

    // filtered slice whose candidates include the masked files, probing
    // the masked side's own extreme: must scan
    val fmn = base.filter(col("id") <= 5000).agg(min(col("id")).as("mn"))
    assert(fmn.collect().head.getLong(0) == 1L)
    assert(!isMetadataOnly(fmn))
  }

  test("a fully-masked file is skipped: its stats no longer gate min/max") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("qbeast-metacount-dvfull")
    (1 to 1000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("qbeast").option("columnsToIndex", "id")
      .option("cubeSize", "5000").option("deletionVectors", "true").save(dir)
    (1001 to 3000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("qbeast").option("cubeSize", "5000").mode("append").save(dir)
    spark.conf.set("spark.qbeast.dv.maxDeletedFraction", "1.0")
    try {
      val t = table.QbeastTable.forPath(spark, dir)
      // id % 2 IN (0, 1) is opaque to stats (never file-proved), so the
      // whole first batch masks rather than dropping as a remove
      assert(t.delete("(id % 2 = 0 OR id % 2 = 1) AND id <= 1000") == 1000L)
      val s = t.snapshot
      assert(s.dvs.exists { case (p, i) =>
        s.files.find(_.path == p).exists(_.elementCount == i.cardinality)
      }, "fixture: some file must be fully masked")
      val base = spark.read.format("qbeast").load(dir)
      // the fully-masked file has NO live rows: it neither witnesses nor
      // bounds, so min folds to the unmasked batch's 1001
      val mn = base.agg(min(col("id")).as("mn"), count(lit(1)).as("cnt"))
      assert(mn.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((1001L, 2000L)))
      assert(isMetadataOnly(mn), mn.queryExecution.executedPlan.toString)
    } finally spark.conf.unset("spark.qbeast.dv.maxDeletedFraction")
  }

  test("empty table counts zero without a scan") {
    val dir = freshTable(1)
    val t = table.QbeastTable.forPath(spark, dir)
    t.delete("a >= 0")
    val df = spark.read.format("qbeast").load(dir).agg(count(lit(1)).as("cnt"))
    assert(df.collect().head.getLong(0) == 0L)
    assert(isMetadataOnly(df))
  }

  test("filtered count subtracts deletion-vector masks on proved files") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("qbeast-metacount-dv")
    // two boundary-aligned batches; the dv delete masks rows INSIDE
    // batch 1's files without rewriting them
    (1 to 5000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("qbeast").option("columnsToIndex", "id")
      .option("cubeSize", "1000").option("deletionVectors", "true").save(dir)
    (5001 to 8000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("qbeast").option("cubeSize", "1000").mode("append").save(dir)
    val t = table.QbeastTable.forPath(spark, dir)
    assert(t.delete("id % 100 = 7 AND id <= 5000") == 50L)
    assert(t.snapshot.dvs.nonEmpty, "fixture: the sparse delete must mask")
    val base = spark.read.format("qbeast").load(dir)
    // batch-1 slice: every file TRUE-proves, each contributes its LIVE
    // rows (element count minus its vector's cardinality)
    val b1 = base.filter(col("id") <= 5000).agg(count(lit(1)).as("cnt"))
    assert(b1.collect().head.getLong(0) == 4950L)
    assert(isMetadataOnly(b1), b1.queryExecution.executedPlan.toString)
    // unfiltered count folds too
    val all = base.agg(count(lit(1)).as("cnt"))
    assert(all.collect().head.getLong(0) == 7950L)
    assert(isMetadataOnly(all))
  }
}
