package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file column stats (min/max/nullCount) + data skipping on
 * NON-indexed columns. */
class FileStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** numFiles metric of the (single) parquet scan after executing `df`. */
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  private def writeSynthetic(dir: String): DataFrame = {
    import spark.implicits._
    // ts and category correlate with the indexed id, like event time
    // correlates with an ingest key in real tables; body is a long text
    // column whose min/max must be dropped from the stats
    val df = (1 to 20000).map { i =>
      (i.toLong, i.toLong * 1000,
        if (i <= 10000) "alpha" else "beta",
        if (i % 50 == 0) null else s"body_${"x" * 80}_$i",
        i * 1.5)
    }.toDF("id", "ts", "category", "body", "value")
    df.write.format("qbeast")
      .option("columnsToIndex", "id,value")
      .option("cubeSize", "1000")
      .save(dir)
    df
  }

  test("stats skip files on a non-indexed numeric column") {
    val dir = TestSpark.tmpDir("fstats-num")
    val df = writeSynthetic(dir)
    val back = spark.read.format("qbeast").load(dir)
    val all = back.inputFiles.length
    assert(all > 3, s"need multiple files, got $all")

    val q = back.filter("ts < 500000") // ids 1..499 — a thin slice
    assert(q.count() === df.filter("ts < 500000").count())
    val read = filesRead(back.filter("ts < 500000"))
    assert(read < all, s"stats skipping read $read of $all files")
  }

  test("stats skip files on a non-indexed string column") {
    val dir = TestSpark.tmpDir("fstats-str")
    val df = writeSynthetic(dir)
    val back = spark.read.format("qbeast").load(dir)
    val all = back.inputFiles.length

    assert(back.filter("category = 'alpha'").count() ===
      df.filter("category = 'alpha'").count())
    val read = filesRead(back.filter("category = 'alpha'"))
    assert(read < all, s"string skipping read $read of $all files")
    // IN list goes through the same range check
    assert(back.filter("category IN ('alpha')").count() ===
      df.filter("category = 'alpha'").count())
  }

  test("long string columns keep truncated bounds and stay correct (no wrong pruning)") {
    val dir = TestSpark.tmpDir("fstats-long")
    val df = writeSynthetic(dir)
    val back = spark.read.format("qbeast").load(dir)
    // body values exceed the truncation length and share one 64-char
    // prefix (bounds are identical across files — no pruning possible):
    // filters on body must still return every match (conservative keep)
    assert(back.filter(col("body").startsWith("body_")).count() ===
      df.filter(col("body").isNotNull).count())
    assert(back.filter("body IS NULL").count() === df.filter("body IS NULL").count())
  }

  test("oversized string values contribute truncated bounds that still prune") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("fstats-trunc")
    // > 64-char values whose FIRST chars sort with the index: the
    // truncated bounds separate files, so the old invalidate-on-oversize
    // behavior (zero pruning) is observable as a regression here
    val df = (1 to 20000).map { i =>
      (i.toLong, f"k$i%08d" + ("z" * 100), i * 2.0)
    }.toDF("id", "payload", "value")
    df.write.format("qbeast")
      .option("columnsToIndex", "id,value")
      .option("cubeSize", "1000").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    val all = back.inputFiles.length
    assert(all > 3, s"need multiple files, got $all")
    // range predicate on the oversized column: pruned AND exact
    val q = back.filter(col("payload") < "k00000500")
    assert(q.count() === 499L)
    assert(filesRead(back.filter(col("payload") < "k00000500")) < all,
      "truncated bounds should skip files")
    // prefix predicate prunes through the same bounds
    assert(filesRead(back.filter(col("payload").startsWith("k0001999"))) < all)
    assert(back.filter(col("payload").startsWith("k0001999")).count() === 10L)
    // equality on a full oversized value: exact through bounds-only stats
    assert(back.filter(col("payload") === ("k00010000" + "z" * 100)).count() === 1L)
    // min/max over the truncated column must NOT fold to metadata (the
    // winning bounds are inexact) and must equal the true extremes
    val agg = back.agg(min("payload").as("mn"), max("payload").as("mx"))
    val scansSurvive = agg.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.nonEmpty
    assert(scansSurvive, "inexact string bounds must bail the metadata fold")
    val r = agg.head()
    assert(r.getString(0) === "k00000001" + "z" * 100)
    assert(r.getString(1) === "k00020000" + "z" * 100)
  }

  test("bumpUpper produces a strict upper bound for every extension; surrogate gap skipped") {
    import org.apache.spark.unsafe.types.UTF8String
    val bump = (s: UTF8String) => graft.write.FileStatsCollector.bumpUpper(s)
    // property: bump(prefix(v)) > v in UTF8 order, for tricky shapes
    val values = Seq(
      "plain ascii tail", "ends high ퟿", "non-bmp 😀 emoji",
      "max cp " + new String(Character.toChars(0x10FFFF)),
      "éè accented", "tab\tand newline\n")
    values.foreach { tail =>
      val v = UTF8String.fromString("pfx_" + tail + ("x" * 100))
      val pfx = v.substring(0, 64)
      val ub = bump(pfx)
      assert(ub != null, s"bump failed for $tail")
      assert(ub.compareTo(v) > 0, s"bound not above value for $tail")
      assert(ub.compareTo(pfx) > 0, s"bound not above prefix for $tail")
    }
    // all-U+10FFFF prefix: no bound exists at this length
    val maxCp = new String(Character.toChars(0x10FFFF))
    assert(bump(UTF8String.fromString(maxCp * 3)) == null)
    // a U+D7FF last char bumps OVER the surrogate gap to U+E000
    val bumped = bump(UTF8String.fromString("a퟿"))
    assert(bumped != null && bumped.toString === "a")
  }

  test("null-count stats prune IS NULL scans") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("fstats-null")
    // nulls only in the low-id range → only low-id files have them
    val df = (1 to 20000).map { i =>
      (i.toLong, if (i <= 1000) null else s"v$i", i * 2.0)
    }.toDF("id", "maybe", "value")
    df.write.format("qbeast")
      .option("columnsToIndex", "id,value")
      .option("cubeSize", "1000").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    val all = back.inputFiles.length
    assert(back.filter("maybe IS NULL").count() === 1000L)
    val read = filesRead(back.filter("maybe IS NULL"))
    assert(read < all, s"IS NULL skipping read $read of $all files")
  }

  test("NaN rows are never pruned away (NaN sorts above every value in Spark)") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("fstats-nan")
    // NaN lives only in the low-id slice; every file's finite values
    // stay small, so a NaN-blind max would prune ALL files for v > 1e9
    val df = (1 to 20000).map { i =>
      (i.toLong, if (i <= 100) Double.NaN else i * 1.0)
    }.toDF("id", "v")
    df.write.format("qbeast")
      .option("columnsToIndex", "id").option("cubeSize", "1000").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    // Spark: NaN > any value, NaN = NaN
    assert(back.filter("v > 1e9").count() === 100L)
    assert(back.filter("v = double('NaN')").count() === 100L)
    assert(back.filter("v >= cast(19000 as double)").count() ===
      df.filter(r => r.getDouble(1) >= 19000.0 || r.getDouble(1).isNaN).count().toLong)
    // the NaN-carrying slice is localized: pruning must still drop
    // files for this query, just not the NaN ones
    val all = back.inputFiles.length
    val read = filesRead(back.filter("v > 1e9"))
    assert(read < all, s"NaN-aware skipping read $read of $all files")
  }

  test("NaN in an INDEXED column: range sane, query space finds the NaN rows") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("fstats-nan-idx")
    // NaN rows in the indexed column itself: the revision range must
    // come from the finite values only (a NaN max would poison every
    // coordinate), NaN rows clamp to the top border on both sides, and
    // NaN comparison literals must constrain the query space instead of
    // producing NaN bounds that intersect nothing
    val df = (1 to 20000).map { i =>
      (i.toLong, if (i <= 100) Double.NaN else i * 1.0)
    }.toDF("id", "v")
    df.write.format("qbeast")
      .option("columnsToIndex", "id,v").option("cubeSize", "1000").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === 20000L)
    // Spark: NaN = NaN is true, NaN > any value
    assert(back.filter("v = double('NaN')").count() === 100L)
    assert(back.filter("v > 1e9").count() === 100L)
    assert(back.filter("v IN (double('NaN'), 105.0)").count() === 101L)
    assert(back.filter("v = 105.0").count() === 1L)
    assert(back.filter("v < 0").count() === 0L)
    // the finite range still prunes: a thin finite slice reads fewer files
    val all = back.inputFiles.length
    assert(all > 3)
    val read = filesRead(back.filter("v >= 500.0 AND v < 700.0"))
    assert(read < all, s"finite-range pruning broken: $read of $all")
  }

  test("Infinity values serialize as legal JSON and prune correctly") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("fstats-inf")
    val df = (1 to 5000).map { i =>
      (i.toLong,
        if (i == 1) Double.PositiveInfinity
        else if (i == 2) Double.NegativeInfinity
        else i * 1.0)
    }.toDF("id", "v")
    df.write.format("qbeast")
      .option("columnsToIndex", "id").option("cubeSize", "500").save(dir)
    // every file's stats JSON must stay parseable (Infinity is not a
    // legal JSON number — the collector writes sentinel strings)
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    snap.files.foreach { f =>
      assert(f.stats.isDefined && graft.read.FileStatsPruning.parse(f.stats.get).isDefined,
        s"unparseable stats: ${f.stats}")
    }
    val back = spark.read.format("qbeast").load(dir)
    assert(back.filter("v > 1e18").count() === 1L) // the +Inf row
    assert(back.filter("v < -1e18").count() === 1L) // the -Inf row
    assert(back.filter("v = double('Infinity')").count() === 1L)
  }

  test("stats survive the log round-trip and optimize keeps them") {
    val dir = TestSpark.tmpDir("fstats-opt")
    writeSynthetic(dir)
    val t = graft.table.QbeastTable.forPath(spark, dir)
    t.optimize()
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    assert(snap.files.nonEmpty)
    assert(snap.files.forall(_.stats.nonEmpty), "rewritten files must carry stats")
    val s = graft.read.FileStatsPruning.parse(snap.files.head.stats.get).get
    assert(s.numRecords > 0)
    assert(s.mins.contains("ts") && s.maxs.contains("ts"))
    // oversized strings keep TRUNCATED bounds, marked inexact, ≤ the cap
    // (+1 on the bumped max, whose last code point may extend)
    assert(s.mins.contains("body"), "long strings keep truncated bounds")
    assert(s.mins("body").asInstanceOf[String].length <=
      graft.write.FileStatsCollector.MaxStringLen)
    assert(s.isInexact("body", isMin = true) || s.isInexact("body", isMin = false),
      "a truncated winner must be marked inexact")
    assert(s.nulls.contains("body"))
  }

}
