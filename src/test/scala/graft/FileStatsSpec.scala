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

  test("long string columns drop min/max but stay correct (no wrong pruning)") {
    val dir = TestSpark.tmpDir("fstats-long")
    val df = writeSynthetic(dir)
    val back = spark.read.format("qbeast").load(dir)
    // body values exceed the stats length cap: filters on body must
    // still return every match (conservative keep)
    assert(back.filter(col("body").startsWith("body_")).count() ===
      df.filter(col("body").isNotNull).count())
    assert(back.filter("body IS NULL").count() === df.filter("body IS NULL").count())
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
    assert(!s.mins.contains("body"), "long strings must not keep min/max")
    assert(s.nulls.contains("body"))
  }

}
