package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file bloom filters (`bloomFilterColumns` write option): equality
 * skipping on high-cardinality NON-indexed columns where min/max ranges
 * cannot prune (every file spans the probe value). */
class BloomSkippingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  private def isMetadataOnly(df: DataFrame): Boolean = {
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

  /** tag is a high-cardinality string UNCORRELATED with the indexed id:
   * every file's [min,max] range spans any probe, so only the bloom can
   * skip. */
  private def writeSynthetic(dir: String, extra: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    val df = (1 to 20000).map { i =>
      val h = java.util.UUID.nameUUIDFromBytes(s"tag_$i".getBytes).toString
      (i.toLong, h, i.toLong * 7)
    }.toDF("id", "tag", "v")
    val w = df.write.format("qbeast")
      .option("columnsToIndex", "id,v")
      .option("cubeSize", "1000")
      .option("bloomFilterColumns", "tag")
    extra.foreach { case (k, x) => w.option(k, x) }
    w.save(dir)
  }

  test("bloom skips all files for an absent value, none lost for present ones") {
    val dir = TestSpark.tmpDir("bloom-basic")
    writeSynthetic(dir)
    val back = spark.read.format("qbeast").load(dir)
    val all = back.inputFiles.length
    assert(all > 3, s"need multiple files, got $all")

    // min/max CANNOT prune this shape: tags are uuid-like, every file
    // spans the whole lexical range — assert the premise holds
    val present = java.util.UUID.nameUUIDFromBytes("tag_12345".getBytes).toString
    val hit = back.filter(col("tag") === present)
    assert(hit.count() == 1)
    val readHit = filesRead(back.filter(col("tag") === present))
    assert(readHit < all,
      s"bloom should cut the scan for a single-file value: read $readHit of $all")

    val absent = "no-such-tag-anywhere"
    val miss = back.filter(col("tag") === absent)
    assert(miss.count() == 0)
    val readMiss = filesRead(back.filter(col("tag") === absent))
    assert(readMiss == 0, s"absent value must skip every file, read $readMiss")

    // IN over one present + one absent value: only the present one's
    // files survive
    val readIn = filesRead(back.filter(col("tag").isin(present, absent)))
    assert(readIn < all && readIn >= 1, s"IN-list read $readIn of $all")
  }

  test("metadata-only count(*) = 0 for a bloom-proven-absent value") {
    val dir = TestSpark.tmpDir("bloom-meta")
    writeSynthetic(dir)
    QTables.ensureExtensions(spark)
    val back = spark.read.format("qbeast").load(dir)
    val q = back.filter(col("tag") === "definitely-not-there")
      .agg(count(lit(1)).as("n"))
    assert(q.head().getLong(0) == 0L)
    assert(isMetadataOnly(q), "absent-value count should fold to metadata")
  }

  test("appends inherit the persisted bloom config; empty option turns it off") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("bloom-inherit")
    writeSynthetic(dir)
    // append WITHOUT the option: filters must still be built
    val extraTag = java.util.UUID.nameUUIDFromBytes("extra".getBytes).toString
    Seq((100001L, extraTag, 1L)).toDF("id", "tag", "v")
      .write.format("qbeast").mode("append").save(dir)
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    assert(snap.configuration.get("qbeast.bloomFilterColumns").contains("tag"))
    assert(snap.files.forall(_.stats.exists(_.contains("bloomFilters"))),
      "every file (original + appended) must carry a bloom filter")
    // the appended value is findable and still prunes to few files
    val back = spark.read.format("qbeast").load(dir)
    assert(back.filter(col("tag") === extraTag).count() == 1)
    val read = filesRead(back.filter(col("tag") === extraTag))
    assert(read < back.inputFiles.length)

    // explicit empty option: config dropped, new files have no blooms
    Seq((100002L, "plain", 2L)).toDF("id", "tag", "v")
      .write.format("qbeast").mode("append")
      .option("bloomFilterColumns", "").save(dir)
    val snap2 = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    assert(!snap2.configuration.contains("qbeast.bloomFilterColumns"))
    // absent-value probe still correct (old files keep filters, the new
    // one has none → conservative read)
    assert(spark.read.format("qbeast").load(dir)
      .filter(col("tag") === "still-absent").count() == 0)
  }

  test("optimize rebuilds blooms; bad options are rejected") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("bloom-optimize")
    writeSynthetic(dir)
    table.QbeastTable.forPath(spark, dir).optimize()
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    assert(snap.files.forall(_.stats.exists(_.contains("bloomFilters"))),
      "optimized files must carry rebuilt bloom filters")
    val back = spark.read.format("qbeast").load(dir)
    assert(filesRead(back.filter(col("tag") === "nope")) == 0)
    assert(back.count() == 20000)

    val e1 = intercept[IllegalArgumentException] {
      Seq((1L, "x", 1L)).toDF("id", "tag", "v")
        .write.format("qbeast").mode("append")
        .option("bloomFilterColumns", "missing_col").save(dir)
    }
    assert(e1.getMessage.contains("missing_col"))
    val e2 = intercept[Exception] {
      (1 to 10).map(i => (i.toLong, Array(i.toFloat))).toDF("id", "emb")
        .write.format("qbeast")
        .option("columnsToIndex", "id")
        .option("bloomFilterColumns", "emb")
        .save(TestSpark.tmpDir("bloom-badtype"))
    }
    assert(e2.getMessage.contains("unsupported type"))
  }

  test("viability gate: an unsizeable filter is skipped, not saturated") {
    import spark.implicits._
    // default cubeSize (5M expected rows/file) would clamp the bitset
    // to < 1 bit/key — a ~100% fp filter that prunes nothing while
    // bloating every log entry. The write must skip building it.
    val dir = TestSpark.tmpDir("bloom-viability")
    (1 to 1000).map(i => (i.toLong, s"t$i")).toDF("id", "tag")
      .write.format("qbeast")
      .option("columnsToIndex", "id") // default cubeSize: 5,000,000
      .option("bloomFilterColumns", "tag")
      .save(dir)
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    assert(snap.files.forall(_.stats.exists(!_.contains("bloomFilters"))),
      "clamped-to-useless filters must not be written")
    // property still persists: a later write with a sane rollupSize
    // builds filters again
    (1001 to 2000).map(i => (i.toLong, s"t$i")).toDF("id", "tag")
      .write.format("qbeast").mode("append")
      .option("rollupSize", "1000").save(dir)
    val snap2 = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    assert(snap2.files.exists(_.stats.exists(_.contains("bloomFilters"))))
    assert(spark.read.format("qbeast").load(dir)
      .filter(col("tag") === "t1500").count() == 1)
  }

  test("a truncated bloom bitset is dropped at parse, never throws") {
    val json = """{"numRecords":5,"minValues":{"tag":"a"},"maxValues":{"tag":"z"},""" +
      """"nullCount":{"tag":0},"bloomFilters":{"tag":{"k":7,"b64":"AA=="}}}"""
    val st = graft.read.FileStatsPruning.parse(json)
    assert(st.isDefined && st.get.blooms.isEmpty,
      "a <8-byte bitset must be dropped (probe modulus would be 0)")
  }

  test("nulls and numeric columns: filter on a nullable long column") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("bloom-long")
    val df = (1 to 8000).map { i =>
      (i.toLong, if (i % 100 == 0) None else Some(i.toLong * 1000003L))
    }.toDF("id", "ref")
    df.write.format("qbeast")
      .option("columnsToIndex", "id")
      .option("cubeSize", "1000")
      .option("bloomFilterColumns", "ref")
      .save(dir)
    val back = spark.read.format("qbeast").load(dir)
    val all = back.inputFiles.length
    assert(all > 3)
    // present numeric value (one row) — found
    assert(back.filter(col("ref") === 5000015L).count() == 1)
    // absent values LAND INSIDE every file's [min,max] — only the bloom
    // skips. A false positive may admit the odd file (never wrong
    // results), so assert across several probes: all counts 0, and the
    // total files read is a small fraction of probes × files
    val probes = Seq(5000016L, 5000017L, 7000022L, 1000004L, 2000007L)
    val reads = probes.map { p =>
      assert(back.filter(col("ref") === p).count() == 0)
      filesRead(back.filter(col("ref") === p))
    }
    assert(reads.sum <= probes.length,
      s"bloom should skip nearly all of ${probes.length}x$all file probes, read ${reads.sum}")
    assert(reads.count(_ == 0L) >= 3, s"most absent probes must read zero files: $reads")
    // null semantics unchanged: IS NULL rows all there
    assert(back.filter(col("ref").isNull).count() == 80)
  }

}
