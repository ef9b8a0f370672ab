package graft

import graft.core.model.IndexFile
import graft.write.PreCommitHook
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Records that it ran (top-level for reflection). */
class OptHookProbe extends PreCommitHook {
  override def name: String = "optprobe"
  override def run(spark: SparkSession, files: Seq[IndexFile]): Map[String, String] = {
    OptHookProbe.ran.incrementAndGet()
    Map.empty
  }
}

object OptHookProbe {
  val ran = new java.util.concurrent.atomic.AtomicInteger()
}

/** A hook for the spec below (must be a top-level class for reflection). */
class CountingHook extends PreCommitHook {
  override def name: String = "counter"
  override def run(spark: SparkSession, files: Seq[IndexFile]): Map[String, String] =
    Map("fileCount" -> files.size.toString, "rows" -> files.map(_.elementCount).sum.toString)
}

class UtilitiesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pre-commit hook runs and its tags land in the log configuration") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dir = TestSpark.tmpDir("hooked")
    li.write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "2000")
      .option("hook.counter", classOf[CountingHook].getName)
      .save(dir)
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    assert(snap.configuration("qbeast.hook.counter.rows") == "6000")
    assert(snap.configuration.contains("qbeast.hook.counter.fileCount"))
  }

  test("optimize(options) runs hooks on the staging path too") {
    // a converted (staging-only) table routes optimize() through
    // optimizeUnindexed — the options-borne hooks must fire there as
    // well, not only on the indexed path
    OptHookProbe.ran.set(0)
    val dir = TestSpark.tmpDir("hooked-staging")
    spark.read.parquet(s"$sf/lineitem.parquet").limit(500)
      .write.mode("overwrite").parquet(dir)
    graft.table.QbeastTable.convertFromParquet(spark, dir)
    // indexed revision to optimize the staging files INTO
    spark.read.parquet(s"$sf/lineitem.parquet").limit(300)
      .write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "2000").mode("append").save(dir)
    graft.table.QbeastTable.forPath(spark, dir).optimize(
      revisionID = graft.core.model.Revision.StagingID,
      options = Map("hook.optprobe" -> classOf[OptHookProbe].getName))
    assert(OptHookProbe.ran.get() == 1, "staging optimize must run the hook")
    assert(spark.read.format("qbeast").load(dir).count() == 800)
  }

  test("auto column selection picks weakly correlated numeric columns") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val cols = graft.index.ColumnsToIndexSelector.selectColumnsToIndex(li, 2)
    assert(cols.size == 2)
    assert(cols.forall(li.schema.fieldNames.contains))
    // end-to-end: write with auto selection enabled and no explicit columns
    spark.conf.set("spark.qbeast.index.columnsToIndex.auto", "true")
    spark.conf.set("spark.qbeast.index.columnsToIndex.auto.max", "2")
    val dir = TestSpark.tmpDir("autosel")
    try {
      li.write.format("qbeast").option("cubeSize", "2000").save(dir)
      val t = graft.table.QbeastTable.forPath(spark, dir)
      assert(t.indexedColumns().size == 2)
      assert(spark.read.format("qbeast").load(dir).count() == 6000)
    } finally {
      spark.conf.set("spark.qbeast.index.columnsToIndex.auto", "false")
    }
  }

  test("per-depth metrics: weights deepen monotonically, counts reconcile") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dir = TestSpark.tmpDir("depthmetrics")
    li.write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "500").save(dir)
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val ds = t.depthMetrics()
    assert(ds.nonEmpty && ds.map(_.depth) == ds.map(_.depth).sorted)
    assert(ds.map(_.elementCount).sum == 6000)
    assert(ds.forall(d => d.minCubeElementCount <= d.maxCubeElementCount))
    assert(ds.forall(d => d.blockCount >= d.cubeCount)) // every cube has ≥1 block
    // richer whole-index metrics (reference IndexMetrics surface)
    val m = t.indexMetrics()
    assert(m.elementCount == 6000)
    assert(m.height == ds.map(_.depth).max + 1)
    assert(m.avgFanout > 0.0 && m.avgFanout <= math.pow(2, m.dimensionCount) + 1e-9)
    assert(m.depthOnBalance > 0.0)
    assert(m.innerCubeStats.cubeCount + m.leafCubeStats.cubeCount == m.cubeCount)
    assert(m.leafCubeStats.cubeCount > 0)
    assert(m.innerCubeStats.minElementCount <= m.innerCubeStats.avgElementCount &&
      m.innerCubeStats.avgElementCount <= m.innerCubeStats.maxElementCount)
    // deeper levels hold heavier rows: mean max-weight fraction grows
    ds.sliding(2).foreach {
      case Seq(a, b) => assert(a.avgMaxWeightFraction <= b.avgMaxWeightFraction + 1e-9)
      case _ =>
    }
    // buffer-capacity knob honored end-to-end
    spark.conf.set("spark.qbeast.index.cubeDomainsBufferCapacity", "1000")
    try {
      val dir2 = TestSpark.tmpDir("bufcap")
      li.write.format("qbeast")
        .option("columnsToIndex", "l_orderkey,l_extendedprice")
        .option("cubeSize", "500").save(dir2)
      assert(spark.read.format("qbeast").load(dir2).count() == 6000)
    } finally spark.conf.unset("spark.qbeast.index.cubeDomainsBufferCapacity")
  }

  test("numeric and string quantile computation produce sorted covering arrays") {
    val part = spark.read.parquet(s"$sf/part.parquet")
    val numQ = graft.utils.QbeastUtils.computeQuantilesForColumn(part, "p_retailprice", 10)
    val nums = numQ.stripPrefix("[").stripSuffix("]").split(",").map(_.toDouble)
    assert(nums.length > 2 && nums.sameElements(nums.sorted))
    val strQ = graft.utils.QbeastUtils.computeStringQuantilesForColumn(part, "p_brand", 10)
    assert(strQ.startsWith("[\"") && strQ.endsWith("\"]"))
  }

  test("computeHistogramForColumn: ascending bounds, usable as columnStats") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val hist = graft.utils.QbeastUtils.computeHistogramForColumn(part, "p_type", 8)
    assert(hist.startsWith("[\"") && hist.endsWith("\"]"))
    // parses and is strictly ascending (the write-side validation relies on it)
    val bounds = org.json4s.jackson.JsonMethods.parse(hist)
      .asInstanceOf[org.json4s.JArray].arr.map(_.asInstanceOf[org.json4s.JString].s)
    assert(bounds.size > 1)
    assert(bounds.lazyZip(bounds.tail).forall(_ < _))
    // a write indexed with these bounds round-trips
    val dir = TestSpark.tmpDir("util-hist")
    part.write.format("qbeast")
      .option("columnsToIndex", "p_type:histogram,p_retailprice")
      .option("columnStats", s"""{"p_type_histogram": $hist}""")
      .option("cubeSize", "2000").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === part.count())
    assert(back.filter("p_type >= 'PROMO'").count() ===
      part.filter("p_type >= 'PROMO'").count())
  }

  test("optimizeFiles rewrites only the named files, content intact") {
    val dir = TestSpark.tmpDir("opt-files")
    val raw = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    raw.write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "500")
      .save(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val s0 = graft.log.QbeastLog.snapshot(dir, conf)
    assert(s0.files.size > 3, s"need several files, got ${s0.files.size}")
    val targets = s0.files.take(2).map(_.path)
    val untouched = s0.files.map(_.path).toSet -- targets

    graft.table.QbeastTable.forPath(spark, dir).optimizeFiles(targets)

    val s1 = graft.log.QbeastLog.snapshot(dir, conf)
    val s1Paths = s1.files.map(_.path).toSet
    assert(targets.forall(p => !s1Paths.contains(p)), "targets rewritten away")
    assert(untouched.subsetOf(s1Paths), "non-targets untouched")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === raw.count())
    assert(back.exceptAll(raw).count() === 0)
    // unknown paths are a no-op, no extra commit
    val v = s1.version
    graft.table.QbeastTable.forPath(spark, dir).optimizeFiles(Seq("nope.parquet"))
    assert(graft.log.QbeastLog.snapshot(dir, conf).version === v)
  }

}
