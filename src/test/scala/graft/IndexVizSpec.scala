package graft

import graft.tools.IndexViz
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexVizSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("cubeRows reconstructs the tree: counts, bytes and weights add up") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dir = TestSpark.tmpDir("viz")
    li.write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "1000").save(dir)
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    val rid = snap.lastRevisionID
    val rows = IndexViz.cubeRows(snap, rid)
    assert(rows.nonEmpty)
    // row counts over all cubes = table rows; bytes ≈ total file bytes
    assert(rows.map(_.elementCount).sum === li.count())
    val totalBytes = snap.files.filter(_.revisionId == rid).map(_.size).sum
    assert(math.abs(rows.map(_.bytes).sum - totalBytes) < 1.0)
    // pre-order: root first, parents before children, parent ids resolve
    assert(rows.head.depth === 0)
    val ids = rows.map(_.id).toSet
    rows.filter(_.depth > 0).foreach(r => assert(ids.contains(r.parent)))
    // weights are sane fractions
    rows.foreach(r => assert(r.maxWeightFraction >= 0.0 && r.maxWeightFraction <= 1.0))
  }

  test("main writes a self-contained HTML with the tree and sampling stats") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dir = TestSpark.tmpDir("vizhtml")
    li.write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "1000").save(dir)
    val out = TestSpark.tmpDir("vizout") + "/index.html"
    IndexViz.main(Array(dir, out, "--fraction=0.1"))
    val html = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(html.contains("<!doctype html>"))
    assert(html.contains("OTree index"))
    // inline data, no external asset references
    assert(html.contains("const DATA=["))
    assert(!html.contains("http://") && !html.contains("https://"))
    // the shared test session must survive the tool run
    assert(!spark.sparkContext.isStopped)
    assert(spark.range(1).count() === 1)
  }

}
