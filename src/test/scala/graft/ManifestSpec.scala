package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Symlink-manifest hardening on top of the q74/LogCheckpointSpec
 * coverage: the Delta-style generate(mode) spelling, the
 * deletion-vector refusal (a manifest reader would resurrect masked
 * rows), and the empty-snapshot zero-byte shape. */
class ManifestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def manifestLines(tbl: String): Seq[String] =
    spark.read.textFile(s"$tbl/_symlink_format_manifest/manifest").collect().toSeq

  test("generate(mode) delegates; unknown modes are rejected by name") {
    val tbl = TestSpark.tmpDir("manifest-mode")
    (1 to 300).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "100").save(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val n = t.generate("symlink_format_manifest")
    val lines = manifestLines(tbl)
    assert(lines.size == n && n > 0)
    assert(spark.read.parquet(lines: _*).count() == 300)
    val e = intercept[IllegalArgumentException](t.generate("nope"))
    assert(e.getMessage.contains("nope"))
  }

  test("masked tables refuse generation until the vectors are purged") {
    val tbl = TestSpark.tmpDir("manifest-dv")
    (1 to 400).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "100").option("deletionVectors", "true").save(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.delete("a % 5 = 0") > 0)
    assert(t.snapshot.dvs.nonEmpty)
    val e = intercept[IllegalArgumentException](t.generateSymlinkManifest())
    assert(e.getMessage.contains("deletion vectors"))
    t.purgeDeletionVectors()
    val n = t.generate("symlink_format_manifest")
    assert(n > 0)
    assert(spark.read.parquet(manifestLines(tbl): _*).count() ==
      spark.read.format("qbeast").load(tbl).count())
  }

  test("an empty snapshot publishes a zero-byte manifest, not a blank line") {
    val tbl = TestSpark.tmpDir("manifest-empty")
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a").save(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.delete("a >= 0") > 0) // copy-on-write: drops every file
    assert(t.generateSymlinkManifest() == 0)
    val p = new org.apache.hadoop.fs.Path(s"$tbl/_symlink_format_manifest/manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getFileStatus(p).getLen == 0L)
    assert(manifestLines(tbl).isEmpty)
  }

}
