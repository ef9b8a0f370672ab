package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta-style symlink manifest generation
 * (QbeastTable.generate("symlink_format_manifest")): the external-
 * reader contract — the manifest's URI list IS the live file set, the
 * parquet view over it equals the table content, regeneration tracks
 * the snapshot, and masked tables refuse (a manifest reader would
 * resurrect deleted rows). */
class ManifestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def manifestLines(tbl: String): Seq[String] =
    spark.read.textFile(s"$tbl/_symlink_format_manifest/manifest").collect().toSeq

  test("manifest lists exactly the live files; external view equals the table") {
    val tbl = TestSpark.tmpDir("manifest")
    (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "100").save(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val n = t.generate("symlink_format_manifest")
    val lines = manifestLines(tbl)
    assert(lines.size == n && lines.distinct.size == n)
    val table0 = spark.read.format("qbeast").load(tbl)
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(lines.toSet == table0.inputFiles
      .map(u => fs.makeQualified(new org.apache.hadoop.fs.Path(u)).toUri.toString).toSet)
    val external = spark.read.parquet(lines: _*)
    assert(external.count() == 500)
    assert(external.agg(sum("b")).head().getDouble(0) ==
      table0.agg(sum("b")).head().getDouble(0))

    // append + regenerate: the manifest tracks the new snapshot
    (501 to 600).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(tbl)
    t.generate("symlink_format_manifest")
    assert(spark.read.parquet(manifestLines(tbl): _*).count() == 600)

    // optimize + regenerate: rewritten files replace the old ones
    t.optimize()
    t.generate("symlink_format_manifest")
    val after = manifestLines(tbl)
    assert(spark.read.parquet(after: _*).count() == 600)

    // unknown mode is rejected by name
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
    val e = intercept[IllegalArgumentException](t.generate("symlink_format_manifest"))
    assert(e.getMessage.contains("deletion vectors"))
    t.purgeDeletionVectors()
    val n = t.generate("symlink_format_manifest")
    assert(n > 0)
    assert(spark.read.parquet(manifestLines(tbl): _*).count() ==
      spark.read.format("qbeast").load(tbl).count())
  }

}
