package graft

import graft.table.QbeastTable

import org.scalatest.funsuite.AnyFunSuite

/** verifyIntegrity: the FSCK-shaped audit of log vs disk. */
class IntegritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeTable(dir: String): Unit = {
    (1 to 8000).map(i => (i.toLong, i * 3L)).toDF("id", "v")
      .write.format("qbeast")
      .option("columnsToIndex", "id,v")
      .option("cubeSize", "1000")
      .save(dir)
  }

  test("healthy table reports no issues") {
    val dir = TestSpark.tmpDir("integrity-ok")
    writeTable(dir)
    assert(QbeastTable.forPath(spark, dir).verifyIntegrity().isEmpty)
  }

  test("a deleted data file is reported as missing") {
    val dir = TestSpark.tmpDir("integrity-missing")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    val victim = t.snapshot.files.head.path
    val full = new org.apache.hadoop.fs.Path(dir, victim)
    val fs = full.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(full, false))
    val issues = t.verifyIntegrity()
    assert(issues.map(_.issue) === Seq("missing-file"))
    assert(issues.head.path.endsWith(victim))
  }

  test("a truncated data file is reported as a size mismatch") {
    val dir = TestSpark.tmpDir("integrity-size")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    val victim = t.snapshot.files.head.path
    val local = java.nio.file.Paths.get(dir, victim)
    val bytes = java.nio.file.Files.readAllBytes(local)
    java.nio.file.Files.write(local, bytes.dropRight(16))
    val issues = t.verifyIntegrity()
    assert(issues.map(_.issue) === Seq("size-mismatch"))
  }

  test("SQL VERIFY surfaces the audit: empty when healthy, rows when broken") {
    val dir = TestSpark.tmpDir("integrity-sql")
    writeTable(dir)
    assert(spark.sql(s"VERIFY '$dir'").collect().isEmpty)
    val victim = QbeastTable.forPath(spark, dir).snapshot.files.head.path
    val full = new org.apache.hadoop.fs.Path(dir, victim)
    full.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(full, false)
    val rows = spark.sql(s"VERIFY '$dir'").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("missing-file"))
  }

  test("a vacuumed maintained table stays healthy") {
    val dir = TestSpark.tmpDir("integrity-maint")
    writeTable(dir)
    (8001 to 9000).map(i => (i.toLong, i * 3L)).toDF("id", "v")
      .write.format("qbeast").mode("append").save(dir)
    val t = QbeastTable.forPath(spark, dir)
    t.optimize()
    t.vacuum(retainMillis = 0L, force = true)
    assert(t.verifyIntegrity().isEmpty)
  }

}
