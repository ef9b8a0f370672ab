package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** writeStream.format("qbeast"): streaming ingestion into an indexed
 * table, with sampling pushdown working on the result. */
class StreamSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("streaming ingestion builds an indexed, sampleable table") {
    val srcDir = TestSpark.tmpDir("stream-src")
    val tblDir = TestSpark.tmpDir("stream-tbl")
    val ckpt = TestSpark.tmpDir("stream-ckpt")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // two source files → the file stream may deliver them across batches
    li.filter("l_orderkey % 2 = 0").write.parquet(srcDir + "/a")
    li.filter("l_orderkey % 2 = 1").write.parquet(srcDir + "/b")

    val stream = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(srcDir + "/*")
    val q = stream.writeStream.format("qbeast")
      .option("checkpointLocation", ckpt)
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "1000")
      .option("path", tblDir)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val back = spark.read.format("qbeast").load(tblDir)
    assert(back.count() == 6000)
    val s = back.sample(0.1).count()
    assert(math.abs(s - 600) <= 120, s"10% of 6000 expected ~600, got $s")
    // snapshot has streaming txn entries
    val snap = graft.log.QbeastLog.snapshot(tblDir, spark.sparkContext.hadoopConfiguration)
    assert(snap.txns.keys.exists(_.startsWith("qbeast-stream-")))
  }

}
