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

  test("Complete mode overwrites the table per trigger instead of accumulating") {
    import spark.implicits._
    val tblDir = TestSpark.tmpDir("stream-complete-tbl")
    val ckpt = TestSpark.tmpDir("stream-complete-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    mem.addData((1L, 10.0), (2L, 20.0))
    val agg = mem.toDS().toDF("k", "v").groupBy($"k").agg(sum($"v").as("total"))
    val q = agg.writeStream.format("qbeast")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .option("columnsToIndex", "k")
      .option("path", tblDir)
      .start()
    try {
      q.processAllAvailable()
      mem.addData((1L, 5.0), (3L, 7.0))
      q.processAllAvailable()
    } finally q.stop()
    // table holds the LATEST full aggregate, not the union of both triggers
    val back = spark.read.format("qbeast").load(tblDir)
      .as[(Long, Double)].collect().toMap
    assert(back == Map(1L -> 15.0, 2L -> 20.0, 3L -> 7.0), back.toString)
  }

  test("queryName + session checkpoint conf yields a stable txn appId") {
    import spark.implicits._
    val tblDir = TestSpark.tmpDir("stream-qn-tbl")
    val root = TestSpark.tmpDir("stream-qn-root")
    val prev = spark.conf.getOption("spark.sql.streaming.checkpointLocation")
    spark.conf.set("spark.sql.streaming.checkpointLocation", root)
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
      mem.addData((1L, 1.0))
      val q = mem.toDS().toDF("k", "v").writeStream.format("qbeast")
        .queryName("stable-ingest")
        .option("columnsToIndex", "k")
        .option("path", tblDir)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snap = graft.log.QbeastLog.snapshot(tblDir, spark.sparkContext.hadoopConfiguration)
      // Spark resolves this query's checkpoint to <root>/stable-ingest
      // — the appId must be derived from that stable identity, not a
      // per-start random id, so crash replays dedup across restarts
      assert(snap.txns.keys.exists(_ == s"qbeast-stream-$root/stable-ingest"),
        s"expected stable appId, got ${snap.txns.keys}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.checkpointLocation", v)
        case None => spark.conf.unset("spark.sql.streaming.checkpointLocation")
      }
    }
  }

  test("Update mode and partitionBy are rejected with clear errors") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val agg = mem.toDS().toDF("k", "v").groupBy($"k").agg(sum($"v").as("total"))
    val e1 = intercept[Exception] {
      agg.writeStream.format("qbeast").outputMode("update")
        .option("checkpointLocation", TestSpark.tmpDir("upd-ckpt"))
        .option("columnsToIndex", "k")
        .option("path", TestSpark.tmpDir("upd-tbl")).start()
    }
    assert(e1.getMessage.contains("Update") || e1.getMessage.contains("update"), e1.getMessage)
    val e2 = intercept[Exception] {
      mem.toDS().toDF("k", "v").writeStream.format("qbeast")
        .partitionBy("k")
        .option("checkpointLocation", TestSpark.tmpDir("pb-ckpt"))
        .option("columnsToIndex", "k")
        .option("path", TestSpark.tmpDir("pb-tbl")).start()
    }
    assert(e2.getMessage.toLowerCase.contains("partition"), e2.getMessage)
  }

}
