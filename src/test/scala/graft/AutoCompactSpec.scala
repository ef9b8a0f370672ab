package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** autoCompact: post-commit small-file folding — the streaming-ingest
 * thousand-tiny-files antidote. */
class AutoCompactSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fileCount(dir: String): Int =
    spark.read.format("qbeast").load(dir).inputFiles.length

  private def history(dir: String) =
    graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)

  test("small files fold after enough appends; config persists; results exact") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("autocompact")
    spark.conf.set("spark.qbeast.autoCompact.minNumFiles", "6")
    try {
      // first write enables the property; every append is one small file
      (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
        .write.format("qbeast")
        .option("columnsToIndex", "id")
        .option("autoCompact", "true")
        .save(dir)
      assert(history(dir).configuration.get("qbeast.autoCompact").contains("true"))
      (1 to 9).foreach { b =>
        (1 to 500).map(i => ((b * 1000 + i).toLong, i * 2.0)).toDF("id", "v")
          .write.format("qbeast").mode("append").save(dir) // no option: inherited
      }
      // 10 tiny commits with minNumFiles=6: compaction must have fired
      val s = history(dir)
      val optimized = QTablesTestAccess.operations(dir, spark).count(_ == "OPTIMIZE")
      assert(optimized >= 1, "auto-compaction should have committed at least one OPTIMIZE")
      assert(fileCount(dir) < 10,
        s"10 appends should fold below 10 files, got ${fileCount(dir)}")
      // exactness: every row still there exactly once
      val got = spark.read.format("qbeast").load(dir)
      assert(got.count() == 5000)
      assert(got.select(countDistinct(col("id"))).head().getLong(0) == 5000)
    } finally spark.conf.unset("spark.qbeast.autoCompact.minNumFiles")
  }

  test("disabled (or turned off) tables never auto-compact") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("autocompact-off")
    spark.conf.set("spark.qbeast.autoCompact.minNumFiles", "2")
    try {
      (1 to 200).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
        .write.format("qbeast").option("columnsToIndex", "id").save(dir)
      (1 to 4).foreach { b =>
        (1 to 200).map(i => ((b * 1000 + i).toLong, i * 2.0)).toDF("id", "v")
          .write.format("qbeast").mode("append").save(dir)
      }
      assert(QTablesTestAccess.operations(dir, spark).count(_ == "OPTIMIZE") == 0)

      // enable, confirm it fires, then turn off and confirm it stops
      (1 to 200).map(i => (5000L + i, i * 2.0)).toDF("id", "v")
        .write.format("qbeast").mode("append")
        .option("autoCompact", "true").save(dir)
      val afterOn = QTablesTestAccess.operations(dir, spark).count(_ == "OPTIMIZE")
      assert(afterOn >= 1)
      (1 to 200).map(i => (6000L + i, i * 2.0)).toDF("id", "v")
        .write.format("qbeast").mode("append")
        .option("autoCompact", "false").save(dir)
      assert(!history(dir).configuration.contains("qbeast.autoCompact"))
      (1 to 200).map(i => (7000L + i, i * 2.0)).toDF("id", "v")
        .write.format("qbeast").mode("append").save(dir)
      assert(QTablesTestAccess.operations(dir, spark).count(_ == "OPTIMIZE") == afterOn)
    } finally spark.conf.unset("spark.qbeast.autoCompact.minNumFiles")
  }

  test("progress guard: files at their natural rollup size never re-compact") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("autocompact-guard")
    spark.conf.set("spark.qbeast.autoCompact.minNumFiles", "4")
    try {
      // cubeSize 1000 over 20k rows → ~20 files of ~1000-2000 rows,
      // all permanently under the 32 MiB size threshold: a size-only
      // trigger would rewrite the whole table on EVERY commit, forever
      (1 to 20000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
        .write.format("qbeast")
        .option("columnsToIndex", "id")
        .option("cubeSize", "1000")
        .option("autoCompact", "true")
        .save(dir)
      val before = fileCount(dir)
      (1 to 3).foreach { b =>
        (1 to 1000).map(i => ((100000 + b * 2000 + i).toLong, 1.0)).toDF("id", "v")
          .write.format("qbeast").mode("append").option("cubeSize", "1000").save(dir)
      }
      // appends may compact THEIR OWN small batch files, but must not
      // keep rewriting the settled base: at most one OPTIMIZE per
      // append-wave, and the base file count cannot balloon
      val opts = QTablesTestAccess.operations(dir, spark).count(_ == "OPTIMIZE")
      assert(opts <= 1, s"settled files must not churn: $opts OPTIMIZE commits")
      assert(spark.read.format("qbeast").load(dir).count() == 23000)
    } finally spark.conf.unset("spark.qbeast.autoCompact.minNumFiles")
  }

  test("streaming sink ingestion stays compacted") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("autocompact-stream")
    val ckpt = TestSpark.tmpDir("autocompact-ckpt")
    spark.conf.set("spark.qbeast.autoCompact.minNumFiles", "4")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
      val q = mem.toDS().toDF("id", "v").writeStream.format("qbeast")
        .option("checkpointLocation", ckpt)
        .option("columnsToIndex", "id")
        .option("autoCompact", "true")
        .option("path", dir)
        .start()
      try {
        (0 until 8).foreach { b =>
          mem.addData((1 to 100).map(i => ((b * 1000 + i).toLong, i * 1.0)): _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      assert(spark.read.format("qbeast").load(dir).count() == 800)
      assert(fileCount(dir) < 8,
        s"8 micro-batches should stay compacted, got ${fileCount(dir)} files")
      assert(QTablesTestAccess.operations(dir, spark).count(_ == "OPTIMIZE") >= 1)
    } finally spark.conf.unset("spark.qbeast.autoCompact.minNumFiles")
  }

}

/** Commit operations of a table's history, oldest→newest. */
object QTablesTestAccess {
  def operations(dir: String, spark: org.apache.spark.sql.SparkSession): Seq[String] =
    graft.table.QbeastTable.forPath(spark, dir).history().map(_.operation)
}
