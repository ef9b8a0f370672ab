package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file HLL register stats (`hllColumns` write option) and the
 * metadata-only approximate distinct count folded from them. The
 * register union across files must be BIT-IDENTICAL to one sketch over
 * all rows (elementwise max is associative over any row partition) —
 * the q93 oracle pins that end-to-end against DuckDB. */
class MetadataHllSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def write(tbl: String, extra: Map[String, String] = Map.empty): Unit = {
    val w = spark.read.parquet(s"$sf/documents.parquet")
      .write.format("qbeast")
      .option("columnsToIndex", "doc_id").option("cubeSize", "100")
      .option("hllColumns", "text,source")
    extra.foreach { case (k, v) => w.option(k, v) }
    w.mode("overwrite").save(tbl)
  }

  test("metadata fold equals the full-scan sketch bit-for-bit") {
    val tbl = TestSpark.tmpDir("hll-meta")
    write(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (c <- Seq("text", "source")) {
      val got = t.approxCountDistinct(c).getOrElse(fail(s"no fold for $c"))
      val want = ops.Sketch.hllDistinct(docs.withColumn("g", lit(1)), "g", col(c))
        .head()
      assert(got.est == want.getDouble(1) && got.scaled == want.getLong(2) &&
        got.zeros == want.getLong(3), s"column $c diverged")
    }
  }

  test("append inherits hllColumns from the table config and the union still folds") {
    val tbl = TestSpark.tmpDir("hll-meta-append")
    write(tbl)
    // append WITHOUT re-specifying the option (table-property discipline)
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" appended-run")))
      .write.format("qbeast").mode("append").save(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val both = spark.read.format("qbeast").load(tbl)
    val want = ops.Sketch.hllDistinct(both.withColumn("g", lit(1)), "g", col("text"))
      .head()
    val got = t.approxCountDistinct("text").getOrElse(fail("no fold after append"))
    assert(got.scaled == want.getLong(2) && got.zeros == want.getLong(3))
  }

  test("optimize rebuilds registers; the fold survives compaction") {
    val tbl = TestSpark.tmpDir("hll-meta-opt")
    write(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val before = t.approxCountDistinct("text").get
    t.optimize()
    val after = t.approxCountDistinct("text").get
    assert(after.scaled == before.scaled && after.zeros == before.zeros,
      "compaction must not change the folded register state")
  }

  test("distributed register fold through the checkpoint sidecar equals the flat fold") {
    val tbl = TestSpark.tmpDir("hll-meta-dist")
    write(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val flat = t.approxCountDistinct("text").get
    // force a parquet sidecar so lightSnapshot routes the fold through
    // DistributedMetadata.hllRegisters (a Spark job over the sidecar),
    // then append a tail commit the fold must overlay from the log
    spark.conf.set("spark.qbeast.metadata.sidecar.minFiles", "0")
    try {
      t.checkpoint()
      assert(graft.log.DistributedMetadata.usable(spark,
        graft.log.QbeastLog.lightSnapshot(tbl, spark.sparkContext.hadoopConfiguration)),
        "fixture must exercise the sidecar path")
      assert(t.approxCountDistinct("text").get == flat,
        "sidecar fold must equal the flat fold")
      spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("doc_id", col("doc_id") + 900000L)
        .withColumn("text", concat(col("text"), lit(" tail-run")))
        .write.format("qbeast").mode("append").save(tbl)
      val both = spark.read.format("qbeast").load(tbl)
      val want = ops.Sketch.hllDistinct(both.withColumn("g", lit(1)), "g", col("text"))
        .head()
      val got = t.approxCountDistinct("text").get
      assert(got.scaled == want.getLong(2) && got.zeros == want.getLong(3),
        "sidecar + tail overlay must equal the full-scan sketch")
    } finally spark.conf.unset("spark.qbeast.metadata.sidecar.minFiles")
  }

  test("bails to None on masked tables, columns without registers, and turn-off") {
    val tbl = TestSpark.tmpDir("hll-meta-bail")
    write(tbl, Map("deletionVectors" -> "true"))
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.approxCountDistinct("lang").isEmpty, "lang has no registers")
    assert(t.approxCountDistinct("nope").isEmpty, "unknown column")
    // dv mask: deleted rows still sit in the registers — must bail
    assert(t.delete("doc_id % 7 = 3") > 0)
    assert(t.approxCountDistinct("text").isEmpty, "masked table must bail")
    // a table written with the option explicitly OFF has no registers
    val tbl2 = TestSpark.tmpDir("hll-meta-off")
    write(tbl2)
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("doc_id", col("doc_id") + 500000L)
      .write.format("qbeast").option("hllColumns", "")
      .mode("append").save(tbl2)
    assert(table.QbeastTable.forPath(spark, tbl2).approxCountDistinct("text").isEmpty,
      "a post-turn-off file without registers must bail the fold")
  }

}
