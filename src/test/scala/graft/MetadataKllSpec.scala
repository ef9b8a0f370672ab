package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file KLL quantile-sketch states (`kllColumns` write option) and
 * the metadata-only approximate quantiles folded from them
 * (QbeastTable.approxQuantile). Within capacity the fold must equal the
 * exact sorted-rank quantile (= DuckDB quantile_disc — the q95 oracle
 * pins that externally); past capacity the rank error must stay inside
 * the KLL bound. */
class MetadataKllSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Qs = Seq(0.5, 0.9, 0.99)

  private def write(tbl: String, extra: Map[String, String] = Map.empty): Unit = {
    val w = spark.read.parquet(s"$sf/documents.parquet")
      .write.format("qbeast")
      .option("columnsToIndex", "doc_id").option("cubeSize", "100")
      .option("kllColumns", "n_chars").option("kllK", "8192")
    extra.foreach { case (k, v) => w.option(k, v) }
    w.mode("overwrite").save(tbl)
  }

  /** The sketch's (and quantile_disc's) exact extraction: smallest value
   * whose 1-based sorted rank reaches max(1, ceil(q·n)). */
  private def exactQuantiles(values: Seq[Double], qs: Seq[Double]): Seq[Double] = {
    val sorted = values.sorted
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * sorted.length).toLong)
      sorted((target - 1).toInt)
    }
  }

  private def nChars(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    df.select(col("n_chars").cast("double")).na.drop().collect().map(_.getDouble(0)).toSeq

  test("within capacity the metadata fold equals the exact quantile") {
    val tbl = TestSpark.tmpDir("kll-meta")
    write(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val got = t.approxQuantile("n_chars", Qs).getOrElse(fail("fold bailed"))
    val want = exactQuantiles(nChars(spark.read.parquet(s"$sf/documents.parquet")), Qs)
    assert(got == want, s"$got != $want")
  }

  test("append inherits kllColumns/kllK from the table config; union still exact") {
    val tbl = TestSpark.tmpDir("kll-meta-append")
    write(tbl)
    // append WITHOUT re-specifying the options (table-property discipline)
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("n_chars", col("n_chars") + lit(1))
      .write.format("qbeast").mode("append").save(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val got = t.approxQuantile("n_chars", Qs).getOrElse(fail("fold bailed after append"))
    val want = exactQuantiles(nChars(spark.read.format("qbeast").load(tbl)), Qs)
    assert(got == want)
  }

  test("optimize rebuilds states; the exact-regime fold is unchanged") {
    val tbl = TestSpark.tmpDir("kll-meta-opt")
    write(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val before = t.approxQuantile("n_chars", Qs).get
    t.optimize()
    assert(t.approxQuantile("n_chars", Qs).get == before,
      "within capacity, repacking rows across files must not change the fold")
  }

  test("bails to None on masked tables, columns without states, and turn-off") {
    val tbl = TestSpark.tmpDir("kll-meta-bail")
    write(tbl, Map("deletionVectors" -> "true"))
    val t = table.QbeastTable.forPath(spark, tbl)
    assert(t.approxQuantile("doc_id", Qs).isEmpty, "doc_id has no states")
    assert(t.approxQuantile("nope", Qs).isEmpty, "unknown column")
    // dv mask: deleted rows still sit in the states — must bail
    assert(t.delete("doc_id % 7 = 3") > 0)
    assert(t.approxQuantile("n_chars", Qs).isEmpty, "masked table must bail")
    // a post-turn-off file without states must bail the fold
    val tbl2 = TestSpark.tmpDir("kll-meta-off")
    write(tbl2)
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("doc_id", col("doc_id") + 500000L)
      .write.format("qbeast").option("kllColumns", "")
      .mode("append").save(tbl2)
    assert(table.QbeastTable.forPath(spark, tbl2).approxQuantile("n_chars", Qs).isEmpty)
  }

  test("distributed state fold through the checkpoint sidecar equals the flat fold") {
    val tbl = TestSpark.tmpDir("kll-meta-dist")
    write(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val flat = t.approxQuantile("n_chars", Qs).get
    // force a parquet sidecar so the fold routes through
    // DistributedMetadata.kllState, then append a tail commit the fold
    // must overlay from the log (within capacity both folds are the
    // exact union sketch, so extraction must agree exactly)
    spark.conf.set("spark.qbeast.metadata.sidecar.minFiles", "0")
    try {
      t.checkpoint()
      assert(graft.log.DistributedMetadata.usable(spark,
        graft.log.QbeastLog.lightSnapshot(tbl, spark.sparkContext.hadoopConfiguration)),
        "fixture must exercise the sidecar path")
      assert(t.approxQuantile("n_chars", Qs).get == flat,
        "sidecar fold must equal the flat fold")
      spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("doc_id", col("doc_id") + 900000L)
        .withColumn("n_chars", col("n_chars") + lit(2))
        .write.format("qbeast").mode("append").save(tbl)
      val want = exactQuantiles(nChars(spark.read.format("qbeast").load(tbl)), Qs)
      assert(t.approxQuantile("n_chars", Qs).get == want,
        "sidecar + tail overlay must equal the exact quantile")
    } finally spark.conf.unset("spark.qbeast.metadata.sidecar.minFiles")
  }

  test("filtered folds answer on proof-aligned predicates, bail on straddlers") {
    import spark.implicits._
    val tbl = TestSpark.tmpDir("kll-meta-filtered")
    // two boundary-aligned appends: a in [1,100] then [101,200]
    def write(lo: Int, hi: Int, mode: String): Unit =
      (lo to hi).map(i => (i.toLong, i * 2.0)).toDF("a", "v")
        .write.format("qbeast").option("columnsToIndex", "a")
        .option("cubeSize", "50")
        .option("kllColumns", "v").option("kllK", "1024")
        .option("hllColumns", "a").mode(mode).save(tbl)
    write(1, 100, "error")
    write(101, 200, "append")
    val t = table.QbeastTable.forPath(spark, tbl)

    // aligned predicate: every file proves — exact quantiles of the half
    val got = t.approxQuantile("v", Qs, "a <= 100").getOrElse(fail("bailed"))
    assert(got == exactQuantiles((1 to 100).map(_ * 2.0), Qs))
    // HLL twin: the folded registers equal the full-scan sketch of the half
    val est = t.approxCountDistinct("a", "a <= 100").getOrElse(fail("bailed"))
    val want = ops.Sketch.hllDistinct(
      spark.range(1, 101).select(lit(1).as("g"), col("id").cast("long").as("a")),
      "g", col("a").cast("string")).head()
    assert(est.scaled == want.getLong(2) && est.zeros == want.getLong(3))
    // straddling predicate: some file can't decide — bail, never guess
    assert(t.approxQuantile("v", Qs, "a <= 50").isEmpty)
    assert(t.approxCountDistinct("a", "a <= 50").isEmpty)
    // FALSE-everywhere predicate: no surviving state — None, not NaN
    assert(t.approxQuantile("v", Qs, "a > 1000").isEmpty)
    // subquery predicates can't be proved from stats: must BAIL, never
    // silently answer for the whole table (the semi-join-rewrite trap)
    spark.range(1, 51).toDF("id").createOrReplaceTempView("kll_keys")
    assert(t.approxQuantile("v", Qs, "a IN (SELECT id FROM kll_keys)").isEmpty)
    assert(t.approxCountDistinct("a", "a IN (SELECT id FROM kll_keys)").isEmpty)
    // a malformed predicate throws (None is reserved for "can't answer")
    intercept[org.apache.spark.sql.AnalysisException] {
      t.approxQuantile("v", Qs, "no_such_column > 5")
    }
  }

  test("filtered folds run through the checkpoint sidecar and overlay the tail") {
    import spark.implicits._
    val tbl = TestSpark.tmpDir("kll-meta-filtered-dist")
    def write(lo: Int, hi: Int, mode: String): Unit =
      (lo to hi).map(i => (i.toLong, i * 2.0)).toDF("a", "v")
        .write.format("qbeast").option("columnsToIndex", "a")
        .option("cubeSize", "50")
        .option("kllColumns", "v").option("kllK", "1024")
        .option("hllColumns", "a").mode(mode).save(tbl)
    write(1, 100, "error")
    write(101, 200, "append")
    val t = table.QbeastTable.forPath(spark, tbl)
    val flatQ = t.approxQuantile("v", Qs, "a <= 100").getOrElse(fail("flat bailed"))
    val flatH = t.approxCountDistinct("a", "a <= 100").getOrElse(fail("flat bailed"))
    // force a parquet sidecar so the filtered folds route the proofs +
    // state merge through ONE Spark job over the checkpoint
    // (DistributedMetadata.filteredKllState / filteredHllRegisters)
    spark.conf.set("spark.qbeast.metadata.sidecar.minFiles", "0")
    try {
      t.checkpoint()
      val light = graft.log.QbeastLog.lightSnapshot(
        tbl, spark.sparkContext.hadoopConfiguration)
      assert(!light.filesComplete &&
        graft.log.DistributedMetadata.usable(spark, light),
        "fixture must exercise the sidecar path")
      assert(t.approxQuantile("v", Qs, "a <= 100").contains(flatQ),
        "sidecar filtered fold must equal the flat fold")
      val est = t.approxCountDistinct("a", "a <= 100").getOrElse(fail("bailed"))
      assert(est == flatH, "sidecar filtered HLL fold must equal the flat fold")
      // straddling predicate still bails at sidecar scale — the proofs
      // run executor-side but keep the same tri-state discipline
      assert(t.approxQuantile("v", Qs, "a <= 50").isEmpty)
      assert(t.approxCountDistinct("a", "a <= 50").isEmpty)
      // tail-only selection: every BULK file is FALSE-proved (zero
      // states come back from the job) and the post-checkpoint tail
      // supplies the whole answer driver-side
      write(201, 300, "append")
      assert(t.approxQuantile("v", Qs, "a > 200")
        .contains(exactQuantiles((201 to 300).map(_ * 2.0), Qs)),
        "tail-only filtered fold must answer from the tail states")
      // spanning predicate: bulk job + tail overlay together
      assert(t.approxQuantile("v", Qs, "a >= 1")
        .contains(exactQuantiles((1 to 300).map(_ * 2.0), Qs)),
        "bulk + tail filtered fold must equal the exact quantile")
    } finally spark.conf.unset("spark.qbeast.metadata.sidecar.minFiles")
  }

  test("non-numeric kllColumns are rejected at write") {
    val tbl = TestSpark.tmpDir("kll-meta-reject")
    val ex = intercept[IllegalArgumentException] {
      spark.read.parquet(s"$sf/documents.parquet")
        .write.format("qbeast")
        .option("columnsToIndex", "doc_id").option("cubeSize", "100")
        .option("kllColumns", "text").mode("overwrite").save(tbl)
    }
    assert(ex.getMessage.contains("kllColumns"))
  }

  test("past capacity the folded estimate stays inside the rank-error bound") {
    val tbl = TestSpark.tmpDir("kll-meta-big")
    val n = 20000
    // deterministic scrambled ordering so files hold mixed value ranges
    (0 until n).map(i => ((i * 2654435761L) % n, ((i * 48271) % n).toDouble))
      .toDF("id", "v")
      .write.format("qbeast")
      .option("columnsToIndex", "id").option("cubeSize", "1000")
      .option("kllColumns", "v").option("kllK", "256")
      .mode("overwrite").save(tbl)
    val t = table.QbeastTable.forPath(spark, tbl)
    val got = t.approxQuantile("v", Qs).getOrElse(fail("fold bailed"))
    // v is a permutation of 0..n-1, so a value's rank is value+1
    Qs.zip(got).foreach { case (q, est) =>
      val rankErr = math.abs((est + 1.0) / n - q)
      assert(rankErr <= 0.05, s"q=$q est=$est rank error $rankErr > 5%")
    }
  }

}
