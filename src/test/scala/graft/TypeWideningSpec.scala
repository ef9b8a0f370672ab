package graft

import graft.core.model.{ColumnMapping, TypeWidening}
import graft.table.QbeastTable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Type widening: `ALTER TABLE ... ALTER COLUMN ... TYPE <wider>` as a
 * metadata-only commit (the Delta `typeWidening` design — see
 * [[graft.core.model.TypeWidening]] for the probe-verified matrix).
 * Covers: reads/appends/DML across the widen, the narrow-incoming
 * upcast, mergeSchema auto-widen, the era gates (min/max stats on a
 * unit change, bloom false-negatives, HLL/KLL fold bails), metadata
 * folds, time travel + RESTORE, CDF, the SQL surface, and the refusal
 * matrix (narrowing, long→double, hash-indexed, indexed date→ts).
 */
class TypeWideningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  /** k (long, indexed) over 4+ files; a int payload; f float payload. */
  private def freshTable(prefix: String, extra: Map[String, String] = Map.empty): String = {
    val dir = TestSpark.tmpDir(prefix)
    val w = (0 until 1000).map(i => (i.toLong, i, i.toFloat / 2))
      .toDF("k", "a", "f")
      .repartition(4)
      .write.format("qbeast")
      .option("columnsToIndex", "k").option("cubeSize", "100")
    extra.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save(dir)
    dir
  }

  test("widen int->long: metadata-only commit; reads, appends past Int.MaxValue, pruning") {
    val dir = freshTable("tw-roundtrip")
    val t = QbeastTable.forPath(spark, dir)
    val filesBefore = t.snapshot.files.map(_.path).toSet
    val vBefore = t.snapshot.version
    t.widenColumn("a", LongType)
    val s = t.snapshot
    assert(s.version == vBefore + 1)
    assert(s.files.map(_.path).toSet == filesBefore, "widen must not rewrite data")
    val field = s.schema.get.fields.find(_.name == "a").get
    assert(field.dataType == LongType)
    val hist = TypeWidening.typeChanges(field)
    assert(hist.map(c => (c.from, c.to)) == Seq((IntegerType, LongType)))
    // old narrow files read under the wide schema, values preserved
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema("a").dataType == LongType)
    assert(back.select(sum("a")).as[Long].head() == (0 until 1000).map(_.toLong).sum)
    // append values no int can hold
    (0 until 10).map(i => (2000L + i, Int.MaxValue.toLong + 1 + i, 9.0f))
      .toDF("k", "a", "f").write.format("qbeast").mode("append").save(dir)
    val all = spark.read.format("qbeast").load(dir)
    assert(all.count() == 1010)
    assert(all.filter(col("a") > Int.MaxValue.toLong).count() == 10)
    // wide-literal filter over MIXED-era files finds narrow-era rows too
    assert(all.filter(col("a") === 500L).count() == 1)
    // OTree pruning on the indexed column is untouched
    assert(filesRead(all.filter(col("k") < 50L)) < filesRead(all))
    assert(t.verifyIntegrity().isEmpty)
  }

  test("widen float->double and decimal growth roundtrip") {
    val dir = freshTable("tw-f2d")
    val t = QbeastTable.forPath(spark, dir)
    t.widenColumn("f", DoubleType)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema("f").dataType == DoubleType)
    // float values upcast exactly (float is a subset of double)
    assert(back.filter(col("f") === lit(250.5f.toDouble)).count() == 1)

    // decimal growth: write decimal(5,2), widen to decimal(12,4)
    val dir2 = TestSpark.tmpDir("tw-dec")
    (0 until 100).map(i => (i.toLong, BigDecimal(i) / 4))
      .toDF("k", "d").select(col("k"), col("d").cast(DecimalType(5, 2)).as("d"))
      .write.format("qbeast").option("columnsToIndex", "k").option("cubeSize", "50")
      .save(dir2)
    val t2 = QbeastTable.forPath(spark, dir2)
    t2.widenColumn("d", DecimalType(12, 4))
    val b2 = spark.read.format("qbeast").load(dir2)
    assert(b2.schema("d").dataType == DecimalType(12, 4))
    assert(b2.filter(col("d") === lit(BigDecimal("2.25"))).count() == 1)

    // int->decimal: stats become type-ineligible, reads stay correct
    val t3 = QbeastTable.forPath(spark, dir)
    t3.widenColumn("a", DecimalType(12, 0))
    val b3 = spark.read.format("qbeast").load(dir)
    assert(b3.schema("a").dataType == DecimalType(12, 0))
    assert(b3.filter(col("a") > lit(995)).count() == 4)
  }

  test("refusal matrix: narrowing, long->double, unknown column, hash-indexed, indexed date->ts") {
    val dir = freshTable("tw-refuse")
    val t = QbeastTable.forPath(spark, dir)
    // narrowing (k is long)
    val e1 = intercept[UnsupportedOperationException] { t.widenColumn("k", IntegerType) }
    assert(e1.getMessage.contains("cannot change column k"), e1.getMessage)
    // long->double fails in BOTH parquet readers (probe-verified)
    val e2 = intercept[UnsupportedOperationException] { t.widenColumn("k", DoubleType) }
    assert(e2.getMessage.contains("cannot change column k"), e2.getMessage)
    // unknown column names the schema
    val e3 = intercept[IllegalArgumentException] { t.widenColumn("zzz", LongType) }
    assert(e3.getMessage.contains("does not exist"), e3.getMessage)
    // decimal target too small for the reader (needs >= 10 integer digits)
    val e4 = intercept[UnsupportedOperationException] {
      t.widenColumn("a", DecimalType(5, 0))
    }
    assert(e4.getMessage.contains("cannot change column a"), e4.getMessage)
    // the no-op converges silently (retried ALTER)
    val v = t.snapshot.version
    t.widenColumn("k", LongType)
    assert(t.snapshot.version == v)

    // hash-indexed column: the recorded transformation hashes lookup
    // literals at the narrow type
    val dirH = TestSpark.tmpDir("tw-hash")
    (0 until 200).map(i => (i, s"s$i")).toDF("h", "s")
      .write.format("qbeast").option("columnsToIndex", "h:hashing")
      .option("cubeSize", "50").save(dirH)
    val tH = QbeastTable.forPath(spark, dirH)
    val eH = intercept[UnsupportedOperationException] { tH.widenColumn("h", LongType) }
    assert(eH.getMessage.contains("hash-indexed"), eH.getMessage)

    // indexed date column: canonical coordinates are DAYS, timestamp
    // predicates MICROS
    val dirD = TestSpark.tmpDir("tw-dateidx")
    (0 until 200).map(i => (java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"), i))
      .toDF("d", "x")
      .write.format("qbeast").option("columnsToIndex", "d").option("cubeSize", "50")
      .save(dirD)
    val tD = QbeastTable.forPath(spark, dirD)
    val eD = intercept[UnsupportedOperationException] {
      tD.widenColumn("d", TimestampNTZType)
    }
    assert(eD.getMessage.contains("indexed"), eD.getMessage)
  }

  test("date->timestamp_ntz (non-indexed): unit change gates min/max pruning") {
    val dir = TestSpark.tmpDir("tw-date")
    (0 until 400).map(i => (i.toLong, java.sql.Date.valueOf(f"2024-${i % 12 + 1}%02d-15")))
      .toDF("k", "d")
      .repartition(4)
      .write.format("qbeast").option("columnsToIndex", "k").option("cubeSize", "100")
      .save(dir)
    val t = QbeastTable.forPath(spark, dir)
    t.widenColumn("d", TimestampNTZType)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema("d").dataType == TimestampNTZType)
    assert(back.count() == 400)
    // the predicate literal is MICROS; old stats are DAYS (a tiny
    // number) — without the era gate maxAbove would prune EVERY file
    // and the count would be 0
    val got = back
      .filter(col("d") >= lit("2024-06-01").cast(TimestampNTZType)).count()
    val want = (0 until 400).count(i => i % 12 + 1 >= 6)
    assert(got == want.toLong, s"era-gated stats pruning lost rows: $got vs $want")
    // metadata min/max folds bail rather than misreport: the answer
    // must come from a scan and be correct
    val mx = back.agg(max("d")).collect()(0).get(0)
    assert(mx != null && mx.toString.startsWith("2024-12-15"))
  }

  test("bloom era gate: equality on a widened column still finds narrow-era rows") {
    val dir = freshTable("tw-bloom", Map("bloomFilterColumns" -> "a"))
    val t = QbeastTable.forPath(spark, dir)
    t.widenColumn("a", LongType)
    val back = spark.read.format("qbeast").load(dir)
    // the literal hashes as LONG; the per-file blooms were built with
    // INT hashes — without the gate this is a false negative that
    // PRUNES the row's file
    assert(back.filter(col("a") === 123L).count() == 1,
      "bloom filter false-negative on a widened column")
    // in-list too (the other bloom-probing shape)
    assert(back.filter(col("a").isin(7L, 123L, 999L)).count() == 3)
  }

  test("HLL/KLL era gates: integral widens keep folding, unit change bails") {
    val dir = TestSpark.tmpDir("tw-sketch")
    (0 until 500).map(i => (i.toLong, i % 97, java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d")))
      .toDF("k", "a", "d")
      .repartition(2)
      .write.format("qbeast").option("columnsToIndex", "k").option("cubeSize", "200")
      .option("hllColumns", "a,d").option("kllColumns", "a,d").save(dir)
    val t = QbeastTable.forPath(spark, dir)
    val hllBefore = t.approxCountDistinct("a")
    assert(hllBefore.nonEmpty)
    val kllBefore = t.approxQuantile("a", Seq(0.5))
    assert(kllBefore.nonEmpty)
    // int->long: the HLL key renders CAST(col AS STRING) — identical
    // digits either way — and the KLL state stores doubles: both folds
    // keep answering, bit-identically
    t.widenColumn("a", LongType)
    assert(t.approxCountDistinct("a") == hllBefore)
    assert(t.approxQuantile("a", Seq(0.5)) == kllBefore)
    // date->timestamp_ntz: days vs micros — both folds must bail
    assert(t.approxCountDistinct("d").nonEmpty)
    assert(t.approxQuantile("d", Seq(0.5)).nonEmpty)
    t.widenColumn("d", TimestampNTZType)
    assert(t.approxCountDistinct("d").isEmpty, "HLL fold must bail after a unit change")
    assert(t.approxQuantile("d", Seq(0.5)).isEmpty, "KLL fold must bail after a unit change")
    // the gated column does not gate its NEIGHBOR
    assert(t.approxCountDistinct("a").nonEmpty)
  }

  test("metadata min/max fold answers correctly across an int->long widen") {
    val dir = freshTable("tw-fold")
    val t = QbeastTable.forPath(spark, dir)
    t.widenColumn("a", LongType)
    (0 until 5).map(i => (3000L + i, Int.MaxValue.toLong + 10 + i, 1.0f))
      .toDF("k", "a", "f").write.format("qbeast").mode("append").save(dir)
    // min/max over MIXED eras: narrow-era JSON ints fold into the wide
    // type exactly (BigDecimal -> Long)
    val row = spark.read.format("qbeast").load(dir)
      .agg(count(lit(1)), min("a"), max("a")).collect()(0)
    assert(row.getLong(0) == 1005L)
    assert(row.getLong(1) == 0L)
    assert(row.getLong(2) == Int.MaxValue.toLong + 14)
  }

  test("DML across the widen: wide-literal DELETE and UPDATE touch the right rows") {
    val dir = freshTable("tw-dml")
    val t = QbeastTable.forPath(spark, dir)
    t.widenColumn("a", LongType)
    (0 until 10).map(i => (5000L + i, Int.MaxValue.toLong + 1 + i, 1.0f))
      .toDF("k", "a", "f").write.format("qbeast").mode("append").save(dir)
    // delete exactly the wide-era rows
    t.delete(s"a > ${Int.MaxValue.toLong}")
    assert(spark.read.format("qbeast").load(dir).count() == 1000)
    // equality DELETE on the bloom-less widened column still hits the
    // narrow-era row (classifyDeleteByStats + scan fallback both sound)
    t.delete("a = 123")
    val rest = spark.read.format("qbeast").load(dir)
    assert(rest.count() == 999)
    assert(rest.filter(col("a") === 123L).count() == 0)
    // update through the wide type
    t.update("a = 7", Map("a" -> "7000000000"))
    assert(spark.read.format("qbeast").load(dir)
      .filter(col("a") === 7000000000L).count() == 1)
  }

  test("mergeSchema auto-widen; enforced append refuses with the option named") {
    val dir = freshTable("tw-merge")
    // wider incoming WITHOUT mergeSchema: refuse, name the fix
    val e = intercept[Exception] {
      Seq((9999L, 1L << 40, 1.0f)).toDF("k", "a", "f")
        .write.format("qbeast").mode("append").save(dir)
    }
    assert(e.getMessage.contains("mergeSchema"), e.getMessage)
    // with mergeSchema: the table column widens, history recorded
    Seq((9999L, 1L << 40, 1.0f)).toDF("k", "a", "f")
      .write.format("qbeast").mode("append").option("mergeSchema", "true").save(dir)
    val t = QbeastTable.forPath(spark, dir)
    val f = t.snapshot.schema.get.fields.find(_.name == "a").get
    assert(f.dataType == LongType)
    assert(TypeWidening.typeChanges(f).map(c => (c.from, c.to)) ==
      Seq((IntegerType, LongType)))
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 1001)
    assert(back.filter(col("a") === (1L << 40)).count() == 1)
    // NARROW incoming after the widen upcasts silently (no option needed)
    Seq((10000L, 42, 2.0f)).toDF("k", "a", "f")
      .write.format("qbeast").mode("append").save(dir)
    assert(spark.read.format("qbeast").load(dir).count() == 1002)
    assert(spark.read.format("qbeast").load(dir)
      .filter(col("k") === 10000L).select("a").as[Long].head() == 42L)
  }

  test("mergeSchema auto-widen applies the SAME index guards as the explicit ALTER") {
    // hash-indexed column: an auto-widen would hash new rows at LONG
    // while the recorded transformation hashes lookup literals at INT —
    // silent lookup misses. The append must refuse exactly like
    // widenColumn does.
    val dirH = TestSpark.tmpDir("tw-merge-hash")
    (0 until 200).map(i => (i, s"s$i")).toDF("h", "s")
      .write.format("qbeast").option("columnsToIndex", "h:hashing")
      .option("cubeSize", "50").save(dirH)
    val eH = intercept[Exception] {
      Seq((1L << 40, "wide")).toDF("h", "s")
        .write.format("qbeast").mode("append")
        .option("mergeSchema", "true").save(dirH)
    }
    assert(eH.getMessage.contains("hash-indexed"), eH.getMessage)
    // table untouched after the refusal
    assert(spark.read.format("qbeast").load(dirH).schema("h").dataType == IntegerType)
    assert(spark.read.format("qbeast").load(dirH).count() == 200)

    // indexed DATE column: auto-widen to TIMESTAMP_NTZ would flip the
    // canonical coordinate unit (days -> micros)
    val dirD = TestSpark.tmpDir("tw-merge-dateidx")
    (0 until 100).map(i => (java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"), i))
      .toDF("d", "x")
      .write.format("qbeast").option("columnsToIndex", "d").option("cubeSize", "50")
      .save(dirD)
    val eD = intercept[Exception] {
      Seq((java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 1))
        .toDF("d", "x").select(col("d").cast(TimestampNTZType).as("d"), col("x"))
        .write.format("qbeast").mode("append")
        .option("mergeSchema", "true").save(dirD)
    }
    assert(eD.getMessage.contains("indexed"), eD.getMessage)
    assert(spark.read.format("qbeast").load(dirD).count() == 100)
  }

  test("time travel reads each version under ITS type; RESTORE rolls the widen back") {
    val dir = freshTable("tw-tt")
    val t = QbeastTable.forPath(spark, dir)
    val v0 = t.snapshot.version
    t.widenColumn("a", LongType)
    (0 until 5).map(i => (8000L + i, Int.MaxValue.toLong + i + 1, 1.0f))
      .toDF("k", "a", "f").write.format("qbeast").mode("append").save(dir)
    // pre-widen version: narrow schema, original rows only
    val old = spark.read.format("qbeast").option("versionAsOf", v0).load(dir)
    assert(old.schema("a").dataType == IntegerType)
    assert(old.count() == 1000)
    // head: wide schema, both eras
    assert(spark.read.format("qbeast").load(dir).count() == 1005)
    // RESTORE to pre-widen: schema narrow again, wide rows gone
    t.restoreToVersion(v0)
    val restored = spark.read.format("qbeast").load(dir)
    assert(restored.schema("a").dataType == IntegerType)
    assert(restored.count() == 1000)
    assert(t.verifyIntegrity().isEmpty)
  }

  test("CDF: changes() replays narrow-era commits under the END version's wide schema") {
    val dir = freshTable("tw-cdf")
    val t = QbeastTable.forPath(spark, dir)
    t.widenColumn("a", LongType)
    (0 until 3).map(i => (9000L + i, Int.MaxValue.toLong + i + 1, 1.0f))
      .toDF("k", "a", "f").write.format("qbeast").mode("append").save(dir)
    t.delete("a = 5")
    val feed = t.changes(0)
    assert(feed.schema("a").dataType == LongType)
    val inserts = feed.filter(col("_change_type") === "insert")
    val deletes = feed.filter(col("_change_type") === "delete")
    // initial write (1000) + append (3) insert; the copy-on-write
    // delete's survivor rows cancel in the EXCEPT ALL — net one delete
    assert(inserts.count() == 1003)
    assert(deletes.count() == 1)
    // the narrow-era deleted row replays with its value intact, as long
    assert(deletes.select("a").as[Long].head() == 5L)
  }

  test("RESTORE past a widen: CDF ranges crossing the wide era refuse NAMED") {
    // found by the r16 fuzz soak (seed 20260825, seq 34): widen ->
    // wide-era DML -> RESTORE to v0 narrows the end schema, and a
    // changes() range crossing the wide era would crash mid-scan
    // reading INT64 footers as date. It must refuse with the range and
    // columns NAMED instead (Delta refuses read-incompatible CDF
    // ranges the same way).
    val dir = freshTable("tw-regress")
    val t = QbeastTable.forPath(spark, dir)
    val v0 = t.snapshot.version
    t.widenColumn("a", LongType)
    (0 until 4).map(i => (7000L + i, Int.MaxValue.toLong + i + 1, 1.0f))
      .toDF("k", "a", "f").write.format("qbeast").mode("append").save(dir)
    val vWide = t.snapshot.version
    // inside the wide era the feed works and reads wide values
    assert(t.changes(0, vWide).filter(col("a") > Int.MaxValue.toLong).count() == 4)
    t.restoreToVersion(v0)
    val head = t.snapshot.version
    // crossing the wide era with a NARROW end schema: named refusal
    val e = intercept[UnsupportedOperationException] { t.changes(0, head).collect() }
    assert(e.getMessage.contains("crosses a type change"), e.getMessage)
    // the restore commit ITSELF is refused too: its delete feed is the
    // wide-era before-image, not expressible under the narrow schema
    // (the removed files' footers are INT64 — only column pruning would
    // hide the crash)
    val eSelf = intercept[UnsupportedOperationException] {
      t.changes(head, head).collect()
    }
    assert(eSelf.getMessage.contains("crosses a type change"), eSelf.getMessage)
    // a range entirely AFTER the restore replays fine (narrow era only)
    Seq((9999L, 1, 1.0f)).toDF("k", "a", "f")
      .write.format("qbeast").mode("append").save(dir)
    val afterFeed = t.changes(head + 1, head + 1)
    assert(afterFeed.collect().length == 1)
    assert(afterFeed.schema("a").dataType == IntegerType)
    // the streaming source refuses a startingVersion anchored INSIDE
    // the wide era under the narrowed pinned schema
    val e2 = intercept[Exception] {
      spark.readStream.format("qbeast")
        .option("startingVersion", vWide.toString).load(dir)
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        .awaitTermination()
    }
    val msgs = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("crosses a type change"), msgs)
  }

  test("SQL surface: ALTER COLUMN TYPE widens through the catalog; narrowing refused") {
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    val dir = TestSpark.tmpDir("tw-sql")
    spark.sql("DROP TABLE IF EXISTS qbeast_catalog.default.tw_sql")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.tw_sql
      (k BIGINT, a INT) USING qbeast
      OPTIONS ('columnsToIndex'='k') LOCATION '$dir'""")
    Seq((1L, 1), (2L, 2)).toDF("k", "a")
      .writeTo("qbeast_catalog.default.tw_sql").append()
    spark.sql("ALTER TABLE qbeast_catalog.default.tw_sql ALTER COLUMN a TYPE BIGINT")
    val back = spark.sql("SELECT * FROM qbeast_catalog.default.tw_sql")
    assert(back.schema("a").dataType == LongType)
    assert(back.select(sum("a")).as[Long].head() == 3L)
    // path readers see the widened log schema too
    assert(spark.read.format("qbeast").load(dir).schema("a").dataType == LongType)
    // narrowing: Spark's own analyzer refuses it (NOT_SUPPORTED_CHANGE_COLUMN,
    // Cast.canUpCast) before the catalog is consulted
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE qbeast_catalog.default.tw_sql ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("cannot change column") ||
      e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e.getMessage)
    // a move the ANALYZER up-casts but the parquet readers cannot
    // (long -> double, probe-verified to fail in both) reaches the
    // catalog and is refused there with the matrix named
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE qbeast_catalog.default.tw_sql ALTER COLUMN k TYPE DOUBLE")
    }
    assert(e2.getMessage.contains("cannot change column") ||
      e2.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e2.getMessage)
    spark.sql("DROP TABLE qbeast_catalog.default.tw_sql")
  }

  test("widen composes with column mapping: rename then widen, stats keep their physical key") {
    val dir = freshTable("tw-mapped", Map("bloomFilterColumns" -> "a"))
    val t = QbeastTable.forPath(spark, dir)
    t.renameColumn("a", "amount")
    t.widenColumn("amount", LongType)
    val s = t.snapshot
    val f = s.schema.get.fields.find(_.name == "amount").get
    assert(ColumnMapping.physicalName(f) == "a")
    assert(f.dataType == LongType)
    assert(TypeWidening.statsTrustless(s.schema.get).isEmpty)
    assert(TypeWidening.bloomTrustless(s.schema.get) == Set("a"), "gates key physical names")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.filter(col("amount") === 123L).count() == 1)
    assert(back.select(sum("amount")).as[Long].head() == (0 until 1000).map(_.toLong).sum)
    assert(t.verifyIntegrity().isEmpty)
  }
}
