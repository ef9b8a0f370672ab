package graft

import graft.log.QbeastLog
import graft.table.QbeastTable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Copy-on-write row-level DELETE/UPDATE on indexed tables. */
class DmlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def conf = spark.sparkContext.hadoopConfiguration

  private def freshLineitem(prefix: String, cubeSize: Int = 1000): String = {
    val dir = TestSpark.tmpDir(prefix)
    spark.read.parquet(s"$sf/lineitem.parquet").write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", cubeSize.toString)
      .save(dir)
    dir
  }

  test("nondeterministic DELETE/UPDATE conditions and assignments are rejected") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("dml-nondet")
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b")
      .option("cubeSize", "100").save(dir)
    val t = table.QbeastTable.forPath(spark, dir)
    // the condition is evaluated in independent jobs per pass — a
    // nondeterministic one would lose AND duplicate rows
    val e = intercept[IllegalArgumentException] { t.delete("rand() < 0.5") }
    assert(e.getMessage.contains("deterministic"))
    val e2 = intercept[IllegalArgumentException] {
      t.update("a < 10", Map("b" -> "rand()"))
    }
    assert(e2.getMessage.contains("deterministic"))
    assert(spark.read.format("qbeast").load(dir).count() == 100)
  }

  test("upsert aligns source types to the table schema by name") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("dml-upsert-types")
    (1 to 50).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b")
      .option("cubeSize", "100").save(dir)
    val t = table.QbeastTable.forPath(spark, dir)
    // int-typed key and string-typed value: written as-is they would
    // poison the shared parquet scan schema for every future read
    val src = Seq((1, "999.5"), (60, "60.5")).toDF("a", "b")
    t.upsert(src, Seq("a"))
    val back = spark.read.format("qbeast").load(dir)
    assert(back.schema("a").dataType.typeName == "long" &&
      back.schema("b").dataType.typeName == "double")
    assert(back.filter(col("a") === 1).select("b").head.getDouble(0) == 999.5)
    assert(back.filter(col("a") === 60).select("b").head.getDouble(0) == 60.5)
    assert(back.count() == 51)
  }

  test("upsert and MERGE INSERT fail on non-castable values instead of writing NULL") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("dml-upsert-storecast")
    (1 to 50).map(i => (i.toLong, i * 2.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b")
      .option("cubeSize", "100").save(dir)
    val t = table.QbeastTable.forPath(spark, dir)
    // store-assignment semantics: 'abc' → double must FAIL the upsert,
    // not silently write NULL for a non-null source value
    val v0 = t.snapshot.version
    val e = intercept[Exception] {
      t.upsert(Seq((1, "abc"), (60, "60.5")).toDF("a", "b"), Seq("a"))
    }
    assert(e.getMessage.contains("abc"), e.getMessage)
    assert(t.snapshot.version == v0, "failed upsert must not commit")
    assert(spark.read.format("qbeast").load(dir).filter(col("b").isNull).count() == 0)
    // castable strings still work (regression guard on the happy path)
    t.upsert(Seq((60, "60.5")).toDF("a", "b"), Seq("a"))
    assert(spark.read.format("qbeast").load(dir).count() == 51)

    // MERGE INSERT assigning a non-castable literal fails the same way
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    spark.sql("DROP TABLE IF EXISTS qbeast_catalog.default.sc_target")
    spark.sql(s"CREATE TABLE qbeast_catalog.default.sc_target USING qbeast LOCATION '$dir'")
    Seq((70L, "oops")).toDF("k", "v").createOrReplaceTempView("sc_src")
    val e2 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO qbeast_catalog.default.sc_target AS t USING sc_src AS s ON t.a = s.k
           |WHEN NOT MATCHED THEN INSERT (a, b) VALUES (s.k, s.v)""".stripMargin)
    }
    assert(e2.getMessage.contains("oops"), e2.getMessage)
    assert(spark.read.format("qbeast").load(dir).filter(col("b").isNull).count() == 0)
  }

  test("delete removes exactly the matching rows and keeps the rest bit-identical") {
    val dir = freshLineitem("dml-del")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    val expectDeleted = raw.filter("l_quantity > 45").count()

    val t = QbeastTable.forPath(spark, dir)
    val deleted = t.delete("l_quantity > 45")
    assert(deleted === expectDeleted)

    val back = spark.read.format("qbeast").load(dir)
    val expect = raw.filter("NOT (l_quantity > 45)")
    assert(back.count() === expect.count())
    assert(back.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(back).count() === 0)

    // second identical delete is a no-op with no extra commit
    val vBefore = QbeastLog.snapshot(dir, conf).version
    assert(t.delete("l_quantity > 45") === 0L)
    assert(QbeastLog.snapshot(dir, conf).version === vBefore)
  }

  test("delete on an indexed-column predicate rewrites only the pruned file subset") {
    val dir = freshLineitem("dml-pruned", cubeSize = 500)
    val s0 = QbeastLog.snapshot(dir, conf)
    val keyMax = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(max("l_orderkey")).head.getLong(0)
    // a narrow range on the leading indexed column: pruning must keep
    // most files out of the rewrite
    val t = QbeastTable.forPath(spark, dir)
    val deleted = t.delete(s"l_orderkey <= ${keyMax / 20}")
    assert(deleted > 0)
    val s1 = QbeastLog.snapshot(dir, conf)
    val removed = s0.files.map(_.path).toSet -- s1.files.map(_.path).toSet
    assert(removed.nonEmpty)
    assert(removed.size < s0.files.size,
      s"delete rewrote all ${s0.files.size} files; pruning did not engage")
    // sampling still behaves after the rewrite (index preserved)
    val back = spark.read.format("qbeast").load(dir)
    val n = back.count()
    val sampled = back.sample(0.2).count()
    assert(math.abs(sampled - 0.2 * n) <= 0.05 * n)
  }

  test("update applies simultaneous assignments with pre-update RHS semantics") {
    val dir = freshLineitem("dml-upd")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    val t = QbeastTable.forPath(spark, dir)
    // swap-style: both RHS see the OLD row
    val updated = t.update("l_returnflag = 'R'",
      Map("l_quantity" -> "l_extendedprice / 100", "l_extendedprice" -> "l_quantity * 100"))
    assert(updated === raw.filter("l_returnflag = 'R'").count())

    val back = spark.read.format("qbeast").load(dir)
    val expect = raw.select(raw.columns.map {
      case "l_quantity" =>
        when(col("l_returnflag") === "R", col("l_extendedprice") / 100)
          .otherwise(col("l_quantity")).as("l_quantity")
      case "l_extendedprice" =>
        when(col("l_returnflag") === "R", col("l_quantity") * 100)
          .otherwise(col("l_extendedprice")).as("l_extendedprice")
      case c => col(c)
    }.toSeq: _*)
    assert(back.count() === expect.count())
    assert(back.select(expect.columns.map(col).toSeq: _*).exceptAll(expect).count() === 0)
  }

  test("update moving an indexed column outside the space cuts a merged revision") {
    val dir = freshLineitem("dml-rev")
    val t = QbeastTable.forPath(spark, dir)
    val ridBefore = t.latestRevisionID
    // push l_extendedprice far beyond the indexed linear range
    val updated = t.update("l_linenumber = 1",
      Map("l_extendedprice" -> "l_extendedprice + 10000000"))
    assert(updated > 0)
    assert(t.latestRevisionID > ridBefore,
      "out-of-space update must land in a new merged revision")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.filter("l_extendedprice >= 10000000").count() === updated)
    // content: full table count unchanged
    assert(back.count() === spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("SQL DELETE FROM works through the catalog (SupportsDelete)") {
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    val dir = TestSpark.tmpDir("dml-sql")
    val table = "qbeast_catalog.default.dml_sql_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("orders_dml_src")
    spark.sql(s"""CREATE TABLE $table
      USING qbeast OPTIONS ('columnsToIndex'='o_orderkey,o_totalprice', 'cubeSize'='1000')
      LOCATION '$dir'
      AS SELECT * FROM orders_dml_src""")
    val before = spark.sql(s"SELECT count(*) FROM $table").head.getLong(0)
    val toGo = spark.sql(
      s"SELECT count(*) FROM $table WHERE o_orderstatus = 'F' AND o_totalprice < 100000")
      .head.getLong(0)
    assert(toGo > 0)
    spark.sql(s"DELETE FROM $table WHERE o_orderstatus = 'F' AND o_totalprice < 100000")
    assert(spark.sql(s"SELECT count(*) FROM $table").head.getLong(0) === before - toGo)
    assert(spark.sql(
      s"SELECT count(*) FROM $table WHERE o_orderstatus = 'F' AND o_totalprice < 100000")
      .head.getLong(0) === 0)
  }

  test("upsert replaces matched keys, inserts new keys, one atomic commit") {
    val dir = TestSpark.tmpDir("dml-upsert")
    val raw = spark.read.parquet(s"$sf/orders.parquet")
    raw.write.format("qbeast")
      .option("columnsToIndex", "o_orderkey,o_totalprice")
      .option("cubeSize", "1000").save(dir)
    val vBefore = QbeastLog.snapshot(dir, conf).version

    val updates = raw.filter("o_orderkey % 7 = 0")
      .withColumn("o_totalprice", lit(-1.0))
    val maxKey = raw.agg(max("o_orderkey")).head.getLong(0)
    val inserts = raw.limit(3).withColumn("o_orderkey", col("o_orderkey") + maxKey + 1000)
    val src = updates.unionByName(inserts)

    val t = QbeastTable.forPath(spark, dir)
    val (replaced, written) = t.upsert(src, Seq("o_orderkey"))
    assert(replaced === raw.filter("o_orderkey % 7 = 0").count())
    assert(written === src.count())
    // exactly one new log version (atomicity)
    assert(QbeastLog.snapshot(dir, conf).version === vBefore + 1)

    val back = spark.read.format("qbeast").load(dir)
    val expect = raw.join(src.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(src)
    assert(back.count() === expect.count())
    assert(back.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(back).count() === 0)
  }

  test("upsert on indexed keys rewrites only the pruned file subset") {
    val dir = freshLineitem("dml-upsert-pruned", cubeSize = 500)
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    val s0 = QbeastLog.snapshot(dir, conf)
    assert(s0.files.size > 2)
    // a tight key range: only files covering it should be rewritten
    val keyMax = raw.agg(max("l_orderkey")).head.getLong(0)
    val src = raw.filter(s"l_orderkey <= ${keyMax / 50}")
      .dropDuplicates("l_orderkey", "l_linenumber")
      .withColumn("l_quantity", col("l_quantity") * 2)
    val t = QbeastTable.forPath(spark, dir)
    val (replaced, _) = t.upsert(src, Seq("l_orderkey", "l_linenumber"))
    assert(replaced > 0)
    val s1 = QbeastLog.snapshot(dir, conf)
    val removed = s0.files.map(_.path).toSet -- s1.files.map(_.path).toSet
    assert(removed.nonEmpty && removed.size < s0.files.size,
      s"upsert rewrote ${removed.size} of ${s0.files.size} files; pruning did not engage")
  }

  test("delete everything leaves a readable empty table") {
    val dir = freshLineitem("dml-all")
    val t = QbeastTable.forPath(spark, dir)
    val deleted = t.delete("l_orderkey IS NOT NULL OR l_orderkey IS NULL")
    assert(deleted > 0)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === 0)
    assert(QbeastLog.snapshot(dir, conf).files.isEmpty)
  }

  // ---- SQL-statement DML (QbeastDmlRules) --------------------------------

  private def sqlCatalogTable(prefix: String): (String, String) = {
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    val dir = freshLineitem(prefix)
    val name = prefix.replace('-', '_')
    spark.sql(s"DROP TABLE IF EXISTS qbeast_catalog.default.$name")
    spark.sql(s"CREATE TABLE qbeast_catalog.default.$name USING qbeast LOCATION '$dir'")
    (s"qbeast_catalog.default.$name", dir)
  }

  test("SQL UPDATE statement applies assignments with pre-update semantics") {
    val (name, dir) = sqlCatalogTable("dml-sqlupd")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    // simultaneous assignments: both RHS see the PRE-update row
    spark.sql(s"UPDATE $name SET l_quantity = l_tax, l_tax = l_quantity " +
      "WHERE l_quantity > 40")
    val back = spark.read.format("qbeast").load(dir)
    val expect = raw.withColumn("swap", col("l_quantity") > 40)
      .withColumn("q", when(col("swap"), col("l_tax")).otherwise(col("l_quantity")))
      .withColumn("t", when(col("swap"), col("l_quantity")).otherwise(col("l_tax")))
    val got = back.agg(sum("l_quantity"), sum("l_tax")).head
    val want = expect.agg(sum("q"), sum("t")).head
    // double sums differ in partition order only
    assert(math.abs(got.getDouble(0) - want.getDouble(0)) < 1e-6)
    assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6)
    assert(back.count() === raw.count())
  }

  test("SQL MERGE INTO (update-all + insert-all) matches the upsert semantics") {
    val (name, dir) = sqlCatalogTable("dml-sqlmrg")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    raw.createOrReplaceTempView("dml_sqlmrg_src")
    val cols = raw.columns.mkString(", ")
    spark.sql(s"""
      MERGE INTO $name t
      USING (SELECT l_orderkey + 90000000 AS l_orderkey, l_linenumber,
                    ${raw.columns.filterNot(c => c == "l_orderkey" || c == "l_linenumber")
                        .mkString(", ")}
             FROM dml_sqlmrg_src WHERE l_orderkey % 100 = 1) s
      ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val back = spark.read.format("qbeast").load(dir)
    val inserted = raw.filter("l_orderkey % 100 = 1").count()
    assert(back.count() === raw.count() + inserted)
    assert(back.filter("l_orderkey >= 90000000").count() === inserted)
  }

  test("SQL MERGE WHEN MATCHED THEN DELETE drops exactly the matched keys") {
    val (name, dir) = sqlCatalogTable("dml-sqlmrgdel")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    raw.filter("l_orderkey % 7 = 0").createOrReplaceTempView("dml_sqlmrgdel_src")
    spark.sql(s"""MERGE INTO $name t USING dml_sqlmrgdel_src s
      ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
      WHEN MATCHED THEN DELETE""")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === raw.filter("l_orderkey % 7 <> 0").count())
    assert(back.filter("l_orderkey % 7 = 0").count() === 0)
  }

  test("SQL MERGE with conditional clauses and NOT MATCHED BY SOURCE") {
    val (name, dir) = sqlCatalogTable("dml-sqlmrggen")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    // the synthetic lineitem repeats (orderkey, linenumber) pairs, so
    // dedup the source to satisfy the multiple-matches rule
    val src = raw.filter("l_orderkey % 5 = 0")
      .dropDuplicates("l_orderkey", "l_linenumber")
    src.createOrReplaceTempView("dml_gen_src")
    spark.sql(s"""MERGE INTO $name t USING dml_gen_src s
      ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
      WHEN MATCHED AND t.l_quantity > 25 THEN UPDATE SET l_returnflag = 'X'
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND t.l_quantity > 45 THEN UPDATE SET l_returnflag = 'Y'""")
    val back = spark.read.format("qbeast").load(dir)
    val m = raw.filter("l_orderkey % 5 = 0")
    // first applicable clause wins: matched & qty>25 flagged X; other
    // matched rows deleted; unmatched heavy rows flagged Y; rest intact
    assert(back.count() === raw.count() - m.filter("l_quantity <= 25").count())
    assert(back.filter("l_returnflag = 'X'").count() ===
      m.filter("l_quantity > 25").count())
    assert(back.filter("l_returnflag = 'Y'").count() ===
      raw.filter("l_orderkey % 5 <> 0 AND l_quantity > 45").count())
    // untouched rows bit-identical
    val untouched = raw.filter("l_orderkey % 5 <> 0 AND l_quantity <= 45")
    assert(back.filter("l_returnflag NOT IN ('X','Y')").exceptAll(untouched).count() === 0)
  }

  test("SQL MERGE conditional INSERT admits only rows passing the clause") {
    val (name, dir) = sqlCatalogTable("dml-sqlmrgins")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    raw.createOrReplaceTempView("dml_ins_src")
    val others = raw.columns.filterNot(_ == "l_orderkey").mkString(", ")
    spark.sql(s"""MERGE INTO $name t
      USING (SELECT l_orderkey + 90000000 AS l_orderkey, $others
             FROM dml_ins_src WHERE l_orderkey % 100 = 1) s
      ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
      WHEN NOT MATCHED AND s.l_quantity > 30 THEN INSERT *""")
    val back = spark.read.format("qbeast").load(dir)
    val want = raw.filter("l_orderkey % 100 = 1 AND l_quantity > 30").count()
    assert(back.count() === raw.count() + want)
    assert(back.filter("l_orderkey >= 90000000").count() === want)
  }

  test("insert-only MERGE with duplicate source keys never duplicates target rows") {
    val (name, dir) = sqlCatalogTable("dml-sqlmrgdup")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    // duplicate keys in the source are LEGAL for insert-only merges;
    // matched target rows must pass through exactly once and no target
    // file should even be rewritten
    raw.limit(200).unionAll(raw.limit(200)).createOrReplaceTempView("dml_dup_src")
    val v0 = QbeastLog.snapshot(dir, conf).version
    spark.sql(s"""MERGE INTO $name t USING dml_dup_src s
      ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
      WHEN NOT MATCHED AND s.l_quantity < 0 THEN INSERT *""")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === raw.count(), "no duplication, no inserts")
    assert(back.exceptAll(raw).count() === 0)
    // insert-only with nothing to insert: no commit at all
    assert(QbeastLog.snapshot(dir, conf).version === v0)
  }

  test("SQL MERGE ON accepts differently-named equi-keys") {
    val (name, dir) = sqlCatalogTable("dml-sqlmrgrk")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    raw.filter("l_orderkey % 100 = 2")
      .dropDuplicates("l_orderkey", "l_linenumber")
      .selectExpr("l_orderkey AS k1", "l_linenumber AS k2")
      .createOrReplaceTempView("dml_rk_src")
    // 'Q' is not a TPC-H returnflag value (those are A/N/R), so the
    // count below sees only rows this merge touched
    spark.sql(s"""MERGE INTO $name t USING dml_rk_src s
      ON t.l_orderkey = s.k1 AND t.l_linenumber = s.k2
      WHEN MATCHED THEN UPDATE SET l_returnflag = 'Q'""")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === raw.count())
    assert(back.filter("l_returnflag = 'Q'").count() ===
      raw.filter("l_orderkey % 100 = 2").count())
    // untouched rows bit-identical
    assert(back.filter("l_returnflag <> 'Q'")
      .exceptAll(raw.filter("l_orderkey % 100 <> 2")).count() === 0)
  }

  test("SQL MERGE DELETE with a renamed source key drops exactly the matched keys") {
    val (name, dir) = sqlCatalogTable("dml-sqlmrgrkdel")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    raw.filter("l_orderkey % 9 = 0").selectExpr("l_orderkey AS victim")
      .distinct().createOrReplaceTempView("dml_rkdel_src")
    spark.sql(s"""MERGE INTO $name t USING dml_rkdel_src s
      ON t.l_orderkey = s.victim
      WHEN MATCHED THEN DELETE""")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === raw.filter("l_orderkey % 9 <> 0").count())
    assert(back.filter("l_orderkey % 9 = 0").count() === 0)
  }

  test("MERGE tolerates duplicate source keys that match no target row") {
    val (name, dir) = sqlCatalogTable("dml-sqlmrgdupok")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    // matched half: unique on the merge keys; unmatched half: every key
    // DUPLICATED — Delta only rejects >1 source rows hitting the same
    // target row, so this merge must succeed and insert both copies
    val matchedSrc = raw.filter("l_orderkey % 100 = 3")
      .dropDuplicates("l_orderkey", "l_linenumber")
    val unmatchedSrc = raw.filter("l_orderkey % 100 = 4 AND l_linenumber = 1")
      .dropDuplicates("l_orderkey")
      .withColumn("l_orderkey", col("l_orderkey") + lit(90000000L))
    val nUn = unmatchedSrc.count()
    assert(nUn > 0)
    matchedSrc.unionAll(unmatchedSrc).unionAll(unmatchedSrc)
      .createOrReplaceTempView("dml_dupok_src")
    spark.sql(s"""MERGE INTO $name t USING dml_dupok_src s
      ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
      WHEN MATCHED THEN UPDATE SET l_returnflag = 'Z'
      WHEN NOT MATCHED THEN INSERT *""")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.filter("l_returnflag = 'Z'").count() ===
      raw.filter("l_orderkey % 100 = 3").count())
    assert(back.filter("l_orderkey >= 90000000").count() === 2 * nUn)
    assert(back.count() === raw.count() + 2 * nUn)
  }

  test("SQL MERGE with unsupported shapes fails with a clear error") {
    val (name, _) = sqlCatalogTable("dml-sqlbad")
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("dml_sqlbad_src")
    // duplicate source keys with a row-modifying matched clause
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name t USING dml_sqlbad_src s
        ON t.l_orderkey = s.l_orderkey
        WHEN MATCHED AND s.l_quantity > 10 THEN DELETE""")
    }
    assert(e.getMessage.contains("unique on the merge keys"))
    // non-equi ON condition
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name t USING dml_sqlbad_src s
        ON t.l_orderkey < s.l_orderkey
        WHEN MATCHED THEN DELETE""")
    }
    assert(e2.getMessage.contains("qbeast MERGE/UPDATE does not support"))
    // the same source column reused in two ON equalities: rejected up
    // front instead of dying later as an ambiguous-reference error
    val e3 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name t USING dml_sqlbad_src s
        ON t.l_orderkey = s.l_orderkey AND t.l_partkey = s.l_orderkey
        WHEN MATCHED THEN DELETE""")
    }
    assert(e3.getMessage.contains("reusing the same source column"))
  }

  test("upsert rejects duplicate source keys that match a target row") {
    val dir = freshLineitem("dml-upsdup")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    val t = QbeastTable.forPath(spark, dir)
    // duplicates matching a target row: Delta's multiple-matches error
    val dupMatched = raw.filter("l_orderkey % 100 = 3")
    val e = intercept[Exception] { t.upsert(dupMatched.unionAll(dupMatched), Seq("l_orderkey", "l_linenumber")) }
    assert(e.getMessage.contains("unique on the merge keys"))
    // duplicates matching NOTHING are legal and insert both copies
    val fresh = raw.filter("l_orderkey % 100 = 4 AND l_linenumber = 1")
      .dropDuplicates("l_orderkey")
      .withColumn("l_orderkey", col("l_orderkey") + lit(91000000L))
    val n = fresh.count()
    t.upsert(fresh.unionAll(fresh), Seq("l_orderkey", "l_linenumber"))
    val back = spark.read.format("qbeast").load(dir)
    assert(back.filter("l_orderkey >= 91000000").count() === 2 * n)
    assert(back.count() === raw.count() + 2 * n)
  }

  // ---- struct-field assignments (Delta withField semantics) -------------

  private def structTable(prefix: String): (String, String) = {
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    val dir = TestSpark.tmpDir(prefix)
    spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        struct(col("o_orderstatus").as("status"),
          col("o_totalprice").as("price")).as("meta"))
      .write.format("qbeast")
      .option("columnsToIndex", "o_orderkey,o_custkey")
      .option("cubeSize", "2000").save(dir)
    val name = prefix.replace('-', '_')
    spark.sql(s"DROP TABLE IF EXISTS qbeast_catalog.default.$name")
    spark.sql(s"CREATE TABLE qbeast_catalog.default.$name USING qbeast LOCATION '$dir'")
    (s"qbeast_catalog.default.$name", dir)
  }

  test("SQL UPDATE SET on a struct field rewrites only that field") {
    val (name, dir) = structTable("dml-structupd")
    val raw = spark.read.parquet(s"$sf/orders.parquet")
    spark.sql(s"UPDATE $name SET meta.price = meta.price + 1000 " +
      "WHERE o_orderkey % 7 = 0")
    val back = spark.read.format("qbeast").load(dir)
    val got = back.select(col("o_orderkey"), col("meta.status").as("status"),
      col("meta.price").as("price"))
    val want = raw.select(col("o_orderkey"), col("o_orderstatus").as("status"),
      when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1000)
        .otherwise(col("o_totalprice")).as("price"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("SQL MERGE UPDATE SET on a struct field applies per matched row") {
    val (name, dir) = structTable("dml-structmrg")
    val raw = spark.read.parquet(s"$sf/orders.parquet")
    raw.filter("o_orderkey % 5 = 0")
      .select(col("o_orderkey"), col("o_totalprice"))
      .createOrReplaceTempView("dml_structmrg_src")
    spark.sql(s"""MERGE INTO $name t USING dml_structmrg_src s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET t.meta.price = s.o_totalprice * 2""")
    val back = spark.read.format("qbeast").load(dir)
    val got = back.select(col("o_orderkey"), col("meta.status").as("status"),
      col("meta.price").as("price"))
    val want = raw.select(col("o_orderkey"), col("o_orderstatus").as("status"),
      when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice")).as("price"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("Assignments applies doubly-nested paths with simultaneous semantics") {
    import org.apache.spark.sql.functions.expr
    val df = spark.sql(
      """SELECT 1L AS id,
        |named_struct('a', named_struct('x', 10.0D, 'y', 2.0D), 'b', 5.0D) AS m
        |""".stripMargin)
    // both right-hand sides see the PRE-update row: m.a.x reads the
    // original m.b, and m.b reads the original m.a.x
    val cols = graft.table.Assignments(df.schema,
      Map("m.a.x" -> expr("m.b * 2"), "m.b" -> expr("m.a.x + 1")))
    val out = df.select(cols: _*).selectExpr("id", "m.a.x", "m.a.y", "m.b").head()
    assert(out.getDouble(1) === 10.0 * 0 + 5.0 * 2) // m.b(orig)=5 → 10
    assert(out.getDouble(2) === 2.0)                // untouched sibling
    assert(out.getDouble(3) === 10.0 + 1)           // m.a.x(orig)=10 → 11
  }

  test("DELETE with subquery predicates deletes exactly the matching rows") {
    import spark.implicits._
    // THE round-12 regression case: an IN-subquery condition rewrites
    // to a semi join, leaving the optimized plan with the scan intact
    // and ZERO Filter conjuncts — indistinguishable from a
    // trivially-true DELETE unless classification checks the plan
    // shape. Before the purity check in optimizedUserConjuncts this
    // deleted the ENTIRE table (every file "proved" vacuously TRUE).
    val dir = TestSpark.tmpDir("dml-subq-del")
    (1 to 200).map(i => (i.toLong, i * 2.0)).toDF("a", "v")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "50").save(dir)
    spark.range(1, 11).toDF("id").createOrReplaceTempView("dml_subq_keys")
    val t = QbeastTable.forPath(spark, dir)
    assert(t.delete("a IN (SELECT id FROM dml_subq_keys)") == 10L)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 190L)
    assert(back.agg(min("a")).head().getLong(0) == 11L)
    // correlated EXISTS takes the same join rewrite
    (1 to 5).map(i => (i * 20L, "k")).toDF("kid", "tag")
      .createOrReplaceTempView("dml_subq_exists")
    assert(t.delete(
      "EXISTS (SELECT 1 FROM dml_subq_exists WHERE kid = a)") == 5L)
    assert(spark.read.format("qbeast").load(dir).count() == 185L)
    // NOT IN (null-aware anti join) — nothing matches an empty set
    spark.emptyDataset[Long].toDF("id").createOrReplaceTempView("dml_subq_empty")
    assert(t.delete("a IN (SELECT id FROM dml_subq_empty)") == 0L)
    assert(spark.read.format("qbeast").load(dir).count() == 185L)
    // the SQL spelling routes through SupportsDelete, where Spark
    // itself refuses subquery conditions up front ("Delete by
    // condition with subquery is not supported") — an ERROR, never a
    // silent mass delete; the Scala API above is the supported path
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    spark.sql("DROP TABLE IF EXISTS qbeast_catalog.default.dml_subq_t")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.dml_subq_t
      (a BIGINT, v DOUBLE) USING qbeast
      OPTIONS ('columnsToIndex'='a') LOCATION '${TestSpark.tmpDir("dml-subq-sql")}'""")
    spark.sql("INSERT INTO qbeast_catalog.default.dml_subq_t VALUES (1, 1.0), (2, 2.0)")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM qbeast_catalog.default.dml_subq_t " +
        "WHERE a IN (SELECT id FROM dml_subq_keys)")
    }
    assert(e.getMessage.contains("subquery"))
    assert(spark.sql("SELECT count(*) FROM qbeast_catalog.default.dml_subq_t")
      .head().getLong(0) == 2L)
  }

  test("subquery DELETE/UPDATE survive a forced shuffle join (no broadcast)") {
    import spark.implicits._
    // input_file_name() is "" after a shuffle: if affected-file
    // discovery projected it ABOVE the subquery's rewritten join, a
    // sort-merge-joined DELETE would match zero files and silently
    // no-op (the inverse failure mode of the round-12 mass delete).
    // Discovery must ride _metadata.file_path, stamped at the scan.
    val dir = TestSpark.tmpDir("dml-subq-smj")
    (1 to 200).map(i => (i.toLong, i * 2.0)).toDF("a", "v")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "50").save(dir)
    spark.range(1, 11).toDF("id").createOrReplaceTempView("dml_smj_keys")
    val t = QbeastTable.forPath(spark, dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(t.delete("a IN (SELECT id FROM dml_smj_keys)") == 10L)
      assert(spark.read.format("qbeast").load(dir).count() == 190L)
      // UPDATE through the same shuffled-join discovery
      assert(t.update("a IN (SELECT id + 20 FROM dml_smj_keys)",
        Map("v" -> "v + 1000")) == 10L)
      val back = spark.read.format("qbeast").load(dir)
      assert(back.filter("v >= 1000").count() == 10L)
      assert(back.filter("a BETWEEN 21 AND 30 AND v = a * 2 + 1000").count() == 10L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("keyed upsert and SQL MERGE survive a forced shuffle join (no broadcast)") {
    import spark.implicits._
    // affected-file discovery for keyed mutations is a left-semi join
    // of the table against the source keys; with broadcast disabled it
    // plans as a sort-merge join, where input_file_name() would be ""
    // and discovery would silently match zero files. Pins that
    // affectedByKeys rides _metadata.file_path (QbeastTable.scala:835).
    val dir = TestSpark.tmpDir("dml-upsert-smj")
    (1 to 200).map(i => (i.toLong, i * 2.0)).toDF("a", "v")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "50").save(dir)
    val t = QbeastTable.forPath(spark, dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val src = (1 to 10).map(i => (i.toLong, -1.0 * i)).toDF("a", "v")
      val (replaced, written) = t.upsert(src, Seq("a"))
      assert(replaced == 10L && written == 10L,
        s"forced-SMJ upsert matched $replaced (want 10) — discovery no-opped")
      val back = spark.read.format("qbeast").load(dir)
      assert(back.count() == 200L)
      assert(back.filter("v < 0").count() == 10L)
      // SQL MERGE through the same shuffled-join discovery
      spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
      spark.sql("DROP TABLE IF EXISTS qbeast_catalog.default.dml_smj_merge")
      spark.sql(s"""CREATE TABLE qbeast_catalog.default.dml_smj_merge
        (a BIGINT, v DOUBLE) USING qbeast
        OPTIONS ('columnsToIndex'='a') LOCATION '$dir'""")
      (11 to 20).map(i => (i.toLong, -2.0 * i)).toDF("a", "v")
        .createOrReplaceTempView("dml_smj_merge_src")
      spark.sql("""MERGE INTO qbeast_catalog.default.dml_smj_merge AS t
        USING dml_smj_merge_src AS s ON t.a = s.a
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (a, v) VALUES (s.a, s.v)""")
      val after = spark.read.format("qbeast").load(dir)
      assert(after.count() == 200L)
      assert(after.filter("a BETWEEN 11 AND 20 AND v = -2.0 * a").count() == 10L,
        "forced-SMJ MERGE updated the wrong rows — discovery no-opped")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SQL UPDATE with a subquery condition updates exactly the matching rows") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("dml-subq-sqlupd")
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    spark.sql("DROP TABLE IF EXISTS qbeast_catalog.default.dml_squpd_t")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.dml_squpd_t
      (a BIGINT, v DOUBLE) USING qbeast
      OPTIONS ('columnsToIndex'='a') LOCATION '$dir'""")
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("a", "v")
      .writeTo("qbeast_catalog.default.dml_squpd_t").append()
    spark.range(1, 11).toDF("id").createOrReplaceTempView("dml_squpd_keys")
    spark.sql("UPDATE qbeast_catalog.default.dml_squpd_t SET v = v + 1000 " +
      "WHERE a IN (SELECT id FROM dml_squpd_keys)")
    val back = spark.sql("SELECT * FROM qbeast_catalog.default.dml_squpd_t")
    assert(back.filter("v >= 1000").count() == 10L)
    assert(back.filter("a <= 10 AND v = a * 2 + 1000").count() == 10L)
    assert(back.count() == 100L)
  }

  test("UPDATE assignments accept scalar subqueries (API and SQL)") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("dml-scalar-subq")
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("a", "v")
      .write.format("qbeast").option("columnsToIndex", "a")
      .option("cubeSize", "50").save(dir)
    spark.range(1, 8).toDF("id").createOrReplaceTempView("dml_scalar_src")
    val t = QbeastTable.forPath(spark, dir)
    // the assignment's scalar subquery is re-evaluated per pass like
    // the condition — deterministic, so every pass agrees
    assert(t.update("a <= 10",
      Map("v" -> "(SELECT max(id) FROM dml_scalar_src) * 1.0")) == 10L)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.filter("a <= 10 AND v = 7.0").count() == 10L)
    assert(back.filter("a > 10 AND v = a * 2").count() == 90L)
    // SQL spelling through the analyzer rule
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    spark.sql("DROP TABLE IF EXISTS qbeast_catalog.default.dml_scalar_t")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.dml_scalar_t
      (a BIGINT, v DOUBLE) USING qbeast
      OPTIONS ('columnsToIndex'='a') LOCATION '${TestSpark.tmpDir("dml-scalar-sql")}'""")
    spark.sql("INSERT INTO qbeast_catalog.default.dml_scalar_t VALUES (1, 1.0), (2, 2.0)")
    spark.sql("UPDATE qbeast_catalog.default.dml_scalar_t " +
      "SET v = (SELECT count(*) FROM dml_scalar_src) WHERE a = 1")
    assert(spark.sql("SELECT v FROM qbeast_catalog.default.dml_scalar_t WHERE a = 1")
      .head().getDouble(0) == 7.0)
  }

  test("API update supports dotted struct paths and rejects conflicts") {
    val (_, dir) = structTable("dml-structapi")
    val t = QbeastTable.forPath(spark, dir)
    val n = t.update("o_custkey % 2 = 0", Map("meta.status" -> "'X'"))
    assert(n > 0)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.filter("meta.status = 'X'").count() === n)
    // whole-column + field assignment of the same column is ambiguous
    val e = intercept[Exception] {
      t.update("o_custkey % 2 = 0",
        Map("meta" -> "named_struct('status','Y','price',0.0)", "meta.price" -> "1.0"))
    }
    assert(e.getMessage.contains("conflicting assignments"))
    // unknown field inside the struct
    val e2 = intercept[Exception] {
      t.update("o_custkey % 2 = 0", Map("meta.nope" -> "1"))
    }
    assert(e2.getMessage.toLowerCase.contains("unknown field"))
  }

}
