package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: CREATE TABLE ... USING qbeast, INSERT INTO (values +
 * select), SELECT with sampling, CTAS — through a standalone qbeast
 * catalog (reference: QbeastCatalogIntegrationTest / QbeastInsertToTest
 * behaviors). */
class CatalogSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    s
  }

  /** The standalone catalog is durable across JVMs now — drop leftovers
   * from previous test runs so creates stay idempotent. */
  private def fresh(table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS qbeast_catalog.default.$table")

  test("CREATE TABLE + INSERT INTO VALUES + SELECT") {
    val loc = TestSpark.tmpDir("cat-create")
    fresh("students")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.students
      (id INT, name STRING, age INT) USING qbeast
      OPTIONS ('columnsToIndex'='id,age', 'cubeSize'='100')
      LOCATION '$loc'""")
    spark.sql(
      "INSERT INTO qbeast_catalog.default.students VALUES (1,'a',20),(2,'b',30),(3,'c',40)")
    val out = spark.sql("SELECT id, name, age FROM qbeast_catalog.default.students ORDER BY id")
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    // second insert appends
    spark.sql("INSERT INTO qbeast_catalog.default.students VALUES (4,'d',50)")
    assert(spark.sql("SELECT count(*) FROM qbeast_catalog.default.students").head.getLong(0) == 4)
  }

  test("INSERT INTO ... SELECT and TABLESAMPLE on a catalog table") {
    val loc = TestSpark.tmpDir("cat-insert-select")
    fresh("li_cat")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.li_cat
      (l_orderkey BIGINT, l_extendedprice DOUBLE) USING qbeast
      OPTIONS ('columnsToIndex'='l_orderkey,l_extendedprice', 'cubeSize'='1000')
      LOCATION '$loc'""")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("li_src")
    spark.sql(
      "INSERT INTO qbeast_catalog.default.li_cat SELECT l_orderkey, l_extendedprice FROM li_src")
    val n = spark.sql("SELECT count(*) FROM qbeast_catalog.default.li_cat").head.getLong(0)
    assert(n == 6000)
    val s5 = spark.sql(
      "SELECT count(*) AS c FROM qbeast_catalog.default.li_cat TABLESAMPLE (5 PERCENT)")
      .head.getLong(0)
    assert(math.abs(s5 - 300) <= 60, s"5% of 6000 expected ~300, got $s5")
  }

  test("CTAS and ALTER TABLE SET TBLPROPERTIES") {
    val loc = TestSpark.tmpDir("cat-ctas")
    fresh("part_ctas")
    spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .createOrReplaceTempView("part_src")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.part_ctas
      USING qbeast OPTIONS ('columnsToIndex'='p_partkey,p_retailprice')
      LOCATION '$loc' AS SELECT p_partkey, p_retailprice FROM part_src""")
    val n = spark.sql("SELECT count(*) FROM qbeast_catalog.default.part_ctas").head.getLong(0)
    assert(n == spark.table("part_src").count())
    spark.sql("ALTER TABLE qbeast_catalog.default.part_ctas SET TBLPROPERTIES ('x'='1')")
    val t = spark.sessionState.catalogManager.catalog("qbeast_catalog")
      .asInstanceOf[graft.catalog.QbeastCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("default"), "part_ctas"))
    assert(t.properties().get("x") == "1")
  }

  test("INSERT OVERWRITE replaces content") {
    val loc = TestSpark.tmpDir("cat-overwrite")
    fresh("ow")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.ow (a BIGINT, b DOUBLE)
      USING qbeast OPTIONS ('columnsToIndex'='a,b') LOCATION '$loc'""")
    spark.sql("INSERT INTO qbeast_catalog.default.ow VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT OVERWRITE qbeast_catalog.default.ow VALUES (9, 9.0)")
    val rows = spark.sql("SELECT a FROM qbeast_catalog.default.ow").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("CREATE OR REPLACE TABLE ... AS SELECT (atomic RTAS via staging)") {
    val loc = TestSpark.tmpDir("cat-rtas")
    fresh("part_r")
    spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .createOrReplaceTempView("part_src_r")
    spark.sql(s"""CREATE OR REPLACE TABLE qbeast_catalog.default.part_r
      USING qbeast OPTIONS ('columnsToIndex'='p_partkey,p_retailprice')
      LOCATION '$loc' AS SELECT p_partkey, p_retailprice FROM part_src_r""")
    val n1 = spark.sql("SELECT count(*) FROM qbeast_catalog.default.part_r").head.getLong(0)
    assert(n1 == spark.table("part_src_r").count())
    // replace with a filtered definition: old data fully swapped out
    spark.sql(s"""CREATE OR REPLACE TABLE qbeast_catalog.default.part_r
      USING qbeast OPTIONS ('columnsToIndex'='p_partkey,p_retailprice')
      LOCATION '$loc' AS SELECT p_partkey, p_retailprice FROM part_src_r
      WHERE p_partkey <= 10""")
    val keys = spark.sql("SELECT p_partkey FROM qbeast_catalog.default.part_r")
      .collect().map(_.getLong(0))
    assert(keys.nonEmpty && keys.forall(_ <= 10), s"got ${keys.length} keys, max ${keys.max}")
    // REPLACE TABLE without AS SELECT empties the data with new schema
    spark.sql(s"""REPLACE TABLE qbeast_catalog.default.part_r
      (p_partkey BIGINT, p_retailprice DOUBLE) USING qbeast
      OPTIONS ('columnsToIndex'='p_partkey,p_retailprice') LOCATION '$loc'""")
    assert(spark.sql("SELECT count(*) FROM qbeast_catalog.default.part_r").head.getLong(0) == 0)
  }

  test("failed RTAS aborts cleanly: old table content intact, no entry leak") {
    val loc = TestSpark.tmpDir("cat-rtas-abort")
    fresh("part_abort")
    spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .createOrReplaceTempView("part_src_a")
    spark.sql(s"""CREATE OR REPLACE TABLE qbeast_catalog.default.part_abort
      USING qbeast OPTIONS ('columnsToIndex'='p_partkey,p_retailprice')
      LOCATION '$loc' AS SELECT p_partkey, p_retailprice FROM part_src_a""")
    val before = spark.sql("SELECT count(*) FROM qbeast_catalog.default.part_abort")
      .head.getLong(0)
    // the replacement query fails at execution time -> abortStagedChanges
    intercept[Exception] {
      spark.sql(s"""CREATE OR REPLACE TABLE qbeast_catalog.default.part_abort
        USING qbeast OPTIONS ('columnsToIndex'='p_partkey,p_retailprice')
        LOCATION '$loc'
        AS SELECT p_partkey, CAST(raise_error('boom') AS DOUBLE) AS p_retailprice
        FROM part_src_a""")
    }
    val after = spark.sql("SELECT count(*) FROM qbeast_catalog.default.part_abort")
      .head.getLong(0)
    assert(after == before, s"failed REPLACE must not touch data ($before -> $after)")
  }

  test("failed CTAS leaves no catalog entry (entry lands after the write)") {
    fresh("ctas_abort")
    spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .createOrReplaceTempView("part_src_c")
    intercept[Exception] {
      spark.sql("""CREATE TABLE qbeast_catalog.default.ctas_abort
        USING qbeast OPTIONS ('columnsToIndex'='p_partkey')
        AS SELECT p_partkey, CAST(raise_error('boom') AS DOUBLE) AS x
        FROM part_src_c""")
    }
    val cat = spark.sessionState.catalogManager.catalog("qbeast_catalog")
      .asInstanceOf[graft.catalog.QbeastCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("default"), "ctas_abort")
    assert(!cat.tableExists(ident), "failed CTAS must not register an entry")
  }

  test("two standalone catalogs with different warehouses are isolated") {
    val whA = TestSpark.tmpDir("cat-wh-a")
    val whB = TestSpark.tmpDir("cat-wh-b")
    def mk(wh: String): graft.catalog.QbeastCatalog = {
      val c = new graft.catalog.QbeastCatalog
      c.initialize("iso", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("warehouse", wh)))
      c
    }
    val a = mk(whA)
    val b = mk(whB)
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("default"), "same_name")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a BIGINT")
    a.createTable(ident, schema, Array.empty,
      java.util.Map.of("provider", "qbeast", "columnsToIndex", "a"))
    assert(a.tableExists(ident) && !b.tableExists(ident),
      "a table created in warehouse A must not appear in warehouse B")
    // B's durable store must not absorb A's entries on save/load
    b.createTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("default"), "b_only"),
      schema, Array.empty, java.util.Map.of("provider", "qbeast", "columnsToIndex", "a"))
    graft.catalog.QbeastCatalog.simulateRestart()
    val b2 = mk(whB)
    assert(!b2.tableExists(ident), "restart must not leak A's tables into B")
    val a2 = mk(whA)
    assert(a2.tableExists(ident))
  }

  test("time travel edge cases raise clear errors") {
    val loc = TestSpark.tmpDir("cat-tt-err")
    fresh("tterr")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.tterr (a BIGINT, b DOUBLE)
      USING qbeast OPTIONS ('columnsToIndex'='a,b') LOCATION '$loc'""")
    spark.sql("INSERT INTO qbeast_catalog.default.tterr VALUES (1, 1.0)")
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM qbeast_catalog.default.tterr VERSION AS OF 'abc'").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("version"),
      s"non-numeric version error should mention version: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM qbeast_catalog.default.tterr TIMESTAMP AS OF '1999-01-01 00:00:00'")
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("timestamp"),
      s"too-early timestamp error should mention timestamp: ${e2.getMessage}")
  }

  test("managed standalone tables survive a catalog restart") {
    val wh = TestSpark.tmpDir("cat-wh")
    val c = new graft.catalog.QbeastCatalog
    c.initialize("resto", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("default"), "managed1")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a BIGINT, b DOUBLE")
    c.createTable(ident, schema, Array.empty,
      java.util.Map.of("provider", "qbeast", "columnsToIndex", "a,b"))
    val loc = c.loadTable(ident).asInstanceOf[graft.catalog.QbeastTableImpl].location
    // simulated JVM restart: in-memory map gone, fresh catalog instance
    graft.catalog.QbeastCatalog.simulateRestart()
    val c2 = new graft.catalog.QbeastCatalog
    c2.initialize("resto", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    val back = c2.loadTable(ident).asInstanceOf[graft.catalog.QbeastTableImpl]
    assert(back.location == loc)
    assert(back.schema().fieldNames.toSeq == Seq("a", "b"))
    assert(c2.tableExists(ident))
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val loc = TestSpark.tmpDir("cat-tt")
    fresh("tt")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.tt (a BIGINT, b DOUBLE)
      USING qbeast OPTIONS ('columnsToIndex'='a,b') LOCATION '$loc'""")
    spark.sql("INSERT INTO qbeast_catalog.default.tt VALUES (1, 1.0), (2, 2.0)")
    Thread.sleep(1100) // distinct mtimes for TIMESTAMP AS OF
    val tsBetween = java.time.Instant.now().toString.replace("T", " ").takeWhile(_ != 'Z')
    spark.sql("INSERT INTO qbeast_catalog.default.tt VALUES (3, 3.0)")
    assert(spark.sql("SELECT count(*) FROM qbeast_catalog.default.tt").head.getLong(0) == 3)
    // VERSION AS OF: CREATE writes no log commit, so the first INSERT
    // is version 0 and the second is version 1
    assert(spark.sql("SELECT count(*) FROM qbeast_catalog.default.tt VERSION AS OF 0")
      .head.getLong(0) == 2)
    assert(spark.sql("SELECT count(*) FROM qbeast_catalog.default.tt VERSION AS OF 1")
      .head.getLong(0) == 3)
    // TIMESTAMP AS OF a point between the inserts sees only the first
    assert(spark.sql(
      s"SELECT count(*) FROM qbeast_catalog.default.tt TIMESTAMP AS OF '$tsBetween'")
      .head.getLong(0) == 2)
  }

  test("DROP TABLE purges managed data, keeps external data") {
    fresh("managed_purge")
    // managed: no LOCATION clause → warehouse-owned path, purged on drop
    spark.sql("""CREATE TABLE qbeast_catalog.default.managed_purge (a BIGINT, b DOUBLE)
      USING qbeast OPTIONS ('columnsToIndex'='a,b')""")
    spark.sql("INSERT INTO qbeast_catalog.default.managed_purge VALUES (1, 1.0)")
    val mloc = graft.catalog.QbeastCatalog.tableLocation("default", "managed_purge").get
    assert(new java.io.File(mloc).exists())
    spark.sql("DROP TABLE qbeast_catalog.default.managed_purge")
    assert(!new java.io.File(mloc).exists(), "managed data must be purged")
    // external: LOCATION given → data survives the drop
    val xloc = TestSpark.tmpDir("cat-ext")
    fresh("ext_keep")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.ext_keep (a BIGINT, b DOUBLE)
      USING qbeast OPTIONS ('columnsToIndex'='a,b') LOCATION '$xloc'""")
    spark.sql("INSERT INTO qbeast_catalog.default.ext_keep VALUES (1, 1.0)")
    spark.sql("DROP TABLE qbeast_catalog.default.ext_keep")
    assert(new java.io.File(xloc, "_qbeast_log").exists(), "external data must survive")
  }

  test("ALTER TABLE properties persist through the table log") {
    val loc = TestSpark.tmpDir("cat-alterlog")
    fresh("alt")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.alt (a BIGINT, b DOUBLE)
      USING qbeast OPTIONS ('columnsToIndex'='a,b') LOCATION '$loc'""")
    spark.sql("INSERT INTO qbeast_catalog.default.alt VALUES (1, 1.0)")
    spark.sql("ALTER TABLE qbeast_catalog.default.alt SET TBLPROPERTIES ('team'='graft')")
    // visible via the table's OWN metadata (no catalog in the loop)
    val t = graft.table.QbeastTable.forPath(spark, loc)
    assert(t.properties.get("team").contains("graft"))
    spark.sql("ALTER TABLE qbeast_catalog.default.alt UNSET TBLPROPERTIES ('team')")
    assert(!graft.table.QbeastTable.forPath(spark, loc).properties.contains("team"))
  }

}
