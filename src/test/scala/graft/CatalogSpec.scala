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

  test("CREATE TABLE + INSERT INTO VALUES + SELECT") {
    val loc = TestSpark.tmpDir("cat-create")
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
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.ow (a BIGINT, b DOUBLE)
      USING qbeast OPTIONS ('columnsToIndex'='a,b') LOCATION '$loc'""")
    spark.sql("INSERT INTO qbeast_catalog.default.ow VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT OVERWRITE qbeast_catalog.default.ow VALUES (9, 9.0)")
    val rows = spark.sql("SELECT a FROM qbeast_catalog.default.ow").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(9L))
  }

}
