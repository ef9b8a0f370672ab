package graft

import org.scalatest.funsuite.AnyFunSuite

/** The README usage snippets, executed verbatim (reference:
 * DocumentationTests). If this fails, the docs lie. */
class DocumentationSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    s
  }

  test("README quickstart works as written") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "user_id")
      .withColumnRenamed("l_extendedprice", "price")
    val tbl = TestSpark.tmpDir("readme")

    df.write.format("qbeast")
      .option("columnsToIndex", "user_id,price")
      .option("cubeSize", "5000")
      .save(tbl)

    val sampled = spark.read.format("qbeast").load(tbl).sample(0.01)
    assert(sampled.count() > 0)

    // the standalone catalog is durable across JVMs; clear prior runs
    spark.sql("DROP TABLE IF EXISTS qbeast_catalog.default.readme_t")
    spark.sql(s"""CREATE TABLE qbeast_catalog.default.readme_t
      (id BIGINT, v DOUBLE) USING qbeast
      OPTIONS ('columnsToIndex'='id') LOCATION '${TestSpark.tmpDir("readme-t")}'""")
    spark.sql("""INSERT INTO qbeast_catalog.default.readme_t
      SELECT l_orderkey, l_extendedprice
      FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`""")
    assert(spark.sql("SELECT count(*) FROM qbeast_catalog.default.readme_t")
      .head().getLong(0) == 6000)
  }

  test("README maintenance entry points exist and run") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val tbl = TestSpark.tmpDir("readme2")
    df.write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice").save(tbl)
    graft.table.QbeastTable.forPath(spark, tbl).optimize()
    assert(spark.read.format("qbeast").load(tbl).count() == 6000)
  }

}
