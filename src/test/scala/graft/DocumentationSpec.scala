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

  test("README table-format SQL and feed surface works as written") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val tbl = TestSpark.tmpDir("readme3")
    df.write.format("qbeast")
      .option("columnsToIndex", "o_orderkey,o_totalprice")
      .option("enableChangeDataFeed", "true").save(tbl)
    val t = graft.table.QbeastTable.forPath(spark, tbl)
    t.delete("o_orderkey % 100 = 7")

    // every SQL statement from the README block parses and runs
    spark.sql(s"OPTIMIZE '$tbl'").collect()
    spark.sql(s"DESCRIBE HISTORY '$tbl'").collect()
    spark.sql(s"DESCRIBE DETAIL '$tbl'").collect()
    val cloneDir = TestSpark.tmpDir("readme3-clone")
    spark.sql(s"CLONE '$tbl' TO '$cloneDir'").collect()
    spark.sql(s"RESTORE '$tbl' TO VERSION AS OF 1").collect()
    assert(spark.sql(s"SELECT * FROM table_changes('$tbl', 1, 1)").count() > 0)
    spark.sql(
      s"ALTER TABLE '$tbl' ADD CONSTRAINT price_ok CHECK (o_totalprice > 0)").collect()
    spark.sql(s"ALTER TABLE '$tbl' DROP CONSTRAINT price_ok").collect()

    // metadata-only aggregate folds without scanning (before the source
    // vacuum: a zero-retention vacuum of the SOURCE reclaims files the
    // shallow clone references — the documented clone caveat)
    val agg = spark.read.format("qbeast").load(cloneDir)
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
        max(col("o_orderkey")).as("mx"))
    assert(agg.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.isEmpty, "count/min/max should fold to metadata")
    assert(agg.collect().head.getLong(0) > 0)

    spark.sql(s"VACUUM '$tbl' RETAIN 0 HOURS FORCE").collect()
  }

}
