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

  test("README maintenance SQL (OPTIMIZE WHERE / VERIFY / REORG PURGE) works as written") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val tbl = TestSpark.tmpDir("readme-maint")
    df.write.format("qbeast")
      .option("columnsToIndex", "o_orderkey,o_totalprice")
      .option("deletionVectors", "true").save(tbl)
    val t = graft.table.QbeastTable.forPath(spark, tbl)
    // merge-on-read delete leaves masks for REORG to materialize
    assert(t.delete("o_orderkey % 100 = 7") > 0)
    assert(t.snapshot.dvs.nonEmpty)
    val liveRows = spark.read.format("qbeast").load(tbl).count()

    // VERIFY: FSCK-shaped audit, one row per issue — a healthy table
    // returns zero rows (masks and all)
    val issues = spark.sql(s"VERIFY '$tbl'")
    assert(issues.collect().isEmpty, issues.collect().mkString("\n"))

    // REORG ... APPLY (PURGE): rewrites ONLY the masked files; vectors
    // clear, content doesn't move
    val purged = spark.sql(s"REORG '$tbl' APPLY (PURGE)").collect()
    assert(purged.head.getLong(1) > 0, purged.mkString)
    assert(t.snapshot.dvs.isEmpty, "REORG PURGE must clear every vector")
    assert(spark.read.format("qbeast").load(tbl).count() == liveRows)

    // OPTIMIZE ... WHERE: repacks only matching files, content invariant
    spark.sql(s"OPTIMIZE '$tbl' WHERE o_totalprice >= 100000").collect()
    assert(spark.read.format("qbeast").load(tbl).count() == liveRows)

    // the purged vectors and rewritten files are now reclaimable
    assert(spark.sql(s"VACUUM '$tbl' RETAIN 0 HOURS FORCE").collect()
      .head.getLong(1) > 0)
    assert(spark.sql(s"VERIFY '$tbl'").collect().isEmpty)
    assert(spark.read.format("qbeast").load(tbl).count() == liveRows)
  }

  test("SQL-only dedup pipeline (registered graft_* functions) matches the Column API") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("dedup_docs")

    // exact dedup entirely in SQL (one representative per content hash)
    val sqlExact = spark.sql(
      """SELECT coalesce(md5(text), concat('__null__', cast(doc_id AS string))) AS content_hash,
        |  min(doc_id) AS doc_id, count(1) AS dup_count
        |FROM dedup_docs GROUP BY 1""".stripMargin)
    val apiExact = ops.Dedup.exactDedup(docs, "doc_id", "text")
    assert(sqlExact.count() == apiExact.count())
    assert(sqlExact.select("doc_id").exceptAll(apiExact.select("doc_id")).count() == 0)

    // MinHash near-dup candidates entirely in SQL: graft_minhash
    // signatures → 16 four-value bands → bucket equi-join → agreement
    // estimate — the same pipeline minHashCandidatePairs builds
    val sqlPairs = spark.sql(
      """WITH sig AS (
        |  SELECT doc_id, graft_minhash(text) AS s
        |  FROM dedup_docs WHERE size(split(trim(text), '\\s+')) >= 3),
        |bands AS (
        |  SELECT doc_id, s, b, slice(s, b * 4 + 1, 4) AS key
        |  FROM sig LATERAL VIEW explode(sequence(0, 15)) t AS b),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
        |scored AS (
        |  SELECT id_a, id_b,
        |    aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)
        |      / 64.0D AS est_jaccard
        |  FROM cand)
        |SELECT id_a, id_b, est_jaccard FROM scored WHERE est_jaccard >= 0.5""".stripMargin)
    val apiPairs = ops.Dedup.minHashCandidatePairs(docs, "doc_id", "text", threshold = 0.5)
    val sqlSet = sqlPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
    val apiSet = apiPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
    assert(sqlSet.nonEmpty, "fixture should contain near-duplicates")
    assert(sqlSet == apiSet,
      s"SQL dedup diverged: only-sql=${sqlSet -- apiSet}, only-api=${apiSet -- sqlSet}")
  }

  test("README sketch-rollup SQL (graft_kll_* / graft_hll_*) works as written") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("sketch_docs")

    // the README's percentile-rollup shape: states per fine group,
    // merged to a coarser rollup with no rescan
    val rolled = spark.sql(
      """WITH states AS (
        |  SELECT source, lang, graft_kll_state(CAST(n_chars AS DOUBLE)) AS st
        |  FROM sketch_docs GROUP BY source, lang)
        |SELECT source, graft_kll_merge(st, 0.5, 0.99) AS qs
        |FROM states GROUP BY source""".stripMargin)
    val direct = spark.sql(
      """SELECT source, graft_kll_quantiles(CAST(n_chars AS DOUBLE), 0.5, 0.99) AS qs
        |FROM sketch_docs GROUP BY source""".stripMargin)
    val a = rolled.select("source", "qs").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val b = direct.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(a == b, "state rollup must equal the direct sketch within capacity")

    // distinct-count twin (same rollup discipline, HLL registers)
    val hll = spark.sql(
      """WITH states AS (
        |  SELECT source, graft_hll_state(
        |    CAST(conv(substr(md5(text), 1, 8), 16, 10) AS BIGINT)) AS st
        |  FROM sketch_docs GROUP BY source)
        |SELECT source, graft_hll_merge(st).est AS est FROM states GROUP BY source""".stripMargin)
    assert(hll.collect().forall(_.getDouble(1) > 0))
  }

  test("README per-file sketch stats + date-function pruning work as written") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("id"), col("o_custkey").as("user_id"),
        col("o_totalprice").as("latency_ms"), col("o_orderdate").as("ts"))
    val path2 = TestSpark.tmpDir("readme-sketchstats")
    df.write.format("qbeast")
      .option("columnsToIndex", "id")
      .option("hllColumns", "user_id")
      .option("kllColumns", "latency_ms")
      .save(path2)
    val t2 = graft.table.QbeastTable.forPath(spark, path2)
    assert(t2.approxCountDistinct("user_id").exists(_.est > 0))
    val qs = t2.approxQuantile("latency_ms", Seq(0.5, 0.99))
      .getOrElse(fail("kll fold bailed"))
    assert(qs.length == 2 && qs(0) <= qs(1))

    // date-function filter: same rows as the raw frame, through the
    // derived-range rewrite
    val filt = "year(ts) = 1996 AND date_trunc('month', ts) >= timestamp'1996-06-01 00:00:00'"
    assert(spark.read.format("qbeast").load(path2).filter(filt).count() ==
      df.filter(filt).count())
  }

}
