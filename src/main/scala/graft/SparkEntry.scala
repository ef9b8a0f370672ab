package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Every entry reads the reference-surface tables through the qbeast
 * datasource (full engine in the loop: write→index→commit→prune→scan)
 * and must hash-match its `oracleSql` run by DuckDB over the raw
 * parquet. Aggregates over prices use exact decimal accumulation cast
 * back to double so both engines produce bit-identical values
 * regardless of partition/order. Column names are aligned 1:1 with the
 * oracle SQL.
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
   * sampled aggregate over the indexed table (sampling pushdown). */
  def entry(spark: SparkSession): DataFrame = {
    val li = QTables.qbeast(spark, "/root/testdata/sf0.001", "lineitem")
    li.sample(0.1)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), avg("l_extendedprice").as("avg_price"))
  }

  private def dec(c: org.apache.spark.sql.Column, scale: Int = 4) =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scan / write-read roundtrip ------------------------------------
    "q01_roundtrip_agg" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        sum("l_quantity").as("sum_qty"),
        dec(col("l_extendedprice")).as("sum_price"))
    }),
    "q02_pricing_summary" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          dec(col("l_extendedprice")).as("sum_base_price"),
          dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),
    // ---- filters (indexed-column pruning paths) -------------------------
    "q03_filter_range" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem")
        .filter(col("l_orderkey").between(100, 400) && col("l_extendedprice") < 50000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),
    "q04_filter_in" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") && col("l_orderkey") < 300)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    }),
    "q05_filter_compound" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem")
        .filter((col("l_orderkey") < 200 || col("l_orderkey") > 1300) &&
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    }),
    // ---- joins ----------------------------------------------------------
    "q06_join_broadcast" -> ((s, dir) => {
      val li = QTables.qbeast(s, dir, "lineitem")
      val o = QTables.qbeast(s, dir, "orders")
      li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
        .filter(col("o_totalprice") > 150000)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dec(col("l_extendedprice")).as("rev"))
    }),
    "q07_join_multi" -> ((s, dir) => {
      val li = QTables.qbeast(s, dir, "lineitem")
      val o = QTables.qbeast(s, dir, "orders")
      val c = QTables.qbeast(s, dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("rev"))
    }),
    "q08_semi_join" -> ((s, dir) => {
      val o = QTables.qbeast(s, dir, "orders")
      val li = QTables.qbeast(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    }),
    "q09_anti_join" -> ((s, dir) => {
      val c = QTables.qbeast(s, dir, "customer")
      val o = QTables.qbeast(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
    }),
    // ---- windows / sort / distinct --------------------------------------
    "q10_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // (l_orderkey, l_linenumber, l_extendedprice) is a total order on
      // the test data; ties on linenumber alone would make row_number
      // nondeterministic across engines
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
      QTables.qbeast(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("running",
          sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("rn") <= 2)
        .select("l_orderkey", "l_linenumber", "rn", "running")
    }),
    "q11_topk" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(100)
    }),
    "q12_distinct" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
    }),
    // ---- set operations --------------------------------------------------
    "q13_union" -> ((s, dir) => {
      val o = QTables.qbeast(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("k"))
      val c = QTables.qbeast(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k"))
      o.union(c).distinct()
    }),
    "q14_intersect" -> ((s, dir) => {
      val withOrders = QTables.qbeast(s, dir, "orders").select(col("o_custkey").as("k"))
      val rich = QTables.qbeast(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      withOrders.intersect(rich)
    }),
    "q15_except" -> ((s, dir) => {
      val all = QTables.qbeast(s, dir, "customer").select(col("c_custkey").as("k"))
      val withOrders = QTables.qbeast(s, dir, "orders").select(col("o_custkey").as("k"))
      all.except(withOrders)
    }),
    // ---- grouping sets / distinct agg ------------------------------------
    "q16_rollup" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sq"))
    }),
    "q17_count_distinct" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem").agg(
        countDistinct("l_orderkey").as("dk"),
        countDistinct("l_returnflag").as("df"))
    }),
    // ---- scalar functions -------------------------------------------------
    "q18_scalar_funcs" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          concat(upper(col("l_returnflag")), lit("-"), substring(col("l_linestatus"), 1, 1)).as("tag"),
          year(col("l_shipdate")).cast("long").as("yr"),
          month(col("l_shipdate")).cast("long").as("mo"),
          floor(col("l_extendedprice") / 1000).cast("long").as("price_k"),
          (col("l_orderkey") % 7).as("m7"),
          abs(col("l_discount") - col("l_tax")).cast("decimal(8,2)").cast("double").as("dt"))
    }),
    "q19_case_when" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem")
        .withColumn("bucket",
          when(col("l_extendedprice") < 20000, "low")
            .when(col("l_extendedprice") < 60000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    }),
    // ---- sampling pushdown (deterministic; no SQL oracle) ----------------
    "q20_sample" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem").sample(0.1)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dec(col("l_extendedprice")).as("sum_price"))
    }),
    "q21_sample_sql" -> ((s, dir) => {
      QTables.qbeast(s, dir, "lineitem").createOrReplaceTempView("li_q")
      s.sql("SELECT count(*) AS n FROM li_q TABLESAMPLE (5 PERCENT)")
    }),
    // ---- append / revisions ----------------------------------------------
    "q22_append_revisions" -> ((s, dir) => {
      QTables.qbeastAppended(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
          dec(col("l_extendedprice")).as("sum_price"))
    })
  )

  /** DuckDB-runnable oracles over the same raw parquet tables. Keys
   * without an oracle (sampling) get the driver's rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q01_roundtrip_agg" ->
      """SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem""".stripMargin,
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q03_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_orderkey BETWEEN 100 AND 400 AND l_extendedprice < 50000""".stripMargin,
    "q04_filter_in" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_orderkey < 300""".stripMargin,
    "q05_filter_compound" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty FROM lineitem
        |WHERE (l_orderkey < 200 OR l_orderkey > 1300)
        |AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' GROUP BY 1""".stripMargin,
    "q06_join_broadcast" ->
      """SELECT o_orderpriority, count(*) AS n,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 150000 GROUP BY 1""".stripMargin,
    "q07_join_multi" ->
      """SELECT c_mktsegment, count(*) AS n,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q08_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q10_window" ->
      """SELECT l_orderkey, l_linenumber, rn, running FROM (
        |SELECT l_orderkey, l_linenumber, row_number() OVER w AS rn,
        |sum(l_quantity) OVER w AS running FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t WHERE rn <= 2""".stripMargin,
    "q11_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q12_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q13_union" ->
      """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        |UNION SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0""".stripMargin,
    "q14_intersect" ->
      """SELECT o_custkey AS k FROM orders
        |INTERSECT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000""".stripMargin,
    "q15_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey AS k FROM orders""".stripMargin,
    "q16_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sq
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q17_count_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS dk, count(DISTINCT l_returnflag) AS df
        |FROM lineitem""".stripMargin,
    "q18_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |upper(l_returnflag) || '-' || substr(l_linestatus, 1, 1) AS tag,
        |CAST(year(l_shipdate) AS BIGINT) AS yr, CAST(month(l_shipdate) AS BIGINT) AS mo,
        |CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
        |l_orderkey % 7 AS m7,
        |CAST(CAST(abs(l_discount - l_tax) AS DECIMAL(8,2)) AS DOUBLE) AS dt
        |FROM lineitem WHERE l_orderkey < 500""".stripMargin,
    "q19_case_when" ->
      """SELECT CASE WHEN l_extendedprice < 20000 THEN 'low'
        |WHEN l_extendedprice < 60000 THEN 'mid' ELSE 'high' END AS bucket,
        |count(*) AS n, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1""".stripMargin,
    "q22_append_revisions" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1""".stripMargin
  )

}
