package graft

import graft.rules.SampleRule

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Shared access to the driver testdata: raw parquet plus cached
 * qbeast-indexed copies (written once per scale factor under /tmp, keyed
 * by the sf dir name). All SparkEntry queries exercising the reference
 * surface read through the qbeast copies so the whole engine is in the
 * loop; oracles run on the raw parquet.
 */
object QTables {

  /** table → (columnsToIndex, cubeSize) */
  val indexSpecs: Map[String, (String, Int)] = Map(
    "lineitem" -> ("l_orderkey,l_extendedprice", 5000),
    "orders" -> ("o_orderkey,o_custkey", 5000),
    "customer" -> ("c_custkey,c_acctbal", 2000),
    "part" -> ("p_partkey,p_retailprice", 2000),
    // ts encoding varies across fixture generations (see EventTime) —
    // index the long ids, which are stable under both
    "events" -> ("user_id,event_id", 5000),
    // non-indexable array<float> column passes through untouched
    "embeddings" -> ("vec_id,label", 2000),
    // string-heavy table; long text payloads ride through the index
    "documents" -> ("doc_id,n_chars", 2000))

  /** Variant index layouts (table, variant) → (source, columns, cubeSize):
   * 3-dim with a Timestamp dimension; hash-indexed string dimension. */
  val variantSpecs: Map[String, (String, String, Int)] = Map(
    "lineitem_3d" -> ("lineitem", "l_orderkey,l_extendedprice,l_shipdate", 5000),
    "customer_hash" -> ("customer", "c_mktsegment:hashing,c_custkey", 2000))

  def qbeastVariant(spark: SparkSession, sfDir: String, variant: String): DataFrame = {
    ensureExtensions(spark)
    val (source, cols, cubeSize) = variantSpecs(variant)
    val path = cachePath(sfDir, variant)
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, source).write.format("qbeast")
          .option("columnsToIndex", cols)
          .option("cubeSize", cubeSize.toString)
          .mode("overwrite")
          .save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  private val lock = new Object

  def raw(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    if (table == "events") {
      // legacy fixtures store ts as TIMESTAMP(NANOS), readable only as
      // long; a no-op for the current timestamp[us] encoding. Consumers
      // access ts through EventTime, which adapts to either type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    if (table == "embeddings") normalizeEmbeddings(df) else df
  }

  /** The similarity kit is `array<float>`-typed end to end; a fixture
   * regeneration that ships `embedding` as list<double> (the same kind
   * of drift that broke the events `ts` column in round 9) must adapt
   * HERE, at the single chokepoint every consumer reads through, not
   * fail at analysis time in ten queries. */
  private[graft] def normalizeEmbeddings(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema.find(_.name == "embedding").map(_.dataType) match {
      case Some(ArrayType(FloatType, _)) => df
      case Some(ArrayType(e: NumericType, _)) =>
        df.withColumn("embedding",
          org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
      case Some(other) =>
        // a non-numeric element type is incompatible drift — casting
        // would produce silent nulls; fail loudly instead
        throw new IllegalStateException(
          s"embeddings fixture drifted to an incompatible type: $other")
      case None => df
    }
  }

  /** The qbeast-indexed copy of `table`, writing it on first use. */
  def qbeast(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, table)
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val (cols, cubeSize) = indexSpecs(table)
        raw(spark, sfDir, table).write.format("qbeast")
          .option("columnsToIndex", cols)
          .option("cubeSize", cubeSize.toString)
          .mode("overwrite")
          .save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** Orders after an overwrite + copy-on-write delete + zero-retention
   * vacuum: the overwrite's dead files and the delete's removed files
   * are physically gone, and the builder PROVES it — every parquet file
   * left on disk must be referenced by the live snapshot (at 100 TB,
   * unreclaimed rewrite garbage doubles storage). Content equals
   * orders minus the deleted predicate. */
  def qbeastVacuumed(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_vacuumed")
    val conf = spark.sparkContext.hadoopConfiguration
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, conf)) {
        val (cols, cubeSize) = indexSpecs("orders")
        def write(df: DataFrame, mode: String): Unit = df.write.format("qbeast")
          .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
          .mode(mode).save(path)
        val o = raw(spark, sfDir, "orders")
        write(o.filter("o_orderkey % 5 = 0"), "errorifexists") // soon-dead files
        write(o, "overwrite") // replaces everything above
        graft.table.QbeastTable.forPath(spark, path).delete("o_orderkey % 7 = 3")
        val removed = graft.table.QbeastTable.forPath(spark, path)
          .vacuum(retainMillis = 0L, force = true)
        require(removed > 0, "vacuum should have had dead files to delete")
        assertNoDeadFiles(spark, path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** Orders with a deterministic append → delete → update history; the
   * change data feed over versions 1..3 is the query result. Built
   * once; the builder pins the expected version numbering so the
   * oracle's replay stays aligned. */
  def qbeastChangesFeed(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_cdf")
    val conf = spark.sparkContext.hadoopConfiguration
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, conf)) {
        // a half-built history must not poison the existence-keyed
        // cache: wipe on ANY failure so the next run rebuilds fully
        try {
          val (cols, cubeSize) = indexSpecs("orders")
          def write(df: DataFrame, mode: String): Unit = df.write.format("qbeast")
            .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
            .mode(mode).save(path)
          val o = raw(spark, sfDir, "orders")
          write(o.filter("o_orderkey % 10 < 5"), "errorifexists") // v0
          write(o.filter("o_orderkey % 10 IN (5, 6)"), "append") // v1
          val t = graft.table.QbeastTable.forPath(spark, path)
          val deleted = t.delete("o_orderstatus = 'F' AND o_orderkey % 100 < 50") // v2
          require(deleted > 0, "cdf fixture: the delete must hit rows")
          val updated = t.update("o_orderkey % 7 = 0",
            Map("o_totalprice" -> "o_totalprice + 1")) // v3
          require(updated > 0, "cdf fixture: the update must hit rows")
          require(t.snapshot.version == 3,
            s"cdf fixture: expected version 3, got ${t.snapshot.version}")
        } catch {
          case e: Throwable =>
            new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
              .delete(new org.apache.hadoop.fs.Path(path), true)
            throw e
        }
      }
    }
    graft.table.QbeastTable.forPath(spark, path).changes(1)
  }

  /** A shallow clone of the canonical orders table with a
   * copy-on-write delete applied to the CLONE only; the builder
   * asserts zero data files were copied and that the source table is
   * untouched. Content: orders minus the clone-side delete. */
  def qbeastCloned(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    qbeast(spark, sfDir, "orders") // ensure the source exists
    val srcPath = cachePath(sfDir, "orders")
    val path = cachePath(sfDir, "orders_clone")
    val conf = spark.sparkContext.hadoopConfiguration
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, conf)) {
        try {
          val src = graft.table.QbeastTable.forPath(spark, srcPath)
          val srcVersion = src.snapshot.version
          val cloned = src.cloneTo(path)
          val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
          val copied = fs.listStatus(new org.apache.hadoop.fs.Path(path))
            .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          require(copied == 0, s"shallow clone copied $copied data files")
          val deleted = cloned.delete("o_orderkey % 3 = 0")
          require(deleted > 0, "clone fixture: the delete must hit rows")
          require(src.snapshot.version == srcVersion,
            "clone fixture: the source table moved")
        } catch {
          case e: Throwable =>
            new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
              .delete(new org.apache.hadoop.fs.Path(path), true)
            throw e
        }
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** Post-vacuum invariant: every parquet file on disk is referenced by
   * the live snapshot and vice versa. */
  private def assertNoDeadFiles(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = graft.log.QbeastLog.snapshot(path, conf).files.map(_.path).toSet
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    require(onDisk == live,
      s"vacuum left non-live files: ${(onDisk -- live).take(5)} / " +
        s"deleted live files: ${(live -- onDisk).take(5)}")
  }

  /** Orders maintained through the SQL statements (injectParser
   * surface): split write + append, `OPTIMIZE '<path>'` repack, then
   * `VACUUM '<path>' RETAIN 0 HOURS FORCE` — the optimize's rewritten
   * originals must be physically reclaimed and content must equal the
   * full raw table. */
  def qbeastSqlMaintained(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_sql_maint")
    val conf = spark.sparkContext.hadoopConfiguration
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, conf)) {
        // a half-built table must not poison the existence-keyed cache:
        // if ANY step fails (e.g. a session built without the parser
        // extension, where spark.sql("OPTIMIZE ...") can't parse), wipe
        // the path so the next call re-runs the WHOLE sequence instead
        // of serving an unmaintained table as if maintained
        try {
          val (cols, cubeSize) = indexSpecs("orders")
          val o = raw(spark, sfDir, "orders")
          o.filter("o_orderkey % 3 = 0").write.format("qbeast")
            .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
            .save(path)
          o.filter("o_orderkey % 3 <> 0").write.format("qbeast")
            .mode("append").save(path)
          spark.sql(s"OPTIMIZE '$path'").collect()
          val deleted = spark.sql(s"VACUUM '$path' RETAIN 0 HOURS FORCE")
            .collect().head.getLong(1)
          require(deleted > 0, "SQL VACUUM should have reclaimed optimize garbage")
          assertNoDeadFiles(spark, path)
        } catch {
          case e: Throwable =>
            new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
              .delete(new org.apache.hadoop.fs.Path(path), true)
            throw e
        }
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** Orders cloned and then maintained ENTIRELY through SQL:
   * `CLONE '<src>' TO '<dst>'` (metadata-only, absolute references)
   * followed by `OPTIMIZE '<dst>'` — the optimize must read through
   * the absolute references and land clone-local rewrites without the
   * source table moving. Content equals full orders. */
  def qbeastSqlCloned(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    qbeast(spark, sfDir, "orders") // ensure the source exists
    val srcPath = cachePath(sfDir, "orders")
    val path = cachePath(sfDir, "orders_sql_clone")
    val conf = spark.sparkContext.hadoopConfiguration
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, conf)) {
        try {
          val srcVersion = graft.table.QbeastTable.forPath(spark, srcPath)
            .snapshot.version
          val files = spark.sql(s"CLONE '$srcPath' TO '$path'")
            .collect().head.getLong(1)
          require(files > 0, "SQL CLONE should reference files")
          spark.sql(s"OPTIMIZE '$path'").collect()
          require(graft.table.QbeastTable.forPath(spark, srcPath)
            .snapshot.version == srcVersion, "SQL clone moved the source")
        } catch {
          case e: Throwable =>
            new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
              .delete(new org.apache.hadoop.fs.Path(path), true)
            throw e
        }
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** Orders built under a CHECK constraint: half the table written,
   * `ALTER TABLE ... ADD CONSTRAINT` (validates the existing half),
   * the other half appended THROUGH the gate, and a violating append
   * proven to fail without changing the table. Content = full
   * orders. */
  def qbeastConstrained(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_constrained")
    val conf = spark.sparkContext.hadoopConfiguration
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, conf)) {
        try {
          val (cols, cubeSize) = indexSpecs("orders")
          def write(df: DataFrame, mode: String): Unit = df.write.format("qbeast")
            .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
            .mode(mode).save(path)
          val o = raw(spark, sfDir, "orders")
          write(o.filter("o_orderkey % 2 = 0"), "errorifexists")
          spark.sql(s"ALTER TABLE '$path' ADD CONSTRAINT price_positive " +
            "CHECK (o_totalprice > 0)").collect()
          write(o.filter("o_orderkey % 2 = 1"), "append") // gated, clean
          val versionBefore = graft.table.QbeastTable.forPath(spark, path)
            .snapshot.version
          val failed =
            try {
              write(o.limit(5).withColumn("o_totalprice",
                org.apache.spark.sql.functions.lit(-1.0)), "append")
              false
            }
            catch { case e: Throwable => e.getMessage.contains("price_positive") }
          require(failed, "violating append must fail naming the constraint")
          require(graft.table.QbeastTable.forPath(spark, path)
            .snapshot.version == versionBefore,
            "failed append must not commit")
        } catch {
          case e: Throwable =>
            new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
              .delete(new org.apache.hadoop.fs.Path(path), true)
            throw e
        }
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** A small orders table taken through a fixed operation sequence so
   * `QbeastTable.history()` has a deterministic shape: v0 WRITE,
   * v1 OVERWRITE, v2 WRITE (append), v3 DELETE, v4 OPTIMIZE. */
  def qbeastHistoried(spark: SparkSession, sfDir: String): String = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_historied")
    val conf = spark.sparkContext.hadoopConfiguration
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, conf)) {
        val (cols, cubeSize) = indexSpecs("orders")
        def write(df: DataFrame, mode: String): Unit = df.write.format("qbeast")
          .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
          .mode(mode).save(path)
        val o = raw(spark, sfDir, "orders")
        write(o.filter("o_orderkey % 2 = 0"), "errorifexists") // v0 WRITE
        write(o, "overwrite") // v1 OVERWRITE (covers the full key domain)
        write(o.filter("o_orderkey % 11 = 5"), "append") // v2 WRITE
        graft.table.QbeastTable.forPath(spark, path).delete("o_orderkey % 13 = 2") // v3
        graft.table.QbeastTable.forPath(spark, path).optimize() // v4
      }
    }
    path
  }

  /** A lineitem table built by an initial write plus an append (exercises
   * revision merging); content equals the full raw table. */
  def qbeastAppended(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "lineitem_appended")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val li = raw(spark, sfDir, "lineitem")
        val (cols, cubeSize) = indexSpecs("lineitem")
        li.filter("l_orderkey % 2 = 0").write.format("qbeast")
          .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
          .save(path)
        li.filter("l_orderkey % 2 = 1").write.format("qbeast")
          .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
          .mode("append").save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** A customer table evolved on append: the first write carries only
   * the base columns; a second append arrives with `mergeSchema=true`
   * and an extra column. Old files are never rewritten — the widened
   * column reads as null from them (metadata-only evolution, the shape
   * that works on a 100 TB table). */
  def qbeastEvolved(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "customer_evolved")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val c = raw(spark, sfDir, "customer")
        c.filter("c_custkey % 2 = 0").select("c_custkey", "c_acctbal")
          .write.format("qbeast")
          .option("columnsToIndex", "c_custkey,c_acctbal")
          .option("cubeSize", "2000")
          .save(path)
        c.filter("c_custkey % 2 = 1")
          .select("c_custkey", "c_acctbal", "c_mktsegment")
          .write.format("qbeast")
          .option("mergeSchema", "true")
          .mode("append").save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** A customer table exercised through logical→physical column mapping
   * (ALTER TABLE RENAME/DROP COLUMN as metadata-only commits): the
   * acctbal column is RENAMED mid-history, a DML delete then runs under
   * the new name, another column is DROPPED, and a post-rename append
   * lands rows under the new logical name — all without rewriting a
   * single pre-rename file (their parquet footers keep the immutable
   * physical name; scans resolve through QbeastParquetFileFormat). */
  def qbeastMapped(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "customer_mapped")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val c = raw(spark, sfDir, "customer")
        // v0: even keys, pre-rename column names
        c.filter("c_custkey % 2 = 0")
          .select("c_custkey", "c_acctbal", "c_mktsegment")
          .write.format("qbeast").option("columnsToIndex", "c_custkey")
          .option("cubeSize", "2000").save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        t.renameColumn("c_acctbal", "balance") // metadata-only
        t.delete("balance < 0") // DML under the renamed name
        t.dropColumn("c_mktsegment") // metadata-only
        // post-rename append under the NEW logical name (physical
        // parquet column stays the original)
        c.filter("c_custkey % 2 = 1")
          .selectExpr("c_custkey", "c_acctbal AS balance")
          .write.format("qbeast").mode("append").save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** A customer table whose columns were TYPE-WIDENED by metadata-only
   * commits (ALTER COLUMN TYPE, the Delta `typeWidening` design):
   * v0 writes nk as INT and bal as FLOAT, the widen commits change
   * them to BIGINT/DOUBLE (old parquet footers keep the narrow types —
   * the scan upcasts per batch), the append lands BIGINT values no int
   * can hold, and a mixed-era DELETE removes rows from both eras. */
  def qbeastWidened(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "customer_widened")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val c = raw(spark, sfDir, "customer")
        // v0: narrow types over several files
        c.filter("c_custkey % 2 = 0")
          .selectExpr("c_custkey", "CAST(c_nationkey AS INT) AS nk",
            "CAST(c_acctbal AS FLOAT) AS bal")
          .write.format("qbeast").option("columnsToIndex", "c_custkey")
          .option("cubeSize", "2000").save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        t.widenColumn("nk", org.apache.spark.sql.types.LongType)
        t.widenColumn("bal", org.apache.spark.sql.types.DoubleType)
        // wide-era append: some nk values exceed Int.MaxValue
        c.filter("c_custkey % 2 = 1")
          .selectExpr("c_custkey",
            "CAST(CASE WHEN c_custkey % 97 = 0 THEN c_custkey + 3000000000 " +
              "ELSE c_nationkey END AS BIGINT) AS nk",
            "CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE) AS bal")
          .write.format("qbeast").mode("append").save(path)
        // mixed-era DML under the widened type
        t.delete("nk >= 5 AND nk <= 9")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** An orders-derived table with GENERATED columns (Delta `GENERATED
   * ALWAYS AS`): `o_year` derives from the order timestamp and is
   * INDEXED — the table is physically organized by a column no write
   * ever supplies — and `o_mod` derives from the customer key. History:
   * computed first write → enforced append (values supplied and checked
   * per row) → UPDATE of the referenced timestamp (o_year recomputes
   * for the matched rows) → DELETE keyed on the derived o_mod (per-file
   * stats over the stored column prune it like any other). */
  def qbeastGenerated(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_generated")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        // v0: generated columns COMPUTED (the frame omits them)
        o.filter("o_orderkey % 2 = 0")
          .write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_year")
          .option("cubeSize", "5000")
          .option("generatedColumns",
            "o_year:year(o_orderdate);o_mod:CAST(o_custkey % 7 AS INT)")
          .save(path)
        // v1: generated columns SUPPLIED — enforced per row in the task
        o.filter("o_orderkey % 2 = 1")
          .selectExpr("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
            "CAST(year(o_orderdate) AS INT) AS o_year",
            "CAST(o_custkey % 7 AS INT) AS o_mod")
          .write.format("qbeast").mode("append").save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        // v2: UPDATE moves the referenced timestamp — o_year recomputes
        t.update("o_orderkey % 10 = 3",
          Map("o_orderdate" -> "o_orderdate + INTERVAL 400 DAY"))
        // v3: DELETE keyed on the derived column
        t.delete("o_mod = 5")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** A customer table whose column name was RELEASED by an
   * overwriteSchema overwrite and RE-ADDED at a different type by a
   * later mergeSchema append — a legal drop-then-re-add path that
   * never relies on column mapping. The overwrite replaces
   * the file set in the same commit, so no live file carries stats for
   * `tag` recorded under the old DOUBLE type. */
  def qbeastReAdded(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "customer_readded")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val c = raw(spark, sfDir, "customer")
        // v0: tag is DOUBLE, wide numeric stats
        c.filter("c_custkey % 2 = 1")
          .selectExpr("c_custkey", "c_acctbal AS tag")
          .write.format("qbeast").option("columnsToIndex", "c_custkey")
          .option("cubeSize", "2000").save(path)
        // v1: schema replaced — the name is released, v0 files removed
        c.filter("c_custkey % 2 = 0").selectExpr("c_custkey", "c_name")
          .write.format("qbeast").mode("overwrite")
          .option("overwriteSchema", "true")
          .option("columnsToIndex", "c_custkey")
          .option("cubeSize", "2000").save(path)
        // v2: tag re-added as STRING via metadata-only evolution
        c.filter("c_custkey % 4 = 1")
          .selectExpr("c_custkey", "c_name", "c_mktsegment AS tag")
          .write.format("qbeast").mode("append")
          .option("mergeSchema", "true").save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** A qbeast table adopted from plain parquet files (staging revision
   * only, no rewrite) — reference ConvertToQbeast semantics. */
  def qbeastConverted(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "lineitem_converted")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        // rewrite (not Files.copy) so the fixture works whether the
        // source is a single parquet file or a spark-written directory
        // (e.g. the ScaleData-derived scale factors)
        raw(spark, sfDir, "lineitem").write.mode("overwrite").parquet(path)
        graft.table.QbeastTable.convertFromParquet(spark, path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** An indexed table that has been compacted with optimize() after an
   * append (index-preserving rewrite). */
  def qbeastOptimized(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "lineitem_optimized")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val li = raw(spark, sfDir, "lineitem")
        li.filter("l_orderkey % 2 = 0").write.format("qbeast")
          .option("columnsToIndex", "l_orderkey,l_extendedprice")
          .option("cubeSize", "2000").save(path)
        li.filter("l_orderkey % 2 = 1").write.format("qbeast")
          .option("columnsToIndex", "l_orderkey,l_extendedprice")
          .option("cubeSize", "2000").mode("append").save(path)
        // optimize every indexed revision — an append that bumped the
        // revision leaves the older revision's files fragmented otherwise
        val t = graft.table.QbeastTable.forPath(spark, path)
        t.revisionIDs.filter(_ > 0).foreach(rid => t.optimize(rid))
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** lineitem loaded through the SQL catalog surface: CREATE TABLE ...
   * USING qbeast + INSERT INTO ... SELECT. Returns the catalog table name. */
  def catalogTable(spark: SparkSession, sfDir: String): String = {
    ensureExtensions(spark)
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    val sfName = new java.io.File(sfDir).getName
    val tableName = s"qbeast_catalog.default.lineitem_${sfName.replace(".", "_")}"
    val path = cachePath(sfDir, "lineitem_catalog")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        spark.sql(s"""CREATE TABLE IF NOT EXISTS $tableName
          (l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_returnflag STRING)
          USING qbeast
          OPTIONS ('columnsToIndex'='l_orderkey,l_extendedprice', 'cubeSize'='5000')
          LOCATION '$path'""")
        raw(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem_src_cat")
        spark.sql(s"""INSERT INTO $tableName
          SELECT l_orderkey, l_quantity, l_extendedprice, l_returnflag FROM lineitem_src_cat""")
      } else {
        spark.sql(s"""CREATE TABLE IF NOT EXISTS $tableName
          (l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_returnflag STRING)
          USING qbeast
          OPTIONS ('columnsToIndex'='l_orderkey,l_extendedprice', 'cubeSize'='5000')
          LOCATION '$path'""")
      }
    }
    tableName
  }

  /** A 2-revision table (second append widens the space → revision bump)
   * collapsed into the latest revision by compactRevisions(); content
   * still equals the full raw table. */
  def qbeastCompacted(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "lineitem_compacted")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val li = raw(spark, sfDir, "lineitem")
        val cut = li.agg(org.apache.spark.sql.functions.expr("percentile(l_orderkey, 0.5)"))
          .head.getDouble(0).toLong
        li.filter(s"l_orderkey <= $cut").write.format("qbeast")
          .option("columnsToIndex", "l_orderkey,l_extendedprice")
          .option("cubeSize", "2000").save(path)
        li.filter(s"l_orderkey > $cut").write.format("qbeast")
          .option("columnsToIndex", "l_orderkey,l_extendedprice")
          .option("cubeSize", "2000").mode("append").save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        require(t.revisionIDs.count(_ > 0) >= 2,
          s"expected a revision bump, got ${t.revisionIDs}")
        t.compactRevisions()
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** A table that went through CREATE OR REPLACE TABLE ... AS SELECT
   * twice (staged, atomic RTAS): the surviving content is the second
   * (filtered) definition. Returns the catalog table name. */
  def replacedTable(spark: SparkSession, sfDir: String): String = {
    ensureExtensions(spark)
    spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    val sfName = new java.io.File(sfDir).getName
    val table = s"qbeast_catalog.default.orders_replaced_${sfName.replace(".", "_")}"
    val path = cachePath(sfDir, "orders_replaced")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").createOrReplaceTempView("orders_src_rep")
        spark.sql(s"""CREATE OR REPLACE TABLE $table
          USING qbeast OPTIONS ('columnsToIndex'='o_orderkey,o_totalprice', 'cubeSize'='5000')
          LOCATION '$path'
          AS SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders_src_rep""")
        spark.sql(s"""CREATE OR REPLACE TABLE $table
          USING qbeast OPTIONS ('columnsToIndex'='o_orderkey,o_totalprice', 'cubeSize'='5000')
          LOCATION '$path'
          AS SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders_src_rep
          WHERE o_totalprice > 150000""")
      } else {
        spark.sql(s"""CREATE TABLE IF NOT EXISTS $table
          (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
          USING qbeast OPTIONS ('columnsToIndex'='o_orderkey,o_totalprice')
          LOCATION '$path'""")
      }
    }
    table
  }

  /** part indexed with a CDF-quantile transformer on p_brand (quantiles
   * computed by QbeastUtils) + linear price. */
  def qbeastQuantilePart(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "part_quantiles")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val part = raw(spark, sfDir, "part")
        val brandQ = graft.utils.QbeastUtils
          .computeStringQuantilesForColumn(part, "p_brand", 20)
        part.write.format("qbeast")
          .option("columnsToIndex", "p_brand:quantiles,p_retailprice")
          .option("columnStats", s"""{"p_brand_quantiles": $brandQ}""")
          .option("cubeSize", "2000")
          .save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** part indexed with the (reference-compatible, deprecated-upstream)
   * string HISTOGRAM transformer on p_type: values bin against explicit
   * sorted bounds; range predicates on p_type prune files. */
  def qbeastHistogramPart(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "part_histogram")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        // explicit bounds at the observed p_type prefixes
        val bounds = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
          .map("\"" + _ + "\"").mkString("[", ",", "]")
        raw(spark, sfDir, "part").write.format("qbeast")
          .option("columnsToIndex", "p_type:histogram,p_retailprice")
          .option("columnStats", s"""{"p_type_histogram": $bounds}""")
          .option("cubeSize", "2000")
          .save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** embeddings with a write-time IVF cluster column (argmax cosine to
   * the deterministic anchor vectors), co-located by cluster and
   * qbeast-indexed on it — ANN queries become file-pruned scans of the
   * probed clusters, with no clustering model anywhere in the query
   * path (VERDICT r1 item 3). */
  def qbeastIvfEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "embeddings_ivf")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val emb = raw(spark, sfDir, "embeddings")
        val anchors = ops.Similarity.collectAnchors(emb, "vec_id", "embedding")
        emb.withColumn("cluster",
            ops.Similarity.anchorClusterCol(anchors,
              org.apache.spark.sql.functions.col("embedding")))
          .repartition(org.apache.spark.sql.functions.col("cluster"))
          .write.format("qbeast")
          .option("columnsToIndex", "cluster,vec_id")
          .option("cubeSize", "2000")
          .save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** embeddings with a write-time LSH bucket column (6-bit
   * sign-projection over the deterministic hyperplanes), co-located by
   * bucket and qbeast-indexed on it — the LSH twin of
   * [[qbeastIvfEmbeddings]]: multi-probe ANN queries become file-pruned
   * scans of the probed buckets (VERDICT r10 item 1). columnStats pin
   * the bucket space to [0, 2^bits) so every bucket equality transforms
   * to the same coordinate on every write. */
  def qbeastLshEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "embeddings_lsh")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val emb = raw(spark, sfDir, "embeddings")
        val dim = emb.select(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("embedding"))).head().getInt(0)
        emb.withColumn("bucket",
            ops.Similarity.lshBucket(
              org.apache.spark.sql.functions.col("embedding"), bits = 6, dim = dim))
          .repartition(org.apache.spark.sql.functions.col("bucket"))
          .write.format("qbeast")
          // single-dim index: every tree level HALVES the bucket range,
          // so bucket resolution reaches 1 value at depth log2(64) with
          // 2^d cubes — a 2-dim (bucket, vec_id) tree would spend 4^d
          // cubes for the same resolution, and the multi-probe point
          // queries never constrain vec_id anyway
          .option("columnsToIndex", "bucket")
          .option("columnStats", """{"bucket_min": 0, "bucket_max": 64}""")
          // small cubes on purpose: bucket resolution is 2^treeDepth,
          // and the embeddings fixtures are small — cubeSize 2000 left
          // the whole table in 1-5 files each spanning many buckets
          // (zero pruning, AnnProbe-measured); 250 cuts enough depth
          // that the 22-probe scan skips files even at sf0.1
          .option("cubeSize", "250")
          .save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** [[qbeastLshEmbeddings]] with merge-on-read DELETE masks on top:
   * `DELETE WHERE vec_id % 17 = 3` is opaque to per-file stats on a
   * bucket-indexed table, so every affected file keeps its bytes and
   * gains a deletion vector — the e15 shape proving the rule-planted
   * dv mask COMPOSES with the multi-probe pruned scan (the builder
   * asserts masks exist AND the probe scan still skips files). */
  def qbeastLshEmbeddingsMasked(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureExtensions(spark)
    val path = cachePath(sfDir, "embeddings_lsh_masked")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val emb = raw(spark, sfDir, "embeddings")
        val dim = emb.select(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("embedding"))).head().getInt(0)
        emb.withColumn("bucket",
            ops.Similarity.lshBucket(col("embedding"), bits = 6, dim = dim))
          .repartition(col("bucket"))
          .write.format("qbeast")
          .option("columnsToIndex", "bucket")
          .option("columnStats", """{"bucket_min": 0, "bucket_max": 64}""")
          .option("cubeSize", "250")
          .option("deletionVectors", "true")
          .save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        val deleted = t.delete("vec_id % 17 = 3")
        require(deleted > 0, "masked LSH fixture: the delete matched nothing")
        val snap = t.snapshot
        require(snap.dvs.nonEmpty,
          "masked LSH fixture: the delete must mask, not rewrite")
        // the pruning invariant the fixture exists for: a single-bucket
        // probe over the MASKED table must still skip files
        val one = spark.read.format("qbeast").load(path).filter(col("bucket") === 0)
        val read = one.select(org.apache.spark.sql.functions
          .input_file_name()).distinct().count()
        val total = snap.files.size
        require(read < total,
          s"masked LSH fixture: bucket probe read $read of $total files — mask broke pruning")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders ingested as FIVE autoCompact appends (minNumFiles forced
   * low so the folding actually fires at fixture scale): the table the
   * q85 oracle reads must be byte-identical in CONTENT to raw orders
   * while its file count and commit history prove the background
   * compaction ran — the builder asserts both. */
  def qbeastAutoCompacted(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_autocompact")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val prev = spark.conf.getOption("spark.qbeast.autoCompact.minNumFiles")
        spark.conf.set("spark.qbeast.autoCompact.minNumFiles", "6")
        try {
          val orders = raw(spark, sfDir, "orders")
          // the slivers must be genuinely SUB-ROLLUP at every scale
          // factor or compactSmallFiles' progress guard (correctly)
          // refuses to fold files already at their natural size — so
          // the rollup target scales WITH the sliver (4x), instead of a
          // fixed 5000 that a bigger sf's slivers outgrow (this exact
          // fixture deterministically stopped firing at sf0.1+ when the
          // guard landed, masked by the /tmp cache until a fresh build)
          val sliver = math.max(1L, orders.count() / 10)
          val cube = math.max(5000L, sliver * 4)
          (0 until 10).foreach { i =>
            val w = orders.filter(col("o_orderkey") % 10 === i)
              .write.format("qbeast").option("cubeSize", cube.toString)
            (if (i == 0)
              w.option("columnsToIndex", "o_orderkey,o_totalprice")
                .option("autoCompact", "true")
            else w.mode("append")).save(path)
          }
          val ops = graft.table.QbeastTable.forPath(spark, path)
            .history().map(_.operation)
          require(ops.contains("OPTIMIZE"),
            "auto-compaction must have fired during the 10-append ingest")
        } finally {
          prev match {
            case Some(v) => spark.conf.set("spark.qbeast.autoCompact.minNumFiles", v)
            case None => spark.conf.unset("spark.qbeast.autoCompact.minNumFiles")
          }
        }
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders ingested as two boundary-split batches, then compacted with
   * `OPTIMIZE ... WHERE o_totalprice < 100000` through SQL: only the
   * low-price batch's files may match, so the high batch's files must
   * survive UNTOUCHED (path-asserted) while content stays exactly
   * orders — the predicate scopes the REPACK, it never filters rows. */
  def qbeastOptimizedWhere(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_optwhere")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        val cut = col("o_totalprice") < 100000.0
        o.filter(cut).write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "2000").save(path)
        o.filter(!cut).write.format("qbeast")
          .option("cubeSize", "2000").mode("append").save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        val before = t.snapshot.files.map(_.path).toSet
        spark.sql(s"OPTIMIZE '$path' WHERE o_totalprice < 100000.0")
        val after = t.snapshot.files
        val untouched = after.map(_.path).toSet.intersect(before)
        require(untouched.nonEmpty && untouched.size < before.size,
          s"scoped optimize must rewrite a strict subset: before=${before.size} " +
            s"untouched=${untouched.size}")
        require(t.history().map(_.operation).contains("OPTIMIZE"),
          "scoped optimize must have committed")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders with `deletionVectors=true` and two merge-on-read DELETEs:
   * the builder PROVES no data file was rewritten (same path set
   * before/after) and that vectors are attached — the masked scan must
   * then match the oracle's filtered content exactly. */
  def qbeastDvOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_dv")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_custkey")
          .option("cubeSize", "2000")
          .option("deletionVectors", "true")
          .save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        val before = t.snapshot.files.map(_.path).toSet
        require(t.delete("o_orderkey % 10 = 3") > 0L)
        require(t.delete("o_orderkey % 10 = 7") > 0L)
        val s = t.snapshot
        require(s.files.map(_.path).toSet == before,
          "merge-on-read DELETE must not rewrite data files")
        require(s.dvs.nonEmpty, "deletion vectors must be attached")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders with `deletionVectors=true` and two merge-on-read UPDATEs:
   * the builder PROVES no pre-update file was rewritten (the old path
   * set survives intact — matched rows were masked, their updated
   * images appended) and that vectors are attached. The sparse-UPDATE
   * shape at 100 TB: survivors are never read (q90). */
  def qbeastDvUpdated(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_dvupd")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_custkey")
          .option("cubeSize", "2000")
          .option("deletionVectors", "true")
          .save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        val before = t.snapshot.files.map(_.path).toSet
        require(t.update("o_orderkey % 10 = 3",
          Map("o_totalprice" -> "o_totalprice + 1.0")) > 0L)
        require(t.update("o_orderkey % 10 = 7",
          Map("o_orderpriority" -> "'9-UPDATED'")) > 0L)
        val s = t.snapshot
        require(before.subsetOf(s.files.map(_.path).toSet),
          "merge-on-read UPDATE must keep every pre-update file")
        require(s.dvs.nonEmpty, "update vectors must be attached")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders with `deletionVectors=true` and a merge-on-read UPSERT:
   * every source row replaces its key-matched target row (price reset
   * to 0.5) via masks + appended images — the builder PROVES no
   * pre-upsert file was rewritten and vectors are attached (q91). */
  def qbeastDvUpserted(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_dvups")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        o.write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_custkey")
          .option("cubeSize", "2000")
          .option("deletionVectors", "true")
          .save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        val before = t.snapshot.files.map(_.path).toSet
        val source = o.filter(col("o_orderkey") % 1000 === 1)
          .withColumn("o_totalprice", lit(0.5))
        val (replaced, inserted) = t.upsert(source, Seq("o_orderkey"))
        require(replaced > 0L && replaced == inserted,
          s"all-matched upsert: replaced=$replaced inserted=$inserted")
        val s = t.snapshot
        require(before.subsetOf(s.files.map(_.path).toSet),
          "merge-on-read upsert must keep every pre-upsert file")
        require(s.dvs.nonEmpty, "upsert vectors must be attached")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders driven through the subquery-predicate DML matrix (the
   * round-12 mass-delete bug class: shapes whose conditions rewrite to
   * joins): IN-subquery DELETE, EXISTS-driven UPDATE, a NOT IN over a
   * NULL-bearing subquery (three-valued logic: never true, must delete
   * ZERO rows), and a user-written coalesce-wrapped condition. Every
   * step's row count is required exact, so a silent mass-delete OR a
   * silent no-op both fail the build, and the q98 oracle recomputes
   * the final content from raw parquet. */
  def qbeastSubqDmlOrders(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_subqdml")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        o.write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_custkey")
          .option("cubeSize", "2000")
          .save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        // view names keyed by the sf dir: parallel fixtures of two
        // scale factors must not read each other's keys
        val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
        o.filter("o_orderkey % 13 = 0").selectExpr("o_orderkey AS k")
          .createOrReplaceTempView(s"subq_del_keys_$tag")
        val expectDel = o.filter("o_orderkey % 13 = 0").count()
        require(t.delete(s"o_orderkey IN (SELECT k FROM subq_del_keys_$tag)")
          == expectDel, "IN-subquery DELETE must delete exactly the keyed rows")
        o.filter("o_orderkey % 17 = 5").selectExpr("o_orderkey AS k")
          .createOrReplaceTempView(s"subq_upd_keys_$tag")
        val expectUpd = o.filter("o_orderkey % 17 = 5 AND o_orderkey % 13 <> 0").count()
        require(t.update(
          s"EXISTS (SELECT 1 FROM subq_upd_keys_$tag WHERE k = o_orderkey)",
          Map("o_totalprice" -> "o_totalprice + 11111.0")) == expectUpd,
          "EXISTS-subquery UPDATE must touch exactly the keyed survivors")
        // NOT IN with a NULL in the subquery result: SQL three-valued
        // logic makes the predicate UNKNOWN for every non-member row —
        // the DELETE must be a no-op, not a mass delete
        o.selectExpr(
          "CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_orderkey END AS k")
          .createOrReplaceTempView(s"subq_null_keys_$tag")
        require(t.delete(s"o_orderkey NOT IN (SELECT k FROM subq_null_keys_$tag)")
          == 0L, "NOT IN over a NULL-bearing subquery must delete nothing")
        // user-written coalesce wrapper == bare predicate (the
        // optimizer strips it; classification must stay correct)
        val expectCoal = o.filter("o_orderkey % 13 <> 0 AND o_orderkey % 19 = 7").count()
        require(t.delete("coalesce(o_orderkey % 19 = 7, false)") == expectCoal,
          "coalesce-wrapped DELETE must equal its bare spelling")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** dv-masked orders indexed ON the date column, then a derived-date
   * DELETE (`year(o_orderdate) < 1998`): files wholly below the cutoff
   * TRUE-prove on PHYSICAL rows and drop whole even though masked —
   * the returned count must subtract their already-masked rows. The
   * builder requires the exact row count and that the proof layer
   * actually dropped files (the date index aligns file boundaries). */
  def qbeastDvDerivedDeleted(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_dvderived")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        o.write.format("qbeast")
          .option("columnsToIndex", "o_orderdate,o_orderkey")
          .option("cubeSize", "2000")
          .option("deletionVectors", "true")
          .save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        require(t.delete("o_custkey % 10 = 3") > 0L)
        require(t.snapshot.dvs.nonEmpty, "masks must be attached before the date delete")
        val filesBefore = t.snapshot.files.map(_.path).toSet
        val expect = o.filter("o_custkey % 10 <> 3 AND year(o_orderdate) < 1998").count()
        require(t.delete("year(o_orderdate) < 1998") == expect,
          "derived-date DELETE over a masked table must count exactly " +
            "(proved drops subtract their already-masked rows)")
        val filesAfter = t.snapshot.files.map(_.path).toSet
        require((filesBefore -- filesAfter).nonEmpty,
          "the date-aligned index should let whole files drop")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** DML over a MIXED table: half converted-in-place (staging files,
   * NO per-file stats) + half appended indexed. The stats classifier
   * must treat stats-less files as undecided (scan them), never
   * proved; staging survivors fold into the indexed revision. Exact
   * counts required on both the DELETE and the UPDATE. */
  def qbeastMixedStatsDml(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_mixeddml")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        o.filter("o_orderkey % 2 = 0").write.mode("overwrite").parquet(path)
        graft.table.QbeastTable.convertFromParquet(spark, path)
        o.filter("o_orderkey % 2 = 1").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_custkey")
          .option("cubeSize", "2000")
          .mode("append").save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        require(t.snapshot.unindexedFiles.nonEmpty, "staging files must exist")
        val expectDel = o.filter("o_totalprice < 50000.0").count()
        require(t.delete("o_totalprice < 50000.0") == expectDel,
          "DELETE straddling stats-less and indexed files must count exactly")
        val expectUpd = o.filter("o_totalprice >= 50000.0 AND o_custkey % 7 = 1").count()
        require(t.update("o_custkey % 7 = 1", Map("o_orderpriority" -> "'MIXED'"))
          == expectUpd, "UPDATE over the mixed table must count exactly")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** MERGE whose SOURCE is a qbeast table carrying its own dv masks:
   * the upsert must see the source through the masked scan — a masked
   * source row must neither replace its target row nor resurrect.
   * Target price is bumped for exactly the live source keys (q101). */
  def qbeastMaskedSourceMerged(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureExtensions(spark)
    val target = cachePath(sfDir, "orders_msrc_target")
    val source = cachePath(sfDir, "orders_msrc_source")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(target, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        o.write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_custkey")
          .option("cubeSize", "2000")
          .save(target)
        o.filter("o_orderkey % 4 = 1").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_custkey")
          .option("cubeSize", "2000")
          .option("deletionVectors", "true")
          .save(source)
        val st = graft.table.QbeastTable.forPath(spark, source)
        require(st.delete("o_custkey % 3 = 0") > 0L)
        require(st.snapshot.dvs.nonEmpty, "source masks must be attached")
        val live = o.filter("o_orderkey % 4 = 1 AND o_custkey % 3 <> 0").count()
        val srcDf = spark.read.format("qbeast").load(source)
          .withColumn("o_totalprice", col("o_totalprice") + 77777.0)
        val t = graft.table.QbeastTable.forPath(spark, target)
        val (replaced, inserted) = t.upsert(srcDf, Seq("o_orderkey"))
        require(replaced == live && inserted == live,
          s"masked source rows must not merge: replaced=$replaced live=$live")
      }
    }
    spark.read.format("qbeast").load(target)
  }

  /** orders with per-file bloom filters on o_custkey — a
   * high-cardinality column UNCORRELATED with the (o_orderkey,
   * o_totalprice) index order, so every file's [min, max] spans any
   * custkey probe and ONLY the bloom can skip files on an equality
   * lookup (the q84 shape). */
  def qbeastBloomOrders(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_bloom")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "2000")
          .option("bloomFilterColumns", "o_custkey")
          .save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** embeddings as a write-time IVF-PQ index (the e04 cluster column +
   * the e12 PQ codes in ONE map-side pass, no vectors stored): qbeast
   * single-dim indexed on `cluster` so a query's probed clusters become
   * file-pruned scans of the (id, cluster, codes) sidecar — m bytes a
   * vector. Codebooks persist as a JSON sidecar inside the table dir
   * (`_pq/codebooks.json`, the index's model artifact); the second
   * element of the result is the loaded codebooks. */
  def qbeastIvfPqEmbeddings(
      spark: SparkSession,
      sfDir: String): (DataFrame, Seq[Seq[(Int, Array[Long])]]) =
    buildIvfPq(spark, sfDir, "embeddings_ivfpq", dv = false)

  /** The IVF-PQ table with `deletionVectors=true` and a merge-on-read
   * DELETE (`vec_id % 17 = 3`, opaque to the cluster index → masks,
   * never drops): codebooks stay trained on the FULL corpus (the index
   * predates the delete — the realistic serving shape), while the
   * coarse codes scan must never emit a masked candidate and the
   * re-rank stage must therefore never resurrect one (e16). The
   * builder proves the masks attached without any file rewrite. */
  def qbeastIvfPqEmbeddingsMasked(
      spark: SparkSession,
      sfDir: String): (DataFrame, Seq[Seq[(Int, Array[Long])]]) =
    buildIvfPq(spark, sfDir, "embeddings_ivfpq_dv", dv = true)

  private def buildIvfPq(
      spark: SparkSession,
      sfDir: String,
      cacheName: String,
      dv: Boolean): (DataFrame, Seq[Seq[(Int, Array[Long])]]) = {
    import org.apache.spark.sql.functions.col
    ensureExtensions(spark)
    val path = cachePath(sfDir, cacheName)
    val conf = spark.sparkContext.hadoopConfiguration
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, conf)) {
        val emb = raw(spark, sfDir, "embeddings")
        // vec_id 0 is the conventional query vector in the e-fixtures —
        // the index holds the CORPUS only (and the codebooks train on
        // exactly what they encode, which is what the oracle replays)
        val corpus = emb.filter(col("vec_id") =!= 0)
        val anchors = ops.Similarity.collectAnchors(emb, "vec_id", "embedding")
        val codebooks = ops.Similarity.pqTrain(corpus, "vec_id", "embedding")
        // sidecar FIRST: the table's existence (its commit log) is the
        // build's commit point — a crash between the two steps then
        // leaves no log and the build re-runs, instead of a committed
        // table whose codebooks are permanently missing
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        val cbPath = new org.apache.hadoop.fs.Path(path, "_pq/codebooks.json")
        val out = fs.create(cbPath, true)
        try out.write(ops.Similarity.pqCodebooksJson(codebooks)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        val writer = corpus.select(
            col("vec_id"),
            ops.Similarity.anchorClusterCol(anchors, col("embedding")).as("cluster"),
            ops.Similarity.pqCodesCol(col("embedding"), codebooks).as("codes"))
          .repartition(col("cluster"))
          .write.format("qbeast")
          // single-dim index (the e11 finding): every level halves the
          // cluster range, so 16 anchor ids resolve at depth 4 with 2^d
          // cubes; columnStats pin the space so every write transforms
          // cluster equalities to the same coordinates
          .option("columnsToIndex", "cluster")
          .option("columnStats", """{"cluster_min": 1, "cluster_max": 17}""")
          .option("cubeSize", "250")
        (if (dv) writer.option("deletionVectors", "true") else writer).save(path)
        if (dv) {
          val t = graft.table.QbeastTable.forPath(spark, path)
          val before = t.snapshot.files.map(_.path).toSet
          require(t.delete("vec_id % 17 = 3") > 0L)
          val s = t.snapshot
          require(s.files.map(_.path).toSet == before,
            "merge-on-read DELETE on the codes table must mask, not rewrite")
          require(s.dvs.nonEmpty, "masks must be attached")
        }
      }
    }
    (spark.read.format("qbeast").load(path), loadPqCodebooks(path, conf))
  }

  /** Read the PQ codebook sidecar written by [[qbeastIvfPqEmbeddings]]. */
  def loadPqCodebooks(
      tablePath: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[Seq[(Int, Array[Long])]] = {
    val p = new org.apache.hadoop.fs.Path(tablePath, "_pq/codebooks.json")
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      ops.Similarity.pqCodebooksFromJson(
        new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }

  /** orders written as two appends split on o_totalprice (< 100000
   * first, the rest appended): every file's o_totalprice range lies
   * entirely on one side of the split, so a filtered count(*) at the
   * boundary is decidable per-file from stats alone — the ingest-batch
   * shape behind metadata-only filtered counts (q83). */
  def qbeastOrdersSplit(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_split")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        val cut = org.apache.spark.sql.functions.col("o_totalprice") < 100000.0
        o.filter(cut).write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000").save(path)
        o.filter(!cut).write.format("qbeast")
          .option("cubeSize", "5000").mode("append").save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders ingested as two batches split on o_totalprice, then
   * `DELETE WHERE o_totalprice < 100000` — the boundary-aligned shape
   * where every file's stats PROVE the predicate all-rows or no-rows,
   * so the whole DELETE is one metadata-only commit: the builder
   * asserts files were DROPPED (not rewritten — zero add actions land)
   * and the untouched batch's files survive byte-identical. The
   * retention-delete shape (`ts < cutoff`) at 100 TB (q89). */
  def qbeastStatsDeleted(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_statsdel")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        val cut = org.apache.spark.sql.functions.col("o_totalprice") < 100000.0
        o.filter(cut).write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000").save(path)
        o.filter(!cut).write.format("qbeast")
          .option("cubeSize", "5000").mode("append").save(path)
        val t = graft.table.QbeastTable.forPath(spark, path)
        val before = t.snapshot.files.map(_.path).toSet
        val expected = o.filter(cut).count()
        val deleted = t.delete("o_totalprice < 100000.0")
        require(deleted == expected,
          s"stats-proved delete count: got $deleted, expected $expected")
        val after = t.snapshot.files.map(_.path).toSet
        require(after.subsetOf(before) && after.size < before.size,
          "stats-proved DELETE must DROP files, never write new ones: " +
            s"before=${before.size} after=${after.size} " +
            s"new=${(after -- before).size}")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders written with user-provided columnStats (wider linear space
   * than the data, so later appends skip revision bumps). */
  def qbeastOrdersWithStats(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_stats")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("columnStats",
            """{"o_orderkey_min": 0, "o_orderkey_max": 100000000,
              |"o_totalprice_min": 0, "o_totalprice_max": 10000000}""".stripMargin)
          .option("cubeSize", "5000")
          .save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** lineitem + orders written as BUCKETED parquet tables (8 buckets on
   * the join key, sorted within buckets): storage-level co-location so
   * orderkey joins execute with ZERO shuffle — at 100 TB the expensive
   * shuffle is paid once at write time and amortized over every
   * subsequent join. In-memory-catalog table defs don't survive a JVM
   * restart, so a fresh session rewrites them (cheap at bench SF).
   * Returns (lineitemTable, ordersTable). */
  def bucketedTables(spark: SparkSession, sfDir: String): (String, String) = {
    val sfName = new java.io.File(sfDir).getName.replace(".", "_")
    val li = s"lineitem_bkt_$sfName"
    val o = s"orders_bkt_$sfName"
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories persist: clear leftovers or saveAsTable
    // fails with LOCATION_ALREADY_EXISTS
    def clearStaleLocation(table: String): Unit = {
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
      val dir = java.nio.file.Paths.get(wh, table)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    lock.synchronized {
      if (!spark.catalog.tableExists(li)) {
        clearStaleLocation(li)
        raw(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(li)
      }
      if (!spark.catalog.tableExists(o)) {
        clearStaleLocation(o)
        raw(spark, sfDir, "orders")
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(o)
      }
    }
    (li, o)
  }

  /** lineitem after a copy-on-write row-level DELETE (files holding
   * matching rows rewritten without them, one atomic commit): content
   * equals the raw table minus the heavy-quantity rows. */
  /** lineitem split into a checkpointed bulk (90%, consolidated into a
   * JSON checkpoint + parquet sidecar) plus a post-checkpoint append
   * tail (10%) — the read takes the DISTRIBUTED metadata path: light
   * log replay on the driver, block pruning as a Spark job over the
   * sidecar, tail overlaid. End state is exactly full lineitem. */
  def qbeastCheckpointed(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "lineitem_checkpointed")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val (cols, cubeSize) = indexSpecs("lineitem")
        val li = raw(spark, sfDir, "lineitem")
        li.filter("l_orderkey % 10 <> 1").write.format("qbeast")
          .option("columnsToIndex", cols)
          .option("cubeSize", cubeSize.toString)
          .save(path)
        spark.conf.set("spark.qbeast.metadata.sidecar.minFiles", "0")
        try graft.table.QbeastTable.forPath(spark, path).checkpoint()
        finally spark.conf.unset("spark.qbeast.metadata.sidecar.minFiles")
        li.filter("l_orderkey % 10 = 1").write.format("qbeast")
          .mode("append").save(path)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  def qbeastDeleted(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "lineitem_deleted")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val (cols, cubeSize) = indexSpecs("lineitem")
        raw(spark, sfDir, "lineitem").write.format("qbeast")
          .option("columnsToIndex", cols)
          .option("cubeSize", cubeSize.toString)
          .save(path)
        graft.table.QbeastTable.forPath(spark, path).delete("l_quantity > 45")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders after a copy-on-write row-level UPDATE (matched rows get the
   * assignment applied and are re-indexed; survivors of affected files
   * rewritten frozen; one atomic commit). */
  def qbeastUpdated(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_updated")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000")
          .save(path)
        graft.table.QbeastTable.forPath(spark, path)
          .update("o_orderstatus = 'F'", Map("o_totalprice" -> "o_totalprice + 100000"))
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders after a MERGE/upsert: an updated slice (same keys, new
   * totalprice) plus an inserted slice (fresh keys beyond the indexed
   * space, forcing the merged-revision path) applied in one commit. */
  def qbeastMerged(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_merged")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        import org.apache.spark.sql.functions._
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000")
          .save(path)
        val o = raw(spark, sfDir, "orders")
        val updates = o.filter("o_orderkey % 10 = 3")
          .withColumn("o_totalprice", col("o_totalprice") + 50000)
        val inserts = o.filter("o_orderkey % 10 = 7")
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        graft.table.QbeastTable.forPath(spark, path)
          .upsert(updates.unionByName(inserts), Seq("o_orderkey"))
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** Register a path-backed qbeast table in the session's qbeast
   * catalog so SQL DML statements can address it. The name is
   * sf-qualified and any stale registry entry (the catalog registry
   * write-throughs to `_catalog.json`, so it outlives the JVM) is
   * dropped first — a leftover entry for the same name could point at
   * another scale factor's path. */
  private def sqlTable(spark: SparkSession, path: String, base: String): String = {
    if (spark.conf.getOption("spark.sql.catalog.qbeast_catalog").isEmpty)
      spark.conf.set("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
    val name = (base + "_" + new java.io.File(path).getParentFile.getName)
      .replaceAll("[^A-Za-z0-9_]", "_")
    spark.sql(s"DROP TABLE IF EXISTS qbeast_catalog.default.$name")
    spark.sql(s"CREATE TABLE qbeast_catalog.default.$name USING qbeast LOCATION '$path'")
    s"qbeast_catalog.default.$name"
  }

  /** orders mutated via the SQL `UPDATE` statement — same end state as
   * [[qbeastUpdated]], but through the analyzer DML path
   * ([[graft.rules.QbeastDmlRules]] → copy-on-write updateWhere). */
  def qbeastSqlUpdated(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_sql_updated")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000")
          .save(path)
        val name = sqlTable(spark, path, "orders_sql_updated")
        spark.sql(
          s"UPDATE $name SET o_totalprice = o_totalprice + 100000 WHERE o_orderstatus = 'F'")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders carrying a nested struct column after a SQL `UPDATE` of one
   * struct FIELD (`SET meta.price = ...`) — exercises the withField
   * assignment path ([[graft.table.Assignments]]) end-to-end. */
  def qbeastStructUpdated(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_struct_updated")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        import org.apache.spark.sql.functions.{col, struct}
        raw(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            struct(col("o_orderstatus").as("status"),
              col("o_totalprice").as("price")).as("meta"))
          .write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_custkey")
          .option("cubeSize", "5000")
          .save(path)
        val name = sqlTable(spark, path, "orders_struct_updated")
        spark.sql(
          s"UPDATE $name SET meta.price = meta.price + 1000 WHERE o_orderkey % 7 = 0")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders mutated via the SQL `MERGE INTO` statement (update-all +
   * insert-all) — same end state as [[qbeastMerged]], but through the
   * analyzer DML path ([[QbeastDmlRules]] → copy-on-write upsert). */
  def qbeastSqlMerged(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_sql_merged")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000")
          .save(path)
        val name = sqlTable(spark, path, "orders_sql_merged")
        raw(spark, sfDir, "orders").createOrReplaceTempView("orders_sql_merge_src")
        spark.sql(s"""
          MERGE INTO $name t
          USING (SELECT o_orderkey, o_custkey, o_orderstatus,
                        o_totalprice + 50000 AS o_totalprice,
                        o_orderdate, o_orderpriority
                 FROM orders_sql_merge_src WHERE o_orderkey % 10 = 3
                 UNION ALL
                 SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
                        o_totalprice, o_orderdate, o_orderpriority
                 FROM orders_sql_merge_src WHERE o_orderkey % 10 = 7) s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders after a GENERAL SQL MERGE: ordered conditional WHEN MATCHED
   * UPDATE/DELETE, a conditional WHEN NOT MATCHED INSERT, and a WHEN
   * NOT MATCHED BY SOURCE UPDATE — the full Delta clause surface over
   * the copy-on-write machinery. */
  def qbeastSqlMergedGeneral(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_sql_merged_gen")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000")
          .save(path)
        val name = sqlTable(spark, path, "orders_sql_merged_gen")
        raw(spark, sfDir, "orders").createOrReplaceTempView("orders_sql_mrggen_src")
        spark.sql(s"""
          MERGE INTO $name t
          USING (SELECT o_orderkey, o_custkey, o_orderstatus,
                        o_totalprice + 50000 AS o_totalprice,
                        o_orderdate, o_orderpriority
                 FROM orders_sql_mrggen_src WHERE o_orderkey % 10 = 3
                 UNION ALL
                 SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
                        o_totalprice, o_orderdate, o_orderpriority
                 FROM orders_sql_mrggen_src WHERE o_orderkey % 10 = 7) s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED AND s.o_totalprice > 200000 THEN
            UPDATE SET o_totalprice = s.o_totalprice, o_orderpriority = 'BUMPED'
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED AND s.o_totalprice < 100000 THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 10 = 9 THEN
            UPDATE SET o_orderpriority = 'DEMOTED'""")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** orders merged through SQL MERGE whose ON clause uses a DIFFERENT
   * source key name (`ON t.o_orderkey = s.key`) — Delta accepts
   * arbitrary equi-key names and so do we. The source also carries
   * DUPLICATE keys that match NO target row: legal (Delta's
   * multiple-matches rule only rejects >1 source rows hitting the same
   * target row), both copies insert. */
  def qbeastSqlMergedRenamedKeys(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_sql_merged_rk")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "orders").write.format("qbeast")
          .option("columnsToIndex", "o_orderkey,o_totalprice")
          .option("cubeSize", "5000")
          .save(path)
        val name = sqlTable(spark, path, "orders_sql_merged_rk")
        raw(spark, sfDir, "orders").createOrReplaceTempView("orders_sql_mrgrk_src")
        spark.sql(s"""
          MERGE INTO $name t
          USING (SELECT o_orderkey AS key, o_custkey AS ck, o_orderstatus AS st,
                        o_totalprice + 50000 AS price, o_orderdate AS dt
                 FROM orders_sql_mrgrk_src WHERE o_orderkey % 10 = 4
                 UNION ALL
                 SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
                        o_totalprice, o_orderdate
                 FROM orders_sql_mrgrk_src WHERE o_orderkey % 10 = 6
                 UNION ALL
                 SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
                        o_totalprice, o_orderdate
                 FROM orders_sql_mrgrk_src WHERE o_orderkey % 10 = 6) s
          ON t.o_orderkey = s.key
          WHEN MATCHED THEN
            UPDATE SET o_totalprice = s.price, o_orderpriority = 'RENAMED'
          WHEN NOT MATCHED THEN
            INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                    o_orderdate, o_orderpriority)
            VALUES (s.key, s.ck, s.st, s.price, s.dt, 'INSERTED')""")
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** lineitem written, appended, then RESTORED to version 0 — the
   * time-travel write-back. Content equals the first write (even
   * orderkeys); the restore is itself a log version, so history keeps
   * both states. */
  def qbeastRestored(spark: SparkSession, sfDir: String): DataFrame = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "lineitem_restored")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val li = raw(spark, sfDir, "lineitem")
        val (cols, cubeSize) = indexSpecs("lineitem")
        li.filter("l_orderkey % 2 = 0").write.format("qbeast")
          .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
          .save(path)
        li.filter("l_orderkey % 2 = 1").write.format("qbeast")
          .option("columnsToIndex", cols).option("cubeSize", cubeSize.toString)
          .mode("append").save(path)
        graft.table.QbeastTable.forPath(spark, path).restoreToVersion(0)
      }
    }
    spark.read.format("qbeast").load(path)
  }

  /** Bump when the log/layout format changes so stale caches from a
   * previous build round are never replayed by newer code.
   * v3: per-file column stats (data skipping) recorded at write. */
  // v5: orders_autocompact recipe changed (sliver-scaled cube target) —
  // cached v4 tables may carry a compaction-never-fired history
  val CacheFormatVersion = 5

  /** Documents indexed with per-file HLL register stats on text/source
   * — the metadata-only approx-distinct fixture (q93). Small cubes so
   * the fold actually unions registers across MANY files. */
  def qbeastHllDocumentsPath(spark: SparkSession, sfDir: String): String = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "documents_hll")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "documents").write.format("qbeast")
          .option("columnsToIndex", "doc_id,n_chars")
          .option("cubeSize", "200")
          .option("hllColumns", "text,source")
          .mode("overwrite")
          .save(path)
        // fixture guard: the fold must be answerable (every file carries
        // registers) — q93 is meaningless otherwise
        val t = graft.table.QbeastTable.forPath(spark, path)
        require(t.approxCountDistinct("text").isDefined,
          "documents_hll fixture: register fold unexpectedly bailed")
      }
    }
    path
  }

  /** Documents indexed with per-file KLL quantile states on n_chars —
   * the metadata-only approx-quantile fixture (q95). Small cubes so
   * the fold merges states across MANY files; kllK=8192 keeps the
   * merged state within capacity (hence exactly `quantile_disc`) at
   * the oracle SF. */
  def qbeastKllDocumentsPath(spark: SparkSession, sfDir: String): String = {
    ensureExtensions(spark)
    val path = cachePath(sfDir, "documents_kll")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        raw(spark, sfDir, "documents").write.format("qbeast")
          .option("columnsToIndex", "doc_id,n_chars")
          .option("cubeSize", "200")
          .option("kllColumns", "n_chars")
          .option("kllK", "8192")
          .mode("overwrite")
          .save(path)
        // fixture guard: the fold must be answerable (every file
        // carries a state) — q95 is meaningless otherwise
        val t = graft.table.QbeastTable.forPath(spark, path)
        require(t.approxQuantile("n_chars", Seq(0.5)).isDefined,
          "documents_kll fixture: state fold unexpectedly bailed")
      }
    }
    path
  }

  /** Orders split into per-year appends with per-file KLL + HLL sketch
   * stats — the FILTERED metadata-fold fixture (q96/q97): every file
   * is year-pure, so `year(o_orderdate) = Y` proves each file wholly
   * true or wholly false and the sketch folds answer under the
   * predicate with zero data files read. */
  def qbeastSketchOrdersPath(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, year}
    ensureExtensions(spark)
    val path = cachePath(sfDir, "orders_sketch_years")
    lock.synchronized {
      if (!graft.log.QbeastLog.exists(path, spark.sparkContext.hadoopConfiguration)) {
        val o = raw(spark, sfDir, "orders")
        val years = o.select(year(col("o_orderdate")).as("y")).distinct()
          .collect().map(_.getInt(0)).sorted
        years.zipWithIndex.foreach { case (y, i) =>
          o.filter(year(col("o_orderdate")) === y)
            .write.format("qbeast")
            .option("columnsToIndex", "o_orderkey,o_totalprice")
            .option("cubeSize", "2000")
            .option("kllColumns", "o_totalprice").option("kllK", "8192")
            .option("hllColumns", "o_custkey")
            .mode(if (i == 0) "overwrite" else "append").save(path)
        }
        val t = graft.table.QbeastTable.forPath(spark, path)
        require(t.approxQuantile("o_totalprice", Seq(0.5),
          s"year(o_orderdate) = ${years.head}").isDefined,
          "orders_sketch_years fixture: filtered fold unexpectedly bailed")
      }
    }
    path
  }

  private def cachePath(sfDir: String, table: String): String = {
    val sfName = new java.io.File(sfDir).getName
    s"/tmp/graft_qbeast/v$CacheFormatVersion/$sfName/$table"
  }

  /** Public accessor for tooling/queries that need a cached table's path. */
  def cachePathFor(sfDir: String, table: String): String = cachePath(sfDir, table)

  /** Make the Sample→hash-filter rule active even in sessions built
   * without `spark.sql.extensions` (e.g. the driver's Verify/Bench). */
  def ensureExtensions(spark: SparkSession): Unit = lock.synchronized {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val existing = cs.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[SampleRule])) {
      cs.experimental.extraOptimizations = existing :+ new SampleRule(spark)
    }
    val withSample = cs.experimental.extraOptimizations
    if (!withSample.exists(_.isInstanceOf[graft.rules.MetadataCountRule])) {
      cs.experimental.extraOptimizations =
        withSample :+ new graft.rules.MetadataCountRule(spark)
    }
    val withMeta = cs.experimental.extraOptimizations
    if (!withMeta.exists(_.isInstanceOf[graft.rules.ScanSizeRule])) {
      cs.experimental.extraOptimizations =
        withMeta :+ new graft.rules.ScanSizeRule(spark)
    }
    val withSize = cs.experimental.extraOptimizations
    if (!withSize.exists(_.isInstanceOf[graft.rules.DvMaskRule])) {
      cs.experimental.extraOptimizations =
        withSize :+ new graft.rules.DvMaskRule(spark)
    }
  }

}
