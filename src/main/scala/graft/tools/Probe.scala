package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    // probe 1: write without columnsToIndex
    try { li.write.format("qbeast").save("/tmp/probe-noidx") ; println("[probe1] NO ERROR (bad)") }
    catch { case e: Exception => println(s"[probe1] error: ${e.getMessage.linesIterator.next()}") }

    // probe 2: read a non-table path
    try { spark.read.format("qbeast").load("/tmp/probe-empty-dir-xyz").count(); println("[probe2] NO ERROR (bad)") }
    catch { case e: Exception => println(s"[probe2] error: ${e.getMessage.linesIterator.next()}") }

    // probe 3: append then count
    val half1 = li.filter("l_orderkey % 2 = 0")
    val half2 = li.filter("l_orderkey % 2 = 1")
    val t = java.nio.file.Files.createTempDirectory("probe-append").toString
    half1.write.format("qbeast").option("columnsToIndex","l_orderkey,l_extendedprice").option("cubeSize","500").save(t)
    half2.write.format("qbeast").option("columnsToIndex","l_orderkey,l_extendedprice").option("cubeSize","500").mode("append").save(t)
    val back = spark.read.format("qbeast").load(t)
    println(s"[probe3] append total=${back.count()} expected=${li.count()} sample(0.2)=${back.sample(0.2).count()}")

    // probe 4: overwrite mode twice (idempotent table state)
    half1.write.format("qbeast").option("columnsToIndex","l_orderkey,l_extendedprice").mode("overwrite").save(t)
    println(s"[probe4] after overwrite rows=${spark.read.format("qbeast").load(t).count()} expected=${half1.count()}")

    spark.stop()
  }
}

/** Driver-contract smoke: entry() rows>0 + Bench-style timing. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry] rows=${rows.length} sample=${rows.take(2).mkString("; ")}")
    spark.stop()
  }
}

/** Probe: run the stateful streaming query twice in one session (memory
 * sink name uniqueness + repeated state init). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = "/root/testdata/sf0.001/events.parquet"
    val a = graft.ops.Streaming.sessionize(spark, p).count()
    val b = graft.ops.Streaming.sessionize(spark, p).count()
    val w = graft.ops.Streaming.windowedAgg(spark, p).count()
    println(s"[streamprobe] sessions1=$a sessions2=$b windows=$w")
    spark.stop()
  }
}

/** Pruning-effectiveness probe at a given SF: files read per sampling
 * fraction and per range-filter selectivity. */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val back = graft.QTables.qbeast(spark, sfDir, "lineitem")
    val all = back.inputFiles.length
    def filesOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    println(s"[prune] total files: $all")
    for (f <- Seq(0.001, 0.01, 0.05, 0.1, 0.5)) {
      val t0 = System.nanoTime()
      val n = back.sample(f).count()
      val dt = (System.nanoTime()-t0)/1e9
      println(f"[prune] sample($f%5.3f): files=${filesOf(back.sample(f))}%3d rows=$n%7d time=$dt%5.2fs")
    }
    val maxKey = 15000
    for (cut <- Seq(150, 1500, 15000, 150000)) {
      val q = back.filter(col("l_orderkey") <= cut)
      println(f"[prune] filter(l_orderkey<=$cut%6d): files=${filesOf(q)}%3d rows=${q.count()}%7d")
    }
    val t1 = System.nanoTime(); back.agg(sum("l_quantity")).collect(); val full=(System.nanoTime()-t1)/1e9
    val t2 = System.nanoTime(); back.sample(0.01).agg(sum("l_quantity")).collect(); val samp=(System.nanoTime()-t2)/1e9
    println(f"[prune] full-agg=$full%5.2fs sample1pct-agg=$samp%5.2fs speedup=${full/samp}%4.1fx")
    spark.stop()
  }
}

/** Probe: catalog error paths + drop/recreate. */
object CatalogProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // probe 1: INSERT into table created without columnsToIndex
    spark.sql("CREATE TABLE qbeast_catalog.default.noidx (a INT, b INT) USING qbeast LOCATION '/tmp/capro-noidx'")
    try { spark.sql("INSERT INTO qbeast_catalog.default.noidx VALUES (1,2)"); println("[catprobe1] NO ERROR (bad)") }
    catch { case e: Exception => println(s"[catprobe1] error: ${e.getMessage.linesIterator.next()}") }
    // probe 2: select from never-written table → empty, not crash
    val n = spark.sql("SELECT count(*) FROM qbeast_catalog.default.noidx").head.getLong(0)
    println(s"[catprobe2] empty-table count=$n")
    // probe 3: drop + recreate same name
    spark.sql("DROP TABLE qbeast_catalog.default.noidx")
    spark.sql("CREATE TABLE qbeast_catalog.default.noidx (a INT) USING qbeast OPTIONS('columnsToIndex'='a') LOCATION '/tmp/capro-noidx2'")
    spark.sql("INSERT INTO qbeast_catalog.default.noidx VALUES (7)")
    println(s"[catprobe3] recreate+insert rows=${spark.sql("SELECT a FROM qbeast_catalog.default.noidx").collect().mkString}")
    spark.stop()
  }
}

/** Probe: hook + auto-selection write options through the public API. */
object HookProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // hook runs and tags the commit
    val d1 = java.nio.file.Files.createTempDirectory("hookprobe").toString
    li.write.format("qbeast").option("columnsToIndex","l_orderkey,l_extendedprice")
      .option("hook.counter","graft.CountingHook_DOES_NOT_EXIST").mode("overwrite")
      .save(d1 + "/bad") match { case _ => }
  }
}

/** Plan inspection: pushed filters, codegen spans, join strategies. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val li = graft.QTables.qbeast(spark, sf, "lineitem")
    val o = graft.QTables.qbeast(spark, sf, "orders")

    def section(name: String, plan: String, keys: Seq[String]): Unit = {
      println(s"== $name ==")
      plan.linesIterator.filter(l => keys.exists(l.contains)).take(12).foreach(l => println("  " + l.trim.take(160)))
    }

    val q1 = li.filter(col("l_orderkey") <= 1500 && col("l_extendedprice") > 2000)
      .select("l_orderkey","l_quantity")
    section("filter+project", q1.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      Seq("PushedFilters", "ReadSchema", "WholeStageCodegen"))

    val q2 = li.join(broadcast(o), li("l_orderkey")===o("o_orderkey")).groupBy("o_orderpriority").count()
    section("broadcast join", q2.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      Seq("BroadcastHashJoin", "WholeStageCodegen", "Exchange"))

    val q3 = li.sample(0.01).agg(sum("l_quantity"))
    section("sample pushdown", q3.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      Seq("Filter", "hash", "PushedFilters", "partial"))

    val q4 = li.groupBy("l_returnflag").agg(sum("l_quantity"))
    section("agg partial", q4.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      Seq("HashAggregate", "Exchange", "WholeStageCodegen"))
    spark.stop()
  }
}

/** Probe: streaming sink exactly-once across query restarts. */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val src = java.nio.file.Files.createTempDirectory("sinkprobe-src").toString
    val tbl = java.nio.file.Files.createTempDirectory("sinkprobe-tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sinkprobe-ckpt").toString
    li.write.parquet(src + "/f1")
    def runOnce(): Long = {
      val q = spark.readStream.schema(li.schema).parquet(src + "/*")
        .writeStream.format("qbeast")
        .option("checkpointLocation", ckpt)
        .option("columnsToIndex", "l_orderkey,l_extendedprice")
        .option("path", tbl).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.format("qbeast").load(tbl).count()
    }
    val n1 = runOnce()
    val n2 = runOnce()   // restart, same checkpoint: no new data -> no dupes
    li.write.parquet(src + "/f2")  // new file arrives
    val n3 = runOnce()
    println(s"[sinkprobe] first=$n1 restart=$n2 afterNewFile=$n3 (expect 6000/6000/12000)")
    spark.stop()
  }
}

/** Probe: log checkpoint after many appends + vacuum via facade. */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ckptprobe").toString
    (1 to 50).map(i => (i.toLong, i*1.0)).toDF("a","b").write.format("qbeast")
      .option("columnsToIndex","a,b").save(dir)
    (1 to 24).foreach { k =>
      (1 to 5).map(i => ((k*100+i).toLong, i*1.0)).toDF("a","b")
        .write.format("qbeast").mode("append").save(dir)
    }
    val logs = new java.io.File(dir, "_qbeast_log").list().sorted
    val ckpts = logs.count(_.endsWith(".checkpoint.json"))
    val n = spark.read.format("qbeast").load(dir).count()
    // overwrite then vacuum
    (1 to 7).map(i => (i.toLong, i*1.0)).toDF("a","b").write.format("qbeast")
      .mode("overwrite").save(dir)
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val deleted = t.vacuum(retainMillis = 0L, force = true)
    val after = spark.read.format("qbeast").load(dir).count()
    println(s"[ckptprobe] checkpoints=$ckpts rows=$n (expect 170) vacuumed=$deleted afterOverwrite=$after (expect 7)")
    spark.stop()
  }
}

/** Probe: CTAS + saveAsTable option propagation (SURVEY #24). */
object CtasProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("li_src")
    // CTAS with options
    try {
      spark.sql(s"""CREATE TABLE qbeast_catalog.default.ctas1
        USING qbeast OPTIONS ('columnsToIndex'='l_orderkey,l_extendedprice','cubeSize'='1000')
        LOCATION '${java.nio.file.Files.createTempDirectory("ctas1")}'
        AS SELECT l_orderkey, l_extendedprice FROM li_src""")
      val n = spark.sql("SELECT count(*) FROM qbeast_catalog.default.ctas1").head.getLong(0)
      val cols = graft.table.QbeastTable.forPath(spark,
        graft.catalog.QbeastCatalog.tableLocation("default","ctas1").getOrElse("?")).indexedColumns()
      println(s"[ctas] rows=$n indexedCols=$cols")
    } catch { case e: Exception => println(s"[ctas] FAILED: ${e.getMessage.linesIterator.next()}") }
    spark.stop()
  }
}

/** Probe: df.write.saveAsTable option propagation. */
object SaveAsTableProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey","l_extendedprice")
    try {
      li.write.format("qbeast")
        .option("columnsToIndex","l_orderkey,l_extendedprice")
        .option("cubeSize","1000")
        .option("path", java.nio.file.Files.createTempDirectory("sat1").toString)
        .saveAsTable("qbeast_catalog.default.sat1")
      val n = spark.sql("SELECT count(*) FROM qbeast_catalog.default.sat1").head.getLong(0)
      val loc = graft.catalog.QbeastCatalog.tableLocation("default","sat1").getOrElse("?")
      val cols = graft.table.QbeastTable.forPath(spark, loc).indexedColumns()
      println(s"[sat] rows=$n indexedCols=$cols")
    } catch { case e: Exception => println(s"[sat] FAILED: ${e.getMessage.linesIterator.next()}") }
    spark.stop()
  }
}

/** Scale probe: synthesize 10M rows, index them, measure write
 * throughput and pruning (16x the bench SF). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val n = 10000000L
    val df = spark.range(n).select(
      col("id"),
      (rand(42) * 1000000).as("x"),
      (randn(7) * 100 + 500).as("y"),
      concat(lit("payload_"), col("id")).as("s"))
    val dir = java.nio.file.Files.createTempDirectory("scale10m").toString
    val t0 = System.nanoTime()
    df.write.format("qbeast")
      .option("columnsToIndex", "x,y")
      .option("cubeSize", "100000")
      .save(dir)
    val dt = (System.nanoTime() - t0) / 1e9
    val back = spark.read.format("qbeast").load(dir)
    val files = back.inputFiles.length
    def filesOf(d: org.apache.spark.sql.DataFrame): Long =
      d.select(input_file_name()).distinct().count()
    val f001 = filesOf(back.sample(0.001))
    val f01 = filesOf(back.sample(0.01))
    val t1 = System.nanoTime(); val full = back.agg(sum("y")).head.getDouble(0); val tf = (System.nanoTime()-t1)/1e9
    val t2 = System.nanoTime(); val samp = back.sample(0.01).agg(avg("y")).head.getDouble(0); val ts = (System.nanoTime()-t2)/1e9
    println(f"[scale] rows=$n write=${dt}%.1fs (${n/dt/1e6}%.2fM rows/s) files=$files")
    println(f"[scale] sample(0.001) reads $f001/$files files; sample(0.01) reads $f01/$files")
    println(f"[scale] full-agg=${tf}%.2fs sampled-agg=${ts}%.2fs speedup=${tf/ts}%.1fx avgErr=${math.abs(samp - full/n)/(full/n)*100}%.3f%%")
    spark.stop()
  }
}

/** Probe: timestamp-dimension and hash-dimension pruning. */
object VariantPruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val li3 = graft.QTables.qbeastVariant(spark, "/root/testdata/sf0.1", "lineitem_3d")
    def filesOf(d: org.apache.spark.sql.DataFrame): Long =
      d.select(input_file_name()).distinct().count()
    val all = li3.inputFiles.length
    val narrow = li3.filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")))
    println(s"[vprune] lineitem_3d files=$all shipdate<1995-06: files=${filesOf(narrow)} rows=${narrow.count()}")
    val ch = graft.QTables.qbeastVariant(spark, "/root/testdata/sf0.1", "customer_hash")
    val eq = ch.filter(col("c_mktsegment") === "BUILDING")
    println(s"[vprune] customer_hash files=${ch.inputFiles.length} mktsegment=BUILDING: files=${filesOf(eq)} rows=${eq.count()}")
    spark.stop()
  }
}

/** Probe: sample-over-join semantics through the public API. */
object JoinSampleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.QTables.qbeast(spark, "/root/testdata/sf0.001", "lineitem")
    val o = graft.QTables.qbeast(spark, "/root/testdata/sf0.001", "orders")
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
    val total = joined.count()
    val half = joined.sample(0.5).count()
    val single = li.sample(0.5).count()
    println(s"[joinsample] joinTotal=$total sample(0.5)=$half (expect ~${total/2}, NOT ~${total/4}); single=$single of ${li.count()}")
    spark.stop()
  }
}

/** Probe: user hash() filters on non-indexed columns keep full results. */
object UserHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val li = graft.QTables.qbeast(spark, "/root/testdata/sf0.01", "lineitem")
    val raw = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val cond = hash(col("l_quantity"), col("l_tax")) < lit(0)
    val a = li.filter(cond).count(); val b = raw.filter(cond).count()
    val cond2 = hash(col("l_orderkey"), col("l_extendedprice")) < lit(0)  // IS the weight
    val c = li.filter(cond2).count(); val d = raw.filter(cond2).count()
    println(s"[userhash] otherCols qbeast=$a raw=$b match=${a==b}; indexedCols qbeast=$c raw=$d match=${c==d}")
    spark.stop()
  }
}

/** Probe: time travel through the public read option. */
object TimeTravelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ttprobe").toString
    (1 to 500).map(i => (i.toLong, i*1.0)).toDF("a","b").write.format("qbeast")
      .option("columnsToIndex","a,b").save(dir)
    (501 to 600).map(i => (i.toLong, i*1.0)).toDF("a","b").write.format("qbeast")
      .mode("append").save(dir)
    val now = spark.read.format("qbeast").load(dir).count()
    val v0 = spark.read.format("qbeast").option("versionAsOf","0").load(dir).count()
    val bad = try { spark.read.format("qbeast").option("versionAsOf","7").load(dir).count(); "NO ERROR" }
      catch { case e: Exception => e.getMessage.linesIterator.next().take(60) }
    println(s"[tt] now=$now v0=$v0 badVersion='$bad'")
    spark.stop()
  }
}

/** Probe: append schema enforcement. */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("schemaprobe").toString
    Seq((1L, 1.0)).toDF("a","b").write.format("qbeast").option("columnsToIndex","a,b").save(dir)
    try { Seq((2L, 2.0, "x")).toDF("a","b","c").write.format("qbeast").mode("append").save(dir); println("[schema] NO ERROR (bad)") }
    catch { case e: Exception => println(s"[schema] extra-col: ${e.getMessage.linesIterator.next().take(80)}") }
    // reordered columns append fine
    Seq((3.0, 3L)).toDF("b","a").write.format("qbeast").mode("append").save(dir)
    println(s"[schema] reorder append rows=${spark.read.format("qbeast").load(dir).count()} (expect 2)")
    spark.stop()
  }
}

/** Probe: config knobs + per-depth metrics via the public facade. */
object KnobsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.qbeast.index.cubeDomainsBufferCapacity", "2000")
      .config("spark.qbeast.index.numberOfRetries", "5")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = java.nio.file.Files.createTempDirectory("knobs").toString
    li.write.format("qbeast").option("columnsToIndex","l_orderkey,l_extendedprice")
      .option("cubeSize","500").save(dir)
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val ds = t.depthMetrics()
    println(s"[knobs] rows=${spark.read.format("qbeast").load(dir).count()} depths=${ds.map(d => s"d${d.depth}:${d.cubeCount}c/${d.elementCount}e/${f"${d.avgMaxWeightFraction}%.3f"}w").mkString(" ")}")
    spark.stop()
  }
}

/** Probe: high-contention concurrent appends land via commit rebasing. */
object ContentionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = java.nio.file.Files.createTempDirectory("contention").toString
    li.limit(10).write.format("qbeast")
      .option("columnsToIndex","l_orderkey,l_extendedprice").save(dir)
    val threads = (0 until 6).map { i =>
      new Thread(() => {
        li.filter(col("l_orderkey") % 6 === i).write.format("qbeast")
          .mode("append").save(dir)
      })
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start()); threads.foreach(_.join())
    val dt = (System.nanoTime()-t0)/1e9
    val n = spark.read.format("qbeast").load(dir).count()
    val snap = graft.log.QbeastLog.snapshot(dir, spark.sparkContext.hadoopConfiguration)
    println(f"[contention] 6 concurrent appenders: rows=$n (expect 6010) in $dt%.1fs dir=$dir")
    println(s"[contention] log: version=${snap.version} revisions=${snap.revisions.keys.toSeq.sorted} files=${snap.files.size} logRows=${snap.files.map(_.elementCount).sum}")
    spark.stop()
  }
}

/** Probe: reads stay consistent while a writer churns commits. */
object ReadWriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rwprobe").toString
    (1 to 100).map(i => (i.toLong, i*1.0)).toDF("a","b").write.format("qbeast")
      .option("columnsToIndex","a,b").save(dir)
    @volatile var stop = false
    @volatile var badReads = 0
    val reader = new Thread(() => {
      var last = 0L
      while (!stop) {
        try {
          val n = spark.read.format("qbeast").load(dir).count()
          if (n < last || (n - 100) % 50 != 0) badReads += 1
          last = n
        } catch { case _: Exception => badReads += 1 }
      }
    })
    reader.start()
    (1 to 15).foreach { k =>
      (1 to 50).map(i => ((k*1000+i).toLong, i*1.0)).toDF("a","b")
        .write.format("qbeast").mode("append").save(dir)
    }
    stop = true; reader.join()
    val fin = spark.read.format("qbeast").load(dir).count()
    println(s"[rw] final=$fin (expect 850) badReads=$badReads")
    spark.stop()
  }
}

/** Probe: per-file block composition (depths, weight bands, envelopes) +
 * range-scan file counts — drives the rollup-packing design. */
object RollupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val back = graft.QTables.qbeast(spark, sfDir, "lineitem")
    val path = graft.QTables.cachePathFor(sfDir, "lineitem")
    val snap = graft.log.QbeastLog.snapshot(path, spark.sparkContext.hadoopConfiguration)
    println(s"[rollup] files=${snap.files.size} blocks=${snap.files.map(_.blocks.size).sum}")
    snap.files.sortBy(_.path).foreach { f =>
      val depths = f.blocks.map(_.cube.depth)
      val n = f.blocks.map(_.elementCount).sum
      val minD = depths.min; val maxD = depths.max
      println(f"[rollup] file=${f.path.take(12)} blocks=${f.blocks.size}%3d rows=$n%6d depthRange=$minD-$maxD")
    }
    val byDepth = snap.files.flatMap(_.blocks).groupBy(_.cube.depth).toSeq.sortBy(_._1)
    byDepth.foreach { case (d, bs) =>
      println(f"[rollup] depth=$d%2d blocks=${bs.size}%4d rows=${bs.map(_.elementCount).sum}%7d")
    }
    def filesOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    for (range <- Seq((100, 400), (5000, 5300), (100000, 100300))) {
      val q = back.filter(col("l_orderkey").between(range._1, range._2))
      println(s"[rollup] range ${range}: files=${filesOf(q)} of ${snap.files.size} rows=${q.count()}")
    }
    // variant: 4x rollupSize — fewer, larger files (the 1 GB-file shape
    // at real scale); compare files-read on the same ranges
    val vdir = java.nio.file.Files.createTempDirectory("rollup4x").toString
    graft.QTables.raw(spark, sfDir, "lineitem").write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "5000").option("rollupSize", "20000").save(vdir)
    val big = spark.read.format("qbeast").load(vdir)
    val vsnap = graft.log.QbeastLog.snapshot(vdir, spark.sparkContext.hadoopConfiguration)
    println(s"[rollup] 4x-rollup files=${vsnap.files.size}")
    for (range <- Seq((100, 400), (5000, 5300), (100000, 100300))) {
      val q = big.filter(col("l_orderkey").between(range._1, range._2))
      println(s"[rollup] 4x range ${range}: files=${filesOf(q)} of ${vsnap.files.size} rows=${q.count()}")
    }
    spark.stop()
  }
}

/** Probe (VERDICT r1 item 9): snapshot load + driver memory at large
 * file counts — measures when the driver-side metadata path needs a
 * columnar checkpoint / distributed join. Args: [numFiles]. */
object MetaScaleProbe {
  def main(args: Array[String]): Unit = {
    val numFiles = if (args.length > 0) args(0).toInt else 1000000
    val dir = java.nio.file.Files.createTempDirectory("metascale").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    val root = graft.core.model.CubeId.root(2)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a BIGINT, b DOUBLE")
    val rev = graft.core.model.Revision(1L, 0L, dir, 5000000,
      Vector(graft.core.transform.LinearTransformer("a", "linear"),
        graft.core.transform.LinearTransformer("b", "linear")),
      Vector(graft.core.transform.LinearTransformation(0, 1000000, 42L),
        graft.core.transform.LinearTransformation(0.0, 1.0, 42L)))
    // batch the adds into commits of 50k actions
    val batch = 50000
    var version = -1L
    var written = 0
    val t0 = System.nanoTime()
    // spread cubes over depth-10 so selectFiles does real intersection work
    while (written < numFiles) {
      val n = math.min(batch, numFiles - written)
      val actions = new scala.collection.mutable.ArrayBuffer[graft.log.LogAction](n + 2)
      if (written == 0) {
        actions += graft.log.MetaDataAction(schema.json, Map("qbeast.lastRevisionID" -> "1"))
        actions += graft.log.RevisionAction(rev)
      }
      var i = 0
      while (i < n) {
        val k = written + i
        // spread files uniformly over space at depth 10 so selective
        // predicates actually prune (each file owns a distinct region)
        val frac = k.toDouble / numFiles
        val cube = graft.core.model.CubeId.containerAt(Array(frac, frac), 10)
        actions += graft.log.AddFileAction(graft.core.model.IndexFile(
          path = s"f$k.parquet", size = 128000000L, modificationTime = 0L,
          revisionId = 1L,
          blocks = Vector(graft.core.model.Block(cube,
            graft.core.model.Weight(k), graft.core.model.Weight(k + 1000), 100000L))),
          dataChange = true)
        i += 1
      }
      version = graft.log.QbeastLog.commit(dir, conf, version, actions.toSeq)
      written += n
    }
    val writeSec = (System.nanoTime() - t0) / 1e9
    println(f"[metascale] wrote $numFiles%d AddFiles in ${version + 1}%d commits: $writeSec%.1f s")

    System.gc()
    val memBefore = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    val t1 = System.nanoTime()
    val snap = graft.log.QbeastLog.snapshot(dir, conf) // also writes a checkpoint
    val loadSec = (System.nanoTime() - t1) / 1e9
    System.gc()
    val memAfter = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    println(f"[metascale] snapshot: files=${snap.files.size}%d load=$loadSec%.1f s " +
      f"retainedMB=${(memAfter - memBefore) / 1e6}%.0f")
    val t2 = System.nanoTime()
    val snap2 = graft.log.QbeastLog.snapshot(dir, conf) // from checkpoint now
    println(f"[metascale] snapshot from checkpoint: ${(System.nanoTime() - t2) / 1e9}%.1f s")
    // warm path: the session snapshot cache answers from the validated
    // fingerprint (one listStatus), no replay — the steady-state cost
    // every interactive query after the first actually pays
    val t2w = System.nanoTime()
    val snapWarm = graft.log.QbeastLog.snapshot(dir, conf)
    val warmMs = (System.nanoTime() - t2w) / 1e6
    println(f"[metascale] snapshot warm (cached): $warmMs%.2f ms " +
      f"sameInstance=${snapWarm eq snap2}%b")
    val t3 = System.nanoTime()
    val selected = graft.read.QbeastFileIndex.selectFiles(snap2,
      Seq.empty) // no filters: full listing path
    println(f"[metascale] selectFiles(all): ${selected.size}%d in ${(System.nanoTime() - t3) / 1e9}%.2f s")

    // ---- distributed metadata path at the same scale ----
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.qbeast.metadata.sidecar.minFiles", "0")
    val t4 = System.nanoTime()
    graft.log.QbeastLog.writeCheckpoint(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(conf), snap2)
    println(f"[metascale] sidecar write: ${(System.nanoTime() - t4) / 1e9}%.1f s")

    System.gc()
    val memL0 = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    val t5 = System.nanoTime()
    val light = graft.log.QbeastLog.lightSnapshot(dir, conf)
    val lightSec = (System.nanoTime() - t5) / 1e9
    System.gc()
    val memL1 = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    println(f"[metascale] light snapshot: complete=${light.filesComplete}%b " +
      f"load=$lightSec%.2f s retainedMB=${(memL1 - memL0) / 1e6}%.0f " +
      f"(vs full: $loadSec%.1f s)")

    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    // selective predicate on the first indexed column: a <= 20000
    val pred = LessThanOrEqual(
      AttributeReference("a", LongType)(), Literal(20000L))
    val dfi = new graft.read.DistributedQbeastFileIndex(spark, light)
    val t6 = System.nanoTime()
    val distSel = dfi.listFiles(Nil, Seq(pred)).head.files.length
    val distSec = (System.nanoTime() - t6) / 1e9
    val t7 = System.nanoTime()
    val flatSel = graft.read.QbeastFileIndex.selectFiles(snap2, Seq(pred)).size
    val flatSec = (System.nanoTime() - t7) / 1e9
    println(f"[metascale] pruned select: distributed=$distSel%d in $distSec%.2f s, " +
      f"flat=$flatSel%d in $flatSec%.2f s")

    // metadata-only count(*) at sidecar scale: one job over the
    // sidecar, O(partitions) longs to the driver
    val tCnt = System.nanoTime()
    val liveCnt = graft.log.DistributedMetadata.liveRowCount(spark, light)
    println(f"[metascale] sidecar count fold: rows=$liveCnt%d in " +
      f"${(System.nanoTime() - tCnt) / 1e9}%.2f s " +
      f"(expect ${numFiles.toLong * 100000L}%d)")

    // ---- distributed control plane (optimize/metrics) at the same scale ----
    // optimize candidate selection: files whose min weight fraction is
    // under a selective cap — driver memory must be O(selected)
    val cap = 0.5 + 1e-5 // weights are Weight(k), k≥0 → fractions start at 0.5
    System.gc()
    val memC0 = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    val t8 = System.nanoTime()
    val cand = graft.log.DistributedMetadata.selectFiles(spark, light, 1L, cap)
    val candSec = (System.nanoTime() - t8) / 1e9
    System.gc()
    val memC1 = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    println(f"[metascale] optimize candidates (cap=$cap%.6f): ${cand.size}%d of " +
      f"$numFiles%d in $candSec%.2f s retainedMB=${(memC1 - memC0) / 1e6}%.0f")
    val t9 = System.nanoTime()
    val (nf, nb, bytes) = graft.log.DistributedMetadata.revisionFileStats(spark, light, 1L)
    println(f"[metascale] revisionFileStats: files=$nf%d blocks=$nb%d " +
      f"bytes=${bytes / 1e9}%.0fGB in ${(System.nanoTime() - t9) / 1e9}%.2f s")
    val t10 = System.nanoTime()
    val st = graft.log.DistributedMetadata.indexStatus(spark, light, 1L)
    println(f"[metascale] distributed indexStatus: cubes=${st.cubeStatuses.size}%d " +
      f"in ${(System.nanoTime() - t10) / 1e9}%.2f s (O(cubes), the writer's broadcast size)")

    // ---- incremental sidecar: checkpoint cost ∝ tail size ----
    // one small commit after the full sidecar, then re-checkpoint: the
    // new layer must be a delta (tail rows only), not a full rewrite
    val tailN = 1000
    val tailActions = (0 until tailN).map { i =>
      graft.log.AddFileAction(graft.core.model.IndexFile(
        path = s"tail$i.parquet", size = 128000000L, modificationTime = 0L,
        revisionId = 1L,
        blocks = Vector(graft.core.model.Block(root,
          graft.core.model.Weight(0), graft.core.model.Weight(1000), 100000L))),
        dataChange = true)
    }
    val v2 = graft.log.QbeastLog.commit(dir, conf, snap2.version, tailActions)
    val snapInc = graft.log.QbeastLog.snapshot(dir, conf)
    val t11 = System.nanoTime()
    graft.log.FileCheckpoint.write(spark, snapInc)
    val incSec = (System.nanoTime() - t11) / 1e9
    val resolved = graft.log.FileCheckpoint.read(spark, dir, v2).count()
    println(f"[metascale] incremental sidecar ($tailN%d-file tail over $numFiles%d): " +
      f"wrote in $incSec%.2f s (compare the full sidecar write above); " +
      f"chain-resolved rows=$resolved%d (expect ${numFiles + tailN}%d)")

    // ---- deletion vectors at metadata scale (VERDICT r11 item 1c) ----
    // a dv-heavy table: 1e5+ masked files. Measures (a) log replay with
    // the dv actions in the tail, (b) the basename→vector mask-map
    // build, (c) the broadcast the mask expression rides (the map no
    // longer ships inside the serialized plan), and (d) the per-row
    // probe cost through one real vector.
    val dvN = math.min(numFiles, 200000)
    val dvBatch = 50000
    var dvWritten = 0
    var dvVer = snapInc.version
    // ONE real vector shared by every action: the probe loads vectors
    // lazily per file, so metadata scale is what's under test here, not
    // 1e5 sidecar files
    val realDv = graft.write.DeletionVectors.write(dir, conf, Array(3L, 7L, 11L))
    val tDv0 = System.nanoTime()
    while (dvWritten < dvN) {
      val n = math.min(dvBatch, dvN - dvWritten)
      val acts = (0 until n).map { i =>
        graft.log.DvFileAction(s"f${dvWritten + i}.parquet", realDv, 3L)
      }
      dvVer = graft.log.QbeastLog.commit(dir, conf, dvVer, acts)
      dvWritten += n
    }
    println(f"[metascale] dv: committed $dvN%d DvFileActions in " +
      f"${(System.nanoTime() - tDv0) / 1e9}%.1f s")
    System.gc()
    val memDv0 = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    val tDv1 = System.nanoTime()
    val dvSnap = graft.log.QbeastLog.snapshot(dir, conf)
    val dvReplay = (System.nanoTime() - tDv1) / 1e9
    System.gc()
    val memDv1 = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    val tDv2 = System.nanoTime()
    val byName = dvSnap.dvs.map { case (p, i) =>
      new org.apache.hadoop.fs.Path(p).getName -> i.dvPath
    }
    val mapBuild = (System.nanoTime() - tDv2) / 1e9
    val tDv3 = System.nanoTime()
    val bc = graft.write.DeletionVectors.broadcastFor(spark, dir, byName)
    val bcSec = (System.nanoTime() - tDv3) / 1e9
    val tDv3b = System.nanoTime()
    graft.write.DeletionVectors.broadcastFor(spark, dir, byName) // cached hit
    val bcHit = (System.nanoTime() - tDv3b) / 1e9
    println(f"[metascale] dv: replay(${dvSnap.dvs.size}%d masks)=$dvReplay%.2f s " +
      f"retainedMB=${(memDv1 - memDv0) / 1e6}%.0f maskMapBuild=$mapBuild%.3f s " +
      f"broadcast=$bcSec%.3f s cachedHit=${bcHit * 1000}%.2f ms")
    // per-row probe: 10M probes against one memoized file (the scan
    // shape — file_path constant within a partition)
    val probe = graft.expressions.DvRowDeleted(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      org.apache.spark.sql.catalyst.expressions.Literal(0L),
      dir, bc, new org.apache.spark.util.SerializableConfiguration(conf))
    val fname = org.apache.spark.unsafe.types.UTF8String.fromString(s"$dir/f17.parquet")
    var hits = 0L
    val tDv4 = System.nanoTime()
    var r = 0L
    while (r < 10000000L) {
      if (probe.isDeleted(fname, r % 20)) hits += 1
      r += 1
    }
    val probeSec = (System.nanoTime() - tDv4) / 1e9
    println(f"[metascale] dv: 10M probes=$probeSec%.2f s " +
      f"(${probeSec * 100}%.1f ns/row) hits=$hits%d (expect 1500000)")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}

/** Perf probe for the two slow bench queries (t03, t25) at sf0.1:
 * stage-level timing to separate real compute from harness noise. */
object TextPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[textperf] $name: rows=$n%8d  ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    time("t25_decontaminate x1") {
      graft.ops.TextOps.decontaminate(docs, "doc_id", "text", col("doc_id") % 97 === 0).count()
    }
    time("t25_decontaminate x2") {
      graft.ops.TextOps.decontaminate(docs, "doc_id", "text", col("doc_id") % 97 === 0).count()
    }
    time("t24_paragraph_dedup") {
      graft.ops.TextOps.paragraphDedup(docs, "doc_id", "text").count()
    }
    for (d <- Seq(3, 8, 16)) {
      time(s"t03_simhash d=$d") {
        graft.ops.Dedup.simHashPairs(docs, "doc_id", "text", maxDistance = d)
          .orderBy(col("hamming"), col("id_a"), col("id_b")).limit(200).count()
      }
    }
    spark.stop()
  }
}

/** Probe: SQL UPDATE / MERGE INTO statements over catalog qbeast tables. */
object SqlDmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.sql.catalog.qbeast_catalog", "graft.catalog.QbeastCatalog")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("sqldml").toString
    o.write.format("qbeast").option("columnsToIndex","o_orderkey,o_totalprice")
      .option("cubeSize","2000").save(dir)
    spark.sql(s"CREATE TABLE qbeast_catalog.default.sqldml USING qbeast LOCATION '$dir'")

    // UPDATE
    try {
      spark.sql("UPDATE qbeast_catalog.default.sqldml SET o_totalprice = o_totalprice + 100000 WHERE o_orderstatus = 'F'")
      val got = spark.sql("SELECT sum(o_totalprice) FROM qbeast_catalog.default.sqldml").head.getDouble(0)
      val want = o.selectExpr("sum(CASE WHEN o_orderstatus='F' THEN o_totalprice+100000 ELSE o_totalprice END)").head.getDouble(0)
      println(f"[sqldml] UPDATE: got=$got%.2f want=$want%.2f match=${math.abs(got-want) < 1e-4}")
    } catch { case e: Exception => println(s"[sqldml] UPDATE FAILED: ${e.getMessage.linesIterator.take(3).mkString(" | ")}") }

    // MERGE (update slice + insert slice)
    try {
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .createOrReplaceTempView("o_src")
      spark.sql("""
        MERGE INTO qbeast_catalog.default.sqldml t
        USING (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 50000 AS o_totalprice,
                      o_orderdate, o_orderpriority
               FROM o_src WHERE o_orderkey % 10 = 3
               UNION ALL
               SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice,
                      o_orderdate, o_orderpriority
               FROM o_src WHERE o_orderkey % 10 = 7) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val n = spark.sql("SELECT count(*) FROM qbeast_catalog.default.sqldml").head.getLong(0)
      val wantN = o.count() + o.filter("o_orderkey % 10 = 7").count()
      println(s"[sqldml] MERGE: rows=$n want=$wantN match=${n == wantN}")
    } catch { case e: Exception => println(s"[sqldml] MERGE FAILED: ${e.getMessage.linesIterator.take(3).mkString(" | ")}") }

    // MERGE ... WHEN MATCHED THEN DELETE is supported (anti-join path):
    // every original key matches o_src, so only the inserted +1e8 keys
    // from the upsert above survive
    try {
      val before = spark.sql("SELECT count(*) FROM qbeast_catalog.default.sqldml").head.getLong(0)
      spark.sql("MERGE INTO qbeast_catalog.default.sqldml t USING o_src s ON t.o_orderkey = s.o_orderkey WHEN MATCHED THEN DELETE")
      val after = spark.sql("SELECT count(*) FROM qbeast_catalog.default.sqldml").head.getLong(0)
      val want = before - o.count()
      println(s"[sqldml] matched-delete: rows $before -> $after want=$want match=${after == want}")
    } catch { case e: Exception => println(s"[sqldml] matched-delete FAILED: ${e.getMessage.linesIterator.take(3).mkString(" | ")}") }
    spark.sql("DROP TABLE qbeast_catalog.default.sqldml")
    spark.stop()
  }
}

/** Perf probe: streaming dedup variants at a given SF. */
object StreamDedupPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.qbeast.stream.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.ops.Streaming.streamingDedupBounded(spark, s"$sfDir/events.parquet").count()
      println(f"[sdperf] s10 run$i: rows=$n ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    spark.stop()
  }
}

/** Sweep stream partition counts for the bounded-dedup state size. */
object StreamDedupSweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (p <- Seq("2", "4", "8", "16", "32"); i <- 1 to 2) {
      spark.conf.set("spark.qbeast.stream.partitions", p)
      val t0 = System.nanoTime()
      val n = graft.ops.Streaming.streamingDedupBounded(spark, s"$sfDir/events.parquet").count()
      println(f"[sdsweep] p=$p%2s run$i: rows=$n ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    spark.stop()
  }
}
