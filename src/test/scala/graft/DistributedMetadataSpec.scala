package graft

import graft.log.{FileCheckpoint, QbeastLog}
import graft.read.{DistributedQbeastFileIndex, QbeastFileIndex}
import graft.table.QbeastTable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** The metadata-scale read path: parquet file-checkpoint sidecar +
 * executor-side pruning must select exactly the files the flat
 * driver-side path selects, under appends, deletes and sampling. */
class DistributedMetadataSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fileIndexOf(df: DataFrame) =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s.relation.location
    }.get

  private def withSidecar[T](f: => T): T = {
    spark.conf.set("spark.qbeast.metadata.sidecar.minFiles", "0")
    try f
    finally spark.conf.unset("spark.qbeast.metadata.sidecar.minFiles")
  }

  private def writeTable(dir: String): Unit = {
    import spark.implicits._
    val df = (1 to 30000).map(i => (i.toLong, i * 1.5, s"cat_${i % 7}"))
      .toDF("id", "value", "category")
    df.write.format("qbeast")
      .option("columnsToIndex", "id,value").option("cubeSize", "2000").save(dir)
    // second commit so the checkpoint consolidates more than one version
    (30001 to 36000).map(i => (i.toLong, i * 1.5, s"cat_${i % 7}"))
      .toDF("id", "value", "category")
      .write.format("qbeast").mode("append").save(dir)
  }

  test("sidecar read path selects exactly the files of the flat path") {
    val dir = TestSpark.tmpDir("dist-meta")
    writeTable(dir)
    withSidecar { QbeastTable.forPath(spark, dir).checkpoint() }
    val snapVersion = QbeastLog.snapshot(dir,
      spark.sparkContext.hadoopConfiguration).version
    assert(FileCheckpoint.exists(dir,
      spark.sparkContext.hadoopConfiguration, snapVersion), "sidecar written")

    // tail commit AFTER the checkpoint: distributed path must overlay it
    import spark.implicits._
    (36001 to 38000).map(i => (i.toLong, i * 1.5, s"cat_${i % 7}"))
      .toDF("id", "value", "category")
      .write.format("qbeast").mode("append").save(dir)

    val distDf = spark.read.format("qbeast").load(dir)
    assert(fileIndexOf(distDf).isInstanceOf[DistributedQbeastFileIndex],
      "sidecar present: read should take the distributed path")

    spark.conf.set("spark.qbeast.metadata.distributed", "false")
    val flatDf =
      try spark.read.format("qbeast").load(dir)
      finally spark.conf.unset("spark.qbeast.metadata.distributed")
    assert(fileIndexOf(flatDf).isInstanceOf[QbeastFileIndex])

    for (pred <- Seq("id <= 1200", "id > 35500", "value >= 3000.0 and value < 9000.0",
        "category = 'cat_3'", "1=1")) {
      val d = distDf.filter(pred)
      val f = flatDf.filter(pred)
      assert(d.count() === f.count(), s"row parity for $pred")
      val dFiles = d.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
      val fFiles = f.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
      assert(dFiles === fFiles, s"identical file selection for $pred")
    }

    // sampling pushdown flows through the same listFiles contract
    val dSample = distDf.sample(0.1).count()
    val fSample = flatDf.sample(0.1).count()
    assert(dSample === fSample, "deterministic sample parity")
  }

  test("tail deletes mask checkpointed sidecar rows") {
    val dir = TestSpark.tmpDir("dist-meta-del")
    writeTable(dir)
    withSidecar { QbeastTable.forPath(spark, dir).checkpoint() }
    // copy-on-write delete AFTER the checkpoint: removes checkpointed
    // files, adds rewritten ones — both must overlay the sidecar
    QbeastTable.forPath(spark, dir).delete("id <= 15000")

    val distDf = spark.read.format("qbeast").load(dir)
    assert(fileIndexOf(distDf).isInstanceOf[DistributedQbeastFileIndex])
    assert(distDf.count() === 21000L)
    assert(distDf.filter("id <= 15000").count() === 0L)
    spark.conf.set("spark.qbeast.metadata.distributed", "false")
    try assert(spark.read.format("qbeast").load(dir).count() === 21000L)
    finally spark.conf.unset("spark.qbeast.metadata.distributed")
  }

  test("light snapshot skips file materialization but keeps metadata") {
    val dir = TestSpark.tmpDir("dist-meta-light")
    writeTable(dir)
    withSidecar { QbeastTable.forPath(spark, dir).checkpoint() }
    val conf = spark.sparkContext.hadoopConfiguration
    val full = QbeastLog.snapshot(dir, conf)
    val light = QbeastLog.lightSnapshot(dir, conf)
    assert(!light.filesComplete)
    assert(light.checkpointVersion === full.version)
    assert(light.files.isEmpty, "no tail commits yet: no driver-side files")
    assert(light.schema === full.schema)
    assert(light.revisions.keySet === full.revisions.keySet)
    val (numFiles, totalBytes) =
      FileCheckpoint.summary(dir, conf, light.checkpointVersion).get
    assert(numFiles === full.files.size.toLong)
    assert(totalBytes === full.files.map(_.size).sum)
  }

  test("metadata count/min/max fold at sidecar scale via one job over the sidecar") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = TestSpark.tmpDir("dist-meta-fold")
    writeTable(dir)
    withSidecar { QbeastTable.forPath(spark, dir).checkpoint() }
    // tail append AFTER the checkpoint: the fold must overlay it
    (36001 to 38000).map(i => (i.toLong, i * 1.5, s"cat_${i % 7}"))
      .toDF("id", "value", "category")
      .write.format("qbeast").mode("append").save(dir)

    val df = spark.read.format("qbeast").load(dir)
    assert(fileIndexOf(df.filter("1=1")).isInstanceOf[DistributedQbeastFileIndex],
      "fixture must take the distributed (light-snapshot) path")
    val agg = df.agg(count(lit(1)).as("cnt"),
      min(col("id")).as("mn"), max(col("id")).as("mx"),
      min(col("category")).as("mnc"), max(col("category")).as("mxc"),
      min(col("value")).as("mnv"), max(col("value")).as("mxv"))
    // the whole aggregate folds: no relation survives optimization
    val scans = agg.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.isEmpty, "sidecar-scale count/min/max should fold to metadata")
    val r = agg.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((38000L, 1L, 38000L)))
    assert((r.getString(3), r.getString(4)) == (("cat_0", "cat_6")))
    assert((r.getDouble(5), r.getDouble(6)) == ((1.5, 57000.0)))

    // FILTERED folds run the tri-state proofs executor-side: the
    // ingest boundary (id <= 36000 vs the tail append) decides every
    // file, so count+min+max under the predicate fold too
    val fagg = df.filter(col("id") > 36000)
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("mn"),
        max(col("value")).as("mxv"))
    val fscans = fagg.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(fscans.isEmpty, "sidecar-scale FILTERED fold should fire")
    val fr = fagg.head()
    assert((fr.getLong(0), fr.getLong(1), fr.getDouble(2)) ==
      ((2000L, 36001L, 57000.0)))
    // a predicate cutting through a file bails to the scan, exactly
    // like the driver-side path
    val partial = df.filter(col("id") > 36100).agg(count(lit(1)).as("cnt"))
    val pscans = partial.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(pscans.nonEmpty, "straddling predicate must bail to the scan")
    assert(partial.head().getLong(0) == 1900L)

    // a SUBQUERY predicate (still a Filter expression at optimization
    // time) embeds a LogicalPlan the fold closure could never
    // serialize: it must bail to the scan — correct answer, no
    // Task-not-serializable crash at plan time
    spark.range(36000, 36500).toDF("cut").createOrReplaceTempView("dm_fold_cut")
    val subq = df.filter("id > (SELECT max(cut) FROM dm_fold_cut)")
      .agg(count(lit(1)).as("cnt"))
    assert(subq.head().getLong(0) == 1501L, "subquery predicate answer")

    // a copy-on-write DELETE lands tail removes (masking sidecar rows)
    // + rewritten adds: the fold must track the overlay exactly
    QbeastTable.forPath(spark, dir).delete("id <= 15000")
    val agg2 = spark.read.format("qbeast").load(dir)
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("mn"))
    val scans2 = agg2.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans2.isEmpty, "post-delete sidecar fold should still fire")
    assert(agg2.head() == org.apache.spark.sql.Row(23000L, 15001L))
  }

  test("pushed filters and column pruning survive the distributed index") {
    val dir = TestSpark.tmpDir("dist-meta-plan")
    writeTable(dir)
    withSidecar { QbeastTable.forPath(spark, dir).checkpoint() }
    val df = spark.read.format("qbeast").load(dir)
      .filter("id <= 5000 and value < 6000.0").select("id", "value")
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.relation.location.isInstanceOf[DistributedQbeastFileIndex])
    val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
    assert(pushed.contains("LessThanOrEqual(id") && pushed.contains("LessThan(value"),
      s"filters not pushed: $pushed")
    val readSchema = scan.metadata.getOrElse("ReadSchema", "")
    assert(!readSchema.contains("category"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("vacuum keeps delta-chain ancestors; compaction unchains them") {
    val dir = TestSpark.tmpDir("dist-meta-vac")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    var expected = 36000L
    withSidecar {
      t.checkpoint() // sidecar at v1: full layer
      (1 to 500).map(i => ((900000 + i).toLong, i * 1.5, "cat_0"))
        .toDF("id", "value", "category")
        .write.format("qbeast").mode("append").save(dir)
      expected += 500
      t.checkpoint() // sidecar at v2: DELTA on v1
    }
    assert(FileCheckpoint.exists(dir, conf, 1) && FileCheckpoint.exists(dir, conf, 2))
    t.vacuum(force = true, retainMillis = 0L)
    assert(FileCheckpoint.exists(dir, conf, 1),
      "chain ancestor survives vacuum — the delta at v2 resolves through it")
    assert(FileCheckpoint.exists(dir, conf, 2), "newest sidecar kept")
    assert(spark.read.format("qbeast").load(dir).count() === expected)

    // grow the chain past MaxChainDepth: the next layer compacts (full)
    // and a later vacuum can then drop the whole old chain
    withSidecar {
      (1 to FileCheckpoint.MaxChainDepth).foreach { k =>
        (1 to 100).map(i => ((910000 + k * 1000 + i).toLong, i * 1.5, "cat_1"))
          .toDF("id", "value", "category")
          .write.format("qbeast").mode("append").save(dir)
        expected += 100
        t.checkpoint()
      }
    }
    val newest = QbeastLog.latestCheckpointVersion(dir, conf)
    t.vacuum(force = true, retainMillis = 0L)
    assert(FileCheckpoint.exists(dir, conf, newest), "compacted sidecar kept")
    assert(!FileCheckpoint.exists(dir, conf, 1),
      "after compaction the old chain is prunable")
    assert(spark.read.format("qbeast").load(dir).count() === expected)
    // and the distributed path still selects correctly post-compaction
    val distDf = spark.read.format("qbeast").load(dir)
    assert(fileIndexOf(distDf).isInstanceOf[DistributedQbeastFileIndex])
    assert(distDf.filter("id > 900000").count() === expected - 36000L)
  }

  test("incremental sidecar layers resolve to the flat file set") {
    val dir = TestSpark.tmpDir("dist-meta-delta")
    writeTable(dir)
    val t = QbeastTable.forPath(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    withSidecar {
      t.checkpoint() // full base layer
      // a delete (removes + rewrites) and an append: the next layer must
      // carry adds AND tombstones
      t.delete("id <= 9000")
      (50001 to 52000).map(i => (i.toLong, i * 1.5, s"cat_${i % 7}"))
        .toDF("id", "value", "category")
        .write.format("qbeast").mode("append").save(dir)
      t.checkpoint() // delta layer
    }
    val v = QbeastLog.latestCheckpointVersion(dir, conf)
    val resolved = FileCheckpoint.read(spark, dir, v)
      .select("path").as[String].collect().sorted
    val flat = QbeastLog.snapshot(dir, conf).files.map(_.path).sorted
    assert(resolved.toSeq === flat.toSeq,
      "chain-resolved sidecar = flat snapshot file set")
    // row parity through the reader
    assert(spark.read.format("qbeast").load(dir).count() === (36000L - 9000L + 2000L))
    spark.conf.set("spark.qbeast.metadata.distributed", "false")
    try assert(spark.read.format("qbeast").load(dir).count() === (36000L - 9000L + 2000L))
    finally spark.conf.unset("spark.qbeast.metadata.distributed")
  }

  test("indexMetrics/depthMetrics via the sidecar match the flat path") {
    val dir = TestSpark.tmpDir("dist-meta-metrics")
    writeTable(dir)
    withSidecar { QbeastTable.forPath(spark, dir).checkpoint() }
    // tail commit after the checkpoint: the distributed aggregation must
    // overlay it exactly like the read path does
    import spark.implicits._
    (36001 to 38000).map(i => (i.toLong, i * 1.5, s"cat_${i % 7}"))
      .toDF("id", "value", "category")
      .write.format("qbeast").mode("append").save(dir)

    val conf = spark.sparkContext.hadoopConfiguration
    val light = QbeastLog.lightSnapshot(dir, conf)
    assert(graft.log.DistributedMetadata.usable(spark, light),
      "light snapshot + sidecar present: control plane should distribute")

    val t = QbeastTable.forPath(spark, dir)
    val dist = t.indexMetrics()
    val distDepths = t.depthMetrics()
    spark.conf.set("spark.qbeast.metadata.distributed", "false")
    val (flat, flatDepths) =
      try (t.indexMetrics(), t.depthMetrics())
      finally spark.conf.unset("spark.qbeast.metadata.distributed")
    assert(dist === flat, "indexMetrics parity distributed vs flat")
    assert(distDepths === flatDepths, "depthMetrics parity distributed vs flat")
  }

  test("optimize selects candidates through the sidecar") {
    val dir = TestSpark.tmpDir("dist-meta-opt")
    writeTable(dir)
    withSidecar { QbeastTable.forPath(spark, dir).checkpoint() }
    val conf = spark.sparkContext.hadoopConfiguration
    assert(!QbeastLog.lightSnapshot(dir, conf).filesComplete)

    val before = spark.read.format("qbeast").load(dir)
    val beforeRows = before.count()
    val beforeSum = before.agg(org.apache.spark.sql.functions.sum("value"))
      .head.getDouble(0)
    val filesBefore = QbeastLog.snapshot(dir, conf).files.size

    // runs with the sidecar present → distributed candidate selection
    QbeastTable.forPath(spark, dir).optimize()

    val after = spark.read.format("qbeast").load(dir)
    assert(after.count() === beforeRows, "optimize preserves rows")
    val afterSum = after.agg(org.apache.spark.sql.functions.sum("value"))
      .head.getDouble(0)
    assert(math.abs(afterSum - beforeSum) < 1e-6, "optimize preserves content")
    val snapAfter = QbeastLog.snapshot(dir, conf)
    assert(snapAfter.files.size <= filesBefore,
      s"optimize repacks: ${snapAfter.files.size} files vs $filesBefore before")
    // index shape preserved: metrics still agree between both paths
    val t = QbeastTable.forPath(spark, dir)
    val dist = t.indexMetrics()
    spark.conf.set("spark.qbeast.metadata.distributed", "false")
    val flat =
      try t.indexMetrics()
      finally spark.conf.unset("spark.qbeast.metadata.distributed")
    assert(dist === flat)
  }

  test("time travel to a pre-sidecar version falls back to the flat path") {
    val dir = TestSpark.tmpDir("dist-meta-tt")
    writeTable(dir)
    withSidecar { QbeastTable.forPath(spark, dir).checkpoint() }
    val v0 = spark.read.format("qbeast").option("versionAsOf", 0).load(dir)
    assert(fileIndexOf(v0).isInstanceOf[QbeastFileIndex],
      "no sidecar at version 0: flat path")
    assert(v0.count() === 30000L)
  }

  test("distributed vacuum deletes the same set the driver loop would") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("dist-vacuum")
    def write(mode: String): Unit =
      (1 to 2000).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
        .write.format("qbeast").option("columnsToIndex", "a")
        .option("cubeSize", "500").mode(mode).save(dir)
    write("error"); write("overwrite") // first batch's files all dead
    val t = QbeastTable.forPath(spark, dir)
    val live = t.snapshot.files.map(f =>
      new org.apache.hadoop.fs.Path(f.path).getName).toSet
    def deadOnDisk(): Int = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !live.contains(f.getName))
    assert(deadOnDisk() > 0, "fixture: the overwrite must leave dead files")
    // threshold 1 forces the executor-parallel delete job (the 100 TB
    // path); result must be indistinguishable from the driver loop
    spark.conf.set("spark.qbeast.vacuum.distributedThreshold", "1")
    try {
      val n = t.vacuum(retainMillis = 0L, force = true)
      assert(n > 0)
      assert(deadOnDisk() === 0, "every dead file reclaimed")
      assert(spark.read.format("qbeast").load(dir).count() === 2000L)
    } finally spark.conf.unset("spark.qbeast.vacuum.distributedThreshold")
  }

}
