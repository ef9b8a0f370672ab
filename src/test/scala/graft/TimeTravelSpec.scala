package graft

import org.scalatest.funsuite.AnyFunSuite

class TimeTravelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("versionAsOf reads the table as of an earlier commit") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("timetravel")
    (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b").save(dir) // v0
    (101 to 150).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(dir) // v1
    (1 to 10).map(i => (i.toLong, 0.0)).toDF("a", "b")
      .write.format("qbeast").mode("overwrite").save(dir) // v2

    assert(spark.read.format("qbeast").load(dir).count() == 10)
    assert(spark.read.format("qbeast").option("versionAsOf", 0).load(dir).count() == 100)
    assert(spark.read.format("qbeast").option("versionAsOf", 1).load(dir).count() == 150)
    assert(spark.read.format("qbeast").option("versionAsOf", 2).load(dir).count() == 10)
    val e = intercept[Exception] {
      spark.read.format("qbeast").option("versionAsOf", 99).load(dir).count()
    }
    assert(e.getMessage.contains("99"))
  }

  test("timestampAsOf resolves the latest version at or before the instant") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("tt-tsasof")
    (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b").save(dir) // v0
    Thread.sleep(1100) // commit mtimes are second-granular on some FS
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(1100)
    (101 to 150).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(dir) // v1

    val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    val between = java.time.LocalDateTime
      .ofInstant(java.time.Instant.ofEpochMilli(betweenMs), zone)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(spark.read.format("qbeast")
      .option("timestampAsOf", between).load(dir).count() == 100)
    // after both commits: head
    val after = java.time.LocalDateTime.now(zone).plusMinutes(1)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(spark.read.format("qbeast")
      .option("timestampAsOf", after).load(dir).count() == 150)
    // before the first commit: error names the timestamp
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("qbeast")
        .option("timestampAsOf", "1990-01-01 00:00:00").load(dir)
    }
    assert(e1.getMessage.contains("1990-01-01"))
    // both options together are rejected
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("qbeast").option("versionAsOf", 0)
        .option("timestampAsOf", after).load(dir)
    }
    assert(e2.getMessage.contains("both"))
    // unparseable timestamp names itself
    val e3 = intercept[IllegalArgumentException] {
      spark.read.format("qbeast").option("timestampAsOf", "not-a-time").load(dir)
    }
    assert(e3.getMessage.contains("not-a-time"))
    // Spark-legal short-id session zones ("PST" rides ZoneId.SHORT_IDS,
    // which plain ZoneId.of rejects) must resolve, not throw
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "PST")
    try assert(spark.read.format("qbeast")
      .option("timestampAsOf", after).load(dir).count() == 150)
    finally spark.conf.set(tzKey, prev)
  }

  test("refresh keeps a time-traveled relation pinned to its version") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("tt-refresh")
    (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b").save(dir) // v0
    (101 to 150).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(dir) // v1

    val v0 = spark.read.format("qbeast").option("versionAsOf", 0).load(dir)
    assert(v0.count() === 100)
    // table moves on; an explicit refresh of the pinned relation's file
    // index must NOT jump it to the new head
    (151 to 160).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(dir) // v2
    val index = v0.queryExecution.analyzed.collectLeaves().collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location
    }.get
    index.refresh()
    assert(v0.count() === 100, "refresh() must re-pin to versionAsOf, not head")
    assert(spark.read.format("qbeast").load(dir).count() === 160)
  }

  test("restoreToVersion rolls data, schema and config back as a new commit") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("restore")
    (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b").save(dir) // v0
    (101 to 150).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(dir) // v1
    val t = graft.table.QbeastTable.forPath(spark, dir)
    t.restoreToVersion(0) // v2 = state of v0
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === 100)
    assert(back.agg(org.apache.spark.sql.functions.max("a")).head.getLong(0) === 100L)
    // the restore is itself history: v1's state is still reachable
    assert(spark.read.format("qbeast").option("versionAsOf", 1).load(dir).count() === 150)
    // and restorable again (roll forward)
    t.restoreToVersion(1)
    assert(spark.read.format("qbeast").load(dir).count() === 150)

    val h = t.history()
    assert(h.map(_.version) === Seq(0L, 1L, 2L, 3L))
    assert(h(0).operation === "WRITE" && h(0).newRevision)
    // restores record an explicit commitInfo op marker (an append-only
    // history restore contains only removes, so a count heuristic
    // would mislabel it DELETE)
    assert(h(2).operation === "RESTORE" && h(2).removedFiles > 0)
    assert(h(3).operation === "RESTORE")

    val err = intercept[IllegalArgumentException](t.restoreToVersion(99))
    assert(err.getMessage.contains("99"))
  }

  test("restore racing concurrent appends recomputes its diff and lands") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("restore-race")
    (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").option("columnsToIndex", "a,b").save(dir) // v0
    (101 to 150).map(i => (i.toLong, i * 1.0)).toDF("a", "b")
      .write.format("qbeast").mode("append").save(dir) // v1
    val t = graft.table.QbeastTable.forPath(spark, dir)
    // restore + appender start together: whichever commit order the race
    // produces, the restore must land without throwing (pre-fix it threw
    // ConcurrentModificationException on any interleaved commit) and the
    // table must read consistently: exactly v0, or v0 plus whichever
    // appends committed AFTER the restore
    val appender = new Thread(() => {
      (1 to 3).foreach { k =>
        (1 to 20).map(i => ((1000 * k + i).toLong, i * 1.0)).toDF("a", "b")
          .write.format("qbeast").mode("append").save(dir)
      }
    })
    appender.start()
    t.restoreToVersion(0)
    appender.join()
    val back = spark.read.format("qbeast").load(dir)
    val n = back.count()
    // v0 rows always present; each surviving append adds 20
    assert(back.filter("a <= 100").count() === 100)
    assert((n - 100) % 20 === 0 && n - 100 <= 60, s"unexpected row count $n")
    // none of v1's rows survive the restore
    assert(back.filter("a BETWEEN 101 AND 150").count() === 0)
    assert(t.history().exists(_.operation == "RESTORE"))
  }

}
