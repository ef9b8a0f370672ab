package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobustnessSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("null values in indexed columns round-trip and stay sampleable") {
    import spark.implicits._
    val data = (1 to 3000).map { i =>
      (if (i % 7 == 0) None else Some(i.toLong),
        if (i % 11 == 0) null else s"name_$i",
        i * 1.5)
    }.toDF("id", "name", "value")
    val dir = TestSpark.tmpDir("nulls")
    data.write.format("qbeast")
      .option("columnsToIndex", "id,value")
      .option("cubeSize", "500").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 3000)
    assert(back.filter(col("id").isNull).count() == data.filter(col("id").isNull).count())
    assert(back.exceptAll(data).count() == 0 && data.exceptAll(back).count() == 0)
    val s = back.sample(0.2).count()
    assert(math.abs(s - 600) <= 120)
    // range filter must still see all non-null matches
    assert(back.filter(col("id") <= 1000).count() == data.filter(col("id") <= 1000).count())
  }

  test("single-value and tiny tables index as root-only (Identity transformation)") {
    import spark.implicits._
    val tiny = Seq((1L, "x"), (1L, "y"), (1L, "z")).toDF("k", "s")
    val dir = TestSpark.tmpDir("tiny")
    tiny.write.format("qbeast").option("columnsToIndex", "k").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 3)
    assert(back.inputFiles.length == 1)
  }

  test("concurrent appends both land (optimistic retry)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = TestSpark.tmpDir("concurrent")
    li.limit(100).write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice").save(dir)
    val parts = (0 until 4).map(i => li.filter(col("l_orderkey") % 4 === i))
    val threads = parts.map { p =>
      new Thread(() => {
        p.write.format("qbeast")
          .option("columnsToIndex", "l_orderkey,l_extendedprice")
          .mode("append").save(dir)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() == 6000 + 100)
  }

  test("8 concurrent appenders + concurrent optimize: exact union, no lost updates") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = TestSpark.tmpDir("stress8")
    spark.conf.set("spark.qbeast.index.numberOfRetries", "50")
    try {
      // seed: bucket 8 of 9; eight appender threads race buckets 0-7
      // while another thread runs optimize in a loop
      li.filter(col("l_orderkey") % 9 === 8).write.format("qbeast")
        .option("columnsToIndex", "l_orderkey,l_extendedprice")
        .option("cubeSize", "500").save(dir)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val appenders = (0 until 8).map { i =>
        new Thread(() => {
          try {
            li.filter(col("l_orderkey") % 9 === i).write.format("qbeast")
              .option("columnsToIndex", "l_orderkey,l_extendedprice")
              .mode("append").save(dir)
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      val optimizer = new Thread(() => {
        try {
          (1 to 3).foreach { _ =>
            graft.table.QbeastTable.forPath(spark, dir).optimize()
            Thread.sleep(25)
          }
        } catch { case t: Throwable => failures.add(t) }
      })
      (appenders :+ optimizer).foreach(_.start())
      (appenders :+ optimizer).foreach(_.join())
      assert(failures.isEmpty,
        s"concurrent writers failed: ${failures.toArray.mkString("; ")}")
      // exact multiset union: every source row exactly once, nothing else
      val back = spark.read.format("qbeast").load(dir)
      assert(back.count() === li.count())
      assert(back.exceptAll(li).count() === 0)
      assert(li.exceptAll(back).count() === 0)
      // a final quiescent optimize must preserve the union too
      graft.table.QbeastTable.forPath(spark, dir).optimize()
      val after = spark.read.format("qbeast").load(dir)
      assert(after.count() === li.count())
      assert(after.exceptAll(li).count() === 0)
    } finally spark.conf.unset("spark.qbeast.index.numberOfRetries")
  }

  test("racing optimizes: loser drops its rewrite, rows never duplicate") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = TestSpark.tmpDir("optrace")
    li.write.format("qbeast")
      .option("columnsToIndex", "l_orderkey,l_extendedprice")
      .option("cubeSize", "500").save(dir)
    // both optimizes select overlapping files; whichever commits second
    // must detect its removes are gone on rebase and abort silently
    // (dropping a pure layout change is always safe) — never double-add
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        try graft.table.QbeastTable.forPath(spark, dir).optimize()
        catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty,
      s"optimize must not surface races: ${failures.toArray.mkString("; ")}")
    val back = spark.read.format("qbeast").load(dir)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).count() === 0)
    assert(li.exceptAll(back).count() === 0)
  }

  test("empty dataframe write creates a readable empty table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("a", "b")
    val dir = TestSpark.tmpDir("emptytbl")
    empty.write.format("qbeast").option("columnsToIndex", "a,b").save(dir)
    assert(spark.read.format("qbeast").load(dir).count() == 0)
  }

}
