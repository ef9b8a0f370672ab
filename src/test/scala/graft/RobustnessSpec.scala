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

  test("empty dataframe write creates a readable empty table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("a", "b")
    val dir = TestSpark.tmpDir("emptytbl")
    empty.write.format("qbeast").option("columnsToIndex", "a,b").save(dir)
    assert(spark.read.format("qbeast").load(dir).count() == 0)
  }

}
