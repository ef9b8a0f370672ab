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

}
