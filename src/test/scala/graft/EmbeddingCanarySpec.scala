package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary for the embeddings table (the events-`ts`
 * lesson applied forward): if a fixture regeneration ships `embedding`
 * as list<double> instead of list<float>, every similarity builder
 * must still run and produce IDENTICAL results through the
 * `QTables.raw` normalization chokepoint — this fails loudly in
 * `sbt test` instead of ten e-queries failing at bench time. */
class EmbeddingCanarySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** A tiny fixture DIR (dir/embeddings.parquet) per encoding, same
   * float-precision values in both. */
  private lazy val encodedDirs: Map[String, String] = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 120).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat()), i % 5)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    def write(name: String, cast: String): String = {
      val dir = TestSpark.tmpDir(s"emb-canary-$name")
      df.withColumn("embedding", col("embedding").cast(cast))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      dir
    }
    Map(
      "float" -> write("float", "array<float>"),
      "double" -> write("double", "array<double>"))
  }

  private val queries = Seq("e01_knn_exact", "e02_ann_lsh", "e06_quantized_ann")

  queries.foreach { q =>
    test(s"$q is invariant to the embedding element type") {
      val results = encodedDirs.map { case (enc, dir) =>
        enc -> SparkEntry.queries(q)(spark, dir)
          .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      }
      assert(results("float") == results("double"),
        s"$q diverged between float and double embedding fixtures")
      assert(results("float").nonEmpty)
    }
  }

  test("normalizeEmbeddings is a no-op on the float shape") {
    val df = spark.read.parquet(s"${encodedDirs("float")}/embeddings.parquet")
    assert(QTables.normalizeEmbeddings(df) eq df)
  }

}
