package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: native codegen CosineSimilarity vs the HOF formulation. */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val a = emb.alias("a"); val b = emb.alias("b")
    val pairs = a.crossJoin(b).filter(col("a.id") < col("b.id"))
    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      val df = pairs.select(c.as("cos")).agg(sum("cos"))
      df.collect() // warm
      val t0 = System.nanoTime()
      val r = df.collect()
      println(f"[cos] $name: ${(System.nanoTime()-t0)/1e9}%.2f s sum=${r(0).getDouble(0)}%.6f")
    }
    val hof = {
      val x = col("a.emb"); val y = col("b.emb")
      val dot = aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val na = sqrt(aggregate(transform(x, p => p.cast("double") * p.cast("double")),
        lit(0.0), (acc, v) => acc + v))
      val nb = sqrt(aggregate(transform(y, p => p.cast("double") * p.cast("double")),
        lit(0.0), (acc, v) => acc + v))
      dot / (na * nb)
    }
    time("hof     ", hof)
    time("codegen ", graft.ops.Dedup.cosine(col("a.emb"), col("b.emb")))
    // confirm values identical
    val diff = pairs.select(
      (graft.ops.Dedup.cosine(col("a.emb"), col("b.emb")) - hof).as("d"))
      .agg(max(abs(col("d")))).head.getDouble(0)
    println(s"[cos] max |codegen - hof| = $diff (expect 0.0)")
    spark.stop()
  }
}
