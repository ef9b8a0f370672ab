package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Prints the file-pruning evidence for the indexed LSH ANN path
 * (e11) at a given scale factor: files read by the multi-probe scan vs
 * total files of the embeddings_lsh table.
 *
 * Run: sbt "runMain graft.tools.AnnProbe <sfDir>" */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.sql.QbeastSparkSessionExtension")
      .config("spark.ui.enabled", "false")
      .appName("ann-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.QTables.raw(spark, sfDir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val lsh = graft.QTables.qbeastLshEmbeddings(spark, sfDir)
    val total = lsh.inputFiles.length
    val ann = graft.ops.Similarity.knnLshIndexed(
      lsh.filter(col("vec_id") =!= 0), "vec_id", "embedding", "bucket", qv, k = 10)
    ann.collect()
    val read = ann.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.sum
    println(s"[annprobe] sf=$sfDir files read=$read of total=$total " +
      f"(${100.0 * read / math.max(total, 1)}%.1f%%)")
    spark.stop()
  }

}
