package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Derive a larger benchmark dataset from an existing testdata scale
 * factor: every fact table is replicated `factor`× with its key columns
 * shifted per replica (consistently across tables, so joins keep their
 * selectivity), and the tiny dimension tables (nation, region) are
 * copied as-is. Replica 0 is the untouched original, so sentinel rows
 * (the vec_id=0 query vector, the 1..16 IVF anchors) stay unique.
 *
 *   sbt "runMain graft.tools.ScaleData /root/testdata/sf0.1 /tmp/testdata_sf1 10"
 *
 * This produces PERFORMANCE data (constant-factor cliff detection at
 * the next scale factor) — correctness stays gated on the driver's
 * DuckDB oracle over the provided scale factors. Duplicated document
 * texts and embedding vectors are intentional: a 10× replicated corpus
 * is a dup-heavy workload that exercises exact/near dedup at volume.
 */
object ScaleData {

  // replica spacing must stay disjoint from the key ranges benchmark
  // fixtures MINT for not-matched MERGE branches (original_key + 1e8 in
  // QTables' merge fixtures): with 1e10 spacing, minted keys land inside
  // their own replica's empty range instead of on the next replica's rows
  private val Shift = 10000000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleData <srcDir> <dstDir> [factor=10]")
    val src = args(0)
    val dst = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // legacy events fixtures stored ts as TIMESTAMP(NANOS) — readable
    // only as long; a no-op for the current timestamp[us] encoding. The
    // scaled copy keeps whichever type the source read produced;
    // consumers adapt via graft.EventTime.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val shifted: Map[String, Seq[String]] = Map(
        "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
        "orders" -> Seq("o_orderkey", "o_custkey"),
        "customer" -> Seq("c_custkey"),
        "part" -> Seq("p_partkey"),
        "supplier" -> Seq("s_suppkey"),
        "events" -> Seq("event_id", "user_id"),
        "documents" -> Seq("doc_id"),
        "embeddings" -> Seq("vec_id"))
      val copied = Seq("nation", "region")

      def replicate(df: DataFrame, keys: Seq[String]): DataFrame = {
        val cols = df.columns
        val withR = df.withColumn("__r", explode(lit((0 until factor).toArray)))
        keys.foldLeft(withR) { (d, k) =>
          d.withColumn(k, (col(k) + col("__r").cast("long") * lit(Shift)).cast(df.schema(k).dataType))
        }.select(cols.map(col).toSeq: _*)
      }

      (shifted.keys.toSeq.sorted ++ copied).foreach { t =>
        val in = spark.read.parquet(s"$src/$t.parquet")
        val out = shifted.get(t).map(replicate(in, _)).getOrElse(in)
        out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
        println(s"[scale] $t: ${in.count()} -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
      }
      println(s"[scale] wrote $dst at ${factor}x of $src")
    } finally spark.stop()
  }

}
