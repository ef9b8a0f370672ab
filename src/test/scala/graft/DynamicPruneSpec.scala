package graft

import graft.ops.DynamicPrune

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic file pruning for star joins: the dimension side's collected
 * join keys pushed into the fact scan prune FILES (OTree point spaces
 * for few keys, stats/bloom for many), while every branch returns
 * exactly the plain inner join. */
class DynamicPruneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** All file scans, descending through AQE's materialized stages. */
  private def allScans(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
    val self = p match {
      case s: FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case _ => Seq.empty
    }
    self ++ p.children.flatMap(allScans)
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = allScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  /** fact: 40k rows indexed on (key, v) across many files; dim: one row
   * per key with an attribute to filter on. */
  private def fixture(): (DataFrame, DataFrame, Long) = {
    val dir = TestSpark.tmpDir("dynprune-fact")
    val fact = (1 to 40000).map(i => (i.toLong % 400, i.toLong, i * 3L))
      .toDF("key", "id", "v")
    fact.write.format("qbeast")
      .option("columnsToIndex", "key,id")
      .option("cubeSize", "1000")
      .save(dir)
    val back = spark.read.format("qbeast").load(dir)
    // attr groups CONTIGUOUS key ranges (k/8), the realistic star-join
    // shape: a dim predicate (a date range, a region) selects keys that
    // are correlated, hence localized in the fact table's index space.
    // Scattered keys (one per OTree slab) legitimately overlap every
    // file — point spaces prune by locality, blooms prune regardless.
    val dim = (0L until 400L).map(k => (k, k / 8)).toDF("dkey", "attr")
    (back, dim, back.inputFiles.length.toLong)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("few-key dim filter prunes fact files; result equals the plain join") {
    val (fact, dim, total) = fixture()
    val dimF = dim.filter(col("attr") === 7) // keys 56..63 -> OR path
    val pruned = DynamicPrune.dynamicPrunedJoin(fact, "key", dimF, "dkey")
    val plain = fact.join(dimF, fact("key") === dimF("dkey"))
    assert(sortedRows(pruned) === sortedRows(plain))
    val read = filesRead(
      DynamicPrune.dynamicPrunedJoin(fact, "key", dimF, "dkey"))
    // the dim side is itself scan-free (a local dataset); the fact scan
    // must skip files — 8/400 keys over a key-indexed table
    assert(read < total, s"expected < $total fact files, read $read")
  }

  test("mid-size key set takes the IN path and stays exact") {
    val (fact, dim, _) = fixture()
    val dimF = dim.filter(col("attr") < 20) // 160 keys: > OrDisjunctCap -> IN
    val pruned = DynamicPrune.dynamicPrunedJoin(fact, "key", dimF, "dkey")
    val plain = fact.join(dimF, fact("key") === dimF("dkey"))
    assert(pruned.count() === plain.count())
    assert(sortedRows(pruned.groupBy("key").count()) ===
      sortedRows(plain.groupBy("key").count()))
  }

  test("key overflow falls back to the bloom pre-filter, still exact") {
    val (fact, dim, _) = fixture()
    val pruned =
      DynamicPrune.dynamicPrunedJoin(fact, "key", dim, "dkey", maxKeys = 16)
    val plain = fact.join(dim, fact("key") === dim("dkey"))
    assert(pruned.count() === plain.count())
    assert(sortedRows(pruned.agg(sum("v"), sum("dkey"))) ===
      sortedRows(plain.agg(sum("v"), sum("dkey"))))
  }

  test("empty and all-null dimension sides produce the empty join") {
    val (fact, dim, _) = fixture()
    val empty = dim.filter(col("attr") === -1)
    assert(DynamicPrune.dynamicPrunedJoin(fact, "key", empty, "dkey")
      .count() === 0L)
    val nullDim = Seq((Option.empty[Long], 1L)).toDF("dkey", "attr")
    assert(DynamicPrune.dynamicPrunedJoin(fact, "key", nullDim, "dkey")
      .count() === 0L)
  }

}
