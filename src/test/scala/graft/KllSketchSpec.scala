package graft

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.KllState

/** Mergeable KLL quantile sketch: exactness within capacity (the regime
 * the t38/t39 oracles replay), the weight-conservation invariant,
 * empirical rank-error bounds past capacity, rollup/merge equivalences,
 * serialization, the SQL surface, and the partial-aggregation plan
 * shape that keeps rows off the shuffle. */
class KllSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** DuckDB quantile_disc: sorted index max(0, ceil(q*n)-1). */
  private def exactDisc(sorted: Array[Double], q: Double): Double =
    sorted(math.max(0, math.ceil(q * sorted.length).toInt - 1))

  // ---- state-level unit behavior -------------------------------------------

  test("exact within capacity: extraction equals the sorted-rank rule") {
    val rnd = new scala.util.Random(7)
    val vals = Array.fill(5000)(rnd.nextDouble() * 1e6)
    val st = new KllState(8192)
    vals.foreach(st.add)
    val sorted = vals.sorted
    val qs = Array(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = st.quantiles(qs)
    qs.zipWithIndex.foreach { case (q, i) =>
      assert(got(i) == exactDisc(sorted, q), s"q=$q")
    }
    assert(st.totalWeight == vals.length.toLong)
  }

  test("compaction conserves total weight exactly and bounds memory") {
    val n = 200000
    val k = 256
    val rnd = new scala.util.Random(11)
    val st = new KllState(k)
    (0 until n).foreach(_ => st.add(rnd.nextDouble()))
    assert(st.totalWeight == n.toLong, "weight must be conserved through compaction")
    val retained = st.levels.map(_.length).sum
    // k per level, ~log2(n/k) levels — nowhere near n
    assert(retained <= k * (64 - java.lang.Long.numberOfLeadingZeros(n.toLong)),
      s"retained $retained items for n=$n, k=$k")
    assert(retained < n / 100, s"sketch kept $retained of $n items")
  }

  test("rank error past capacity stays small (n=200k, k=256)") {
    val n = 200000
    val k = 256
    val rnd = new scala.util.Random(13)
    // values ARE their own rank signal: uniform grid, shuffled
    val vals = rnd.shuffle((0 until n).toVector).toArray
    val st = new KllState(k)
    vals.foreach(v => st.add(v.toDouble))
    val qs = Array(0.01, 0.1, 0.5, 0.9, 0.99)
    val got = st.quantiles(qs)
    qs.zipWithIndex.foreach { case (q, i) =>
      // value v has true rank v+1 in 0..n-1 grid
      val trueRank = got(i) + 1
      val target = math.max(1L, math.ceil(q * n).toLong)
      val err = math.abs(trueRank - target) / n.toDouble
      assert(err <= 0.02, s"q=$q: rank error $err (got ${got(i)})")
    }
  }

  test("merge of partitioned states matches single-fold within rank-error bound") {
    val n = 100000
    val k = 256
    val rnd = new scala.util.Random(17)
    val vals = rnd.shuffle((0 until n).toVector).toArray
    val parts = vals.grouped(n / 8 + 1).toVector
    val merged = parts.map { p =>
      val s = new KllState(k); p.foreach(v => s.add(v.toDouble)); s
    }.reduce(_.mergeIn(_))
    assert(merged.totalWeight == n.toLong)
    val qs = Array(0.1, 0.5, 0.9)
    val got = merged.quantiles(qs)
    qs.zipWithIndex.foreach { case (q, i) =>
      val err = math.abs((got(i) + 1) - q * n) / n.toDouble
      assert(err <= 0.02, s"q=$q: rank error $err after merge")
    }
  }

  test("serialization roundtrip preserves the sketch bit-for-bit") {
    val rnd = new scala.util.Random(19)
    val st = new KllState(64)
    (0 until 10000).foreach(_ => st.add(rnd.nextGaussian()))
    val back = KllState.deserialize(st.serialize())
    assert(back.k == st.k && back.flips == st.flips)
    assert(back.levels.map(_.toVector) == st.levels.map(_.toVector))
    val qs = Array(0.25, 0.5, 0.75)
    assert(back.quantiles(qs).toVector == st.quantiles(qs).toVector)
  }

  // ---- DataFrame operators --------------------------------------------------

  test("kllQuantiles is exact within capacity and invariant to partitioning") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 3000).map(i => (s"g${i % 3}", rnd.nextInt(100000).toDouble))
    val df = rows.toDF("g", "v")
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).toArray.sorted
      (g, exactDisc(sorted, 0.5), exactDisc(sorted, 0.95))
    }.toSet
    def run(parts: Int) =
      ops.Sketch.kllQuantiles(df.repartition(parts), "g", col("v"),
        Seq("p50" -> 0.5, "p95" -> 0.95))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(run(1) == expected)
    // merge order cannot matter in the exact regime: level 0 concat
    assert(run(8) == expected)
  }

  test("kllState + kllMergeQuantiles equals the direct sketch, survives persistence") {
    val rnd = new scala.util.Random(29)
    val df = (0 until 4000)
      .map(i => (s"s${i % 4}", s"d${i % 13}", rnd.nextInt(1000000).toDouble))
      .toDF("src", "day", "v")
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val direct = ops.Sketch.kllQuantiles(df, "src", col("v"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    val dir = TestSpark.tmpDir("kll-rollup")
    ops.Sketch.kllState(df, Seq("src", "day"), col("v"))
      .write.parquet(s"$dir/states")
    val rolled = ops.Sketch.kllMergeQuantiles(
      spark.read.parquet(s"$dir/states"), "src", col("kll_state"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(rolled === direct)
  }

  test("merge adopts the larger capacity: big-k exact states stay exact through a default-k merge") {
    val n = 60000 // far past DefaultK (8192): a default-capacity merge
    val k = 100000 // buffer would compact; adopting k=100000 must not
    val rnd = new scala.util.Random(37)
    val vals = rnd.shuffle((0 until n).toVector).toArray
    val parts = vals.grouped(n / 4 + 1).toVector
    val serialized = parts.map { p =>
      val s = new KllState(k); p.foreach(v => s.add(v.toDouble)); s.serialize()
    }
    val buffer = new KllState(KllState.DefaultK) // KllMergeAgg's buffer
    serialized.foreach(b => buffer.mergeIn(KllState.deserialize(b)))
    assert(buffer.k == k, "merge buffer must adopt the states' capacity")
    assert(buffer.totalWeight == n.toLong)
    val qs = Array(0.25, 0.5, 0.75)
    val got = buffer.quantiles(qs)
    qs.zipWithIndex.foreach { case (q, i) =>
      // within the ADOPTED capacity nothing compacts: exact rank rule
      val expect = math.max(0, math.ceil(q * n).toInt - 1)
      assert(got(i) == expect.toDouble, s"q=$q: got ${got(i)}, want $expect")
    }
  }

  test("nulls are skipped, empty groups answer NaN") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)),
      ("e", None)).toDF("g", "v")
    val got = ops.Sketch.kllQuantiles(df, "g", col("v"), Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("g") == 1.0) // ceil(0.5*2)=1 -> first of [1.0, 3.0]
    assert(got("e").isNaN)
  }

  // ---- SQL surface ----------------------------------------------------------

  test("graft_kll_quantiles / graft_kll_state / graft_kll_merge SQL functions") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 2000).map(i => (s"g${i % 2}", s"d${i % 5}", rnd.nextInt(10000)))
    rows.toDF("g", "d", "v").createOrReplaceTempView("kll_sql_in")
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._3.toDouble).toArray.sorted
      (g, exactDisc(sorted, 0.5), exactDisc(sorted, 0.9))
    }.toSet
    val direct = spark.sql(
      """SELECT g, graft_kll_quantiles(CAST(v AS DOUBLE), 0.5, 0.9) AS qs
        |FROM kll_sql_in GROUP BY g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)(0),
        r.getSeq[Double](1)(1))).toSet
    assert(direct == expected)
    val rolled = spark.sql(
      """WITH states AS (
        |  SELECT g, d, graft_kll_state(CAST(v AS DOUBLE)) AS st
        |  FROM kll_sql_in GROUP BY g, d)
        |SELECT g, graft_kll_merge(st, 0.5, 0.9) AS qs FROM states GROUP BY g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)(0),
        r.getSeq[Double](1)(1))).toSet
    assert(rolled == expected)
    // SQL `0` and `1` parse as INTEGER literals — still valid quantiles
    val edges = spark.sql(
      """SELECT graft_kll_quantiles(CAST(v AS DOUBLE), 0, 1) AS qs
        |FROM kll_sql_in""".stripMargin).head().getSeq[Double](0)
    val all = rows.map(_._3.toDouble).sorted
    assert(edges == Seq(all.head, all.last))
  }

  // ---- plan shape -----------------------------------------------------------

  test("kll aggregation is map-side partial: states ride the shuffle, not rows") {
    val df = ops.Sketch.kllQuantiles(
      (0 until 1000).map(i => (s"g${i % 4}", i.toDouble)).toDF("g", "v")
        .repartition(8),
      "g", col("v"), Seq("p50" -> 0.5))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // descend into materialized AQE query stages (QueryStageExec wraps
    // its stage plan as a member, not a child)
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[ObjectHashAggregateExec] = {
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      p.collect { case o: ObjectHashAggregateExec => o } ++
        p.collect { case q: QueryStageExec => q.plan }.flatMap(collectAll)
    }
    val aggs = collectAll(plan)
    assert(aggs.size >= 2,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
    assert(aggs.exists(_.toString.contains("partial_graft_kll")),
      s"expected a map-side partial kll aggregate:\n$plan")
  }

}
