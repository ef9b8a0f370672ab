package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fixture-drift canary: the events `ts` column has shipped under
 * different parquet encodings across driver fixture generations
 * (TIMESTAMP(NANOS) arriving as long, timestamp[us] arriving as
 * TIMESTAMP or TIMESTAMP_NTZ). Every event-time consumer must produce
 * IDENTICAL results on all encodings of the same data — this spec
 * builds one tiny synthetic events table, writes it three ways, and
 * runs each streaming/as-of/session builder against each copy. If a
 * future fixture regeneration changes the encoding again, this fails
 * loudly instead of the bench failing at analysis time.
 */
class EventTimeCanarySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // ~2 hours of events for 3 users: sessions, windows, and both the
  // 'error' and 'click' types the stream-stream join filters on
  private lazy val encodedDirs: Map[String, String] = {
    import spark.implicits._
    val types = Seq("signup", "click", "error", "view")
    val baseMicros = 1700000000000000L // 2023-11-14T22:13:20Z
    val rows = for {
      u <- 0 until 3
      i <- 0 until 40
    } yield (u.toLong, (u * 1000 + i).toLong, types((i + u) % types.size),
      (u * 40 + i) * 1.5, baseMicros + i * 300000000L + u * 7000000L)
    val df = rows.toDF("user_id", "event_id", "event_type", "value", "ts_us")

    def write(name: String, tsCol: org.apache.spark.sql.Column): String = {
      val dir = TestSpark.tmpDir(s"events-canary-$name")
      df.select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), tsCol.as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }

    Map(
      // legacy fixture shape: TIMESTAMP(NANOS) read via nanosAsLong → long
      "long_nanos" -> write("long", (col("ts_us") * 1000L).cast("long")),
      // current fixture shape under inferTimestampNTZ: timestamp_ntz
      "ntz_micros" -> write("ntz",
        timestamp_micros(col("ts_us")).cast("timestamp_ntz")),
      // UTC-adjusted micros: plain timestamp
      "tz_micros" -> write("tz", timestamp_micros(col("ts_us"))))
  }

  /** Collect `df` to a canonical sorted multiset for cross-encoding
   * equality. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  private def assertInvariant(name: String)(build: String => DataFrame): Unit = {
    val results = encodedDirs.map { case (enc, dir) => enc -> canon(build(dir)) }
    val (refEnc, ref) = results.head
    assert(ref.nonEmpty, s"$name returned no rows — canary data too small")
    results.tail.foreach { case (enc, got) =>
      assert(got === ref, s"$name: encoding $enc differs from $refEnc")
    }
  }

  test("EventTime.micros and .timestamp agree across all ts encodings") {
    assertInvariant("event_time_cols") { dir =>
      val df = spark.read.parquet(dir)
      df.select(col("event_id"), EventTime.micros(df).as("us"),
        unix_micros(EventTime.timestamp(df)).as("ts_us"))
    }
  }

  test("windowed aggregation is encoding-invariant") {
    assertInvariant("windowedAgg")(d => ops.Streaming.windowedAgg(spark, d))
  }

  test("watermarked windowed aggregation is encoding-invariant") {
    assertInvariant("windowedAggWatermarked")(d =>
      ops.Streaming.windowedAggWatermarked(spark, d))
  }

  test("sessionize is encoding-invariant") {
    assertInvariant("sessionize")(d => ops.Streaming.sessionize(spark, d))
  }

  test("streaming windowed HLL is encoding-invariant and equals the batch sketch") {
    assertInvariant("streamingWindowedHll")(d =>
      ops.Streaming.streamingWindowedHll(spark, d))
    // micro-batch boundaries must not change the registers: the
    // streamed state equals one batch sketch over the same rows
    val dir = encodedDirs("tz_micros")
    val streamed = canon(ops.Streaming.streamingWindowedHll(spark, dir))
    val df = spark.read.parquet(dir)
    val keyed = df.select(
      unix_micros(window(col("ts"), "6 hours")("start")).as("ws"),
      col("event_type"), col("user_id"))
    val states = ops.Sketch.hllState(keyed, Seq("ws", "event_type"),
      col("user_id").cast("string"))
    val shims = org.apache.spark.sql.GraftShims
    val agg = shims.column(graft.expressions.HllMergeAgg(
      shims.expression(col("hll_state"))).toAggregateExpression())
    val batch = states.groupBy("ws", "event_type").agg(agg.as("sk"))
      .select(col("ws"), col("event_type"), col("sk.est").as("est"),
        col("sk.scaled").as("scaled"), col("sk.zeros").as("zeros"))
    assert(streamed == canon(batch), "streamed HLL != batch HLL")
  }

  test("streaming windowed quantiles are encoding-invariant and exact within capacity") {
    assertInvariant("streamingWindowedQuantiles")(d =>
      ops.Streaming.streamingWindowedQuantiles(spark, d))
    // within capacity the streamed sketch is the exact sorted-rank
    // quantile over each group's values, batching notwithstanding
    val dir = encodedDirs("tz_micros")
    val streamed = ops.Streaming.streamingWindowedQuantiles(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val df = spark.read.parquet(dir)
    val grouped = df.select(
        unix_micros(window(col("ts"), "6 hours")("start")).as("ws"),
        col("event_type"), col("value").cast("double").as("v"))
      .collect().groupBy(r => (r.getLong(0), r.getString(1)))
    grouped.foreach { case (key, rows) =>
      val sorted = rows.map(_.getDouble(2)).sorted
      def q(p: Double): Double =
        sorted((math.max(1L, math.ceil(p * sorted.length).toLong) - 1).toInt)
      assert(streamed(key) == ((q(0.5), q(0.9), q(0.99))), s"group $key diverged")
    }
  }

  test("stream-stream interval join is encoding-invariant") {
    assertInvariant("streamStreamJoin")(d =>
      ops.Streaming.streamStreamJoin(spark, d))
  }

  test("bounded streaming dedup is encoding-invariant") {
    assertInvariant("streamingDedupBounded")(d =>
      ops.Streaming.streamingDedupBounded(spark, d))
  }

  test("as-of join is encoding-invariant") {
    assertInvariant("asofJoin") { d =>
      val ev0 = spark.read.parquet(d)
      val ev = ev0.select(col("user_id"), col("event_id"), col("event_type"),
        EventTime.micros(ev0).as("tsu"), col("value"))
      val left = ev.filter(col("event_type") === "error")
        .select("user_id", "event_id", "tsu")
      val right = ev.filter(col("event_type") === "signup")
        .select("user_id", "tsu", "value")
      ops.AsOfJoin.asofJoin(left, right, "user_id", "tsu",
        Map("value" -> "signup_value"))
    }
  }

  test("session windows are encoding-invariant") {
    assertInvariant("sessionWindow") { d =>
      val ev0 = spark.read.parquet(d)
      val ev = ev0.withColumn("tsm", EventTime.timestamp(ev0))
      ev.groupBy(col("user_id"), session_window(col("tsm"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"), col("n"))
    }
  }

}
