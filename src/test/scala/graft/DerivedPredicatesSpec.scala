package graft

import graft.read.DerivedPredicates

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate

/** Derived range predicates from monotone date functions
 * (read/DerivedPredicates.scala): `year(ts)=…`, `cast(ts AS date)`,
 * `trunc`/`date_trunc` comparisons must (a) rewrite to exactly
 * equivalent raw-column ranges, (b) actually skip files on a
 * time-clustered qbeast table, (c) never change query results — across
 * operators, null rows, non-UTC zones and DST boundaries — and (d)
 * unlock metadata-only counts and stats-proof DELETEs. */
class DerivedPredicatesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  // ---- unit: the rewrite itself ------------------------------------------

  private val d = AttributeReference("d", DateType)()
  private val ts = AttributeReference("ts", TimestampType)()

  private def days(y: Int, m: Int, dd: Int): Int =
    LocalDate.of(y, m, dd).toEpochDay.toInt

  test("year(date) comparisons rewrite to exact day ranges") {
    val Seq(r) = DerivedPredicates.expand(Seq(EqualTo(Year(d), Literal(1995))))
    assert(r == And(
      GreaterThanOrEqual(d, Literal(days(1995, 1, 1), DateType)),
      LessThan(d, Literal(days(1996, 1, 1), DateType))))
    val Seq(ge) = DerivedPredicates.expand(Seq(GreaterThanOrEqual(Year(d), Literal(1995))))
    assert(ge == GreaterThanOrEqual(d, Literal(days(1995, 1, 1), DateType)))
    val Seq(gt) = DerivedPredicates.expand(Seq(GreaterThan(Year(d), Literal(1995))))
    assert(gt == GreaterThanOrEqual(d, Literal(days(1996, 1, 1), DateType)))
    val Seq(lt) = DerivedPredicates.expand(Seq(LessThan(Year(d), Literal(1995))))
    assert(lt == LessThan(d, Literal(days(1995, 1, 1), DateType)))
    val Seq(le) = DerivedPredicates.expand(Seq(LessThanOrEqual(Year(d), Literal(1995))))
    assert(le == LessThan(d, Literal(days(1996, 1, 1), DateType)))
    // literal-first mirrors flip
    val Seq(m) = DerivedPredicates.expand(Seq(GreaterThan(Literal(1995), Year(d))))
    assert(m == LessThan(d, Literal(days(1995, 1, 1), DateType)))
  }

  test("trunc(date) boundary vs non-boundary literals") {
    def tr(fmt: String) = TruncDate(d, Literal(fmt))
    // boundary: [L, next)
    val Seq(b) = DerivedPredicates.expand(
      Seq(EqualTo(tr("month"), Literal(days(1995, 7, 1), DateType))))
    assert(b == And(
      GreaterThanOrEqual(d, Literal(days(1995, 7, 1), DateType)),
      LessThan(d, Literal(days(1995, 8, 1), DateType))))
    // non-boundary literal: trunc can never equal it → constant FALSE
    val Seq(nb) = DerivedPredicates.expand(
      Seq(EqualTo(tr("month"), Literal(days(1995, 7, 2), DateType))))
    assert(nb == Literal(false, BooleanType))
    // week truncates to Monday; 1995-06-05 was a Monday
    val Seq(w) = DerivedPredicates.expand(
      Seq(GreaterThanOrEqual(tr("week"), Literal(days(1995, 6, 5), DateType))))
    assert(w == GreaterThanOrEqual(d, Literal(days(1995, 6, 5), DateType)))
    // trunc(date,…) has no 'day' level (Spark returns NULL): no rewrite
    val dayEq = EqualTo(tr("day"), Literal(days(1995, 7, 1), DateType))
    assert(DerivedPredicates.expand(Seq(dayEq)) == Seq(dayEq))
  }

  test("rewrites recurse through And/Or but never Not; unknown shapes untouched") {
    val leaf = EqualTo(Year(d), Literal(1995))
    val other = EqualTo(AttributeReference("x", IntegerType)(), Literal(3))
    val Seq(o) = DerivedPredicates.expand(Seq(Or(leaf, other)))
    o match {
      case Or(And(_: GreaterThanOrEqual, _: LessThan), `other`) =>
      case x => fail(s"unexpected: $x")
    }
    // NOT(g = L) rewrites to the complement union (exact); other
    // shapes under Not stay untouched
    val Seq(ne) = DerivedPredicates.expand(Seq(Not(leaf)))
    assert(ne == Or(
      LessThan(d, Literal(days(1995, 1, 1), DateType)),
      GreaterThanOrEqual(d, Literal(days(1996, 1, 1), DateType))))
    val notRange = Not(GreaterThan(Year(d), Literal(1995)))
    assert(DerivedPredicates.expand(Seq(notRange)) == Seq(notRange))
    val monthE = EqualTo(Month(d), Literal(3)) // non-monotonic: no rewrite
    assert(DerivedPredicates.expand(Seq(monthE)) == Seq(monthE))
    // idempotent: a second pass leaves the expansion unchanged
    val once = DerivedPredicates.expand(Seq(leaf))
    assert(DerivedPredicates.expand(once) == once)
  }

  test("zoned timestamp anchors use the cast's zone") {
    val cast = Cast(ts, DateType, Some("America/New_York"))
    val Seq(r) = DerivedPredicates.expand(
      Seq(EqualTo(cast, Literal(days(1995, 3, 7), DateType))))
    val zone = java.time.ZoneId.of("America/New_York")
    def micros(y: Int, m: Int, dd: Int): Long = {
      val i = LocalDate.of(y, m, dd).atStartOfDay(zone).toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    assert(r == And(
      GreaterThanOrEqual(ts, Literal(micros(1995, 3, 7), TimestampType)),
      LessThan(ts, Literal(micros(1995, 3, 8), TimestampType))))
    // an unresolved zone derives nothing (never guess a zone)
    val bare = EqualTo(Cast(ts, DateType), Literal(days(1995, 3, 7), DateType))
    assert(DerivedPredicates.expand(Seq(bare)) == Seq(bare))
    // Spark-legal short ids ("PST" rides ZoneId.SHORT_IDS) must resolve
    // like the engine resolves them — not throw, not skip
    val pst = EqualTo(Cast(ts, DateType, Some("PST")),
      Literal(days(1995, 3, 7), DateType))
    DerivedPredicates.expand(Seq(pst)) match {
      case Seq(And(GreaterThanOrEqual(`ts`, Literal(lo: java.lang.Long, TimestampType)), _)) =>
        val la = java.time.ZoneId.of("America/Los_Angeles")
        val want = LocalDate.of(1995, 3, 7).atStartOfDay(la).toInstant
        assert(lo == want.getEpochSecond * 1000000L)
      case x => fail(s"PST zone should derive: $x")
    }
    // a nonsense zone skips the derivation instead of failing the query
    val bad = EqualTo(Cast(ts, DateType, Some("Not/AZone")),
      Literal(days(1995, 3, 7), DateType))
    assert(DerivedPredicates.expand(Seq(bad)) == Seq(bad))
  }

  test("expansion is idempotent for IN (the double-expansion call sites rely on it)") {
    val in = In(Year(d), Seq(Literal(1994), Literal(1996)))
    val once = DerivedPredicates.expand(Seq(in))
    assert(DerivedPredicates.expand(once) == once)
    once match {
      case Seq(And(`in`, And(_: GreaterThanOrEqual, _: LessThan))) =>
      case x => fail(s"unexpected IN expansion: $x")
    }
  }

  // ---- end-to-end: correctness + file skipping ----------------------------

  /** Hourly rows for the given years, one append per year (so files are
   * year-pure), ~1% null timestamps (unless `nulls=false`), plus a
   * derived date column. */
  private def writeYears(dir: String, years: Seq[Int], nulls: Boolean = true): Unit = {
    import spark.implicits._
    years.foreach { y =>
      val start = LocalDate.of(y, 1, 1).toEpochDay
      val end = LocalDate.of(y + 1, 1, 1).toEpochDay
      val rows = (start until end).flatMap { day =>
        (0 until 24 by 3).map { h =>
          val id = day * 24 + h
          val t = if (nulls && id % 97 == 0) null
            else java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400L + h * 3600L))
          (id, t)
        }
      }
      rows.toDF("id", "ts")
        .withColumn("dt", to_date(col("ts")))
        .write.format("qbeast").mode("append")
        .option("columnsToIndex", "id").option("cubeSize", "2000")
        .save(dir)
    }
  }

  test("date-function predicates prune files and never change results") {
    val dir = TestSpark.tmpDir("derived-prune")
    writeYears(dir, Seq(1994, 1995, 1996))
    val back = spark.read.format("qbeast").load(dir)
    back.createOrReplaceTempView("dp_t")
    val raw = back.select("id", "ts", "dt").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    val total = filesRead(back.select("id"))

    val selective = Seq(
      "year(ts) = 1995",
      "year(ts) >= 1996",
      "year(ts) < 1995",
      "1996 <= year(ts)",
      "year(ts) <=> 1994",
      "cast(ts as date) = date'1995-03-07'",
      "cast(ts as date) >= date'1996-06-01'",
      "to_date(ts) < date'1994-02-01'",
      "date_trunc('month', ts) = timestamp'1995-07-01 00:00:00'",
      "date_trunc('MONTH', ts) >= timestamp'1996-11-01 00:00:00'",
      "date_trunc('week', ts) = timestamp'1995-06-05 00:00:00'",
      "date_trunc('day', ts) <= timestamp'1994-01-10 00:00:00'",
      "date_trunc('quarter', ts) = timestamp'1996-10-01 00:00:00'",
      // non-boundary literal: provably empty, every file skipped
      "date_trunc('month', ts) = timestamp'1995-07-02 00:00:00'",
      "year(dt) = 1995",
      "trunc(dt, 'mm') = date'1995-07-01'",
      "trunc(dt, 'year') < date'1995-01-01'",
      // date column vs timestamp literal analyzes as cast(dt AS timestamp)
      "dt = timestamp'1995-03-07 00:00:00'",
      "dt > timestamp'1996-03-07 12:00:00'",
      // != / NOT(=) derive the complement union of the bucket
      "NOT (year(ts) = 1995)",
      "year(ts) != 1996",
      // date_trunc over a DATE column (analyzes as date_trunc over
      // cast(dt AS timestamp)): anchors are plain date literals
      "date_trunc('month', dt) = timestamp'1995-07-01 00:00:00'",
      "date_trunc('quarter', dt) >= timestamp'1996-04-01 00:00:00'",
      // unix_timestamp: one-second buckets over ts, one-day over dates
      s"unix_timestamp(ts) < ${LocalDate.of(1995, 1, 1).toEpochDay * 86400L}",
      s"to_unix_timestamp(ts) >= ${LocalDate.of(1996, 1, 1).toEpochDay * 86400L}",
      s"unix_timestamp(dt) = ${LocalDate.of(1995, 3, 7).toEpochDay * 86400L}",
      // date_format equality (pure bucket preimage)
      "date_format(ts, 'yyyy-MM-dd') = '1995-03-07'",
      "date_format(ts, 'yyyy-MM') = '1996-06'",
      "date_format(dt, 'yyyy') = '1994'",
      "date_format(ts, 'yyyy-MM-dd') IN ('1995-03-07', '1996-06-01')",
      // date_format ranges: gated off in the global rewrite (output
      // order diverges outside 4-digit years) but proved per FILE when
      // its min/max dates sit in years [1, 9999] (FileStatsPruning
      // .dateFormatCmp) — these year-clustered files all qualify
      "date_format(ts, 'yyyy-MM-dd') >= '1996-01-01'",
      "date_format(ts, 'yyyy-MM') <= '1994-06'",
      "date_format(dt, 'yyyy') < '1995'",
      "'1996' <= date_format(ts, 'yyyy')",
      "date_format(dt, 'yyyy-MM-dd') > '1996-06-15'")
    val unselectiveButExact = Seq(
      "year(ts) IN (1995, 1996)",
      "year(ts) = 1995 OR year(ts) = 1994",
      // correctness-only: calendar-image and day-grain shapes rarely
      // decide the year-span files here (pruning is asserted on the
      // quarter-aligned fixture below instead)
      "date_format(ts, 'yyyy-MM-dd') != '1995-03-07'",
      "dayofweek(dt) = 1",
      "weekday(ts) <= 1",
      "dayofmonth(ts) = 31",
      "month(ts) != 7",
      "month(ts) = 7",
      "quarter(dt) = 2",
      "month(ts) IN (1, 12)",
      "month(dt) >= 11",
      "unix_timestamp(ts) = unix_timestamp(timestamp'1995-03-07 06:00:00')")

    (selective ++ unselectiveButExact).foreach { p =>
      val got = spark.sql(s"SELECT id, ts, dt FROM dp_t WHERE $p").collect()
        .map(r => (r.get(0), r.get(1), r.get(2))).toSet
      val want = {
        // evaluate the same predicate on the collected rows via a local
        // relation — the reference semantics with no pruning in play
        import spark.implicits._
        val local = raw.toSeq.map { case (i, t, dd) =>
          (i.asInstanceOf[Long],
            t.asInstanceOf[java.sql.Timestamp], dd.asInstanceOf[java.sql.Date])
        }.toDF("id", "ts", "dt")
        local.where(p).collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
      }
      assert(got == want, s"row mismatch for: $p")
    }

    selective.foreach { p =>
      val n = filesRead(spark.sql(s"SELECT id FROM dp_t WHERE $p"))
      assert(n < total, s"no files skipped for: $p ($n of $total)")
    }
    // the provably-empty month literal prunes everything
    val none = filesRead(
      spark.sql("SELECT id FROM dp_t WHERE date_trunc('month', ts) = timestamp'1995-07-02 00:00:00'"))
    assert(none == 0L)
  }

  test("date_format ranges: year-10000 files stay unpruned, clean files still skip") {
    // "+10000-01-01" sorts BELOW every digit-led string while sitting
    // above them chronologically — a raw-range derivation would skip
    // the year-10000 file for predicates its rows actually match. The
    // per-file proof must bail (None) there and still prune the files
    // whose min/max years sit inside [1, 9999].
    val dir = TestSpark.tmpDir("derived-df-y10k")
    writeYears(dir, Seq(1995, 10000), nulls = false)
    val back = spark.read.format("qbeast").load(dir)
    back.createOrReplaceTempView("dp_y10k")
    val raw = back.select("id", "ts", "dt").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    val total = filesRead(back.select("id"))

    val parity = Seq(
      // matches ONLY the sign-prefixed year-10000 rows
      "date_format(ts, 'yyyy-MM-dd') < '1000-01-01'",
      // matches ONLY 1995 ("+10000" < "1995" as strings)
      "date_format(ts, 'yyyy') >= '1995'",
      "date_format(dt, 'yyyy-MM') <= '1995-12'")
    parity.foreach { p =>
      val got = spark.sql(s"SELECT id, ts, dt FROM dp_y10k WHERE $p").collect()
        .map(r => (r.get(0), r.get(1), r.get(2))).toSet
      val want = {
        import spark.implicits._
        raw.toSeq.map { case (i, t, dd) =>
          (i.asInstanceOf[Long],
            t.asInstanceOf[java.sql.Timestamp], dd.asInstanceOf[java.sql.Date])
        }.toDF("id", "ts", "dt").where(p).collect()
          .map(r => (r.get(0), r.get(1), r.get(2))).toSet
      }
      assert(got == want, s"row mismatch for: $p")
      assert(got.nonEmpty, s"fixture bug — no rows matched: $p")
    }

    // the 1995 files prove none-match and skip; the year-10000 files
    // cannot prove either way and are kept
    val n = filesRead(
      spark.sql("SELECT id FROM dp_y10k WHERE date_format(ts, 'yyyy-MM-dd') >= '9999-01-01'"))
    assert(n > 0L && n < total, s"want partial pruning, read $n of $total files")
  }

  test("calendar image proofs prune when file spans stay within the bucket grain") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("derived-calimg")
    // four QUARTER-aligned ingests of 1995: each file's ts span stays
    // inside one quarter, so a month/quarter predicate decides files
    (0 until 4).foreach { q =>
      val start = LocalDate.of(1995, q * 3 + 1, 1).toEpochDay
      val end = LocalDate.of(1995, q * 3 + 3, 1).plusMonths(1).toEpochDay
      (start until end).map { day =>
        (day, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400L)))
      }.toDF("id", "ts")
        .write.format("qbeast").mode("append")
        .option("columnsToIndex", "id").option("cubeSize", "50").save(dir)
    }
    val back = spark.read.format("qbeast").load(dir)
    val total = filesRead(back.select("id"))
    assert(total >= 4, s"need one file per quarter at least, got $total")
    back.createOrReplaceTempView("derived_calimg")
    Seq(
      "month(ts) = 7" -> 31L,
      "quarter(ts) = 2" -> 91L,
      "month(ts) IN (1, 2)" -> 59L,
      "month(ts) >= 11" -> 61L).foreach { case (p, want) =>
      val got = spark.sql(s"SELECT count(*) FROM derived_calimg WHERE $p").head().getLong(0)
      assert(got == want, s"$p: got $got want $want")
      val n = filesRead(spark.sql(s"SELECT id FROM derived_calimg WHERE $p"))
      assert(n < total, s"no files skipped for: $p ($n of $total)")
    }
  }

  test("unix_timestamp buckets honor truncating division around the epoch") {
    import spark.implicits._
    // Spark's unix_timestamp truncates toward ZERO (probed:
    // unix_timestamp('1969-12-31 23:59:59.5') = 0, not -1), so the
    // second-0 bucket is [-0.999999s, +0.999999s] and every sec <= 0
    // bucket starts early — a floorDiv anchor would silently DROP
    // pre-epoch rows from scans, metadata counts and DML
    val dir = TestSpark.tmpDir("derived-unix-epoch")
    // sub-second timestamps straddling the epoch: micros at 0.1s steps
    // over [-3s, +3s]
    val rows = (-30 to 30).map(t => (t.toLong, new java.sql.Timestamp(t * 100L)))
    rows.toDF("id", "ts").write.format("qbeast")
      .option("columnsToIndex", "id").option("cubeSize", "20").save(dir)
    val back = spark.read.format("qbeast").load(dir)
    back.createOrReplaceTempView("dp_unix_epoch")
    val localRows = rows.toDF("id", "ts")
    Seq(
      "unix_timestamp(ts) = 0",
      "unix_timestamp(ts) = -1",
      "unix_timestamp(ts) = 1",
      "unix_timestamp(ts) = -2",
      "unix_timestamp(ts) >= 0",
      "unix_timestamp(ts) < 0",
      "unix_timestamp(ts) <= -1",
      "unix_timestamp(ts) > -2",
      "unix_timestamp(ts) != 0").foreach { p =>
      val got = spark.sql(s"SELECT id FROM dp_unix_epoch WHERE $p")
        .collect().map(_.getLong(0)).toSet
      val want = localRows.where(p).collect().map(_.getLong(0)).toSet
      assert(got == want, s"row mismatch for: $p (got ${got.toSeq.sorted}, " +
        s"want ${want.toSeq.sorted})")
    }
    // the truncating bucket is observable: second 0 spans 19 of the
    // 0.1s steps (-0.9s .. +0.9s inclusive)
    assert(spark.sql(
      "SELECT count(*) FROM dp_unix_epoch WHERE unix_timestamp(ts) = 0")
      .head().getLong(0) == 19L)
  }

  test("non-UTC session zone: boundaries follow the zone, DST included") {
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "America/New_York")
    try {
      import spark.implicits._
      val dir = TestSpark.tmpDir("derived-tz")
      // instants straddling local midnights, the 1995 DST transitions
      // (Apr 2 spring-forward, Oct 29 fall-back), and the local year edge
      val instants = Seq(
        "1994-12-31T23:30:00Z", "1995-01-01T04:59:59Z", "1995-01-01T05:00:00Z",
        "1995-04-02T06:30:00Z", "1995-04-02T08:00:00Z",
        "1995-10-29T05:30:00Z", "1995-10-29T06:30:00Z", "1995-10-29T07:30:00Z",
        "1995-07-01T03:59:59Z", "1995-07-01T04:00:00Z",
        "1996-01-01T04:59:59Z", "1996-01-01T05:00:00Z")
      val rows = instants.zipWithIndex.map { case (s, i) =>
        (i.toLong, java.sql.Timestamp.from(java.time.Instant.parse(s)))
      }
      val local = rows.toDF("id", "ts")
      local.write.format("qbeast")
        .option("columnsToIndex", "id").option("cubeSize", "100").save(dir)
      val back = spark.read.format("qbeast").load(dir)
      val preds = Seq(
        "year(ts) = 1995",
        "cast(ts as date) = date'1995-04-02'",
        "cast(ts as date) = date'1995-10-29'",
        "cast(ts as date) < date'1995-01-01'",
        "date_trunc('day', ts) = timestamp'1995-10-29 00:00:00'",
        "date_trunc('month', ts) = timestamp'1995-07-01 00:00:00'",
        "date_trunc('year', ts) = timestamp'1995-01-01 00:00:00'")
      preds.foreach { p =>
        val got = back.where(p).select("id").collect().map(_.getLong(0)).toSet
        val want = local.where(p).select("id").collect().map(_.getLong(0)).toSet
        assert(got == want, s"zone mismatch for: $p")
      }
    } finally spark.conf.set(tzKey, prev)
  }

  /** True iff the executed plan is a pure local scan — no file source
   * (same discipline as MetadataCountSpec). */
  private def isMetadataOnly(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    var local = false
    var scan = false
    plan.foreach {
      case _: org.apache.spark.sql.execution.LocalTableScanExec => local = true
      case f if f.nodeName.contains("Scan") && !f.nodeName.contains("LocalTableScan") =>
        scan = true
      case _ =>
    }
    local && !scan
  }

  private def jobsLaunchedBy(body: => Unit): Int = {
    val group = s"derived-del-${java.util.UUID.randomUUID()}"
    spark.sparkContext.setJobGroup(group, "derived predicates spec")
    try body finally spark.sparkContext.clearJobGroup()
    spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
  }

  test("metadata-only count(*) and stats DELETE see through year()") {
    val dir = TestSpark.tmpDir("derived-meta")
    // null-free + one append per year: every file proves year(ts)=Y
    // wholly true or wholly false
    writeYears(dir, Seq(1994, 1995), nulls = false)
    spark.read.format("qbeast").load(dir).createOrReplaceTempView("dp_meta")

    val cnt = spark.sql("SELECT count(*) AS n FROM dp_meta WHERE year(ts) = 1995")
    val expected = 365L * 8 // hourly-by-3 rows of a non-leap year
    assert(cnt.collect().head.getLong(0) == expected)
    assert(isMetadataOnly(cnt), cnt.queryExecution.executedPlan.toString)

    // retention DELETE through year(): whole files drop with no Spark job
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val before = t.snapshot.files.map(_.path).toSet
    var deleted = -1L
    val jobs = jobsLaunchedBy { deleted = t.delete("year(ts) < 1995") }
    assert(deleted == 365L * 8)
    assert(jobs == 0, s"derived-range DELETE must be metadata-only, saw $jobs jobs")
    val after = t.snapshot.files.map(_.path).toSet
    assert(after.subsetOf(before) && after.size < before.size)
    assert(spark.read.format("qbeast").load(dir).where("year(ts) < 1995").count() == 0L)
  }
}
