package graft

import graft.table.QbeastTable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types.{DataType, DateType, DoubleType, IntegerType, LongType, StringType, StructType, TimestampNTZType}
import org.scalatest.funsuite.AnyFunSuite

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import scala.util.Random

/**
 * Randomized differential fuzz harness. Both real bugs of the last two
 * rounds (the subquery-DELETE mass delete, the shuffled-join
 * `input_file_name()` no-op) lived in predicate/plan shapes nobody had
 * declared in a spec — this suite mechanizes shape coverage instead of
 * hand-enumerating it.
 *
 * Two generators, both seeded and reproducible (the assert message of
 * any failure carries the case seed and the generated SQL — rerun with
 * GRAFT_FUZZ_SEED to pin, then freeze the shrunk case as a regression):
 *
 *  1. PREDICATE fuzz: random predicate trees (comparisons over every
 *     column type incl. NaN/-0.0/unicode/non-BMP, IN / NOT IN with and
 *     without NULLs, IS [NOT] NULL, the whole derived-date family —
 *     year/month/quarter/dayofmonth/dayofweek/cast/trunc/date_trunc/
 *     date_format/unix_timestamp — LIKE, unpushable arithmetic, and
 *     And/Or/Not/coalesce(...,false) combinators) evaluated on the
 *     indexed+stats-pruned qbeast table vs the same rows as a
 *     LocalRelation, where no pruning/index/stats code can run. Row
 *     sets AND count(*) results must agree — the count goes through
 *     the metadata filtered-fold rewrite, so its proof/bail logic is
 *     fuzzed against ground truth too.
 *
 *  2. DML+schema fuzz: random delete/update/append/upsert/restore/
 *     optimize/optimizeWhere/vacuum sequences (copy-on-write AND
 *     deletion-vector tables, with and without persisted change files)
 *     with predicates drawn from the same generator plus
 *     IN-subqueries, interleaved with SCHEMA EVOLUTION ops —
 *     mergeSchema widening appends, metadata-only ADD COLUMNS
 *     commits, overwriteSchema replacement, and dead names re-added
 *     at a different type — checked after every op against a
 *     driver-side LocalRelation model advanced through plain Spark
 *     SQL (the reference semantics with no qbeast code). Sequence-end
 *     invariants: versionAsOf reads across the whole history (incl.
 *     schema replacements), CDF multiset reconstruction from the last
 *     replacement, and an AvailableNow streaming drain that must
 *     equal the batch feed (or stop with the pinned schema-change
 *     error when the history widened).
 *
 * Case budget: 700 predicate cases (x2 checks each) + 32 sequences x
 * 10 ops = 1020 seeded cases per `sbt test` run, tunable via
 * GRAFT_FUZZ_CASES / GRAFT_FUZZ_SEED for deeper local soaks.
 */
class FuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val masterSeed: Long =
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260815L)
  private val predCases: Int =
    sys.env.get("GRAFT_FUZZ_CASES").map(_.toInt).getOrElse(700)
  private val dmlSeqs: Int =
    sys.env.get("GRAFT_FUZZ_DML_SEQS").map(_.toInt).getOrElse(32)
  private val dmlOps = 10

  // ---- shared literal/predicate generator -----------------------------------

  private def tsString(epochSec: Long): String =
    LocalDateTime.ofEpochSecond(epochSec, 0, ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Random predicate trees over the fuzz fixture's columns. `cols`
   * restricts the vocabulary (the DML fixture has fewer columns). */
  private final class Gen(r: Random, dmlMode: Boolean) {

    private def cmp(): String =
      Seq("=", "<", "<=", ">", ">=", "!=", "<=>")(r.nextInt(7))

    private def lit(col: String): String = col match {
      case "k" => (r.nextInt(3400) - 50).toString
      case "iv" => (r.nextInt(110) - 5).toString
      case "v" => r.nextInt(8) match {
        case 0 => "cast('NaN' as double)"
        case 1 => "0.0"
        case 2 => "-0.0"
        case _ => f"${r.nextDouble() * 4500 - 2200}%.3f"
      }
      case "s" => r.nextInt(6) match {
        case 0 => "'héllo-→3'"
        case 1 => "'𝒵2'"
        case 2 => "''"
        case 3 => "'zzz'"
        case _ => f"'w${r.nextInt(330)}%04d'"
      }
      case "d" =>
        s"date'${LocalDate.of(1991 + r.nextInt(17), 1 + r.nextInt(12), 1 + r.nextInt(28))}'"
      case "ts" =>
        s"timestamp'${tsString(-60000000L + (math.abs(r.nextLong()) % 1160000000L))}'"
    }

    private val cols =
      if (dmlMode) Seq("k", "v", "s", "d") else Seq("k", "iv", "v", "s", "d", "ts")
    private def col(): String = cols(r.nextInt(cols.length))
    private def dateCol(): String =
      if (dmlMode) "d" else if (r.nextBoolean()) "d" else "ts"

    def leaf(): String = r.nextInt(18) match {
      case 0 | 1 | 2 | 3 =>
        val c = col()
        s"$c ${cmp()} ${lit(c)}"
      case 4 =>
        val c = col()
        val n = 1 + r.nextInt(4)
        val items = Seq.fill(n)(lit(c)) ++ (if (r.nextInt(10) == 0) Seq("NULL") else Nil)
        s"$c IN (${items.mkString(", ")})"
      case 5 =>
        val c = col()
        val items = Seq.fill(1 + r.nextInt(3))(lit(c)) ++
          (if (r.nextInt(6) == 0) Seq("NULL") else Nil)
        s"$c NOT IN (${items.mkString(", ")})"
      case 6 =>
        s"${col()} IS ${if (r.nextBoolean()) "" else "NOT "}NULL"
      case 7 =>
        s"year(${dateCol()}) ${cmp()} ${1989 + r.nextInt(21)}"
      case 8 =>
        val (f, hi) = Seq(("month", 13), ("quarter", 5), ("dayofmonth", 32),
          ("dayofweek", 8), ("weekday", 7))(r.nextInt(5))
        s"$f(${dateCol()}) ${cmp()} ${r.nextInt(hi + 1)}"
      case 9 if !dmlMode =>
        s"cast(ts as date) ${cmp()} ${lit("d")}"
      case 10 if !dmlMode =>
        val u = Seq("year", "quarter", "month", "week", "day")(r.nextInt(5))
        s"date_trunc('$u', ts) ${cmp()} ${lit("ts")}"
      case 11 =>
        val u = Seq("year", "quarter", "mm", "week")(r.nextInt(4))
        s"trunc(d, '$u') ${cmp()} ${lit("d")}"
      case 12 =>
        val (fmt, str) = r.nextInt(3) match {
          case 0 => ("yyyy-MM-dd",
            s"${1990 + r.nextInt(19)}-${"%02d".format(1 + r.nextInt(12))}-${"%02d".format(1 + r.nextInt(28))}")
          case 1 => ("yyyy-MM", s"${1990 + r.nextInt(19)}-${"%02d".format(1 + r.nextInt(12))}")
          case _ => ("yyyy", s"${1990 + r.nextInt(19)}")
        }
        s"date_format(${dateCol()}, '$fmt') ${cmp()} '$str'"
      case 13 if !dmlMode =>
        s"unix_timestamp(ts) ${cmp()} ${-60000000L + (math.abs(r.nextLong()) % 1160000000L)}"
      case 14 =>
        val pat = r.nextInt(3) match {
          case 0 => s"w0${r.nextInt(10)}%"
          case 1 => s"%${r.nextInt(10)}"
          case _ => s"%l%"
        }
        s"s LIKE '$pat'"
      case 15 =>
        s"substring(s, 1, 2) = '${if (r.nextBoolean()) "w0" else "hé"}'"
      case 16 =>
        s"k % ${2 + r.nextInt(7)} = ${r.nextInt(3)}"
      case _ =>
        val c = col()
        s"$c ${cmp()} ${lit(c)}"
    }

    def gen(depth: Int): String =
      if (depth <= 0) leaf()
      else r.nextInt(12) match {
        case 0 | 1 | 2 => s"(${gen(depth - 1)}) AND (${gen(depth - 1)})"
        case 3 | 4 | 5 => s"(${gen(depth - 1)}) OR (${gen(depth - 1)})"
        case 6 => s"NOT (${gen(depth - 1)})"
        case 7 => s"coalesce((${gen(depth - 1)}), false)"
        case _ => leaf()
      }
  }

  // ---- predicate fuzz --------------------------------------------------------

  private def predFixture(): (DataFrame, String) = {
    import spark.implicits._
    val rows = (1 to 3000).map { i =>
      val k = i.toLong
      val iv = i % 97
      val v: java.lang.Double =
        if (i % 89 == 0) null
        else if (i % 211 == 0) java.lang.Double.valueOf(Double.NaN)
        else if (i % 210 == 0) java.lang.Double.valueOf(-0.0)
        else java.lang.Double.valueOf(i * 1.37 - 2000.0)
      val s: String =
        if (i % 83 == 0) null
        else if (i % 50 == 0) s"héllo-→${i % 7}"
        else if (i % 51 == 0) s"𝒵${i % 5}"
        else f"w${i % 300}%04d"
      val d: java.sql.Date =
        if (i % 79 == 0) null
        else java.sql.Date.valueOf(LocalDate.of(1992, 1, 1).plusDays((i * 5) % 5113))
      val ts: java.sql.Timestamp =
        if (i % 73 == 0) null
        else java.sql.Timestamp.from(Instant.ofEpochSecond(-60000000L + i.toLong * 347777L))
      (k, iv, v, s, d, ts)
    }
    val df = rows.toDF("k", "iv", "v", "s", "d", "ts")
    val dir = TestSpark.tmpDir("fuzz-pred")
    df.write.format("qbeast")
      .option("columnsToIndex", "k,iv")
      .option("cubeSize", "150")
      .option("bloomFilterColumns", "s")
      .save(dir)
    (df, dir)
  }

  test(s"predicate fuzz: $predCases seeded shapes match an unindexed LocalRelation") {
    val (truthDf, dir) = predFixture()
    truthDf.createOrReplaceTempView("fuzz_t")
    spark.read.format("qbeast").load(dir).createOrReplaceTempView("fuzz_q")

    // fixture parity before fuzzing (a broken write would fail every case)
    assert(spark.table("fuzz_q").count() == 3000L)

    var i = 0
    while (i < predCases) {
      val seed = masterSeed + i
      val p = new Gen(new Random(seed), dmlMode = false).gen(2)
      val clue = s"[seed=$seed] WHERE $p"
      val want = spark.sql(s"SELECT k FROM fuzz_t WHERE $p")
        .collect().map(_.getLong(0)).sorted.toSeq
      val got = spark.sql(s"SELECT k FROM fuzz_q WHERE $p")
        .collect().map(_.getLong(0)).sorted.toSeq
      if (got != want) {
        val missing = want.diff(got).take(5)
        val extra = got.diff(want).take(5)
        fail(s"$clue: ${got.size} rows vs ${want.size} expected; " +
          s"missing=$missing extra=$extra")
      }
      // count(*)/min/max go through the metadata filtered-fold rewrite —
      // its tri-state proofs and bail logic must agree with ground truth
      // on every aggregate shape it can answer
      val gotAgg = spark.sql(
        s"SELECT count(*) AS c, min(k) AS mn, max(k) AS mx FROM fuzz_q WHERE $p").head()
      assert(gotAgg.getLong(0) == want.size.toLong,
        s"$clue: count ${gotAgg.getLong(0)} vs ${want.size}")
      val wantMin = if (want.isEmpty) null else java.lang.Long.valueOf(want.head)
      val wantMax = if (want.isEmpty) null else java.lang.Long.valueOf(want.last)
      assert(Option(gotAgg.get(1)).orNull == wantMin &&
        Option(gotAgg.get(2)).orNull == wantMax,
        s"$clue: min/max ${gotAgg.get(1)}/${gotAgg.get(2)} vs $wantMin/$wantMax")
      i += 1
    }
  }

  // ---- DML sequence fuzz -----------------------------------------------------

  /** Canonical multiset of a frame's rows — columns SORTED BY NAME so
   * frames whose schemas agree as sets (but not in order) compare
   * equal; schema evolution grows the column set mid-sequence. */
  private def canon(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(col).toSeq: _*).collect().map(_.toSeq.map {
      case null => "∅"
      case x => x.toString
    }.mkString("|")).sorted.toSeq

  /** Project `df` onto `to`: shared columns pass through, missing ones
   * become typed nulls, extra ones drop — the projection the change
   * feed applies when replaying commits under a schema that widened
   * (or narrowed, via restore) after them. */
  private def conform(df: DataFrame, to: StructType): DataFrame =
    df.select(to.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)

  /** Re-materialize as a LocalRelation so the model never reads files. */
  private def localize(df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    spark.createDataFrame(rows, df.schema)
  }

  private def freshRows(from: Long, n: Int, r: Random): Seq[(Long, java.lang.Double, String, java.sql.Date)] =
    (0 until n).map { j =>
      val k = from + j
      val v: java.lang.Double =
        if (r.nextInt(10) == 0) null else java.lang.Double.valueOf(r.nextInt(4000) - 2000 + 0.25)
      val s: String = if (r.nextInt(12) == 0) null else f"w${r.nextInt(330)}%04d"
      val d: java.sql.Date = if (r.nextInt(12) == 0) null
        else java.sql.Date.valueOf(LocalDate.of(1992 + r.nextInt(12), 1 + r.nextInt(12), 1 + r.nextInt(28)))
      (k, v, s, d)
    }

  test(s"DML+schema fuzz: $dmlSeqs seeded sequences x $dmlOps ops match a LocalRelation model") {
    import spark.implicits._
    val assigns = Seq(
      Map("v" -> "v + 10.5"),
      Map("v" -> "v * 2"),
      Map("s" -> "concat(coalesce(s, 'n'), '!')"),
      Map("d" -> "date_add(d, 30)"),
      Map("v" -> "-v", "s" -> "upper(s)"))
    val baseCols = Set("k", "v", "s", "d")

    for (seq <- 0 until dmlSeqs) {
      val seed = masterSeed * 31 + seq
      val r = new Random(seed)
      val dv = seq % 2 == 1
      // every 4th sequence persists change files (enableChangeDataFeed):
      // its DML replays through the 'c' units / cdc branch instead of
      // the file re-diff, under the same model invariants
      val cdf = seq % 4 == 2
      // every 4th sequence stays schema-stable: its end-of-sequence
      // streaming drain must SUCCEED and match batch changes() row for
      // row (schema-changing histories pin the restart-the-stream
      // error instead — Delta parity)
      val allowSchema = seq % 4 != 3
      // every 8th (two residues: one schema-fuzzing+cdf, one dv+stable)
      // sequence carries a GENERATED column gc := CAST(k % 9 AS INT):
      // appends/upserts compute it, DML recomputes it, renames/widens
      // of the referenced k are refused (tolerated below), drops and
      // overwrites kill the definition, RESTORE resurrects it
      val gen = seq % 8 == 6 || seq % 8 == 3
      val genSql = "CAST(k % 9 AS INT)"
      val dir = TestSpark.tmpDir(s"fuzz-dml-$seq")
      val init = freshRows(1L, 160, r)
      val w0 = init.toDF("k", "v", "s", "d").write.format("qbeast")
        .option("columnsToIndex", "k").option("cubeSize", "40")
      val w1 = if (dv) w0.option("deletionVectors", "true") else w0
      val w2 = if (cdf) w1.option("enableChangeDataFeed", "true") else w1
      (if (gen) w2.option("generatedColumns", s"gc:$genSql") else w2).save(dir)
      var model = localize(
        if (gen) init.toDF("k", "v", "s", "d").withColumn("gc", expr(genSql))
        else init.toDF("k", "v", "s", "d"))
      var nextKey = 161L
      var nextCol = 1
      var schemaOps = 0
      // set by the WIDEN TYPE op: a later RESTORE can roll the schema
      // back PAST the widen, after which a changes() range crossing the
      // wide era must fail with the engine's NAMED type-regression
      // refusal (wide-era files cannot read under the narrowed end
      // schema) — the sequence-end checks tolerate exactly that message
      var didWidenType = false
      // set when a zero-retention VACUUM ran (only on seq % 8 == 5
      // sequences): replays reaching behind the reclaim may fail, but
      // only with the reclaim named (or Spark's file-not-found for the
      // probe-free time-travel scan) — never with wrong rows
      var lastVacuum: Option[Long] = None
      // overwriteSchema-released names become reusable at a DIFFERENT
      // type — the stale-stats screen must never consult the dead files
      val droppedCols = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
      val t = QbeastTable.forPath(spark, dir)
      val v0 = t.snapshot.version
      // (version, expected content, model frame) after every commit —
      // drawn from by the RESTORE op. CLEARED at overwriteSchema so
      // restores and the CDF reconstruction never cross a schema
      // REPLACEMENT (changes() reads every commit's files under the
      // head schema, and a replaced column type would clash); widening
      // commits stay fully inside both invariants. `fullHistory` keeps
      // every version for versionAsOf, which DOES cross replacements
      // (each snapshot reads under its own schema).
      // per entry: (version, canon, model, curName snapshot, anchor
      // content under that version's logical names) — the last two
      // restore with the schema on RESTORE ops
      val history = scala.collection.mutable
        .ArrayBuffer.empty[(Long, Seq[String], DataFrame, Map[String, String], DataFrame)]
      val fullHistory = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
      // base logical name -> CURRENT logical name (tracks RENAME COLUMN;
      // generated predicates/assignments translate through it)
      var curName: Map[String, String] = Map("k" -> "k", "v" -> "v", "s" -> "s", "d" -> "d")
      // the anchor's content expressed under the CURRENT head names —
      // renames re-label it, drops remove, restores roll it back
      var anchorHead: DataFrame = model
      history += ((v0, canon(model), model, curName, anchorHead))
      fullHistory += ((v0, canon(model)))
      var anchor: (Long, DataFrame) = (v0, model)
      // translate base column tokens in generated SQL to current names
      def tr(sql: String): String =
        if (curName.forall { case (b, c) => b == c }) sql
        else "\\b(k|v|s|d)\\b".r.replaceAllIn(sql, m => curName(m.group(1)))

      // one sink + checkpoint per sequence: the mid-sequence drain (on
      // schema-stable sequences) and the final drain share them, so the
      // final drain RESUMES from the recorded offsets
      val outDir = TestSpark.tmpDir(s"fuzz-stream-out-$seq")
      val ckpt = TestSpark.tmpDir(s"fuzz-stream-ckpt-$seq")
      def drainFeed(): Unit = {
        val q = spark.readStream.format("qbeast")
          .option("readChangeFeed", "true").option("startingVersion", v0.toString)
          .load(dir)
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", outDir)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
      }

      def dmlPred(): String = {
        // 1-in-4: an IN-subquery over a freshly registered keys view —
        // the shape class both recent real bugs lived in
        if (r.nextInt(4) == 0) {
          val keys = Seq.fill(1 + r.nextInt(12))((math.abs(r.nextLong()) % (nextKey + 20)))
          keys.toDF("id").createOrReplaceTempView("fuzz_dml_keys")
          s"${curName("k")} IN (SELECT id FROM fuzz_dml_keys)"
        } else tr(new Gen(r, dmlMode = true).gen(1 + r.nextInt(2)))
      }
      def randType(): DataType =
        Seq[DataType](DoubleType, IntegerType, StringType)(r.nextInt(3))
      def widenValue(dt: DataType): org.apache.spark.sql.Column = dt match {
        case IntegerType => (col(curName("k")) % 7).cast(IntegerType)
        case DoubleType => col(curName("k")) * 0.5
        case _ => org.apache.spark.sql.functions.concat(lit("z"), col(curName("k")))
      }
      def curNames: Seq[String] = Seq("k", "v", "s", "d").map(curName)
      // compute the LIVE generated columns on a frame about to be
      // written (conform null-fills them, which enforcement would
      // reject); defs are read per op — drops/overwrites kill them,
      // RESTORE resurrects them, renames re-key them
      def genComputed(df: DataFrame): DataFrame =
        if (!gen) df
        else t.generatedColumns.foldLeft(df) { case (acc, (n, sql)) =>
          if (acc.columns.contains(n))
            acc.withColumn(n, expr(sql).cast(acc.schema(n).dataType))
          else acc
        }

      for (op <- 0 until dmlOps) {
        val what0 = r.nextInt(24)
        val what = if (!allowSchema && what0 >= 16) what0 % 8 else what0
        val desc: String = what match {
          case 0 | 1 | 2 | 3 =>
            val p = dmlPred()
            t.delete(p)
            model = localize(model.where(s"NOT coalesce(($p), false)"))
            s"DELETE WHERE $p"
          case 4 | 5 | 6 =>
            val p = dmlPred()
            val a = assigns(r.nextInt(assigns.length))
              .map { case (c, e) => (curName.getOrElse(c, c), tr(e)) }
            t.update(p, a)
            val sel = model.columns.toSeq.map { c =>
              a.get(c) match {
                case Some(e) => s"IF(coalesce(($p), false), $e, $c) AS $c"
                case None => c
              }
            }
            model = localize(model.selectExpr(sel: _*))
            s"UPDATE ${a.keys.mkString(",")} WHERE $p"
          case 7 | 8 =>
            // appends carry the FULL current schema (widened columns as
            // nulls) — exact-schema appends need no mergeSchema option
            val batch = freshRows(nextKey, 10 + r.nextInt(20), r)
            nextKey += batch.size
            val bdf = genComputed(conform(batch.toDF(curNames: _*), model.schema))
            bdf.write.format("qbeast").mode("append").save(dir)
            model = localize(model.unionByName(bdf))
            s"APPEND ${batch.size}"
          case 9 | 10 =>
            // keys may hit existing rows, deleted rows, or be brand new
            val src = freshRows(1, 0, r) ++ (0 until (5 + r.nextInt(10))).map { _ =>
              val k = 1L + (math.abs(r.nextLong()) % (nextKey + 10))
              freshRows(k, 1, r).head
            }
            val srcDf = genComputed(conform(
              src.toDF(curNames: _*).dropDuplicates(curName("k")), model.schema))
            if (model.isEmpty) {
              // upsert into an emptied table is a pinned refusal (use a
              // plain write); the model must stay unchanged
              val e = intercept[IllegalArgumentException] {
                t.upsert(srcDf, Seq(curName("k")))
              }
              assert(e.getMessage.contains("empty table"))
              s"UPSERT-REFUSED ${src.size}"
            } else {
              t.upsert(srcDf, Seq(curName("k")))
              model = localize(
                model.join(srcDf.select(curName("k")), Seq(curName("k")), "left_anti")
                  .unionByName(srcDf))
              s"UPSERT ${src.size}"
            }
          case 11 | 12 if history.size > 1 =>
            // restore to a random recorded version: the model rolls
            // back with it (restore is itself one more commit) — and
            // the schema narrows back with it across widening commits.
            // After a zero-retention vacuum the resurrect files may be
            // gone: the refusal must NAME the reclaim and commit
            // NOTHING (the model stays put and the next check proves it)
            val (rv, _, rm, rCur, rAnchor) = history(r.nextInt(history.size))
            try {
              t.restoreToVersion(rv)
              model = rm
              curName = rCur
              anchorHead = rAnchor
              s"RESTORE to v$rv"
            } catch {
              case e: IllegalArgumentException
                if lastVacuum.isDefined && e.getMessage.contains("vacuum") =>
                s"RESTORE-REFUSED v$rv (vacuumed)"
            }
          case 16 | 17 =>
            // widen via mergeSchema append: a fresh column, or (when an
            // overwrite released one) a DEAD name re-added at a
            // DIFFERENT type — legal exactly because no live file
            // carries the old type
            // a RESTORE may have resurrected a released name — only
            // names absent from the CURRENT schema are re-addable
            val reAddable = droppedCols.filterNot { case (n, _) =>
              model.columns.exists(_.equalsIgnoreCase(n)) }
            val (cname, dt) =
              if (reAddable.nonEmpty && r.nextBoolean()) {
                val (n, oldDt) = reAddable.head
                droppedCols.remove(n)
                val nt = Seq[DataType](DoubleType, IntegerType, StringType)
                  .filterNot(_ == oldDt)(r.nextInt(2))
                (n, nt)
              } else { val n = s"x$nextCol"; nextCol += 1; (n, randType()) }
            val batch = freshRows(nextKey, 8 + r.nextInt(12), r)
            nextKey += batch.size
            val bdf = genComputed(conform(batch.toDF(curNames: _*), model.schema))
              .withColumn(cname, widenValue(dt))
            bdf.write.format("qbeast").option("mergeSchema", "true")
              .mode("append").save(dir)
            model = localize(
              model.withColumn(cname, lit(null).cast(dt)).unionByName(bdf))
            schemaOps += 1
            s"WIDEN $cname:${dt.simpleString} +${batch.size}"
          case 18 =>
            // metadata-only ADD COLUMNS (the ALTER TABLE commit shape):
            // no file is written; every existing row reads null
            val n = s"x$nextCol"; nextCol += 1
            val dt = randType()
            val tc = org.apache.spark.sql.connector.catalog.TableChange.addColumn(Array(n), dt)
            graft.catalog.QbeastCatalog.persistAddColumnsToLog(dir,
              Seq(tc.asInstanceOf[org.apache.spark.sql.connector.catalog.TableChange.AddColumn]))
            model = localize(model.withColumn(n, lit(null).cast(dt)))
            schemaOps += 1
            s"ADD COLUMNS $n:${dt.simpleString}"
          case 19 =>
            // overwriteSchema replacement: back to the base columns,
            // releasing every widened name for a later retyped re-add
            model.schema.fields.filterNot(f => baseCols.contains(f.name))
              .foreach(f => droppedCols(f.name) = f.dataType)
            val batch = freshRows(nextKey, 30 + r.nextInt(30), r)
            nextKey += batch.size
            // renamed base columns are also released back to base names
            // (overwriteSchema resets the column mapping to identity)
            curName.values.filterNot(baseCols.contains)
              .foreach(n => droppedCols(n) = model.schema(n).dataType)
            val w2 = batch.toDF("k", "v", "s", "d").write.format("qbeast")
              .option("columnsToIndex", "k").option("cubeSize", "40")
              .option("overwriteSchema", "true").mode("overwrite")
            val w3 = if (dv) w2.option("deletionVectors", "true") else w2
            (if (cdf) w3.option("enableChangeDataFeed", "true") else w3).save(dir)
            model = localize(batch.toDF("k", "v", "s", "d"))
            curName = Map("k" -> "k", "v" -> "v", "s" -> "s", "d" -> "d")
            history.clear()
            schemaOps += 1
            s"OVERWRITE ${batch.size} (schema reset)"
          case 20 | 21 =>
            // RENAME COLUMN (column mapping): metadata-only; the
            // physical name — and every file, stat, sketch and
            // revision transformer keyed by it — stays put. A column a
            // LIVE generation expression references refuses the rename
            // (the engine's guard) — the model stays put with it.
            val cols0 = model.columns.toSeq
            val c = cols0(r.nextInt(cols0.length))
            val nn = s"rn$nextCol"; nextCol += 1
            try {
              t.renameColumn(c, nn)
              model = localize(model.withColumnRenamed(c, nn))
              anchorHead = anchorHead.withColumnRenamed(c, nn)
              curName = curName.map { case (b, cur) => (b, if (cur == c) nn else cur) }
              schemaOps += 1
              s"RENAME $c -> $nn"
            } catch {
              case e: UnsupportedOperationException
                if gen && e.getMessage.contains("generated column") =>
                s"RENAME-REFUSED $c (generated-column reference)"
            }
          case 22 =>
            // DROP a widened/re-added column (never a base one — the
            // predicate generator keeps referencing those); the name is
            // then re-addable at ANY type (fresh physical mint)
            val widened = model.columns.filterNot(curName.values.toSet.contains).toSeq
            if (widened.isEmpty) { t.optimize(); "OPTIMIZE (nothing to drop)" }
            else {
              val c = widened(r.nextInt(widened.length))
              t.dropColumn(c)
              droppedCols(c) = model.schema(c).dataType
              model = localize(model.drop(c))
              anchorHead = anchorHead.drop(c)
              schemaOps += 1
              s"DROP COLUMN $c"
            }
          case 23 =>
            // rename-then-re-add the RELEASED logical name: the re-add
            // mints a fresh physical name, so every pre-existing row
            // must read NULL under it — resurrected data fails the
            // very next content check
            val cols0 = model.columns.toSeq
            val c = cols0(r.nextInt(cols0.length))
            val nn = s"rn$nextCol"; nextCol += 1
            try {
              t.renameColumn(c, nn)
              model = localize(model.withColumnRenamed(c, nn))
              anchorHead = anchorHead.withColumnRenamed(c, nn)
              curName = curName.map { case (b, cur) => (b, if (cur == c) nn else cur) }
              val dt = randType()
              val tc = org.apache.spark.sql.connector.catalog.TableChange.addColumn(Array(c), dt)
              graft.catalog.QbeastCatalog.persistAddColumnsToLog(dir,
                Seq(tc.asInstanceOf[org.apache.spark.sql.connector.catalog.TableChange.AddColumn]))
              model = localize(model.withColumn(c, lit(null).cast(dt)))
              schemaOps += 2
              s"RENAME $c -> $nn + RE-ADD $c:${dt.simpleString}"
            } catch {
              case e: UnsupportedOperationException
                if gen && e.getMessage.contains("generated column") =>
                s"RENAME-REFUSED $c (generated-column reference)"
            }
          case 13 =>
            // WHERE-scoped optimize: rewrites only matching files;
            // content is invariant like plain optimize
            val p = tr(new Gen(r, dmlMode = true).gen(1))
            try { t.optimizeWhere(org.apache.spark.sql.functions.expr(p)); () }
            catch { case _: IllegalArgumentException => t.optimize() }
            s"OPTIMIZE WHERE $p"
          case 14 if allowSchema =>
            // ALTER COLUMN TYPE (type widening): metadata-only; old
            // files keep narrow footers, the scan upcasts per batch.
            // Candidates: INT x-columns (→ LONG or DOUBLE) and the
            // date column (→ TIMESTAMP_NTZ — the unit-changing move
            // that exercises the stats/bloom/sketch era gates).
            // Subsequent appends/upserts conform to the widened model
            // schema, predicates keep their literals (Spark coerces),
            // and RESTORE rolls the narrow schema back from history.
            // a LIVE generated column (or a column its expression
            // references) refuses the widen — exclude those candidates
            val genOff: Set[String] =
              if (!gen) Set.empty
              else t.generatedColumns.keys.map(_.toLowerCase).toSet + "k"
            val intCols = model.schema.fields
              .filter(_.dataType == IntegerType).map(_.name)
              .filterNot(n => genOff.contains(n.toLowerCase) &&
                t.generatedColumns.nonEmpty).toSeq
            val dateCol = curName("d")
            val dIsDate = model.schema(dateCol).dataType == DateType
            if (intCols.isEmpty && !dIsDate) {
              t.optimize(); "OPTIMIZE (nothing to widen)"
            } else if (intCols.nonEmpty && (!dIsDate || r.nextBoolean())) {
              val c = intCols(r.nextInt(intCols.length))
              val to: DataType = if (r.nextBoolean()) LongType else DoubleType
              t.widenColumn(c, to)
              model = localize(model.withColumn(c, col(c).cast(to)))
              // the anchor snapshot may predate the column entirely
              if (anchorHead.columns.contains(c))
                anchorHead = anchorHead.withColumn(c, col(c).cast(to))
              schemaOps += 1
              didWidenType = true
              s"WIDEN TYPE $c -> ${to.simpleString}"
            } else {
              t.widenColumn(dateCol, TimestampNTZType)
              model = localize(
                model.withColumn(dateCol, col(dateCol).cast(TimestampNTZType)))
              if (anchorHead.columns.contains(dateCol))
                anchorHead =
                  anchorHead.withColumn(dateCol, col(dateCol).cast(TimestampNTZType))
              schemaOps += 1
              didWidenType = true
              s"WIDEN TYPE $dateCol -> timestamp_ntz"
            }
          case 15 if seq % 8 == 5 =>
            // zero-retention vacuum: reclaims every tombstoned file,
            // change file and replaced vector. CURRENT content must
            // stay bit-identical (a vacuum that touches a live file —
            // or a live deletion vector — fails the very next check);
            // replays reaching BEHIND the reclaim fail NAMED, which the
            // sequence-end invariants tolerate for pre-vacuum versions
            t.vacuum(0L, force = true)
            lastVacuum = Some(t.snapshot.version)
            "VACUUM"
          case _ =>
            t.optimize()
            "OPTIMIZE"
        }
        if (sys.env.contains("GRAFT_FUZZ_TRACE"))
          println(s"[fuzz-trace] seq=$seq op#$op $desc")
        val got = canon(spark.read.format("qbeast").load(dir))
        val want = canon(model)
        if (got != want) {
          val missing = want.diff(got).take(3)
          val extra = got.diff(want).take(3)
          fail(s"[seq=$seq seed=$seed dv=$dv op#$op $desc]: " +
            s"${got.size} rows vs ${want.size} expected; " +
            s"missing=$missing extra=$extra")
        }
        val ver = t.snapshot.version
        if (desc.startsWith("OVERWRITE")) { anchor = (ver, model); anchorHead = model }
        history += ((ver, want, model, curName, anchorHead))
        fullHistory += ((ver, want))
        // mid-sequence drain on the schema-stable sequences: the final
        // drain then RESUMES from this checkpoint, exercising offset
        // restart across every unit kind (incl. the whole-commit 'x'
        // diffs) with exactly-once delivery into the same sink
        if (!allowSchema && op == dmlOps / 2 - 1) drainFeed()
      }
      // generated-column invariant: every stored value of a LIVE
      // definition satisfies its expression at sequence end (computed,
      // enforced and recomputed rows alike)
      if (gen) t.generatedColumns.foreach { case (n, sql) =>
        val bad = spark.read.format("qbeast").load(dir)
          .filter(org.apache.spark.sql.functions.not(expr(s"`$n` <=> ($sql)"))).count()
        assert(bad == 0L, s"[seq=$seq seed=$seed] generated column $n " +
          s"violates its definition on $bad rows")
      }
      // time travel across the random history — INCLUDING schema
      // replacements (each snapshot reads its files under its own
      // schema): up to 4 random recorded versions must read back
      // exactly the state the model had there
      def msgChain(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t2 => s"${t2.getClass.getSimpleName}: ${t2.getMessage}").mkString(" | ")
      val picks = new Random(seed + 999).shuffle(fullHistory.toSeq).take(4)
      picks.foreach { case (v, want) =>
        val got =
          try canon(spark.read.format("qbeast")
            .option("versionAsOf", v.toString).load(dir))
          catch {
            // a pre-vacuum version may reference reclaimed files; the
            // time-travel scan has no pre-probe, so Spark's own
            // file-not-found is also acceptable — but ONLY when the
            // message names a path under THIS table (a wrong-path
            // reader bug must not hide behind the tolerance); wrong
            // ROWS never are
            case e: Throwable if lastVacuum.exists(_ >= v) && {
              val m = msgChain(e)
              m.contains("vacuum") ||
                (m.contains(dir) && (m.toLowerCase.contains("does not exist") ||
                  m.contains("FileNotFound") || m.contains("FILE_NOT_EXIST")))
            } => null
          }
        if (got != null && got != want)
          fail(s"[seq=$seq seed=$seed dv=$dv versionAsOf=$v]: " +
            s"${got.size} rows vs ${want.size} expected; " +
            s"missing=${want.diff(got).take(3)} extra=${got.diff(want).take(3)}")
      }
      // change-feed reconstruction: anchor state ⊎ inserts ∖ deletes
      // from the last schema REPLACEMENT (or the initial write) to head
      // must equal the final content — multiset semantics, with every
      // frame and the anchor projected to the HEAD schema (widening
      // commits inside the range replay old rows with null new columns)
      val head = t.snapshot.version
      val (anchorV, _) = anchor
      if (head > anchorV) {
        val finalCols = model.columns.sorted.toSeq
        val counts = scala.collection.mutable.Map.empty[String, Long]
        // the anchor content viewed under the HEAD logical names:
        // renames re-labeled it along the way, drops removed columns,
        // re-adds null-fill through conform (fresh physical names)
        canon(conform(anchorHead, model.schema))
          .foreach(s => counts(s) = counts.getOrElse(s, 0L) + 1)
        val feedRows =
          try t.changes(anchorV + 1, head)
            .select(("_change_type" +: finalCols).map(col): _*).collect()
          catch {
            // a replay range reaching behind a zero-retention vacuum
            // must fail with the reclaim NAMED — anything else is a bug
            case e: Throwable if lastVacuum.isDefined &&
              msgChain(e).contains("vacuum") => null
            // a RESTORE that rolled back past a type widening leaves
            // wide-era files unreadable under the narrowed end schema:
            // the engine must refuse NAMED (never crash in the scan or
            // narrow values silently)
            case e: Throwable if didWidenType &&
              msgChain(e).contains("crosses a type change") => null
          }
        if (feedRows != null) {
          feedRows.foreach { r2 =>
            val row = (1 until r2.length).map(j =>
              if (r2.isNullAt(j)) "∅" else r2.get(j).toString).mkString("|")
            val delta = if (r2.getString(0) == "insert") 1L else -1L
            counts(row) = counts.getOrElse(row, 0L) + delta
          }
          val rebuilt = counts.toSeq.filter(_._2 != 0)
            .flatMap { case (row, n) =>
              if (n < 0) fail(s"[seq=$seq seed=$seed dv=$dv cdf]: " +
                s"negative multiplicity $n for $row")
              Seq.fill(n.toInt)(row)
            }.sorted
          val finalCanon = canon(model)
          if (rebuilt != finalCanon)
            fail(s"[seq=$seq seed=$seed dv=$dv cdf v${anchorV + 1}..$head]: " +
              s"replay gives ${rebuilt.size} rows vs ${finalCanon.size}; " +
              s"missing=${finalCanon.diff(rebuilt).take(3)} " +
              s"extra=${rebuilt.diff(finalCanon).take(3)}")
        }
      }
      // sequence-end STREAMING drain: the CDF stream must replay the
      // SAME feed batch changes() computes (restores and rewrites ride
      // the whole-commit diff units) — or, when the history changed the
      // schema, stop with the pinned restart-the-stream error
      try {
        drainFeed()
        val finalCols = model.columns.sorted.toSeq
        def rows(df: DataFrame): Seq[String] =
          df.select(("_commit_version" +: "_change_type" +: finalCols).map(col): _*)
            .collect().map(_.toSeq.map { case null => "∅"; case x => x.toString }
              .mkString("|")).sorted.toSeq
        val streamed = rows(spark.read.parquet(outDir))
        val batchFeed = rows(t.changes(v0, head))
        if (streamed != batchFeed)
          fail(s"[seq=$seq seed=$seed dv=$dv stream-drain v$v0..$head]: " +
            s"${streamed.size} streamed rows vs ${batchFeed.size} batch; " +
            s"missing=${batchFeed.diff(streamed).take(3)} " +
            s"extra=${streamed.diff(batchFeed).take(3)}")
      } catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable =>
          val msg = msgChain(e)
          val schemaStop = schemaOps > 0 && msg.contains("changed the table schema")
          val vacuumStop = lastVacuum.isDefined && msg.contains("vacuum")
          // batchFeed's changes(v0, head) can hit the type-regression
          // refusal when a RESTORE crossed back past a widen (the drain
          // itself stops at the widen's MetaDataAction with the restart
          // error first — commits replay in order)
          val typeStop = didWidenType && msg.contains("crosses a type change")
          if (!(schemaStop || vacuumStop || typeStop))
            fail(s"[seq=$seq seed=$seed dv=$dv stream-drain]: unexpected " +
              s"failure (schemaOps=$schemaOps vacuum=$lastVacuum): $msg")
      }
    }
  }

}
