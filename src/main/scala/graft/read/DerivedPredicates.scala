package graft.read

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.{DayOfWeek, Instant, LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import java.time.temporal.TemporalAdjusters

/**
 * Derives file-prunable range predicates from monotone date/time
 * function predicates, so `WHERE year(ts) = 1995`,
 * `cast(ts AS date) = '…'`, `trunc(d,'month') >= '…'` and
 * `date_trunc('month', ts) = '…'` skip files exactly like the
 * equivalent raw-column range would. Spark itself never pushes these
 * shapes down (parquet/stats pushdown sees only bare attribute
 * comparisons), yet they are how people actually write date filters —
 * without this an indexed/stats-pruned scan silently degrades to a
 * full-table read.
 *
 * Each recognized function is a *monotone bucketing* of its column:
 * the preimage of every output value is one contiguous raw-value
 * interval. A comparison against a literal L therefore rewrites to an
 * EXACT equivalent on the raw column, built from two bucket anchors
 *   lo(L) = start of the first bucket with value >= L
 *   hi(L) = start of the first bucket with value >  L
 * as  g=L ⟺ lo<=a<hi,  g>=L ⟺ a>=lo,  g>L ⟺ a>=hi,
 *     g<=L ⟺ a<hi,     g<L ⟺ a<lo
 * (NULL rows: both sides evaluate NULL — a filter drops them either
 * way). Because the rewrite is an equivalence, not just an implication,
 * leaves are REPLACED in place, which also lets
 * [[graft.rules.MetadataCountRule]]'s all-rows proofs
 * ([[FileStatsPruning.proveAll]]) answer `count(*) WHERE year(d)=…`
 * entirely from metadata. `IN` lists get an implied covering range
 * AND-ed next to the original leaf instead (the union of buckets has
 * gaps, so it is not an equivalence).
 *
 * Rewrites recurse only through And/Or — monotone contexts where
 * replacing a leaf with an equivalent is sound; anything else (Not,
 * CaseWhen, …) is left untouched. Timestamp boundary arithmetic uses
 * the Cast/TruncTimestamp node's own resolved time zone through the
 * same java.time operations Spark's DateTimeUtils performs
 * (`LocalDate.atStartOfDay(zone).toInstant`), so boundaries agree with
 * the engine bit-for-bit, DST transitions included; sub-day
 * `date_trunc` units are NOT derived because instant→local-time is
 * non-monotone across DST overlaps (day-and-coarser stay monotone:
 * the local *date* of an instant never repeats).
 *
 * Everything here is best-effort and conservative: any unrecognized
 * shape, overflow, or exotic zone leaves the predicate as-is, and the
 * expanded output is used for FILE SELECTION only — Spark still
 * re-applies the original row filters after the scan.
 */
object DerivedPredicates {

  def expand(filters: Seq[Expression]): Seq[Expression] = filters.map(rewrite)

  private def rewrite(e: Expression): Expression = e match {
    // the exact tree the In branch itself emits — And(original IN, its
    // own covering range): leave it alone so expand() is idempotent
    // (the distributed index expands once, selectFiles expands again).
    // Requires literal equality with what we'd derive, so a USER-written
    // And(In, And(ge, lt)) that merely resembles it still expands
    case a @ And(in: In, And(_: GreaterThanOrEqual, _: LessThan))
        if deriveLeaf(in).contains(a) => a
    case And(l, r) => And(rewrite(l), rewrite(r))
    case Or(l, r) => Or(rewrite(l), rewrite(r))
    // the DML path's three-valued-logic wrapper (`coalesce(cond,
    // false)`): monotone in `cond` and maps UNKNOWN to FALSE exactly
    // like a filter does, so rewriting inside preserves row selection
    case Coalesce(Seq(inner, f @ Literal(false, BooleanType))) =>
      Coalesce(Seq(rewrite(inner), f))
    case leaf => deriveLeaf(leaf).getOrElse(leaf)
  }

  // ---- leaf comparison dispatch -------------------------------------------

  private def deriveLeaf(e: Expression): Option[Expression] = e match {
    case EqualTo(g, Literal(v, _)) if v != null => eq(g, v)
    case EqualTo(Literal(v, _), g) if v != null => eq(g, v)
    // <=> with a non-null literal filters exactly like = (NULL rows fail both)
    case EqualNullSafe(g, Literal(v, _)) if v != null => eq(g, v)
    case EqualNullSafe(Literal(v, _), g) if v != null => eq(g, v)
    case GreaterThanOrEqual(g, Literal(v, _)) if v != null && rangeDerivable(g) => ge(g, v)
    case GreaterThan(g, Literal(v, _)) if v != null && rangeDerivable(g) => gt(g, v)
    case LessThanOrEqual(g, Literal(v, _)) if v != null && rangeDerivable(g) => le(g, v)
    case LessThan(g, Literal(v, _)) if v != null && rangeDerivable(g) => lt(g, v)
    // literal-first spellings mirror
    case GreaterThanOrEqual(Literal(v, _), g) if v != null && rangeDerivable(g) => le(g, v)
    case GreaterThan(Literal(v, _), g) if v != null && rangeDerivable(g) => lt(g, v)
    case LessThanOrEqual(Literal(v, _), g) if v != null && rangeDerivable(g) => ge(g, v)
    case LessThan(Literal(v, _), g) if v != null && rangeDerivable(g) => gt(g, v)
    // g != L ⟺ a outside the bucket [lo, hi) — exact, incl. the
    // unattainable-literal case (the union is then "a IS NOT NULL",
    // which is what g != L evaluates to there)
    case Not(EqualTo(g, Literal(v, _))) if v != null => neq(g, v)
    case Not(EqualTo(Literal(v, _), g)) if v != null => neq(g, v)
    case In(g, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      val vs = list.collect { case Literal(v, _) if v != null => v }
      if (vs.isEmpty) None
      else {
        val bs = vs.map(buckets(g, _))
        for {
          all <- if (bs.forall(_.isDefined)) Some(bs.flatten) else None
          attr = all.head._1
          los <- sequence(all.map(_._2._1))
          his <- sequence(all.map(_._2._2))
        } yield And(e,
          And(GreaterThanOrEqual(attr, los.minBy(litLong)),
            LessThan(attr, his.maxBy(litLong))))
      }
    case _ => None
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.flatten) else None

  /** False for bucketings whose OUTPUT order diverges from the raw
   * order somewhere in the domain — range comparisons must not derive
   * there. date_format strings sort chronologically only within
   * non-negative 4-digit years: a year ≥ 10000 prints "+10000-…",
   * which sorts BELOW every digit-led string while sitting above them
   * chronologically, so `date_format(ts,…) >= '1990-01-01'` is NOT
   * equivalent to a raw range (equality/IN stay exact — they are pure
   * bucket preimages). */
  private def rangeDerivable(g: Expression): Boolean = g match {
    case _: DateFormatClass => false
    case _ => true
  }

  private def litLong(l: Literal): Long = l.value match {
    case i: java.lang.Integer => i.toLong
    case l2: java.lang.Long => l2.longValue()
    case _ => 0L
  }

  private def eq(g: Expression, v: Any): Option[Expression] =
    buckets(g, v).flatMap { case (a, (lo, hi)) =>
      for (l <- lo; h <- hi) yield {
        // an unattainable literal (e.g. trunc = mid-month) gives an
        // empty range; the two conjuncts can't see that jointly (a file
        // straddling the anchor passes both), so fold it here. FALSE
        // instead of UNKNOWN is filter-equivalent, and rewrites only
        // land in filter-monotone contexts (And/Or/coalesce(·,false))
        if (litLong(l) >= litLong(h)) Literal(false, BooleanType)
        else And(GreaterThanOrEqual(a, l), LessThan(a, h))
      }
    }
  private def neq(g: Expression, v: Any): Option[Expression] =
    buckets(g, v).flatMap { case (a, (lo, hi)) =>
      for (l <- lo; h <- hi) yield Or(LessThan(a, l), GreaterThanOrEqual(a, h))
    }

  private def ge(g: Expression, v: Any): Option[Expression] =
    buckets(g, v).flatMap { case (a, (lo, _)) => lo.map(GreaterThanOrEqual(a, _)) }
  private def gt(g: Expression, v: Any): Option[Expression] =
    buckets(g, v).flatMap { case (a, (_, hi)) => hi.map(GreaterThanOrEqual(a, _)) }
  private def le(g: Expression, v: Any): Option[Expression] =
    buckets(g, v).flatMap { case (a, (_, hi)) => hi.map(LessThan(a, _)) }
  private def lt(g: Expression, v: Any): Option[Expression] =
    buckets(g, v).flatMap { case (a, (lo, _)) => lo.map(LessThan(a, _)) }

  // ---- bucket anchors per recognized shape --------------------------------

  /** How a timestamp column reads its wall clock. */
  private sealed trait TsKind
  private final case class Zoned(zone: ZoneId) extends TsKind
  private case object Ntz extends TsKind

  /** Resolve a Catalyst timeZoneId string the way the engine does
   * (Spark accepts SHORT_IDS like "PST" and unpadded offsets like
   * "GMT+8:00" that plain ZoneId.of rejects); None — never a throw —
   * for anything unresolvable, so an exotic zone skips the derivation
   * instead of failing the query. */
  private def zoneOf(z: String): Option[ZoneId] =
    scala.util.Try(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(z)).toOption

  /** (raw attribute, (lo, hi)) — the two bucket-anchor literals in the
   * attribute's own type, None where the arithmetic over/underflows. */
  private def buckets(
      g: Expression, v: Any): Option[(Attribute, (Option[Literal], Option[Literal]))] =
    g match {
      // year(date_col)
      case Year(a: Attribute) if a.dataType == DateType =>
        intOf(v).map { y =>
          (a, (yearStartDays(y).flatMap(dateLit), yearStartDays(y + 1).flatMap(dateLit)))
        }
      // year(ts_col): the analyzer inserts cast(ts AS date)
      case Year(c: Cast) if c.dataType == DateType =>
        for (tk <- tsCastTarget(c); y <- intOf(v)) yield {
          def anchor(yy: Int) =
            yearStartDays(yy).flatMap(d => startOfDayMicros(d, tk._2)).map(tsLit(_, tk._2))
          (tk._1, (anchor(y), anchor(y + 1)))
        }
      // cast(ts_col AS date) — also to_date(ts_col)
      case c: Cast if c.dataType == DateType =>
        for (tk <- tsCastTarget(c); d <- daysOf(v)) yield {
          def anchor(dd: Long) = startOfDayMicros(dd, tk._2).map(tsLit(_, tk._2))
          (tk._1, (anchor(d), anchor(d + 1L)))
        }
      // cast(date_col AS timestamp) — how mixed date-vs-timestamp
      // comparisons analyze; each date is one bucket [startOfDay(d),
      // startOfDay(d+1))
      case c: Cast
          if (c.dataType == TimestampType || c.dataType == TimestampNTZType) &&
            c.child.isInstanceOf[Attribute] && c.child.dataType == DateType =>
        val a = c.child.asInstanceOf[Attribute]
        val tk = if (c.dataType == TimestampNTZType) Ntz
          else c.timeZoneId.flatMap(zoneOf).map(Zoned(_)).getOrElse(return None)
        microsOf(v).map { l =>
          // lo = first date whose start-of-day >= L; hi = first > L
          val ld = localDateOf(l, tk)
          val s = startOfDayMicros(ld.toEpochDay, tk)
          def lit(d: Long) = dateLit(d)
          s.map { sm =>
            val loD = if (sm >= l) ld.toEpochDay else ld.toEpochDay + 1
            val hiD = if (sm > l) ld.toEpochDay else ld.toEpochDay + 1
            (a, (lit(loD), lit(hiD)))
          }.getOrElse((a, (None, None)))
        }
      // trunc(date_col, 'fmt')
      case TruncDate(a: Attribute, Literal(fmt: UTF8String, _)) if a.dataType == DateType =>
        for (u <- unitOf(fmt.toString, subWeekOk = false); l <- daysOf(v)) yield {
          val anchors = scala.util.Try {
            val ld = LocalDate.ofEpochDay(l)
            val fl = floorUnit(ld, u)
            val next = plusUnit(fl, u)
            val lo = if (fl == ld) ld else next // literal on a boundary ⇔ fl == ld
            (dateLit(lo.toEpochDay), dateLit(next.toEpochDay))
          }.getOrElse((None, None))
          (a, anchors)
        }
      // date_trunc('fmt', ts_col)
      case TruncTimestamp(Literal(fmt: UTF8String, _), a: Attribute, tz)
          if a.dataType == TimestampType || a.dataType == TimestampNTZType =>
        val tk = if (a.dataType == TimestampNTZType) Ntz
          else tz.flatMap(zoneOf).map(Zoned(_)).getOrElse(return None)
        for (u <- unitOf(fmt.toString, subWeekOk = true); l <- microsOf(v)) yield {
          val anchors = scala.util.Try {
            val ld = localDateOf(l, tk)
            val fl = floorUnit(ld, u)
            val next = plusUnit(fl, u)
            val flM = startOfDayMicros(fl.toEpochDay, tk)
            val nextM = startOfDayMicros(next.toEpochDay, tk)
            val lo = flM.flatMap(f => if (f == l) Some(f) else nextM)
            (lo.map(tsLit(_, tk)), nextM.map(tsLit(_, tk)))
          }.getOrElse((None, None))
          (a, anchors)
        }
      // date_trunc('fmt', date_col) — analyzes as date_trunc over
      // cast(date AS timestamp); every unit's dates share one output
      // (start-of-day of the unit start), so the anchors are plain
      // DATE literals — no zone arithmetic on the raw side at all
      // the cast's zone and the truncation's zone must AGREE (both are
      // the session zone in analyzed plans) — with different zones the
      // local date of start-of-day can shift a day and the anchors
      // would misprune; NTZ is zoneless and always safe
      case TruncTimestamp(Literal(fmt: UTF8String, _), c: Cast, tz)
          if (c.dataType == TimestampType || c.dataType == TimestampNTZType) &&
            c.child.isInstanceOf[Attribute] && c.child.dataType == DateType &&
            (c.dataType == TimestampNTZType || c.timeZoneId == tz) =>
        val a = c.child.asInstanceOf[Attribute]
        val tk = if (c.dataType == TimestampNTZType) Ntz
          else tz.flatMap(zoneOf).map(Zoned(_)).getOrElse(return None)
        for (u <- unitOf(fmt.toString, subWeekOk = true); l <- microsOf(v)) yield {
          val anchors = scala.util.Try {
            val ld = localDateOf(l, tk)
            val fl = floorUnit(ld, u)
            val next = plusUnit(fl, u)
            // the unit containing l's local date outputs gf ≤ l; it is
            // the first unit with output ≥ l iff gf == l exactly
            val gf = startOfDayMicros(fl.toEpochDay, tk)
            val lo = gf.map(g => if (g == l) fl else next)
            (lo.flatMap(d => dateLit(d.toEpochDay)), dateLit(next.toEpochDay))
          }.getOrElse((None, None))
          (a, anchors)
        }
      // unix_timestamp(ts_col) / to_unix_timestamp(ts_col): epoch
      // seconds = micros / 1e6 with TRUNCATING division (toward zero —
      // Spark's ToTimestamp uses plain long division, probed:
      // unix_timestamp('1969-12-31 23:59:59.5') = 0, not -1), so the
      // second-0 bucket is [-999999, 999999] and every sec <= 0 bucket
      // starts 999999 micros EARLIER than sec*1e6 — a floorDiv anchor
      // would silently drop pre-epoch rows from scans, metadata counts
      // and DML classification
      case UnixEpochSeconds(a) if a.dataType == TimestampType ||
          a.dataType == TimestampNTZType =>
        longOf(v).map { sec =>
          val tk = if (a.dataType == TimestampNTZType) Ntz else Zoned(ZoneOffset.UTC)
          // first micros of bucket `s` under truncating division
          def bucketStart(s: Long): Option[Literal] =
            scala.util.Try {
              val base = Math.multiplyExact(s, 1000000L)
              if (s <= 0) Math.subtractExact(base, 999999L) else base
            }.toOption.map(tsLit(_, tk))
          (a, (bucketStart(sec), bucketStart(sec + 1)))
        }
      // unix_timestamp(date_col): start-of-day epoch seconds in the
      // function's zone — one-day buckets, date-literal anchors
      case ue @ UnixEpochSeconds(a) if a.dataType == DateType =>
        val zone = (ue match {
          case u: UnixTimestamp => u.timeZoneId
          case u: ToUnixTimestamp => u.timeZoneId
          case _ => None
        }).flatMap(zoneOf).getOrElse(return None)
        longOf(v).map { sec =>
          val anchors = scala.util.Try {
            val ld = Instant.ofEpochSecond(sec).atZone(zone).toLocalDate
            val gf = startOfDayMicros(ld.toEpochDay, Zoned(zone)).map(_ / 1000000L)
            val lo = gf.map(g =>
              if (g >= sec) ld.toEpochDay else ld.toEpochDay + 1)
            val hi = gf.map(g =>
              if (g > sec) ld.toEpochDay else ld.toEpochDay + 1)
            (lo.flatMap(dateLit), hi.flatMap(dateLit))
          }.getOrElse((None, None))
          (a, anchors)
        }
      // date_format(col, 'yyyy-MM-dd' | 'yyyy-MM' | 'yyyy') compared
      // to a string literal: each output string is one unit's bucket.
      // Range comparisons are gated off by rangeDerivable (output
      // order diverges from raw order outside 4-digit years);
      // equality/IN/!= are pure bucket preimages, hence exact. A
      // literal that parses to no unit start (or not at all) yields an
      // empty/complement range through the normal anchor algebra.
      case DateFormatClass(inner, Literal(fmt: UTF8String, _), tz) =>
        val u = fmt.toString match {
          case "yyyy-MM-dd" => UDay
          case "yyyy-MM" => UMonth
          case "yyyy" => UYear
          case _ => return None
        }
        val s = v match {
          case us: UTF8String => us.toString
          case _ => return None
        }
        // unparseable literal: stay conservative (no derivation) — the
        // engine still evaluates the original predicate per row
        val unitStart: LocalDate = scala.util.Try(u match {
          case UDay => LocalDate.parse(s)
          case UMonth => java.time.YearMonth.parse(s).atDay(1)
          case _ => java.time.Year.parse(s).atDay(1)
        }).getOrElse(return None)
        // years outside [0, 9999] print signed/5-digit forms the
        // parse above never produces; [0,9999] prints exactly these
        if (unitStart.getYear < 0 || unitStart.getYear > 9999) return None
        val next = plusUnit(unitStart, u)
        inner match {
          case a: Attribute if a.dataType == DateType =>
            Some((a, (dateLit(unitStart.toEpochDay), dateLit(next.toEpochDay))))
          // ts column (possibly via the implicit date→ts cast the
          // analyzer inserts is the OTHER direction; ts needs zone)
          case a: Attribute
              if a.dataType == TimestampType || a.dataType == TimestampNTZType =>
            val tk = if (a.dataType == TimestampNTZType) Ntz
              else tz.flatMap(zoneOf).map(Zoned(_)).getOrElse(return None)
            Some((a, (
              startOfDayMicros(unitStart.toEpochDay, tk).map(tsLit(_, tk)),
              startOfDayMicros(next.toEpochDay, tk).map(tsLit(_, tk)))))
          // date column behind the analyzer's date→timestamp cast:
          // the cast's zone and the format's zone must agree (both are
          // the session zone in analyzed plans) or the local date of
          // start-of-day could shift; NTZ is zoneless and always safe
          case c: Cast if c.child.isInstanceOf[Attribute] &&
              c.child.dataType == DateType &&
              (c.dataType == TimestampNTZType || c.timeZoneId == tz) =>
            Some((c.child.asInstanceOf[Attribute],
              (dateLit(unitStart.toEpochDay), dateLit(next.toEpochDay))))
          case _ => None
        }
      case _ => None
    }

  /** Matches unix_timestamp / to_unix_timestamp over a bare column
   * with the DEFAULT format (any format evaluates identically for
   * date/timestamp inputs — it only matters for string parsing). */
  private object UnixEpochSeconds {
    def unapply(e: Expression): Option[Attribute] = e match {
      case u: UnixTimestamp => attrOf(u.timeExp)
      case u: ToUnixTimestamp => attrOf(u.timeExp)
      case _ => None
    }
    private def attrOf(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case _ => None
    }
  }

  /** The cast's source attribute and wall-clock kind, when the cast is
   * over a raw timestamp column (zoned casts must carry their resolved
   * session zone — an unresolved one derives nothing). */
  private def tsCastTarget(c: Cast): Option[(Attribute, TsKind)] = c.child match {
    case a: Attribute if a.dataType == TimestampNTZType => Some((a, Ntz))
    case a: Attribute if a.dataType == TimestampType =>
      c.timeZoneId.flatMap(zoneOf).map(z => (a, Zoned(z)))
    case _ => None
  }

  // ---- literal/value plumbing ---------------------------------------------

  private def intOf(v: Any): Option[Int] = v match {
    case i: java.lang.Integer => Some(i.intValue())
    case _ => None
  }
  private def daysOf(v: Any): Option[Long] = v match {
    case i: java.lang.Integer => Some(i.longValue()) // DateType internal
    case _ => None
  }
  private def microsOf(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue()) // Timestamp(NTZ) internal
    case _ => None
  }
  private def longOf(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue())
    case i: java.lang.Integer => Some(i.longValue())
    case _ => None
  }

  private def dateLit(days: Long): Option[Literal] =
    if (days >= Int.MinValue && days <= Int.MaxValue) Some(Literal(days.toInt, DateType))
    else None

  private def tsLit(micros: Long, tk: TsKind): Literal =
    Literal(micros, if (tk == Ntz) TimestampNTZType else TimestampType)

  private def yearStartDays(y: Int): Option[Long] =
    scala.util.Try(LocalDate.of(y, 1, 1).toEpochDay).toOption

  /** Start-of-day instant in micros — the same
   * `LocalDate.atStartOfDay(zone).toInstant` Spark's DateTimeUtils
   * daysToMicros performs, so DST-gap days agree with the engine. */
  private def startOfDayMicros(epochDay: Long, tk: TsKind): Option[Long] =
    scala.util.Try {
      tk match {
        case Ntz => Math.multiplyExact(epochDay, 86400000000L)
        case Zoned(z) =>
          instantMicros(LocalDate.ofEpochDay(epochDay).atStartOfDay(z).toInstant)
      }
    }.toOption

  private def instantMicros(i: Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)

  private def localDateOf(micros: Long, tk: TsKind): LocalDate = {
    val secs = Math.floorDiv(micros, 1000000L)
    val nanos = Math.floorMod(micros, 1000000L) * 1000L
    tk match {
      case Ntz => LocalDateTime.ofEpochSecond(secs, nanos.toInt, ZoneOffset.UTC).toLocalDate
      case Zoned(z) => Instant.ofEpochSecond(secs, nanos).atZone(z).toLocalDate
    }
  }

  // ---- unit arithmetic ------------------------------------------------------

  private sealed trait Unit_
  private case object UYear extends Unit_
  private case object UQuarter extends Unit_
  private case object UMonth extends Unit_
  private case object UWeek extends Unit_
  private case object UDay extends Unit_

  /** Spark's trunc/date_trunc level spellings; `trunc` (dates) stops at
   * week — finer levels return NULL there, so deriving them would be
   * wrong, not just useless. */
  private def unitOf(fmt: String, subWeekOk: Boolean): Option[Unit_] =
    fmt.toLowerCase(java.util.Locale.ROOT) match {
      case "year" | "yyyy" | "yy" => Some(UYear)
      case "quarter" => Some(UQuarter)
      case "month" | "mon" | "mm" => Some(UMonth)
      case "week" => Some(UWeek)
      case "day" | "dd" if subWeekOk => Some(UDay)
      case _ => None
    }

  private def floorUnit(ld: LocalDate, u: Unit_): LocalDate = u match {
    case UYear => LocalDate.of(ld.getYear, 1, 1)
    case UQuarter => LocalDate.of(ld.getYear, ((ld.getMonthValue - 1) / 3) * 3 + 1, 1)
    case UMonth => ld.withDayOfMonth(1)
    case UWeek => ld.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    case UDay => ld
  }

  private def plusUnit(ld: LocalDate, u: Unit_): LocalDate = u match {
    case UYear => ld.plusYears(1)
    case UQuarter => ld.plusMonths(3)
    case UMonth => ld.plusMonths(1)
    case UWeek => ld.plusWeeks(1)
    case UDay => ld.plusDays(1)
  }

}
