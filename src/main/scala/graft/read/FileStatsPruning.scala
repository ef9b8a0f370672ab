package graft.read

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.util.concurrent.ConcurrentHashMap

/**
 * File-level data skipping over the per-file column stats written by
 * [[graft.write.FileStatsCollector]] (Delta-style min/max/nullCount).
 * Complements the OTree block pruning: the index prunes on INDEXED
 * columns and sampling weight; this prunes on any other column the
 * stats cover. Strictly conservative — any expression shape or type it
 * does not understand keeps the file.
 */
object FileStatsPruning {

  /** One column's per-file bloom filter (see
   * [[graft.write.BloomCollector]]): decoded bitset words + probe
   * count. */
  final case class BloomStat(words: Array[Long], k: Int)

  final case class Stats(
      numRecords: Long,
      mins: Map[String, Any],
      maxs: Map[String, Any],
      nulls: Map[String, Long],
      blooms: Map[String, BloomStat] = Map.empty,
      hll: Map[String, Array[Byte]] = Map.empty,
      kll: Map[String, Array[Byte]] = Map.empty,
      // truncated-string bound markers ("min" | "max" | "minmax"):
      // the marked side is a valid BOUND but not an actual row value —
      // pruning/proofs stay sound, the metadata min/max fold must bail
      inexact: Map[String, String] = Map.empty) {

    /** True when the column's `isMin` side is a truncated bound. */
    def isInexact(col: String, isMin: Boolean): Boolean =
      inexact.get(col).exists(m =>
        m == "minmax" || m == (if (isMin) "min" else "max"))
  }

  /** Parsed-stats cache keyed by the JSON text (one entry per file;
   * snapshots reuse the same strings across queries). Bounded: every
   * write/compaction mints NEW stats strings, so an uncapped
   * JVM-lifetime map grows monotonically on a long-lived driver —
   * clearing on overflow only costs re-parsing, which is what the
   * cache amortizes in the first place. */
  private val MaxCacheEntries = 200000
  private val cache = new ConcurrentHashMap[String, Stats]()

  /**
   * Era gates for type-widened columns ([[graft.core.model.TypeWidening]]):
   * `statsOff` columns lose their min/max bounds (stored-unit change —
   * date days vs timestamp micros — makes old values incomparable);
   * `bloomOff` columns lose their bloom filters (xxhash64 keys hashed at
   * the narrow type would produce FALSE NEGATIVES against widened
   * literals). Everything downstream already treats a missing bound /
   * missing filter conservatively, so gating = removing the entries.
   * nullCount and numRecords stay — they are type-independent.
   */
  final case class Gates(statsOff: Set[String], bloomOff: Set[String]) {
    def isEmpty: Boolean = statsOff.isEmpty && bloomOff.isEmpty
  }

  object Gates {
    val none: Gates = Gates(Set.empty, Set.empty)

    /** Gates for a table's current LOGICAL schema (physical-keyed). */
    def of(schema: org.apache.spark.sql.types.StructType): Gates = {
      import graft.core.model.TypeWidening
      if (!TypeWidening.isEnabled(schema)) none
      else Gates(TypeWidening.statsTrustless(schema), TypeWidening.bloomTrustless(schema))
    }
  }

  /** Apply era gates to parsed stats (identity when no column of the
   * table was ever widened — the universal fast path). Only the
   * sections the PROOFS consult are trimmed; the hll/kll sections are
   * gated separately by their fold entry points (sketchEraOk /
   * TypeWidening.hllTrustless|kllTrustless), which know the finer
   * hash-compatibility rules. */
  def gate(s: Stats, g: Gates): Stats =
    if (g.isEmpty) s
    else {
      val off = g.statsOff
      s.copy(
        mins = if (off.isEmpty) s.mins else s.mins -- off,
        maxs = if (off.isEmpty) s.maxs else s.maxs -- off,
        blooms = s.blooms -- off -- g.bloomOff)
    }

  def mayMatch(statsJson: Option[String], filters: Seq[Expression]): Boolean =
    mayMatch(statsJson, filters, Gates.none)

  def mayMatch(
      statsJson: Option[String],
      filters: Seq[Expression],
      gates: Gates): Boolean =
    statsJson match {
      case None => true
      case Some(json) =>
        parse(json) match {
          case None => true
          case Some(stats) =>
            val gated = gate(stats, gates)
            filters.forall(f => eval(gated, f))
        }
    }

  def parse(json: String): Option[Stats] = {
    val hit = cache.get(json)
    if (hit != null) return Some(hit)
    try {
      val j = JsonMethods.parse(json)
      def section(name: String): Map[String, Any] = j \ name match {
        case JObject(fields) => fields.collect {
          case (k, JInt(v)) => k -> BigDecimal(v)
          case (k, JLong(v)) => k -> BigDecimal(v)
          case (k, JDouble(v)) => k -> BigDecimal(v)
          case (k, JDecimal(v)) => k -> v
          case (k, JString(s)) => k -> s
          case (k, JBool(b)) => k -> b
        }.toMap
        case _ => Map.empty
      }
      val numRecords = j \ "numRecords" match {
        case JInt(v) => v.toLong
        case JLong(v) => v
        case _ => return None
      }
      val nulls = (j \ "nullCount" match {
        case JObject(fields) => fields.collect {
          case (k, JInt(v)) => k -> v.toLong
          case (k, JLong(v)) => k -> v
        }.toMap
        case _ => Map.empty[String, Long]
      })
      // per-column bloom filters (absent in pre-bloom stats): a
      // malformed entry drops ONLY that column's filter, never the
      // min/max sections
      val blooms = j \ "bloomFilters" match {
        case JObject(fields) => fields.flatMap { case (col, o) =>
          try {
            val k = o \ "k" match {
              case JInt(v) => v.toInt
              case JLong(v) => v.toInt
              case _ => 0
            }
            val b64 = o \ "b64" match {
              case JString(s) => s
              case _ => ""
            }
            if (b64.isEmpty || k <= 0) None
            else {
              val bytes = java.util.Base64.getDecoder.decode(b64)
              val lb = java.nio.ByteBuffer.wrap(bytes)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer()
              val words = new Array[Long](lb.remaining())
              lb.get(words)
              // a truncated bitset (< 1 word) would make the probe's
              // modulus 0 — drop the filter, keep the file
              if (words.isEmpty) None else Some(col -> BloomStat(words, k))
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        }.toMap
        case _ => Map.empty[String, BloomStat]
      }
      // per-column HLL register states (absent unless the table was
      // written with hllColumns): a malformed entry drops only that
      // column's registers
      val hll = j \ "hll" match {
        case JObject(fields) => fields.flatMap {
          case (col, JString(b64)) =>
            try {
              val bytes = java.util.Base64.getDecoder.decode(b64)
              if (bytes.length == graft.expressions.HllDistinctAgg.M)
                Some(col -> bytes)
              else None
            } catch { case scala.util.control.NonFatal(_) => None }
          case _ => None
        }.toMap
        case _ => Map.empty[String, Array[Byte]]
      }
      // per-column serialized KLL quantile states (absent unless the
      // table was written with kllColumns); a malformed entry drops
      // only that column's state
      val kll = j \ "kll" match {
        case JObject(fields) => fields.flatMap {
          case (col, JString(b64)) =>
            try Some(col -> java.util.Base64.getDecoder.decode(b64))
            catch { case scala.util.control.NonFatal(_) => None }
          case _ => None
        }.toMap
        case _ => Map.empty[String, Array[Byte]]
      }
      val inexact = j \ "inexact" match {
        case JObject(fields) => fields.collect {
          case (k, JString(v)) => k -> v
        }.toMap
        case _ => Map.empty[String, String]
      }
      val s = Stats(numRecords, section("minValues"), section("maxValues"),
        nulls, blooms, hll, kll, inexact)
      if (cache.size() > MaxCacheEntries) cache.clear()
      cache.put(json, s)
      Some(s)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  // ---- conservative evaluation: "could any row in this file match?" ----

  private def eval(s: Stats, e: Expression): Boolean = e match {
    case And(l, r) => eval(s, l) && eval(s, r)
    case Or(l, r) => eval(s, l) || eval(s, r)

    // a constant condition decides outright (DerivedPredicates folds
    // unattainable equalities to FALSE); a NULL literal passes no rows
    case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) => b
    case Literal(null, org.apache.spark.sql.types.BooleanType) => false
    // the DML path's three-valued wrapper: coalesce(x, false) is true
    // iff x is true
    case Coalesce(Seq(inner, Literal(false, org.apache.spark.sql.types.BooleanType))) =>
      eval(s, inner)

    case EqualTo(a: AttributeReference, Literal(v, dt)) => containsValue(s, a.name, v, dt)
    case EqualTo(Literal(v, dt), a: AttributeReference) => containsValue(s, a.name, v, dt)

    case GreaterThan(a: AttributeReference, Literal(v, _)) => maxAbove(s, a.name, v, strict = true)
    case GreaterThan(Literal(v, _), a: AttributeReference) => minBelow(s, a.name, v, strict = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => maxAbove(s, a.name, v, strict = false)
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => minBelow(s, a.name, v, strict = false)
    case LessThan(a: AttributeReference, Literal(v, _)) => minBelow(s, a.name, v, strict = true)
    case LessThan(Literal(v, _), a: AttributeReference) => maxAbove(s, a.name, v, strict = true)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => minBelow(s, a.name, v, strict = false)
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => maxAbove(s, a.name, v, strict = false)

    case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, dt) => containsValue(s, a.name, v, dt) }
    case InSet(a: AttributeReference, set) =>
      set.exists(v => containsValue(s, a.name, v, a.dataType))

    case IsNull(a: AttributeReference) =>
      s.nulls.get(a.name).forall(_ > 0)
    case IsNotNull(a: AttributeReference) =>
      s.nulls.get(a.name).forall(_ < s.numRecords)

    case StartsWith(a: AttributeReference, Literal(p: UTF8String, _)) if p != null =>
      prefixOverlaps(s, a.name, p.toString)

    // non-contiguous calendar functions (month/quarter/dayofweek/…):
    // no single raw range is equivalent, but the file's min/max bound
    // the function's IMAGE exactly — a definite miss skips the file
    case other => proveCalendar(s, other) != Some(false)
  }

  // ---- tri-state proofs (metadata-only filtered counts) --------------------

  /**
   * Prove a predicate over EVERY row of a file from its stats:
   * Some(true) = every row evaluates TRUE; Some(false) = no row
   * evaluates TRUE (FALSE or UNKNOWN); None = cannot decide. The
   * TRUE-proof of any comparison requires a zero null count (a NULL
   * row evaluates UNKNOWN, which a filter drops), so
   * `MetadataCountRule` can answer `count(*)` under a predicate by
   * summing element counts of proven-true files — iff every file
   * proves one way or the other (a single undecidable file bails the
   * whole rewrite back to the scan).
   */
  def proveAll(s: Stats, e: Expression): Option[Boolean] = e match {
    case Literal(b: Boolean, _) => Some(b)
    // the DML path's SQL three-valued-logic wrapper (`coalesce(cond,
    // false)`): all-rows-TRUE iff cond is (comparison TRUE-proofs
    // already require null-free inputs), and "no row TRUE" already
    // means FALSE-or-UNKNOWN — both proofs pass through unchanged
    case Coalesce(Seq(inner, Literal(false, org.apache.spark.sql.types.BooleanType))) =>
      proveAll(s, inner)
    case And(l, r) =>
      (proveAll(s, l), proveAll(s, r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    case Or(l, r) =>
      (proveAll(s, l), proveAll(s, r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    case EqualTo(a: AttributeReference, Literal(v, dt)) => proveEq(s, a.name, v, dt)
    case EqualTo(Literal(v, dt), a: AttributeReference) => proveEq(s, a.name, v, dt)
    case GreaterThan(a: AttributeReference, Literal(v, _)) => proveCmp(s, a.name, v, 1, strict = true)
    case GreaterThan(Literal(v, _), a: AttributeReference) => proveCmp(s, a.name, v, -1, strict = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => proveCmp(s, a.name, v, 1, strict = false)
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => proveCmp(s, a.name, v, -1, strict = false)
    case LessThan(a: AttributeReference, Literal(v, _)) => proveCmp(s, a.name, v, -1, strict = true)
    case LessThan(Literal(v, _), a: AttributeReference) => proveCmp(s, a.name, v, 1, strict = true)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => proveCmp(s, a.name, v, -1, strict = false)
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => proveCmp(s, a.name, v, 1, strict = false)
    case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
      val vs = list.collect { case Literal(v, dt) if v != null => (v, dt) }
      val eqs = vs.map { case (v, dt) => proveEq(s, a.name, v, dt) }
      if (eqs.exists(_.contains(true))) Some(true)
      else if (eqs.nonEmpty && eqs.forall(_.contains(false))) Some(false)
      else if (vs.isEmpty) Some(false) // only-null IN list matches nothing
      else None
    case IsNull(a: AttributeReference) =>
      (s.nulls.get(a.name), Some(s.numRecords)) match {
        case (Some(n), Some(total)) if n == total => Some(true)
        case (Some(0L), _) => Some(false)
        case _ => None
      }
    case IsNotNull(a: AttributeReference) =>
      s.nulls.get(a.name) match {
        case Some(0L) => Some(true)
        case Some(n) if n == s.numRecords => Some(false)
        case _ => None
      }
    case other => proveCalendar(s, other)
  }

  // ---- calendar-function image proofs ---------------------------------

  /** Tri-state all-rows proof for comparisons over NON-CONTIGUOUS
   * calendar bucketings (`month(d) = 5`, `dayofweek(ts) IN (1,7)`,
   * `quarter(d) >= 3`) — the shapes [[DerivedPredicates]] cannot
   * rewrite to one raw range. The raw column's min/max bound the set
   * of dates in the file, whose function IMAGE is enumerated exactly
   * (with full-period short-circuits, ≤ a few dozen steps): the image
   * is a superset of the outputs actually achieved, so `image ⊆ {v}`
   * proves all rows TRUE (given zero nulls) and `v ∉ image` proves no
   * row matches — both conservative under the superset. Same contract
   * as [[proveAll]]: Some(true) / Some(false) / None. */
  private def proveCalendar(s: Stats, e: Expression): Option[Boolean] = {
    def intLit(v: Any): Option[Int] = v match {
      case i: java.lang.Integer => Some(i.intValue())
      case l: java.lang.Long if l.longValue() == l.intValue() => Some(l.intValue())
      case _ => None
    }
    def withImage(g: Expression)(f: (Set[Int], Long) => Option[Boolean]): Option[Boolean] =
      calendarImage(s, g).flatMap { case (colName, image) =>
        s.nulls.get(colName).flatMap(n => f(image, n))
      }
    e match {
      case EqualTo(g, Literal(v, _)) if v != null =>
        intLit(v).flatMap(m => withImage(g) { (img, nulls) =>
          if (!img.contains(m)) Some(false)
          else if (img == Set(m) && nulls == 0L) Some(true)
          else None
        })
      case EqualTo(Literal(v, _), g) if v != null => proveCalendar(s, EqualTo(g, Literal(v)))
      case Not(EqualTo(g, Literal(v, _))) if v != null =>
        intLit(v).flatMap(m => withImage(g) { (img, nulls) =>
          if (img == Set(m)) Some(false) // every non-null row IS m; nulls fail too
          else if (!img.contains(m) && nulls == 0L) Some(true)
          else None
        })
      case Not(EqualTo(Literal(v, _), g)) if v != null =>
        proveCalendar(s, Not(EqualTo(g, Literal(v))))
      case In(g, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.collect { case Literal(v, _) if v != null => intLit(v) }
        if (vs.isEmpty) return Some(false) // only-null IN list matches nothing
        if (vs.exists(_.isEmpty)) return None
        val set = vs.flatten.toSet
        withImage(g) { (img, nulls) =>
          if ((img & set).isEmpty) Some(false)
          else if (img.subsetOf(set) && nulls == 0L) Some(true)
          else None
        }
      case GreaterThan(g, Literal(v, _)) if v != null => calCmp(s, g, v, 1, strict = true)
      case GreaterThan(Literal(v, _), g) if v != null => calCmp(s, g, v, -1, strict = true)
      case GreaterThanOrEqual(g, Literal(v, _)) if v != null => calCmp(s, g, v, 1, strict = false)
      case GreaterThanOrEqual(Literal(v, _), g) if v != null => calCmp(s, g, v, -1, strict = false)
      case LessThan(g, Literal(v, _)) if v != null => calCmp(s, g, v, -1, strict = true)
      case LessThan(Literal(v, _), g) if v != null => calCmp(s, g, v, 1, strict = true)
      case LessThanOrEqual(g, Literal(v, _)) if v != null => calCmp(s, g, v, -1, strict = false)
      case LessThanOrEqual(Literal(v, _), g) if v != null => calCmp(s, g, v, 1, strict = false)
      case _ => None
    }
  }

  /** `g <cmp> v` with dir = 1 meaning g must be ABOVE v (mirrors
   * [[proveCmp]]), proved from the calendar image's extremes. String
   * literals dispatch to the date_format bound proof. */
  private def calCmp(
      s: Stats, g: Expression, v: Any, dir: Int, strict: Boolean): Option[Boolean] = {
    val lit: Int = v match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long if l.longValue() == l.intValue() => l.intValue()
      case us: UTF8String => return dateFormatCmp(s, g, us, dir, strict)
      case _ => return None
    }
    calendarImage(s, g).flatMap { case (colName, img) =>
      s.nulls.get(colName).flatMap { nulls =>
        if (img.isEmpty) return Some(false)
        val inner = if (dir > 0) img.min else img.max // closest to failing
        val outer = if (dir > 0) img.max else img.min
        val ci = Integer.compare(inner, lit)
        val co = Integer.compare(outer, lit)
        val allMatch = (if (strict) ci * dir > 0 else ci * dir >= 0) && nulls == 0L
        val noneMatch = if (strict) co * dir <= 0 else co * dir < 0
        if (allMatch) Some(true) else if (noneMatch) Some(false) else None
      }
    }
  }

  /** Tri-state proof for `date_format(col, fmt) <cmp> 'literal'` with
   * dir = 1 meaning the output must be ABOVE the literal.
   * [[DerivedPredicates]] gates these ranges off GLOBALLY because
   * formatted strings sort chronologically only within 4-digit
   * non-negative years (year ≥ 10000 prints "+10000-…", which sorts
   * below every digit-led string; year ≤ 0 prints year-of-era forms) —
   * but per FILE the min/max prove whether the hazard is reachable:
   * when both bound dates sit in years [1, 9999], every output this
   * file can produce is a fixed-width digit string whose UTF-8 order
   * equals chronological order, so [fmt(min), fmt(max)] bounds the
   * outputs and the usual inner/outer-extreme argument applies. Any
   * file that CAN reach the unordered years yields None (kept /
   * undecided), preserving the global gate's conservatism. */
  private def dateFormatCmp(
      s: Stats, g: Expression, lit: UTF8String, dir: Int, strict: Boolean): Option[Boolean] =
    dateFormatBounds(s, g).flatMap { case (colName, loS, hiS) =>
      s.nulls.get(colName).flatMap { nulls =>
        val (inner, outer) = if (dir > 0) (loS, hiS) else (hiS, loS)
        val ci = Integer.signum(UTF8String.fromString(inner).compareTo(lit))
        val co = Integer.signum(UTF8String.fromString(outer).compareTo(lit))
        val allMatch = (if (strict) ci * dir > 0 else ci * dir >= 0) && nulls == 0L
        val noneMatch = if (strict) co * dir <= 0 else co * dir < 0
        if (allMatch) Some(true) else if (noneMatch) Some(false) else None
      }
    }

  /** (column name, fmt(min), fmt(max)) for the recognized date_format
   * shapes over a DATE/TIMESTAMP column, valid ONLY when both bound
   * dates land in years [1, 9999] (see [[dateFormatCmp]]); the three
   * patterns are prefixes of the ISO date, built digit-exact without
   * the formatter. None for unrecognized shapes, missing stats,
   * unresolvable zones, or out-of-window years. */
  private def dateFormatBounds(s: Stats, g: Expression): Option[(String, String, String)] = {
    import java.time.LocalDate
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    g match {
      case DateFormatClass(inner, Literal(fmt: UTF8String, _), tz) =>
        val cut = fmt.toString match {
          case "yyyy-MM-dd" => 10
          case "yyyy-MM" => 7
          case "yyyy" => 4
          case _ => return None
        }
        def bigDec(m: Map[String, Any], col: String): Option[BigDecimal] =
          m.get(col).collect { case b: BigDecimal => b }
        def dateBounds(a: AttributeReference): Option[(String, LocalDate, LocalDate)] =
          for {
            mn <- bigDec(s.mins, a.name); mx <- bigDec(s.maxs, a.name)
            lo <- scala.util.Try(LocalDate.ofEpochDay(mn.toLongExact)).toOption
            hi <- scala.util.Try(LocalDate.ofEpochDay(mx.toLongExact)).toOption
          } yield (a.name, lo, hi)
        val range: Option[(String, LocalDate, LocalDate)] = inner match {
          case a: AttributeReference if a.dataType == DateType => dateBounds(a)
          // ts column: micros → local date in the format's zone
          // (monotone), NTZ reads its wall clock directly
          case a: AttributeReference
              if a.dataType == TimestampType || a.dataType == TimestampNTZType =>
            val toLocal: Long => LocalDate =
              if (a.dataType == TimestampNTZType) { micros =>
                java.time.LocalDateTime.ofEpochSecond(
                  Math.floorDiv(micros, 1000000L),
                  (Math.floorMod(micros, 1000000L) * 1000L).toInt,
                  java.time.ZoneOffset.UTC).toLocalDate
              } else {
                val zone = tz.flatMap(z => scala.util.Try(
                  org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(z))
                  .toOption).getOrElse(return None)
                micros => java.time.Instant.ofEpochSecond(
                  Math.floorDiv(micros, 1000000L),
                  Math.floorMod(micros, 1000000L) * 1000L).atZone(zone).toLocalDate
              }
            for {
              mn <- bigDec(s.mins, a.name); mx <- bigDec(s.maxs, a.name)
              lo <- scala.util.Try(toLocal(mn.toLongExact)).toOption
              hi <- scala.util.Try(toLocal(mx.toLongExact)).toOption
            } yield (a.name, lo, hi)
          // date column behind the analyzer's date→timestamp cast: cast
          // zone and format zone must agree (both the session zone in
          // analyzed plans) or start-of-day could shift the local date
          case c: Cast if c.child.isInstanceOf[AttributeReference] &&
              c.child.dataType == DateType &&
              (c.dataType == TimestampNTZType || c.timeZoneId == tz) =>
            dateBounds(c.child.asInstanceOf[AttributeReference])
          case _ => None
        }
        range.flatMap { case (n, lo, hi) =>
          if (lo.getYear < 1 || hi.getYear > 9999) None
          else {
            def iso(d: LocalDate): String =
              f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"
            Some((n, iso(lo).substring(0, cut), iso(hi).substring(0, cut)))
          }
        }
      case _ => None
    }
  }

  /** (underlying column name, exact image of the calendar function over
   * the file's [min, max] date range). The range covers every date a
   * row could hold, so the image is a superset of the achieved outputs
   * — sound for both proof directions. None for unrecognized shapes,
   * missing stats, or unresolvable zones. */
  private def calendarImage(s: Stats, g: Expression): Option[(String, Set[Int])] = {
    import java.time.LocalDate
    // the date-valued child: a DATE attribute, or the analyzer's
    // cast(ts AS date) over a timestamp attribute (zone-resolved)
    def dateRange(child: Expression): Option[(String, LocalDate, LocalDate)] = {
      def bigDec(m: Map[String, Any], col: String): Option[BigDecimal] =
        m.get(col).collect { case b: BigDecimal => b }
      child match {
        case a: AttributeReference if a.dataType == org.apache.spark.sql.types.DateType =>
          for {
            mn <- bigDec(s.mins, a.name); mx <- bigDec(s.maxs, a.name)
            lo <- scala.util.Try(LocalDate.ofEpochDay(mn.toLongExact)).toOption
            hi <- scala.util.Try(LocalDate.ofEpochDay(mx.toLongExact)).toOption
          } yield (a.name, lo, hi)
        case c: Cast if c.dataType == org.apache.spark.sql.types.DateType =>
          c.child match {
            case a: AttributeReference
                if a.dataType == org.apache.spark.sql.types.TimestampType ||
                  a.dataType == org.apache.spark.sql.types.TimestampNTZType =>
              val toLocal: Long => LocalDate =
                if (a.dataType == org.apache.spark.sql.types.TimestampNTZType) { micros =>
                  java.time.LocalDateTime.ofEpochSecond(
                    Math.floorDiv(micros, 1000000L),
                    (Math.floorMod(micros, 1000000L) * 1000L).toInt,
                    java.time.ZoneOffset.UTC).toLocalDate
                } else {
                  val zone = c.timeZoneId.flatMap(z => scala.util.Try(
                    org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(z))
                    .toOption).getOrElse(return None)
                  micros => java.time.Instant.ofEpochSecond(
                    Math.floorDiv(micros, 1000000L),
                    Math.floorMod(micros, 1000000L) * 1000L).atZone(zone).toLocalDate
                }
              for {
                mn <- bigDec(s.mins, a.name); mx <- bigDec(s.maxs, a.name)
                lo <- scala.util.Try(toLocal(mn.toLongExact)).toOption
                hi <- scala.util.Try(toLocal(mx.toLongExact)).toOption
              } yield (a.name, lo, hi)
            case _ => None
          }
        case _ => None
      }
    }
    // step the range unit-wise with a full-period short-circuit; spans
    // are a few steps for date-clustered files, bounded always
    def enumerate(
        lo: LocalDate, hi: LocalDate,
        step: LocalDate => LocalDate, f: LocalDate => Int,
        full: => Set[Int], fullAfterDays: Long): Set[Int] = {
      if (hi.toEpochDay - lo.toEpochDay >= fullAfterDays) full
      else {
        val out = Set.newBuilder[Int]
        var d = lo
        while (!d.isAfter(hi)) { out += f(d); d = step(d) }
        out += f(hi) // the last partial step still covers hi
        out.result()
      }
    }
    g match {
      case Month(child) => dateRange(child).map { case (n, lo, hi) =>
        (n, enumerate(lo, hi, _.plusMonths(1).withDayOfMonth(1), _.getMonthValue,
          (1 to 12).toSet, 366L))
      }
      case Quarter(child) => dateRange(child).map { case (n, lo, hi) =>
        (n, enumerate(lo, hi, _.plusMonths(3).withDayOfMonth(1),
          d => (d.getMonthValue - 1) / 3 + 1, (1 to 4).toSet, 366L))
      }
      case DayOfMonth(child) => dateRange(child).map { case (n, lo, hi) =>
        (n, enumerate(lo, hi, _.plusDays(1), _.getDayOfMonth, (1 to 31).toSet, 31L))
      }
      // Spark: dayofweek is 1 = Sunday … 7 = Saturday
      case DayOfWeek(child) => dateRange(child).map { case (n, lo, hi) =>
        (n, enumerate(lo, hi, _.plusDays(1),
          d => d.getDayOfWeek.getValue % 7 + 1, (1 to 7).toSet, 7L))
      }
      // Spark: weekday is 0 = Monday … 6 = Sunday
      case WeekDay(child) => dateRange(child).map { case (n, lo, hi) =>
        (n, enumerate(lo, hi, _.plusDays(1),
          d => d.getDayOfWeek.getValue - 1, (0 to 6).toSet, 7L))
      }
      case _ => None
    }
  }

  /** All-rows / no-rows proof for `col <cmp> v`, where `dir` = 1 means
   * the column must be ABOVE the literal. TRUE-proofs additionally need
   * a zero null count (NULL compares UNKNOWN). NaN rides [[cmp]]'s
   * total-order handling: a NaN max proves `col > v` can still match,
   * and NaN rows themselves compare above every literal, exactly like
   * Spark's comparison operators. */
  private def proveCmp(
      s: Stats,
      colName: String,
      v: Any,
      dir: Int,
      strict: Boolean): Option[Boolean] = {
    if (v == null) return Some(false) // comparison with NULL is UNKNOWN for all rows
    val nulls = s.nulls.get(colName).getOrElse(return None)
    if (nulls == s.numRecords) return Some(false)
    val mn = s.mins.get(colName).getOrElse(return None)
    val mx = s.maxs.get(colName).getOrElse(return None)
    val (inner, outer) = if (dir > 0) (mn, mx) else (mx, mn)
    // inner = the extreme CLOSEST to failing (min for >, max for <)
    (cmp(inner, v), cmp(outer, v)) match {
      case (Some(ci), Some(co)) =>
        val allMatch = (if (strict) ci * dir > 0 else ci * dir >= 0) && nulls == 0L
        val noneMatch = if (strict) co * dir <= 0 else co * dir < 0
        if (allMatch) Some(true) else if (noneMatch) Some(false) else None
      case _ => None
    }
  }

  private def proveEq(
      s: Stats, colName: String, v: Any,
      dt: org.apache.spark.sql.types.DataType): Option[Boolean] = {
    if (v == null) return Some(false)
    // bloom says definitely-absent → no row matches, even when min/max
    // can't decide (the high-cardinality case blooms exist for)
    if (bloomAbsent(s, colName, v, dt)) return Some(false)
    val nulls = s.nulls.get(colName).getOrElse(return None)
    if (nulls == s.numRecords) return Some(false)
    val mn = s.mins.get(colName).getOrElse(return None)
    val mx = s.maxs.get(colName).getOrElse(return None)
    (cmp(mn, v), cmp(mx, v)) match {
      case (Some(a), Some(b)) =>
        // all-rows-equal needs both sides EXACT: a truncated bound
        // equal to v cannot witness that v is an actual row value
        // (unreachable with this collector's bounds — a truncated min
        // forces max > min — but cheap insurance against drift)
        if (a == 0 && b == 0 && nulls == 0L &&
          !s.isInexact(colName, isMin = true) &&
          !s.isInexact(colName, isMin = false)) Some(true)
        else if (a > 0 || b < 0) Some(false)
        else None
      case _ => None
    }
  }

  /** Missing min/max is only decisive when the column is tracked and
   * entirely null (string columns with invalid UTF-8 drop min/max but
   * keep nullCount < numRecords, so they stay conservative; truncated
   * oversized values keep bounds, marked in `inexact`). */
  private def allNull(s: Stats, col: String): Boolean =
    s.nulls.get(col).contains(s.numRecords)

  private def containsValue(
      s: Stats, col: String, v: Any, dt: org.apache.spark.sql.types.DataType): Boolean = {
    if (v == null) return false // EqualTo(col, null) matches nothing
    if (allNull(s, col)) return false
    if (bloomAbsent(s, col, v, dt)) return false
    (s.mins.get(col), s.maxs.get(col)) match {
      case (Some(mn), Some(mx)) =>
        (cmp(mn, v), cmp(mx, v)) match {
          case (Some(a), Some(b)) => a <= 0 && b >= 0
          case _ => true
        }
      case _ => true
    }
  }

  /** True iff the file HAS a bloom filter for `col` and it proves the
   * value absent (no false negatives: every non-null value written was
   * inserted under the same xxhash64 key). Missing filter, unhashable
   * literal, or any error keeps the file. */
  private def bloomAbsent(
      s: Stats, col: String, v: Any, dt: org.apache.spark.sql.types.DataType): Boolean =
    try s.blooms.get(col) match {
      case Some(b) =>
        bloomKey(v, dt) match {
          case Some(h) => !graft.expressions.BloomImpl.mightContain(b.words, h, b.k)
          case None => false
        }
      case None => false
    } catch { case scala.util.control.NonFatal(_) => false }

  /** The write side inserts `xxhash64(col)` (seed 42, Catalyst
   * semantics); hash the probe literal through the same expression so
   * write and read agree bit-for-bit on every type. -0.0 and float NaN
   * payloads normalize to the canonical forms Spark's UnsafeRow writers
   * store, so an odd literal spelling can never cause a false skip. */
  private def bloomKey(
      v: Any, dt: org.apache.spark.sql.types.DataType): Option[Long] =
    try {
      val norm: Any = v match {
        case d: java.lang.Double =>
          if (java.lang.Double.isNaN(d)) java.lang.Double.valueOf(Double.NaN)
          else if (d.doubleValue() == 0.0) java.lang.Double.valueOf(0.0)
          else d
        case f: java.lang.Float =>
          if (java.lang.Float.isNaN(f)) java.lang.Float.valueOf(Float.NaN)
          else if (f.floatValue() == 0.0f) java.lang.Float.valueOf(0.0f)
          else f
        case other => other
      }
      new XxHash64(Seq(Literal(norm, dt))).eval(null) match {
        case l: java.lang.Long => Some(l.longValue())
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def maxAbove(s: Stats, col: String, v: Any, strict: Boolean): Boolean = {
    if (v == null) return false
    if (allNull(s, col)) return false
    s.maxs.get(col) match {
      case Some(mx) => cmp(mx, v) match {
        case Some(c) => if (strict) c > 0 else c >= 0
        case None => true
      }
      case None => true
    }
  }

  private def minBelow(s: Stats, col: String, v: Any, strict: Boolean): Boolean = {
    if (v == null) return false
    if (allNull(s, col)) return false
    s.mins.get(col) match {
      case Some(mn) => cmp(mn, v) match {
        case Some(c) => if (strict) c < 0 else c <= 0
        case None => true
      }
      case None => true
    }
  }

  /** Every string with prefix `p` sorts ≥ p, so `max < p` proves no
   * match. The upper side has no safe bound without Delta-style
   * truncation markers (non-BMP suffixes can sort above any BMP
   * sentinel in UTF-8 byte order), so only the lower check prunes. */
  private def prefixOverlaps(s: Stats, col: String, p: String): Boolean = {
    if (allNull(s, col)) return false
    s.maxs.get(col) match {
      case Some(mx: String) =>
        UTF8String.fromString(mx).compareTo(UTF8String.fromString(p)) >= 0
      case _ => true
    }
  }

  /** Non-finite double stats can't be JSON numbers; the collector
   * writes these sentinels instead (FileStatsCollector.toJson — the
   * single other site that must agree on the spellings; MetadataCountRule
   * decodes through here). Only consulted when the context proves the
   * column is floating (a Float/Double literal, or a known-floating
   * column type), so a STRING column whose data happens to contain
   * "NaN" is never misread. */
  def nonFinite(s: String): Option[Double] = s match {
    case "NaN" => Some(Double.NaN)
    case "Infinity" => Some(Double.PositiveInfinity)
    case "-Infinity" => Some(Double.NegativeInfinity)
    case _ => None
  }

  private def isFloating(v: Any): Boolean =
    v.isInstanceOf[java.lang.Float] || v.isInstanceOf[java.lang.Double]

  /** Spark's total order for doubles: -Inf < finite < +Inf < NaN,
   * NaN == NaN, -0.0 == 0.0 (the semantics of Spark's
   * nanSafeCompareDoubles, re-stated here because that helper is not
   * public API). */
  def nanCmp(a: Double, b: Double): Int =
    if (java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b)) 0
    else if (java.lang.Double.isNaN(a)) 1
    else if (java.lang.Double.isNaN(b)) -1
    else if (a < b) -1
    else if (a > b) 1
    else 0

  /** Stats value vs Catalyst literal; None = incomparable (keep file).
   * Numeric stats are BigDecimal; literals funnel through the same
   * binary-exact conversions the collector used, so equality on
   * boundaries is preserved. Non-finite values (either side) compare in
   * Spark's double total order — the sign alone decides, so the finite
   * side's BigDecimal→Double rounding can't flip an outcome. */
  private def cmp(stat: Any, lit: Any): Option[Int] = (stat, lit) match {
    case (a: String, b) if isFloating(b) =>
      nonFinite(a).map(d => nanCmp(d, b.asInstanceOf[java.lang.Number].doubleValue()))
    case (a: BigDecimal, b) if isFloating(b) &&
        !java.lang.Double.isFinite(b.asInstanceOf[java.lang.Number].doubleValue()) =>
      // finite stat vs NaN/±Inf literal: position decided by the literal
      Some(nanCmp(0.0, b.asInstanceOf[java.lang.Number].doubleValue()))
    case (a: BigDecimal, b: java.lang.Number) => b match {
      case v: java.lang.Byte => Some(a.compare(BigDecimal(v.longValue())))
      case v: java.lang.Short => Some(a.compare(BigDecimal(v.longValue())))
      case v: java.lang.Integer => Some(a.compare(BigDecimal(v.longValue())))
      case v: java.lang.Long => Some(a.compare(BigDecimal(v.longValue())))
      case v: java.lang.Float => Some(a.compare(BigDecimal(v.doubleValue())))
      case v: java.lang.Double => Some(a.compare(BigDecimal(v.doubleValue())))
      case _ => None
    }
    case (a: BigDecimal, b: org.apache.spark.sql.types.Decimal) =>
      Some(a.compare(b.toBigDecimal))
    // UTF8String order is UTF-8 byte order (= code-point order), which
    // differs from String's UTF-16 order for non-BMP chars — compare in
    // the same space the collector used
    case (a: String, b: UTF8String) => Some(UTF8String.fromString(a).compareTo(b))
    case (a: Boolean, b: java.lang.Boolean) => Some(a.compareTo(b.booleanValue()))
    case _ => None
  }

}
