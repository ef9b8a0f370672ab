package graft.write

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.Locale

/**
 * Generated columns — Delta Lake's `GENERATED ALWAYS AS (expr)`
 * semantics over the qbeast log (the reference has no equivalent; its
 * schema is whatever the written frame carries).
 *
 * A generated column is a STORED table column whose value is defined by
 * a SQL expression over the row's other columns:
 *
 *  - a write that OMITS the column gets it computed per row;
 *  - a write that SUPPLIES the column is enforced per row
 *    (`col <=> expr`, null-safe — a mismatching value fails the write
 *    exactly like a CHECK constraint, through the same in-task
 *    enforcement path);
 *  - UPDATE/MERGE may not assign the column directly; row-modifying
 *    clauses RECOMPUTE it after the other assignments apply, so a
 *    change to a referenced column can never leave a stale value.
 *
 * Because the column is physically stored, everything downstream is
 * ordinary: per-file min/max stats, bloom/HLL/KLL sketches, OTree
 * indexing (a generated column is a legal `columnsToIndex` entry —
 * e.g. derive `event_date` from a timestamp and organize the table by
 * it), CDF images, time travel and streaming all see a normal column.
 * At 100 TB that is the point: the derivation runs once at ingest,
 * map-side and codegen'd, instead of in every reader.
 *
 * Definitions live in the table configuration as
 * `qbeast.generatedColumns.<name> = <exprSql>` (the CHECK-constraint
 * property discipline), written at table creation — first write or an
 * `overwriteSchema=true` replace — via the `generatedColumns` option
 * (`name:expr[;name:expr...]`) or passthrough
 * `qbeast.generatedColumns.*` properties (the CTAS/TBLPROPERTIES
 * path). Expressions are stored in LOGICAL column names; evaluation
 * happens on logical-named frames, and the per-row enforcement SQL is
 * translated like any constraint under column mapping. Definitions
 * cannot be added to a table that already has data (existing rows
 * would not satisfy them — Delta refuses the same way).
 *
 * Expression rules (validated at definition time): deterministic, no
 * aggregates/subqueries, no time/session-dependent functions, and no
 * references to other generated columns.
 */
object GeneratedColumns {

  val Prefix = "qbeast.generatedColumns."
  val OptionName = "generatedColumns"

  private def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  /** name → generation SQL recorded in the table configuration. */
  def of(configuration: Map[String, String]): Map[String, String] =
    configuration.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }

  /** Parse the compact `name:expr;name:expr` option value (the name is
   * everything before the FIRST ':'; expressions may contain ':' in
   * literals). */
  def parseOption(value: String): Map[String, String] =
    value.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { entry =>
      val i = entry.indexOf(':')
      require(i > 0 && i < entry.length - 1,
        s"generatedColumns entry '$entry' must have the form name:expression")
      val name = entry.substring(0, i).trim
      val sql = entry.substring(i + 1).trim
      require(name.nonEmpty && sql.nonEmpty &&
        name.forall(c => c.isLetterOrDigit || c == '_'),
        s"generatedColumns entry '$entry': name must be alphanumeric and the " +
          "expression non-empty")
      name -> sql
    }.toMap

  /** Definitions carried by write options: the compact option plus
   * passthrough `qbeast.generatedColumns.*` keys (the TBLPROPERTIES
   * route through the catalog). */
  def fromOptions(extra: Map[String, String]): Map[String, String] = {
    val keyed = extra.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }
    val compact = extra.collectFirst {
      case (k, v) if k.equalsIgnoreCase(OptionName) => v
    }.map(parseOption).getOrElse(Map.empty[String, String])
    keyed ++ compact
  }

  /** The definitions a write runs under, plus whether they are being
   * DEFINED by this write (definition time validates the expressions).
   *
   *  - new table: the options define them;
   *  - `overwriteSchema=true` replace: explicit options redefine; with
   *    no options, existing definitions survive only for columns the
   *    new frame still carries (the replace may drop a generated
   *    column — its stale definition must die with it);
   *  - existing table otherwise: the persisted config applies; options
   *    that DIFFER are refused (existing rows were never validated
   *    against the new expression — Delta refuses retrofits the same
   *    way).
   */
  def resolveForWrite(
      extra: Map[String, String],
      tableConfig: Map[String, String],
      tableExists: Boolean,
      isSchemaReplace: Boolean,
      incoming: StructType,
      tableSchema: Option[StructType]): (Map[String, String], Boolean) = {
    val optioned = fromOptions(extra)
    val configured = of(tableConfig)
    if (!tableExists) (optioned, optioned.nonEmpty)
    else if (isSchemaReplace) {
      if (optioned.nonEmpty) (optioned, true)
      else {
        val have = incoming.fieldNames.map(lower).toSet
        (configured.filter { case (n, _) => have.contains(lower(n)) }, false)
      }
    } else {
      // the persisted config is the source of truth; option entries are
      // either consistent echoes (the catalog passes creation-time
      // TBLPROPERTIES on every write — possibly under a since-renamed
      // column name), or an illegal retrofit/redefinition
      val schemaNames = tableSchema.map(_.fieldNames.map(lower).toSet).getOrElse(Set.empty)
      optioned.foreach { case (n, sql) =>
        configured.find(_._1.equalsIgnoreCase(n)) match {
          case Some((_, csql)) if csql == sql => () // consistent echo
          case Some((cn, csql)) => throw new UnsupportedOperationException(
            s"generated column $cn is defined as ($csql) and cannot be " +
              s"redefined as ($sql) on a table that already has data. " +
              "Recreate the table (overwrite with overwriteSchema=true).")
          case None if !schemaNames.contains(lower(n)) &&
              !incoming.fieldNames.exists(_.equalsIgnoreCase(n)) &&
              tableSchema.exists(graft.core.model.ColumnMapping.isEnabled) =>
            // stale echo: the column was dropped or renamed away after
            // creation (both upgrade the table to column mapping — an
            // UNMAPPED table can have no stale echoes, so this arm
            // never swallows a genuine retrofit there), but the catalog
            // keeps replaying the creation options on every write — the
            // persisted config rules, and refusing here would brick
            // inserts after a legal DROP
            ()
          case None => throw new UnsupportedOperationException(
            s"generated column $n cannot be added to a table that already " +
              "has data (existing rows were never validated against the " +
              "expression). Recreate the table (overwrite with " +
              "overwriteSchema=true) to define it.")
        }
      }
      (configured, false)
    }
  }

  /** Validate definitions at definition time: parseable, deterministic,
   * no aggregates/subqueries/time functions, references resolve against
   * the incoming frame and never name another generated column. */
  def validateDefinitions(
      spark: SparkSession,
      df: DataFrame,
      gens: Map[String, String]): Unit = {
    val banned = Set("current_date", "current_timestamp", "now", "localtimestamp",
      "current_timezone", "rand", "randn", "random", "uuid", "shuffle",
      "monotonically_increasing_id", "input_file_name", "spark_partition_id",
      "session_user", "current_user", "user")
    val genNames = gens.keySet.map(lower)
    gens.foreach { case (name, sql) =>
      val parsed =
        try spark.sessionState.sqlParser.parseExpression(sql)
        catch { case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"generated column $name: cannot parse expression '$sql': ${e.getMessage}")
        }
      parsed.foreach {
        case f: UnresolvedFunction
          if banned.contains(lower(f.nameParts.last)) =>
          throw new IllegalArgumentException(
            s"generated column $name: expression '$sql' uses " +
              s"${f.nameParts.last}(), which is not deterministic across " +
              "writes — generated columns must derive from the row alone")
        case _ => ()
      }
      val refs = parsed.collect { case a: UnresolvedAttribute => a.nameParts.head }
      refs.find(r => genNames.contains(lower(r))).foreach { r =>
        throw new IllegalArgumentException(
          s"generated column $name: expression '$sql' references " +
            s"$r, which is itself generated — generation expressions may only " +
            "reference regular columns")
      }
      val analyzed =
        try df.select(expr(sql)).queryExecution.analyzed
        catch { case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"generated column $name: expression '$sql' does not resolve " +
              s"against the written schema: ${e.getMessage}")
        }
      require(!analyzed.exists(_.isInstanceOf[Aggregate]),
        s"generated column $name: expression '$sql' aggregates — generated " +
          "columns must be computed per row")
      require(analyzed.expressions.forall(e =>
        e.deterministic && !SubqueryExpression.hasSubquery(e)),
        s"generated column $name: expression '$sql' must be deterministic " +
          "and subquery-free")
    }
  }

  /** Apply the definitions to a frame about to be written: compute the
   * columns the frame omits (cast to the table's declared type when one
   * exists) and return the per-row enforcement checks for the columns
   * the frame SUPPLIES — (name, SQL) pairs ready to ride the CHECK
   * constraint path. */
  def prepare(
      df: DataFrame,
      gens: Map[String, String],
      tableSchema: Option[StructType]): (DataFrame, Seq[(String, String)]) = {
    if (gens.isEmpty) return (df, Nil)
    val present = df.columns.map(lower).toSet
    val ordered = gens.toSeq.sortBy(_._1)
    val checks = ordered.collect {
      case (name, sql) if present.contains(lower(name)) =>
        s"generated_$name" -> checkSql(name, sql, declaredType(tableSchema, name))
    }
    val out = ordered.foldLeft(df) {
      case (acc, (name, sql)) if !present.contains(lower(name)) =>
        declaredType(tableSchema, name) match {
          case Some(t) => acc.withColumn(name, expr(sql).cast(t))
          case None => acc.withColumn(name, expr(sql))
        }
      case (acc, _) => acc
    }
    (out, checks)
  }

  /** Per-row enforcement SQL for a supplied generated column: null-safe
   * equality against the (type-aligned) expression — TRUE passes, FALSE
   * violates, matching the write-side compute exactly. */
  private def checkSql(name: String, sql: String, t: Option[DataType]): String = {
    val rhs = t match {
      case Some(dt) => s"CAST(($sql) AS ${dt.sql})"
      case None => s"($sql)"
    }
    s"`$name` <=> $rhs"
  }

  private def declaredType(schema: Option[StructType], name: String): Option[DataType] =
    schema.flatMap(_.fields.find(_.name.equalsIgnoreCase(name))).map(_.dataType)

  /** Enforcement checks for DML-written row images (the
   * `constraintsFor` hook): every generated column of the table schema
   * is present in DML frames, so each one gets its check. */
  def checksFor(
      configuration: Map[String, String],
      schema: Option[StructType]): Seq[(String, String)] = {
    val gens = of(configuration)
    if (gens.isEmpty) Nil
    else gens.toSeq.sortBy(_._1).map { case (name, sql) =>
      s"generated_$name" -> checkSql(name, sql, declaredType(schema, name))
    }
  }

  /** Overwrite every generated column of `df` with its recomputed
   * value — applied to UPDATE/MERGE row images AFTER the user's
   * assignments, so base-column changes propagate (Delta recomputes the
   * same way). No-op without definitions. */
  def recompute(
      df: DataFrame,
      configuration: Map[String, String],
      schema: Option[StructType]): DataFrame = {
    val gens = of(configuration)
    if (gens.isEmpty) df
    else gens.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (name, sql)) =>
      declaredType(schema, name) match {
        case Some(t) => acc.withColumn(name, expr(sql).cast(t))
        case None => acc.withColumn(name, expr(sql))
      }
    }
  }

  /** Refuse an UPDATE/MERGE assignment that targets a generated column
   * (directly or through a struct field path) — the value is computed,
   * never assigned (Delta refuses identically). */
  def refuseAssignments(
      configuration: Map[String, String],
      assignedKeys: Iterable[String]): Unit = {
    val gens = of(configuration)
    if (gens.isEmpty) return
    assignedKeys.foreach { key =>
      val head = key.split('.').head
      gens.keys.find(_.equalsIgnoreCase(head)).foreach { g =>
        throw new UnsupportedOperationException(
          s"cannot assign generated column $g: it is always computed as " +
            s"(${gens(g)}). Assign the columns it references instead.")
      }
    }
  }

  /** Generated-column names whose EXPRESSION references `column`
   * (top-level attribute head match) — renames/drops/widens of such
   * columns are refused rather than silently breaking the derivation. */
  def referencing(
      spark: SparkSession,
      configuration: Map[String, String],
      column: String): Seq[String] =
    of(configuration).toSeq.collect {
      case (name, sql) if scala.util.Try {
        spark.sessionState.sqlParser.parseExpression(sql).collect {
          case a: UnresolvedAttribute => a.nameParts.head
        }.exists(_.equalsIgnoreCase(column))
      }.getOrElse(true) => name // unparseable (shouldn't happen) → conservative
    }

  /** True when `column` is itself a generated column. */
  def isGenerated(configuration: Map[String, String], column: String): Boolean =
    of(configuration).keys.exists(_.equalsIgnoreCase(column))

  /** Lowercased names whose TYPE must not change while the definitions
   * stand: the generated columns themselves and every column their
   * expressions reference (a widen could silently change the computed
   * value through the enforcement cast — refuse, like Delta). */
  def typeProtected(
      spark: SparkSession,
      gens: Map[String, String]): Set[String] =
    if (gens.isEmpty) Set.empty
    else gens.keySet.map(lower) ++ gens.values.flatMap { sql =>
      scala.util.Try {
        spark.sessionState.sqlParser.parseExpression(sql).collect {
          case a: UnresolvedAttribute => lower(a.nameParts.head)
        }
      }.getOrElse(Nil)
    }

}
