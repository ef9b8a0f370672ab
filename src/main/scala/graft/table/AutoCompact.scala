package graft.table


import org.apache.spark.sql.SparkSession

/**
 * Post-commit small-file compaction (Delta's `autoCompact` table
 * property, re-expressed over the qbeast layout): a write with
 * `option("autoCompact", "true")` — or into a table that persisted the
 * property — checks, AFTER its commit, whether enough small files have
 * accumulated and folds them with a targeted layout-only
 * [[QbeastTable.optimizeFiles]] rewrite (dataChange = false, so
 * streaming readers skip it). This is the antidote to streaming
 * ingest's thousand-tiny-files failure mode: each micro-batch commits
 * a few small files; every `minNumFiles`-th batch pays one bounded
 * compaction instead of the table degrading until a manual OPTIMIZE.
 *
 * Knobs (session conf):
 *  - `spark.qbeast.autoCompact.minNumFiles` (default 24): small files
 *    required before a compaction triggers — below it the rewrite
 *    would churn more than it saves.
 *  - `spark.qbeast.autoCompact.smallFileSize` (default 32 MiB): files
 *    at or above this size are left alone.
 *
 * Scale shape: the trigger check is a driver fold over file metadata
 * already in the snapshot; the rewrite reads only the small files, and
 * a PROGRESS GUARD in [[QbeastTable.compactSmallFiles]] skips any
 * trigger that would not at least halve the file count — files already
 * at their natural rollup size are never re-rewritten, so steady state
 * is one bounded compaction per ~minNumFiles commits, not a quadratic
 * rewrite of an ever-growing "small" set. Concurrent appends are safe
 * — the rewrite commits through the rebase loop, and a lost race just
 * leaves the smalls for the next trigger.
 */
object AutoCompact {

  def compactSmallFiles(spark: SparkSession, tablePath: String): Unit = {
    val minNumFiles = spark.conf
      .getOption("spark.qbeast.autoCompact.minNumFiles").map(_.toInt).getOrElse(24)
    val smallFileSize = spark.conf
      .getOption("spark.qbeast.autoCompact.smallFileSize").map(_.toLong)
      .getOrElse(32L * 1024 * 1024)
    require(minNumFiles > 1, s"autoCompact.minNumFiles must be > 1, got $minNumFiles")
    QbeastTable.forPath(spark, tablePath)
      .compactSmallFiles(smallFileSize, minNumFiles)
  }

}
