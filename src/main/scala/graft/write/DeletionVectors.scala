package graft.write

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path


/**
 * Deletion-vector storage: merge-on-read row-level DELETE (Delta's
 * deletion vectors, re-expressed over the qlog). Instead of rewriting a
 * whole file to drop a few rows, a DELETE writes a small sidecar of the
 * file's deleted ROW INDEXES under `_deletion_vectors/` and commits one
 * `dv` log action per masked file; readers filter masked rows out via
 * `_metadata.row_index` (see [[graft.expressions.DvRowDeleted]] and
 * `rules/DvMaskRule`). A rewrite of the file (optimize, compaction, a
 * later copy-on-write DML) materializes the deletes and clears the mask
 * (log replay drops a dv attachment on add/remove of its data file).
 *
 * Opt-in per table (`deletionVectors` write option, persisted like a
 * table property): the default copy-on-write path stays untouched.
 *
 * Format (version byte + count + sorted int64 indexes, little-endian):
 * simple, splittable by binary search, and immutable — a new DELETE on
 * an already-masked file writes a NEW vector containing the union and
 * replaces the attachment; the old vector expires through vacuum like a
 * removed data file. At 100 TB the vectors are metadata-scale: a
 * million masked rows cost 8 MB against the multi-GB file they'd
 * otherwise rewrite.
 */
object DeletionVectors {

  val DirName = "_deletion_vectors"

  /** Table property / write option enabling merge-on-read DELETE. */
  val PropertyKey = "qbeast.deletionVectors"

  /** DELETE falls back to copy-on-write when the post-delete masked
   * fraction of ANY affected file would exceed this (a mostly-deleted
   * file is cheaper to rewrite than to keep masking). */
  val MaxMaskedFraction = 0.5

  private val Magic: Byte = 1

  def enabled(configuration: Map[String, String]): Boolean =
    configuration.get(PropertyKey).contains("true")

  /** Write a vector of sorted, distinct row indexes; returns the
   * table-relative path. Callers pass indexes already sorted (the
   * writer aggregates them with `sort_array`); enforced here because a
   * misordered vector would silently break the reader's binary search. */
  def write(tablePath: String, conf: Configuration, indexes: Array[Long]): String = {
    require(indexes.nonEmpty, "empty deletion vector")
    var i = 1
    while (i < indexes.length) {
      require(indexes(i - 1) < indexes(i), "deletion vector must be sorted distinct")
      i += 1
    }
    val rel = s"$DirName/dv-${java.util.UUID.randomUUID()}.bin"
    val target = new Path(tablePath, rel)
    val fs = target.getFileSystem(conf)
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 * indexes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic)
    bb.putInt(indexes.length)
    indexes.foreach(bb.putLong)
    val out = fs.create(target, false)
    try out.write(bb.array()) finally out.close()
    rel
  }

  /** Read a vector (sorted row indexes). Fails loudly on a bad magic or
   * truncation — a half-read mask would silently resurrect rows. */
  def read(tablePath: String, conf: Configuration, dvPath: String): Array[Long] = {
    val p = new Path(tablePath, dvPath)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, bytes) finally in.close()
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == Magic, s"bad deletion vector magic in $dvPath")
    val n = bb.getInt
    require(bytes.length == 1 + 4 + 8L * n, s"truncated deletion vector $dvPath")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  /** Union of two sorted-distinct index arrays (new DELETE over an
   * already-masked file). */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c < 0) { out(k) = a(i); i += 1 }
      else if (c > 0) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  /** Is sorted-distinct `a` a subset of sorted-distinct `b`? Driver-side
   * grow-only test for the change-feed replay: every ordinary DML
   * commit only ever GROWS a file's vector (union of the old mask and
   * the new deletes), so `old ⊆ new` proves the resurrect (insert) side
   * of a vector delta empty without scanning the data file. Only a
   * RESTORE that reset a vector to an earlier, smaller state fails the
   * test. O(|b|) merge walk over the cached arrays. */
  def subsetOf(a: Array[Long], b: Array[Long]): Boolean = {
    if (a.length > b.length) return false
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { i += 1; j += 1 }
      else if (c > 0) j += 1
      else return false
    }
    i == a.length
  }

  /** Apply the table's deletion-vector mask to a DataFrame reading its
   * data files (any file-source frame — the `_metadata` columns resolve
   * through the analyzer). No-op when the snapshot has no vectors. Used
   * by every INTERNAL reader (DML passes, rewrites, CDC diffs) so their
   * correctness never depends on the session having `DvMaskRule`
   * registered; user-facing scans are wrapped by the rule. */
  def mask(
      snap: graft.log.QbeastSnapshot,
      conf: Configuration,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    maskWith(snap.tablePath,
      snap.dvs.map { case (p, i) => new Path(p).getName -> i.dvPath }, conf, df)

  /** [[mask]] with an explicit basename→vector map — for readers pinned
   * to a dv state other than a snapshot's head (the streaming source
   * masks snapshot-phase files with the STREAM-START vectors; appended
   * files are never in that map, so they pass untouched). */
  def maskWith(
      tablePath: String,
      dvByName: Map[String, String],
      conf: Configuration,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    if (dvByName.isEmpty) return df
    df.filter(org.apache.spark.sql.functions.not(probeCol(tablePath, dvByName, conf)))
  }

  /** The raw is-this-row-masked probe as a Column (TRUE = covered by a
   * vector in `dvByName`). [[maskWith]] filters on its negation; the
   * change-feed replay combines new/old probes to isolate the rows one
   * dv commit newly masked. Driver-only (builds a broadcast). */
  def probeCol(
      tablePath: String,
      dvByName: Map[String, String],
      conf: Configuration): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    val shims = org.apache.spark.sql.GraftShims
    val spark = org.apache.spark.sql.SparkSession.active
    shims.column(graft.expressions.DvRowDeleted(
      shims.expression(col("_metadata.file_path")),
      shims.expression(col("_metadata.row_index")),
      tablePath, broadcastFor(spark, tablePath, dvByName),
      new org.apache.spark.util.SerializableConfiguration(conf)))
  }

  // ---- driver-side broadcast cache -----------------------------------
  // The mask map is O(#masked files); embedding it in the expression
  // would ship it with every stage and deserialize it per task. One
  // broadcast per (table, dv state) instead: fetched once per executor,
  // reused across the queries that run against that state. Keyed by
  // (table, state hash) so replay surfaces that alternate between two
  // states of the same table (the CDF 'v' branch probes state-at-v and
  // state-at-(v-1) per commit) hold both hot instead of thrashing one
  // slot. Each entry pins the SparkContext that built it: a broadcast
  // outliving its (stopped) context would fail at execution, so a
  // context change is a cache miss, never an error. LRU eviction (a
  // workload cycling through >MaxBcEntries dv states keeps its hot
  // entries instead of wiping everything at once), and the evicted or
  // replaced broadcast is unpersisted non-blocking — safe because a
  // plan still holding it just re-fetches the blocks on demand — so
  // executor memory is not left to ContextCleaner GC timing alone.
  private val bcCache = new graft.core.LruCache[
    String,
    (org.apache.spark.SparkContext, Map[String, String],
      org.apache.spark.broadcast.Broadcast[Map[String, String]])](
    MaxBcEntries, onEvict = (_, v) => unpersistQuietly(v._1, v._3))
  private def MaxBcEntries = 64

  /** Release the broadcast's executor blocks if its context is still
   * alive; never lets a teardown race fail the caller's query. */
  private def unpersistQuietly(
      sc: org.apache.spark.SparkContext,
      bc: org.apache.spark.broadcast.Broadcast[_]): Unit =
    try { if (!sc.isStopped) bc.unpersist(blocking = false) }
    catch { case _: Exception => () }

  def broadcastFor(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      dvByName: Map[String, String])
      : org.apache.spark.broadcast.Broadcast[Map[String, String]] = {
    val sc = spark.sparkContext
    val key = s"$tablePath#${dvByName.hashCode}"
    bcCache.get(key) match {
      case Some(hit) if (hit._1 eq sc) && !sc.isStopped && hit._2 == dvByName =>
        return hit._3
      case _ =>
    }
    // create OUTSIDE the cache lock: sc.broadcast does BlockManager
    // I/O, and holding the shared monitor across it would serialize
    // every concurrent planner's unrelated cache hit behind it
    val bc = sc.broadcast(dvByName)
    // a replaced entry (lost race / hash collision / restarted
    // context) is dead weight on the executors the moment the new
    // broadcast exists; unpersist is non-blocking and re-fetchable, so
    // a racer that already handed the loser out stays correct
    bcCache.put(key, (sc, dvByName, bc))
      .foreach(prev => if (!(prev._3 eq bc)) unpersistQuietly(prev._1, prev._3))
    bc
  }

  // ---- executor-side vector cache ------------------------------------
  // The mask expression probes per ROW; vectors are loaded once per
  // (table, dvPath) per JVM and shared across tasks — so this lookup
  // runs once per (file, partition), never per row, and a synchronized
  // LRU is cheap. Bounded because new DELETEs mint NEW dv paths: the
  // map would otherwise grow for the life of a long executor; LRU keeps
  // the vectors of the tables currently being scanned hot instead of
  // wiping all of them on overflow.
  private val cache = new graft.core.LruCache[String, Array[Long]](10000)

  def cached(tablePath: String, conf: Configuration, dvPath: String): Array[Long] = {
    val key = s"$tablePath#$dvPath"
    cache.get(key) match {
      case Some(hit) => hit
      case None =>
        val loaded = read(tablePath, conf, dvPath) // I/O outside the lock
        cache.put(key, loaded)
        loaded
    }
  }

}
