package graft.log

import graft.core.model._

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.SortedMap
import scala.collection.mutable

/**
 * Control-plane metadata jobs over the parquet file-checkpoint sidecar
 * (the write-side counterpart of [[graft.read.DistributedQbeastFileIndex]];
 * reference shape: `core/.../query/QueryExecutor.scala:44-93` runs the same
 * kind of Spark job over Delta's `Dataset[AddFile]`).
 *
 * Every method takes a LIGHT snapshot ([[QbeastLog.lightSnapshot]]): the
 * driver holds only revisions/config plus the post-checkpoint commit tail.
 * The consolidated file bulk is scanned by executors; only the *requested*
 * slice comes back — optimize candidates are O(selected), index statuses
 * are O(cubes), metrics are O(1) aggregates — never O(table files) of
 * driver memory. The (small, ≤ checkpoint-interval commits) tail is folded
 * in driver-side, exactly as the light read path does: tail-touched paths
 * mask their sidecar rows, tail adds contribute directly.
 */
object DistributedMetadata {

  // usable() is probed by the optimizer on EVERY global aggregate over
  // a light-snapshot table, once per fixpoint iteration — memoize the
  // sidecar exists() RPC per snapshot instance (same identity+path+
  // version key discipline as the fold memos in MetadataCountRule) so
  // plan-time cost is one filesystem round-trip per snapshot, not per
  // optimizer pass. A pinned snapshot whose sidecar is vacuumed mid-
  // lifetime would read a stale `true`, but every downstream job fails
  // loudly on the missing file rather than mis-answering.
  private val usableMemo = new graft.core.LruCache[(Int, String, Long), Boolean](256)

  /** Cleared alongside the snapshot cache and fold memos
   * ([[QbeastLog.invalidateCache]]) after out-of-band surgery. */
  private[graft] def invalidateUsableMemo(): Unit = usableMemo.clear()

  /** Can `snap` be served by these jobs right now? (Light replay AND the
   * sidecar still on disk — vacuum never prunes the newest sidecar, but a
   * pinned old snapshot can outlive its own.) Honors the read path's
   * `spark.qbeast.metadata.distributed` = "false" opt-out: this is the
   * chokepoint every metadata fold / sketch job routes through, so the
   * one gate keeps "no executor-side metadata jobs" true across count,
   * min/max, HLL and KLL paths (they fall back to full replay + driver
   * fold). */
  def usable(spark: SparkSession, snap: QbeastSnapshot): Boolean = {
    if (snap.filesComplete) return false
    if (spark.conf.getOption("spark.qbeast.metadata.distributed").contains("false"))
      return false
    val key = (System.identityHashCode(snap), snap.tablePath, snap.checkpointVersion)
    usableMemo.get(key).getOrElse {
      val v = FileCheckpoint.exists(snap.tablePath,
        spark.sparkContext.hadoopConfiguration, snap.checkpointVersion)
      usableMemo.put(key, v)
      v
    }
  }

  /** One broadcast of the dv-cardinality map per fold job — O(masked
   * files) bytes fetched once per executor instead of re-serialized
   * into every task's closure. Callers unpersist (non-blocking) after
   * collecting; the fold results themselves are memoized per snapshot,
   * so re-broadcast on a memo miss is the rare path. */
  private def broadcastDvCards(
      spark: SparkSession,
      snap: QbeastSnapshot): org.apache.spark.broadcast.Broadcast[Map[String, Long]] =
    spark.sparkContext.broadcast(snap.dvs.map { case (p, i) => p -> i.cardinality })

  /** Live sidecar rows at `snap`'s version (tail-touched paths masked),
   * optionally restricted to one revision. Pure executor-side filter;
   * nothing materializes on the driver until the caller aggregates. */
  private def liveRows(
      spark: SparkSession,
      snap: QbeastSnapshot,
      rid: Option[Long]): Dataset[CheckpointFileRow] = {
    import spark.implicits._
    val touched = snap.tailTouchedPaths
    val base = FileCheckpoint.read(spark, snap.tablePath, snap.checkpointVersion)
    val scoped = rid.map(r => base.where(col("revisionId") === r)).getOrElse(base)
    scoped.as[CheckpointFileRow].filter(r => !touched.contains(r.path))
  }

  private def tailFiles(snap: QbeastSnapshot, rid: Option[Long]): Vector[IndexFile] =
    rid.map(r => snap.files.filter(_.revisionId == r)).getOrElse(snap.files)

  private def dimensionsOf(snap: QbeastSnapshot)(rid: Long): Int =
    snap.revisions.get(rid).map(r => math.max(r.dimensionCount, 1)).getOrElse(1)

  /** Files of `rid` whose minimum weight fraction is ≤ `maxMinWeightFraction`
   * — the optimize candidate selection, O(selected) driver memory. */
  def selectFiles(
      spark: SparkSession,
      snap: QbeastSnapshot,
      rid: Long,
      maxMinWeightFraction: Double = 1.0): Vector[IndexFile] = {
    val cap = maxMinWeightFraction
    val selected = liveRows(spark, snap, Some(rid))
      .filter { r =>
        r.blocks.isEmpty ||
          Weight(r.blocks.iterator.map(_.minWeight).min).fraction <= cap
      }
      .collect()
    val dims = dimensionsOf(snap) _
    (selected.iterator.map(_.toIndexFile(dims)) ++
      tailFiles(snap, Some(rid)).iterator.filter(_.minWeight.fraction <= cap))
      .toVector
  }

  /** Files whose (table-relative) path is in `wanted` — the targeted
   * `optimize(files)` selection. */
  def filesWithPaths(
      spark: SparkSession,
      snap: QbeastSnapshot,
      wanted: Set[String]): Vector[IndexFile] = {
    val dims = dimensionsOf(snap) _
    val selected = liveRows(spark, snap, None)
      .filter(r => wanted.contains(r.path))
      .collect()
    (selected.iterator.map(_.toIndexFile(dims)) ++
      snap.files.iterator.filter(f => wanted.contains(f.path))).toVector
  }

  /** Live files smaller than `maxSize` bytes (auto-compaction trigger).
   * Driver memory is O(small files) — the set about to be rewritten. */
  def filesSmallerThan(
      spark: SparkSession,
      snap: QbeastSnapshot,
      maxSize: Long): Vector[IndexFile] = {
    val dims = dimensionsOf(snap) _
    val selected = liveRows(spark, snap, None)
      .filter(r => r.size < maxSize)
      .collect()
    (selected.iterator.map(_.toIndexFile(dims)) ++
      snap.files.iterator.filter(_.size < maxSize)).toVector
  }

  /** Files belonging to any revision in `rids` (compactRevisions). */
  def filesOfRevisions(
      spark: SparkSession,
      snap: QbeastSnapshot,
      rids: Set[Long]): Vector[IndexFile] = {
    val dims = dimensionsOf(snap) _
    val selected = liveRows(spark, snap, None)
      .filter(r => rids.contains(r.revisionId))
      .collect()
    (selected.iterator.map(_.toIndexFile(dims)) ++
      snap.files.iterator.filter(f => rids.contains(f.revisionId))).toVector
  }

  /** Total physical row count (block element counts) of the live files
   * — the sidecar half of the metadata-only `count(*)`
   * ([[graft.rules.MetadataCountRule]]): one job, O(partitions) longs
   * to the driver, plus the post-checkpoint tail folded here. The
   * caller subtracts dv-masked rows (exact log metadata). */
  def liveRowCount(spark: SparkSession, snap: QbeastSnapshot): Long = {
    val bulk = liveRows(spark, snap, None).rdd
      .mapPartitions { it =>
        var n = 0L
        it.foreach(r => n += r.blocks.iterator.map(_.elementCount).sum)
        Iterator.single(n)
      }.fold(0L)(_ + _)
    bulk + snap.files.iterator.map(_.elementCount).sum
  }

  /** Witness/bound extreme partials for BOTH sides of `column` over
   * the sidecar bulk — the sidecar half of the metadata-only min/max
   * fold, one job serving min AND max (the common `min(c), max(c)`
   * aggregate, memoized per snapshot by the caller so optimizer
   * fixpoint re-runs never re-launch it). Each partition folds its
   * files through the SAME per-file rule the driver loop uses
   * ([[graft.rules.MetadataCountRule.foldFileExtreme]]: unmasked+exact
   * sides are witnesses, masked files and truncated string sides are
   * dominance bounds) and ships four accumulators; the driver merges
   * them and folds the tail. None = some file was undecidable
   * (missing stats) — the caller bails to the scan. The dv map is
   * BROADCAST (fetched once per executor), not closure-captured: for a
   * heavily dv-masked table it is O(masked files) bytes, which closure
   * capture would re-serialize into every task. Returns (minWitness,
   * minBound, maxWitness, maxBound). */
  def extremePartials(
      spark: SparkSession,
      snap: QbeastSnapshot,
      column: String,
      floating: Boolean,
      string: Boolean): Option[(graft.rules.MetadataCountRule.ExtremeAcc,
      graft.rules.MetadataCountRule.ExtremeAcc,
      graft.rules.MetadataCountRule.ExtremeAcc,
      graft.rules.MetadataCountRule.ExtremeAcc)] = {
    import graft.rules.MetadataCountRule.{ExtremeAcc, foldFileExtreme}
    val dvCardsBc = broadcastDvCards(spark, snap)
    val partials = try {
      liveRows(spark, snap, None).rdd.mapPartitions { it =>
        var ok = true
        val dvCards = dvCardsBc.value
        val minW = new ExtremeAcc(isMin = true, floating, string)
        val minB = new ExtremeAcc(isMin = true, floating, string)
        val maxW = new ExtremeAcc(isMin = false, floating, string)
        val maxB = new ExtremeAcc(isMin = false, floating, string)
        // stop consuming the partition once a file is undecidable
        while (ok && it.hasNext) {
          val r = it.next()
          val ec = r.blocks.iterator.map(_.elementCount).sum
          val dvc = dvCards.getOrElse(r.path, 0L)
          // the second call re-parses from the bounded JSON-keyed
          // cache (FileStatsPruning.parse), not the raw string
          ok = foldFileExtreme(r.stats, ec, dvc, column, isMin = true, minW, minB) &&
            foldFileExtreme(r.stats, ec, dvc, column, isMin = false, maxW, maxB)
        }
        Iterator.single((ok, minW, minB, maxW, maxB))
      }.collect()
    } finally dvCardsBc.unpersist(blocking = false)
    if (partials.exists(!_._1)) None
    else {
      val minW = new ExtremeAcc(isMin = true, floating, string)
      val minB = new ExtremeAcc(isMin = true, floating, string)
      val maxW = new ExtremeAcc(isMin = false, floating, string)
      val maxB = new ExtremeAcc(isMin = false, floating, string)
      partials.foreach { case (_, w1, b1, w2, b2) =>
        minW.mergeFrom(w1); minB.mergeFrom(b1)
        maxW.mergeFrom(w2); maxB.mergeFrom(b2)
      }
      Some((minW, minB, maxW, maxB))
    }
  }

  /** FILTERED count + per-column extreme partials over the sidecar
   * bulk — the sidecar half of the metadata-only
   * `count(*)/min/max WHERE pred` fold. Each partition runs the SAME
   * tri-state per-file proof + fold the driver loop uses
   * ([[graft.rules.MetadataCountRule.foldFileFiltered]]); the expanded
   * conjuncts ship in the closure (Catalyst expressions are
   * serializable). None = some file was undecidable or straddles the
   * predicate — the caller bails to the scan. `cols` =
   * (name, floating, string) per requested min/max column; returns
   * (live matching rows, per-column (minW, minB, maxW, maxB)). */
  def filteredFoldPartials(
      spark: SparkSession,
      snap: QbeastSnapshot,
      provable: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      cols: Array[(String, Boolean, Boolean)])
      : Option[(Long, Array[(graft.rules.MetadataCountRule.ExtremeAcc,
      graft.rules.MetadataCountRule.ExtremeAcc,
      graft.rules.MetadataCountRule.ExtremeAcc,
      graft.rules.MetadataCountRule.ExtremeAcc)])] = {
    import graft.rules.MetadataCountRule.{foldFileFiltered, freshQuads, mergeQuads}
    val dvCardsBc = broadcastDvCards(spark, snap)
    val partials = try {
      liveRows(spark, snap, None).rdd.mapPartitions { it =>
        var ok = true
        var n = 0L
        val dvCards = dvCardsBc.value
        val accs = freshQuads(cols)
        // stop consuming the partition the moment a file is undecidable
        // — the remaining rows can no longer change the (failed) result
        while (ok && it.hasNext) {
          val r = it.next()
          val ec = r.blocks.iterator.map(_.elementCount).sum
          ok = foldFileFiltered(r.stats, ec, dvCards.getOrElse(r.path, 0L),
            provable, cols, accs, n += _)
        }
        Iterator.single((ok, n, accs))
      }.collect()
    } finally dvCardsBc.unpersist(blocking = false)
    if (partials.exists(!_._1)) None
    else {
      var n = 0L
      val accs = freshQuads(cols)
      partials.foreach { case (_, pn, pa) => n += pn; mergeQuads(accs, pa) }
      Some((n, accs))
    }
  }

  /** Union of the checkpointed files' per-column HLL registers — the
   * sidecar-scale half of [[graft.table.QbeastTable.approxCountDistinct]].
   * One Spark job over the parquet sidecar; only per-partition 256-byte
   * partials reach the driver. None if any live file lacks registers
   * for `column`. */
  def hllRegisters(
      spark: SparkSession,
      snap: QbeastSnapshot,
      column: String): Option[Array[Byte]] = {
    import spark.implicits._
    import graft.expressions.HllDistinctAgg
    val partials = liveRows(spark, snap, None).mapPartitions { it =>
      var ok = true
      val acc = new Array[Byte](HllDistinctAgg.M)
      it.foreach { r =>
        // empty files contribute nothing and may legitimately lack an
        // hll stats section — same tolerance the driver-side fold
        // (QbeastTable.foldHllRegisters) and the sibling kllState apply
        if (ok && r.blocks.iterator.map(_.elementCount).sum > 0L) {
          r.stats.flatMap(graft.read.FileStatsPruning.parse)
            .flatMap(_.hll.get(column)) match {
            case Some(b) => HllDistinctAgg.mergeRegisters(acc, b)
            case None => ok = false
          }
        }
      }
      Iterator.single((ok, acc))
    }.collect()
    if (partials.exists(!_._1)) None
    else {
      val acc = new Array[Byte](HllDistinctAgg.M)
      partials.foreach(p => HllDistinctAgg.mergeRegisters(acc, p._2))
      Some(acc)
    }
  }

  /** FILTERED twin of [[hllRegisters]] — the sidecar half of
   * [[graft.table.QbeastTable.approxCountDistinct(column:String,where:String)*]].
   * Each partition runs the tri-state per-file stats proof the
   * filtered count/min/max fold uses
   * ([[graft.rules.MetadataCountRule.proveFileForFold]]): TRUE-proved
   * files contribute their whole register set, FALSE-proved files
   * contribute nothing, and a single undecidable file (straddling
   * predicate, missing/stale stats, missing registers) fails the whole
   * fold. Callers pre-screen subquery conjuncts (PlanExpression is not
   * serializable) and dv masks. Returns (registers,
   * included-non-empty-file count) — the count lets the caller keep
   * the "matched nothing ⇒ scan" contract; None = bail to the scan. */
  def filteredHllRegisters(
      spark: SparkSession,
      snap: QbeastSnapshot,
      provable: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      column: String): Option[(Array[Byte], Long)] = {
    import graft.expressions.HllDistinctAgg
    // HLL accumulates raw registers: merging IS the byte-wise max,
    // identical for file states and partials; serialize is free
    filteredSketchFold[Array[Byte]](spark, snap, provable,
      extract = _.hll.get(column),
      start = () => Array.empty[Byte],
      absorb = (acc, b) => {
        val a = if (acc.isEmpty) new Array[Byte](HllDistinctAgg.M) else acc
        HllDistinctAgg.mergeRegisters(a, b)
        a
      },
      finish = a => a)
  }

  /** FILTERED twin of [[kllState]] — the sidecar half of
   * [[graft.table.QbeastTable.approxQuantile(column:String,qs:Seq[Double],where:String)*]].
   * Same tri-state proof discipline as [[filteredHllRegisters]].
   * Returns (serialized merged state — EMPTY when no TRUE-proved file
   * held one, e.g. a predicate selecting only the tail —, included
   * file count); None = bail to the scan (undecidable file or a
   * TRUE-proved file missing its state). */
  def filteredKllState(
      spark: SparkSession,
      snap: QbeastSnapshot,
      provable: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      column: String): Option[(Array[Byte], Long)] = {
    import graft.expressions.KllState
    // KLL accumulates ONE live state per partition and serializes it
    // once at partition end (serializing the accumulator on every
    // absorbed file would add O(files-per-partition) churn to exactly
    // the sidecar-scale path this fold exists to speed up); partials
    // and file states share one serialized form, so the driver merge
    // runs the same absorb over the partition outputs
    filteredSketchFold[KllState](spark, snap, provable,
      extract = _.kll.get(column),
      start = () => null,
      absorb = (acc, b) => {
        val in = KllState.deserialize(b)
        if (acc == null) in else { acc.mergeIn(in); acc }
      },
      finish = st => if (st == null) Array.empty[Byte] else st.serialize())
  }

  /** The ONE tri-state filtered sketch fold both sketch kinds share
   * (review finding r14: four hand-kept copies of this loop would
   * drift): each partition classifies every file with
   * [[graft.rules.MetadataCountRule.proveFileForFold]] — TRUE-proved
   * files have their serialized state extracted and absorbed,
   * FALSE-proved files contribute nothing, any undecidable file fails
   * the fold — and emits one (ok, included, state) partial; the driver
   * absorbs the partials through the SAME `absorb`. The fold is typed
   * over an accumulator `A` with a serialize-at-partition-end `finish`
   * step so a state with a costly serialized form (KLL) stays LIVE
   * across the per-file absorbs instead of round-tripping through
   * bytes on every file. `finish(start())` is the identity state (also
   * returned when no TRUE-proved file held one). */
  private def filteredSketchFold[A](
      spark: SparkSession,
      snap: QbeastSnapshot,
      provable: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      extract: graft.read.FileStatsPruning.Stats => Option[Array[Byte]],
      start: () => A,
      absorb: (A, Array[Byte]) => A,
      finish: A => Array[Byte])
      : Option[(Array[Byte], Long)] = {
    import spark.implicits._
    import graft.rules.MetadataCountRule.proveFileForFold
    val partials = liveRows(spark, snap, None).mapPartitions { it =>
      var ok = true
      var included = 0L
      var acc = start()
      // stop consuming the partition once a file is undecidable
      while (ok && it.hasNext) {
        val r = it.next()
        val ec = r.blocks.iterator.map(_.elementCount).sum
        proveFileForFold(r.stats, ec, provable) match {
          case 1 =>
            r.stats.flatMap(graft.read.FileStatsPruning.parse)
              .flatMap(extract) match {
              case Some(b) => acc = absorb(acc, b); included += 1
              case None => ok = false
            }
          case 0 => ()
          case _ => ok = false
        }
      }
      Iterator.single((ok, included, finish(acc)))
    }.collect()
    if (partials.exists(!_._1)) None
    else {
      var included = 0L
      var acc = start()
      partials.foreach { case (_, inc, bytes) =>
        included += inc
        if (bytes.nonEmpty) acc = absorb(acc, bytes)
      }
      Some((finish(acc), included))
    }
  }

  /** Whole-table KLL sketch state of `column` folded distributively
   * over the checkpoint sidecar (the percentile twin of
   * [[hllRegisters]]): each partition merges its files' states into one
   * partial, so only O(partitions) serialized sketches reach the
   * driver. None when any live non-empty file lacks a state. Partition
   * and row order are deterministic (checkpoint file order), so the
   * fold is reproducible; within capacity it is exactly the union
   * sketch regardless of order. */
  def kllState(
      spark: SparkSession,
      snap: QbeastSnapshot,
      column: String): Option[Array[Byte]] = {
    import spark.implicits._
    import graft.expressions.KllState
    val partials = liveRows(spark, snap, None).mapPartitions { it =>
      var ok = true
      var acc: KllState = null
      it.foreach { r =>
        if (ok && r.blocks.iterator.map(_.elementCount).sum > 0L) {
          r.stats.flatMap(graft.read.FileStatsPruning.parse)
            .flatMap(_.kll.get(column)) match {
            case Some(b) =>
              val st = KllState.deserialize(b)
              if (acc == null) acc = st else acc.mergeIn(st)
            case None => ok = false
          }
        }
      }
      Iterator.single((ok, if (acc == null) Array.empty[Byte] else acc.serialize()))
    }.collect()
    if (partials.exists(!_._1)) None
    else {
      var acc: KllState = null
      partials.foreach { case (_, bytes) =>
        if (bytes.nonEmpty) {
          val st = KllState.deserialize(bytes)
          if (acc == null) acc = st else acc.mergeIn(st)
        }
      }
      Option(acc).map(_.serialize())
    }
  }

  /** Per-cube tree state of one revision (maxWeight = min over block
   * maxWeights, elementCount = sum) as a groupBy-cube Spark job over the
   * sidecar blocks; the tail merges in driver-side. O(cubes) driver
   * memory — the same order as the broadcast the writer ships anyway. */
  def indexStatus(spark: SparkSession, snap: QbeastSnapshot, rid: Long): IndexStatus = {
    import spark.implicits._
    val revision = snap.revisions(rid)
    val rows = liveRows(spark, snap, Some(rid))
      .flatMap(_.blocks.iterator.map(b => (b.cube, b.maxWeight, b.elementCount)))
      .toDF("cube", "w", "n")
      .groupBy(col("cube"))
      .agg(min(col("w")).as("w"), sum(col("n")).as("n"))
      .as[(String, Int, Long)]
      .collect()
    val dims = math.max(revision.dimensionCount, 1)
    val acc = mutable.HashMap.empty[CubeId, (Weight, Long)]
    rows.foreach { case (cube, w, n) =>
      acc.update(CubeId.fromString(dims, cube), (Weight(w), n))
    }
    tailFiles(snap, Some(rid)).foreach { f =>
      f.blocks.foreach { b =>
        val (w, n) = acc.getOrElse(b.cube, (Weight.MaxValue, 0L))
        acc.update(b.cube, (w.min(b.maxWeight), n + b.elementCount))
      }
    }
    val statuses = SortedMap.newBuilder[CubeId, CubeStatus]
    acc.foreach { case (cube, (w, n)) => statuses += cube -> CubeStatus(cube, w, n) }
    IndexStatus(revision, statuses.result())
  }

  /** (fileCount, blockCount, totalBytes) of one revision — the scalar
   * aggregates of indexMetrics, computed without listing files. */
  def revisionFileStats(
      spark: SparkSession,
      snap: QbeastSnapshot,
      rid: Long): (Long, Long, Long) = {
    import spark.implicits._
    val agg = liveRows(spark, snap, Some(rid))
      .map(r => (1L, r.blocks.size.toLong, r.size))
      .toDF("f", "b", "s")
      .agg(sum(col("f")), sum(col("b")), sum(col("s")))
      .as[(Option[Long], Option[Long], Option[Long])]
      .head()
    val tail = tailFiles(snap, Some(rid))
    (agg._1.getOrElse(0L) + tail.size,
      agg._2.getOrElse(0L) + tail.map(_.blocks.size.toLong).sum,
      agg._3.getOrElse(0L) + tail.map(_.size).sum)
  }

  /** Block counts per cube depth of one revision (depthMetrics). */
  def blocksPerDepth(
      spark: SparkSession,
      snap: QbeastSnapshot,
      rid: Long): Map[Int, Long] = {
    import spark.implicits._
    val dims = dimensionsOf(snap)(rid)
    val rows = liveRows(spark, snap, Some(rid))
      .flatMap(_.blocks.iterator.map(b => CubeId.fromString(dims, b.cube).depth))
      .toDF("d")
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)]
      .collect()
    val acc = mutable.HashMap.empty[Int, Long] ++= rows
    tailFiles(snap, Some(rid)).foreach(_.blocks.foreach { b =>
      acc.update(b.cube.depth, acc.getOrElse(b.cube.depth, 0L) + 1L)
    })
    acc.toMap
  }

}
