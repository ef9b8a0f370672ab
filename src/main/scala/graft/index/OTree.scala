package graft.index

import graft.core.model._

import scala.collection.mutable

/** Names of the transient columns added during indexing (reference:
 * `core/.../index/QbeastColumns.scala:25-143`). */
object QbeastColumns {
  val weightColumnName = "_qbeastWeight"
  val cubeColumnName = "_qbeastCube"
  val fileUUIDColumnName = "_qbeastFileUUID"
}

/**
 * Per-partition bounded OTree builder (pass 1 of the write pipeline).
 *
 * Buffers up to `bufferCapacity` (point, weight) pairs, then places them
 * lightest-first: each element walks root→down and occupies the first
 * cube with a free slot (`groupCubeSize` slots per cube), incrementing
 * the *domain* (subtree population estimate) of every cube it traverses.
 * Occupancy persists across flushes so the tree keeps deepening instead
 * of re-filling the root. Concept from the reference's
 * `core/.../model/CubeDomainsBuilder.scala:74-193`, re-derived.
 */
final class LocalOTreeBuilder(dims: Int, groupCubeSize: Int, bufferCapacity: Int) {

  // a zero capacity would make the doubling buffer (0*2=0) never grow
  // (per-row ArrayIndexOutOfBounds), and a Long conf value past Int
  // range truncates NEGATIVE at the caller's .toInt — fail with the
  // config named instead of a cryptic executor crash
  require(bufferCapacity > 0,
    s"cubeDomainsBufferCapacity must be a positive Int, got $bufferCapacity " +
      "(spark.qbeast.index.cubeDomainsBufferCapacity)")

  // hot path: pointer-walk trie (no CubeId allocation / byte-array
  // hashing per traversed level — the walk cost is what dominates on
  // deep trees over clustered key spaces); map fallback above the
  // trie's fanout cap
  private val trie: CountTrie =
    if (dims <= CubeTrie.MaxTrieDims) new CountTrie(dims, groupCubeSize) else null
  // only materialized on the high-dimensional fallback path
  private lazy val occupancy = mutable.HashMap.empty[CubeId, Int]
  private lazy val domains = mutable.HashMap.empty[CubeId, Long]
  private val bufPoints = new mutable.ArrayBuffer[Array[Double]](math.min(bufferCapacity, 1 << 16))
  // (weight << 32 | index) packed for a primitive no-boxing sort
  private var bufKeys = new Array[Long](math.min(bufferCapacity, 1 << 16))
  private var bufSize = 0

  def add(point: Array[Double], weight: Int): Unit = {
    bufPoints += point
    if (bufSize == bufKeys.length)
      bufKeys = java.util.Arrays.copyOf(bufKeys, bufKeys.length * 2)
    // sign-extended weight in the top 32 bits: the signed long sort IS
    // the signed weight sort, ties broken by insertion index. (The
    // previous sign-bit-FLIP packing put the flipped bit at bit 63,
    // flipping the long's sign back — placement ran non-negative
    // weights first instead of lightest-first; caught by the trie
    // parity test against a plain sortBy(weight) reference.)
    bufKeys(bufSize) = (weight.toLong << 32) | bufSize.toLong
    bufSize += 1
    if (bufSize >= bufferCapacity) flush()
  }

  private def flush(): Unit = {
    java.util.Arrays.sort(bufKeys, 0, bufSize)
    var i = 0
    while (i < bufSize) {
      place(bufPoints((bufKeys(i) & 0xffffffffL).toInt))
      i += 1
    }
    bufPoints.clear()
    bufSize = 0
  }

  private def place(point: Array[Double]): Unit = {
    if (trie != null) { trie.place(point); return }
    var cube = CubeId.root(dims)
    var placed = false
    while (!placed) {
      domains.update(cube, domains.getOrElse(cube, 0L) + 1L)
      val used = occupancy.getOrElse(cube, 0)
      if (used < groupCubeSize || cube.depth >= CubeId.MaxDepth) {
        occupancy.update(cube, used + 1)
        placed = true
      } else {
        cube = cube.childContaining(point)
      }
    }
  }

  /** Flush the remaining buffer and emit (cube, domain) pairs. */
  def result(): Iterator[(String, Long)] = {
    flush()
    if (trie != null) trie.domains
    else domains.iterator.map { case (cube, domain) => (cube.toString, domain) }
  }

}

object OTreeAlgorithm {

  val MinGroupCubeSize = 30

  /** Write-parallelism-adjusted per-cube slot count (reference formula,
   * `CubeDomainsBuilder.scala:23,40-48`). */
  def groupCubeSize(desiredCubeSize: Int, numPartitions: Int, numElements: Long,
      bufferCapacity: Long): Int = {
    val groups = math.max(numPartitions.toLong, numElements / bufferCapacity)
    val size = if (groups <= 0) desiredCubeSize.toLong else desiredCubeSize / groups
    math.max(MinGroupCubeSize, math.min(size, Int.MaxValue).toInt)
  }

  /**
   * Driver-side cube weight estimation (reference:
   * `OTreeDataAnalyzer.estimateUpdatedCubeWeights`): level-order, the
   * normalized weight of a cube adds the share of its parent's remaining
   * weight range needed to capture `desiredCubeSize` of the subtree's
   * `domain` elements; subtrees no larger than a cube become leaves.
   *
   * `existingSubtreeCounts` folds an existing revision's population in
   * on appends.
   */
  def estimateCubeWeights(
      newDomains: Map[CubeId, Long],
      existingSubtreeCounts: Map[CubeId, Long],
      desiredCubeSize: Int): (Map[CubeId, Weight], Map[CubeId, Long]) = {

    val merged = mutable.HashMap.empty[CubeId, Long]
    newDomains.foreach { case (c, d) => merged.update(c, d) }
    existingSubtreeCounts.foreach { case (c, d) => merged.update(c, merged.getOrElse(c, 0L) + d) }
    if (merged.isEmpty) return (Map.empty, Map.empty)

    val nw = mutable.HashMap.empty[CubeId, Double]
    val weights = Map.newBuilder[CubeId, Weight]
    val counts = Map.newBuilder[CubeId, Long]

    merged.keys.toSeq.sortBy(_.depth).foreach { cube =>
      val treeSize = merged(cube)
      val parentNw = parentNormalizedWeight(cube, nw)
      val cubeNw =
        if (treeSize <= desiredCubeSize) 1.0
        else math.min(1.0, parentNw + (1.0 - parentNw) * desiredCubeSize / treeSize)
      nw.update(cube, cubeNw)
      weights += cube -> NormalizedWeight.toWeight(cubeNw)
      // Expected rows CAPTURED at this cube, not subtree size: of the
      // `treeSize` rows in the cube's region, ancestors already took
      // weight ≤ parentNw, and this cube admits (parentNw, cubeNw] — so
      // ~treeSize·(cubeNw − parentNw) rows actually land here. The
      // earlier min(treeSize, desired) overshot by 1/(1−parentNw),
      // which made rollup believe deep cubes were full and emit files
      // ~3× smaller than rollupSize (measured at sf1: 595-row files at
      // rollupSize 2000; packing now tracks the target).
      counts += cube -> math.max(1L, math.round(treeSize * (cubeNw - parentNw)))
    }
    (weights.result(), counts.result())
  }

  private def parentNormalizedWeight(cube: CubeId, nw: mutable.HashMap[CubeId, Double]): Double = {
    var p = cube.parent
    while (p.nonEmpty) {
      nw.get(p.get) match {
        case Some(w) => return w
        case None => p = p.get.parent
      }
    }
    0.0
  }

  /**
   * Pass-2 row placement (reference: `PointWeightIndexer.scala:35-43`):
   * the first cube on the root→leaf path whose max weight admits the
   * row's weight; cubes absent from the estimate are fresh leaves and
   * accept everything that reaches them.
   */
  def findTargetCube(
      point: Array[Double],
      weight: Int,
      cubeWeights: Map[CubeId, Weight]): CubeId = {
    var cube = CubeId.root(point.length)
    while (true) {
      cubeWeights.get(cube) match {
        case None => return cube
        case Some(maxW) if weight <= maxW.value => return cube
        case _ =>
          if (cube.depth >= CubeId.MaxDepth) return cube
          cube = cube.childContaining(point)
      }
    }
    cube // unreachable
  }

  /**
   * Pack under-filled cubes into their ancestors until each group holds
   * ~`rollupSize` rows; each resulting group becomes one output file
   * (reference: `core/.../writer/Rollup.scala:56-76`).
   *
   * Unlike a close-only-at-level rollup, a parent SEALS its accumulated
   * group as soon as absorbing a child pushes it past `rollupSize` and
   * keeps packing the rest into a fresh group. Without sealing, a
   * parent absorbs up to its whole fanout before its own level closes
   * it — bounded 2× overshoot at 2 dims but ~2^d× at d dims (a 256 GB
   * file at a 1 GB target for an 8-column index). With sealing every
   * group is < 2×rollupSize regardless of dimension count.
   *
   * @return (targetCube, memberCubes) groups; each group becomes one
   *         file, rows of a member cube land in its group's file.
   */
  def computeRollupGroups(
      cubeCounts: Map[CubeId, Long],
      rollupSize: Long): Seq[(CubeId, Seq[CubeId])] = {
    if (cubeCounts.isEmpty) return Nil
    val sizes = mutable.HashMap.empty[CubeId, Long]
    val members = mutable.HashMap.empty[CubeId, mutable.ArrayBuffer[CubeId]]
    cubeCounts.foreach { case (c, n) =>
      sizes.update(c, n)
      members.update(c, mutable.ArrayBuffer(c))
    }
    val out = Seq.newBuilder[(CubeId, Seq[CubeId])]
    // deepest-first by level, so parents created mid-rollup are still
    // visited when their level comes up; cubes sorted within a level
    // for deterministic grouping
    val byDepth = mutable.HashMap.empty[Int, mutable.ArrayBuffer[CubeId]]
    sizes.keys.foreach(c => byDepth.getOrElseUpdate(c.depth, mutable.ArrayBuffer.empty) += c)
    val maxDepth = byDepth.keys.max
    (maxDepth to 0 by -1).foreach { depth =>
      byDepth.getOrElse(depth, mutable.ArrayBuffer.empty).sorted.foreach { cube =>
        val size = sizes(cube)
        val mine = members(cube)
        if (cube.isRoot) {
          if (mine.nonEmpty) out += cube -> mine.toSeq
        } else if (size >= rollupSize) {
          out += cube -> mine.toSeq
        } else {
          val parent = cube.parent.get
          if (!sizes.contains(parent)) {
            // parent wasn't assigned any rows of its own
            sizes.update(parent, 0L)
            members.update(parent, mutable.ArrayBuffer(parent))
            byDepth.getOrElseUpdate(parent.depth, mutable.ArrayBuffer.empty) += parent
          }
          val accumulated = sizes(parent) + size
          members(parent) ++= mine
          members.remove(cube)
          if (accumulated >= rollupSize) {
            // seal the parent's current group; the parent keeps packing
            // its remaining children into a fresh (initially empty) one
            out += parent -> members(parent).toSeq
            members.update(parent, mutable.ArrayBuffer.empty)
            sizes.update(parent, 0L)
          } else {
            sizes.update(parent, accumulated)
          }
        }
      }
    }
    out.result()
  }

  /** Member → target-cube view of [[computeRollupGroups]] (groups that
   * sealed under the same target collapse — use the groups API when
   * distinct files per group matter, i.e. in the writer). */
  def computeRollup(
      cubeCounts: Map[CubeId, Long],
      rollupSize: Long): Map[CubeId, CubeId] =
    computeRollupGroups(cubeCounts, rollupSize).flatMap { case (target, ms) =>
      ms.map(_ -> target)
    }.toMap

}
