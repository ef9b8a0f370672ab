package graft.index

import graft.core.model.{CubeId, Weight}

/**
 * Pointer-walk tries for the two per-row hot loops of the indexed-write
 * pipeline. Both previously walked the cube tree with a fresh `CubeId`
 * allocation (a new `Array[Long]`) plus a byte-array-hashed map lookup
 * PER LEVEL PER ROW. On evenly-spread data (height ~8) that is 8
 * allocations + 8 hashes per row per pass; on clustered key spaces the
 * tree legitimately deepens (10× replica fixtures: height 25 —
 * tenant-/epoch-prefixed ids cluster the same way in production) and
 * the constant factor scales with depth. The tries walk child-pointer
 * arrays indexed by the point's bit pattern instead: zero allocation
 * and zero hashing per level; exactly one `CubeId` materialization per
 * row (the result), or one per CUBE at emission (the builder).
 *
 * Trie nodes hold a `1 << dims` child array (allocated lazily, only on
 * first descent through the node, so leaf-heavy trees stay compact);
 * [[CubeTrie.MaxTrieDims]] caps the fanout — higher-dimensional
 * indexes fall back to the map-based walk.
 */
object CubeTrie {

  /** 2^8 = 256 child pointers (2 KiB) per INTERNAL node worst case. */
  val MaxTrieDims = 8

  /** Child index + coordinate advance for one level of descent: bit d
   * of the index is dimension d's next coordinate bit. Mirrors
   * `CubeId.childContaining`. */
  def childIndex(point: Array[Double], coords: Array[Long], depth: Int): Int = {
    val dims = point.length
    var idx = 0
    var d = 0
    while (d < dims) {
      val scale = 1L << (depth + 1)
      val scaled = math.min((point(d) * scale).toLong, scale - 1)
      val bit = (scaled & 1L).toInt
      coords(d) = (coords(d) << 1) | bit
      idx |= bit << d
      d += 1
    }
    idx
  }

}

/**
 * Read-mostly trie over the (cubeWeights, rollupFiles) broadcast maps,
 * answering `OTreeAlgorithm.findTargetCube` + nearest-ancestor file
 * resolution in one walk. Semantics are EXACTLY the map version's
 * (parity-tested): descend while the cube is weight-mapped and rejects
 * the row's weight; stop at the first unmapped or admitting cube (or
 * the depth cap); the file is the deepest own-entry at or above the
 * stop cube, else the default.
 */
final class AssignTrie(
    dims: Int,
    weights: Map[CubeId, Weight],
    files: Map[CubeId, Int],
    defaultFile: Int) {

  require(dims <= CubeTrie.MaxTrieDims, s"AssignTrie supports <= ${CubeTrie.MaxTrieDims} dims")

  private val fanout = 1 << dims

  private final class Node {
    var present: Boolean = false // cube ∈ weights
    var maxWeight: Int = Int.MaxValue
    var file: Int = -1 // own files entry only (no inheritance)
    var children: Array[Node] = null
  }

  private val root = new Node

  private def insertPath(cube: CubeId): Node = {
    // walk the cube's coordinate bits from the root, creating nodes
    var node = root
    var level = 0
    while (level < cube.depth) {
      val shift = cube.depth - level - 1
      var idx = 0
      var d = 0
      while (d < dims) {
        idx |= (((cube.coords(d) >>> shift) & 1L).toInt) << d
        d += 1
      }
      if (node.children == null) node.children = new Array[Node](fanout)
      if (node.children(idx) == null) node.children(idx) = new Node
      node = node.children(idx)
      level += 1
    }
    node
  }

  weights.foreach { case (c, w) =>
    val n = insertPath(c); n.present = true; n.maxWeight = w.value
  }
  files.foreach { case (c, f) => insertPath(c).file = f }

  /** (stopDepth, fileIndex) walk; `coords` is advanced in place and
   * holds the stop cube's coordinates on return. The file payload is an
   * INT index into the write's target-file table, not the 36-char UUID
   * string: the index is what rides the write exchange (4 bytes/row vs
   * 36), the task-side writer resolves the name once per FILE. */
  def walk(point: Array[Double], weight: Int, coords: Array[Long]): (Int, Int) = {
    var node: Node = root
    var depth = 0
    var best = defaultFile
    while (true) {
      if (node != null && node.file >= 0) best = node.file
      if (node == null || !node.present) return (depth, best)
      if (weight <= node.maxWeight || depth >= CubeId.MaxDepth) return (depth, best)
      val idx = CubeTrie.childIndex(point, coords, depth)
      node = if (node.children == null) null else node.children(idx)
      depth += 1
    }
    (depth, best) // unreachable
  }

}

/**
 * Mutable counting trie backing [[LocalOTreeBuilder]]: per-node domain
 * (rows that traversed the cube) and occupancy (rows placed in it),
 * the `place()` walk creating children on first descent. Emission
 * materializes one `CubeId` string per cube, not per row.
 */
final class CountTrie(dims: Int, groupCubeSize: Int) {

  require(dims <= CubeTrie.MaxTrieDims, s"CountTrie supports <= ${CubeTrie.MaxTrieDims} dims")

  private val fanout = 1 << dims

  private final class Node {
    var domain: Long = 0L
    var occupancy: Int = 0
    var children: Array[Node] = null
  }

  private val root = new Node

  def place(point: Array[Double]): Unit = {
    val coords = scratch // coords are only advanced, never read back here
    var node = root
    var depth = 0
    var placed = false
    while (!placed) {
      node.domain += 1L
      if (node.occupancy < groupCubeSize || depth >= CubeId.MaxDepth) {
        node.occupancy += 1
        placed = true
      } else {
        val idx = CubeTrie.childIndex(point, coords, depth)
        if (node.children == null) node.children = new Array[Node](fanout)
        if (node.children(idx) == null) node.children(idx) = new Node
        node = node.children(idx)
        depth += 1
      }
    }
  }

  // childIndex shifts coords along; contents are irrelevant to place(),
  // so one scratch buffer serves every call
  private val scratch = new Array[Long](dims)

  /** (cube.toString, domain) for every traversed cube. */
  def domains: Iterator[(String, Long)] = {
    val out = Vector.newBuilder[(String, Long)]
    def dfs(node: Node, depth: Int, coords: Array[Long]): Unit = {
      out += ((CubeId(dims, depth, coords.clone()).toString, node.domain))
      if (node.children != null) {
        var idx = 0
        while (idx < fanout) {
          val child = node.children(idx)
          if (child != null) {
            var d = 0
            while (d < dims) {
              coords(d) = (coords(d) << 1) | ((idx >>> d) & 1).toLong
              d += 1
            }
            dfs(child, depth + 1, coords)
            d = 0
            while (d < dims) { coords(d) = coords(d) >>> 1; d += 1 }
          }
          idx += 1
        }
      }
    }
    dfs(root, 0, new Array[Long](dims))
    out.result().iterator
  }

}
