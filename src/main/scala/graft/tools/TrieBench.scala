package graft.tools

import graft.core.model._
import graft.index._

/** Isolated microbench: pointer-trie vs CubeId-map walks for the two
 * per-row write-path loops, on a clustered (deep) and a uniform
 * (shallow) point distribution. No Spark — pure JVM, warmed. */
object TrieBench {
  def main(args: Array[String]): Unit = {
    val dims = 2
    val n = 2000000
    val rnd = new scala.util.Random(99)
    def mkPoints(clustered: Boolean): Array[Array[Double]] =
      Array.fill(n) {
        if (!clustered) Array(rnd.nextDouble(), rnd.nextDouble())
        else {
          val c = rnd.nextInt(10) / 10.0
          Array(c + rnd.nextDouble() * 1e-7, c + rnd.nextDouble() * 1e-7)
        }
      }
    def time(label: String, rows: Int)(body: => Any): Unit = {
      (1 to 2).foreach(_ => body) // warm
      val t0 = System.nanoTime()
      body
      println(f"[triebench] $label: ${(System.nanoTime() - t0) / 1e6}%.0f ms for $rows rows")
    }
    Seq(true, false).foreach { clustered =>
      val pts = mkPoints(clustered)
      val tag = if (clustered) "clustered" else "uniform"
      time(s"$tag trie place", n) {
        val t = new CountTrie(dims, 30)
        pts.foreach(t.place)
        t.domains.length
      }
      time(s"$tag map place", n) {
        val occupancy = scala.collection.mutable.HashMap.empty[CubeId, Int]
        val domains = scala.collection.mutable.HashMap.empty[CubeId, Long]
        pts.foreach { p =>
          var cube = CubeId.root(dims); var placed = false
          while (!placed) {
            domains.update(cube, domains.getOrElse(cube, 0L) + 1L)
            val used = occupancy.getOrElse(cube, 0)
            if (used < 30 || cube.depth >= CubeId.MaxDepth) { occupancy.update(cube, used + 1); placed = true }
            else cube = cube.childContaining(p)
          }
        }
        domains.size
      }
      // assignment walk over a frozen weight tree derived from the data
      val builder = new LocalOTreeBuilder(dims, 30, 1 << 21)
      pts.foreach(p => builder.add(p, rnd.nextInt()))
      val domains = builder.result().toMap.map { case (s, d) => CubeId.fromString(dims, s) -> d }
      val (weights, _) = OTreeAlgorithm.estimateCubeWeights(domains, Map.empty, 5000)
      println(s"[triebench] $tag tree: ${weights.size} cubes, height ${weights.keys.map(_.depth).max}")
      val files = weights.keys.zipWithIndex.toMap
      val ws = rnd.shuffle(pts.toSeq.take(100000)).toArray
      val trie = new AssignTrie(dims, weights, files, files.size)
      time(s"$tag trie assign", ws.length) {
        var i = 0; var acc = 0L
        while (i < ws.length) {
          val coords = new Array[Long](dims)
          val (depth, _) = trie.walk(ws(i), i, coords)
          acc += depth; i += 1
        }
        acc
      }
      time(s"$tag map assign", ws.length) {
        var i = 0; var acc = 0L
        while (i < ws.length) {
          acc += OTreeAlgorithm.findTargetCube(ws(i), i, weights).depth; i += 1
        }
        acc
      }
    }
  }
}
