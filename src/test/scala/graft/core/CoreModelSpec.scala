package graft.core

import graft.core.model._
import graft.index.{LocalOTreeBuilder, OTreeAlgorithm}
import org.scalatest.funsuite.AnyFunSuite

/** Seeded property-style loops (the offline cache has no scalatest↔
 * scalacheck bridge artifact). */
object PropLoop {
  def forAllPoints(n: Int = 200)(check: Array[Double] => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => check(Array(rnd.nextDouble(), rnd.nextDouble())))
  }
  def forAllPointsDepth(n: Int = 200, maxDepth: Int = 20)(check: (Array[Double], Int) => Unit): Unit = {
    val rnd = new scala.util.Random(43)
    (1 to n).foreach(_ => check(Array(rnd.nextDouble(), rnd.nextDouble()), 1 + rnd.nextInt(maxDepth)))
  }
}

class CubeIdSpec extends AnyFunSuite {
  import PropLoop._

  test("root has depth 0 and contains every point") {
    val root = CubeId.root(2)
    assert(root.isRoot && root.depth == 0)
    forAllPoints() { p => assert(root.contains(p)) }
  }

  test("children partition the parent region") {
    val root = CubeId.root(2)
    forAllPoints() { p =>
      val containing = root.children.filter(_.contains(p)).toSeq
      assert(containing.size == 1)
      assert(containing.head == root.childContaining(p))
    }
  }

  test("parent/child round trip and ancestry") {
    forAllPointsDepth() { (p, depth) =>
      val cube = CubeId.containerAt(p, depth)
      assert(cube.contains(p))
      val parent = cube.parent.get
      assert(parent.isAncestorOf(cube))
      assert(parent.childContaining(p) == CubeId.containerAt(p, depth))
      assert(!cube.isAncestorOf(parent))
    }
  }

  test("containers iterator is the ancestor chain") {
    forAllPoints() { p =>
      val chain = CubeId.containers(p).take(10).toSeq
      chain.zipWithIndex.foreach { case (c, d) => assert(c.depth == d && c.contains(p)) }
      chain.sliding(2).foreach { case Seq(a, b) => assert(a.isAncestorOf(b)); case _ => }
    }
  }

  test("pre-order: ancestors sort before descendants; siblings by child index") {
    val root = CubeId.root(2)
    val kids = root.children.toSeq
    kids.foreach(k => assert(root.compare(k) < 0))
    kids.sliding(2).foreach { case Seq(a, b) => assert(a.compare(b) < 0); case _ => }
    // deep descendant of child 0 still sorts before child 1
    val deep = kids.head.child(3).child(2)
    assert(deep.compare(kids(1)) < 0)
  }

  test("bytes and string codecs round trip") {
    forAllPointsDepth(maxDepth = 30) { (p, depth) =>
      val cube = CubeId.containerAt(p, depth)
      assert(CubeId.fromBytes(2, cube.bytes) == cube)
      assert(CubeId.fromString(2, cube.toString) == cube)
    }
  }

  test("from/to bound the region; point on boundary goes to upper cube") {
    val c = CubeId.containerAt(Array(0.5, 0.5), 1)
    assert(c.coords.toSeq == Seq(1L, 1L))
    assert(c.from.toSeq == Seq(0.5, 0.5) && c.to.toSeq == Seq(1.0, 1.0))
    assert(c.contains(Array(1.0, 1.0))) // top edge belongs to last cube
  }
}

class WeightSpec extends AnyFunSuite {

  test("fraction maps the Int range onto [0,1] monotonically") {
    assert(Weight.MinValue.fraction == 0.0)
    assert(Weight.MaxValue.fraction == 1.0)
    val rnd = new scala.util.Random(44)
    (1 to 500).foreach { _ =>
      val a = rnd.nextInt(); val b = rnd.nextInt()
      if (a < b) assert(Weight(a).fraction <= Weight(b).fraction)
    }
  }

  test("fromFraction inverts fraction within one ulp of the int range") {
    val rnd = new scala.util.Random(45)
    (1 to 500).foreach { _ =>
      val f = rnd.nextDouble()
      val w = Weight.fromFraction(f)
      assert(math.abs(w.fraction - f) < 1e-9)
    }
  }

  test("fromFraction clamps") {
    assert(Weight.fromFraction(-1.0) == Weight.MinValue)
    assert(Weight.fromFraction(2.0) == Weight.MaxValue)
  }
}

class OTreeAlgorithmSpec extends AnyFunSuite {

  test("local builder domains: root sees everything, children partition the rest") {
    val builder = new LocalOTreeBuilder(2, 10, 1000)
    val rnd = new scala.util.Random(7)
    val points = Array.fill(1000)(Array(rnd.nextDouble(), rnd.nextDouble()))
    points.foreach(p => builder.add(p, rnd.nextInt()))
    val domains = builder.result().toMap.map { case (s, d) => CubeId.fromString(2, s) -> d }
    val root = CubeId.root(2)
    assert(domains(root) == 1000)
    val childSum = root.children.flatMap(domains.get).sum
    assert(childSum == 1000 - 10) // root keeps groupCubeSize, rest flows down
  }

  test("trie-backed builder emits exactly the map-walk domains (clustered + uniform)") {
    // reference implementation: the pre-trie map walk, verbatim
    def mapDomains(points: Seq[(Array[Double], Int)], groupCubeSize: Int)
        : Map[String, Long] = {
      val occupancy = scala.collection.mutable.HashMap.empty[CubeId, Int]
      val domains = scala.collection.mutable.HashMap.empty[CubeId, Long]
      // place lightest-first like the builder's flush sort
      points.sortBy(_._2).foreach { case (p, _) =>
        var cube = CubeId.root(2)
        var placed = false
        while (!placed) {
          domains.update(cube, domains.getOrElse(cube, 0L) + 1L)
          val used = occupancy.getOrElse(cube, 0)
          if (used < groupCubeSize || cube.depth >= CubeId.MaxDepth) {
            occupancy.update(cube, used + 1); placed = true
          } else cube = cube.childContaining(p)
        }
      }
      domains.map { case (c, d) => c.toString -> d }.toMap
    }
    val rnd = new scala.util.Random(13)
    // 10-cluster comb like the replica-shifted scale fixtures (deep
    // chimney) mixed with uniform points
    val points = (1 to 4000).map { i =>
      val p =
        if (i % 2 == 0) Array(rnd.nextDouble(), rnd.nextDouble())
        else {
          val c = rnd.nextInt(10) / 10.0
          Array(c + rnd.nextDouble() * 1e-5, c + rnd.nextDouble() * 1e-5)
        }
      (p, rnd.nextInt())
    }
    val builder = new LocalOTreeBuilder(2, 20, 1 << 20) // single flush
    points.foreach { case (p, w) => builder.add(p, w) }
    val got = builder.result().toMap
    assert(got == mapDomains(points, 20))
    assert(got.keys.map(CubeId.fromString(2, _).depth).max > 10,
      "the clustered fixture should force a deep tree")
  }

  test("estimated weights increase with depth and cap at MaxValue") {
    val builder = new LocalOTreeBuilder(2, 50, 10000)
    val rnd = new scala.util.Random(11)
    (1 to 5000).foreach(_ => builder.add(Array(rnd.nextDouble(), rnd.nextDouble()), rnd.nextInt()))
    val domains = builder.result().toMap.map { case (s, d) => CubeId.fromString(2, s) -> d }
    val (weights, _) = OTreeAlgorithm.estimateCubeWeights(domains, Map.empty, 1000)
    weights.foreach { case (cube, w) =>
      cube.parent.flatMap(weights.get).foreach { pw =>
        assert(pw.value <= w.value, s"parent weight must not exceed child at $cube")
      }
    }
    assert(weights(CubeId.root(2)) < Weight.MaxValue)
  }

  test("findTargetCube assigns light rows to the root, heavy rows deeper") {
    val root = CubeId.root(2)
    val p = Array(0.3, 0.7)
    val child = root.childContaining(p)
    val weights = Map(root -> Weight(0), child -> Weight.MaxValue)
    assert(OTreeAlgorithm.findTargetCube(p, -5, weights) == root)
    assert(OTreeAlgorithm.findTargetCube(p, 5, weights) == child)
  }

  test("rollup packs small cubes into ancestors and respects target size") {
    val root = CubeId.root(2)
    val kids = root.children.toSeq
    val counts: Map[CubeId, Long] =
      Map(root -> 100L, kids(0) -> 10L, kids(1) -> 2000L, kids(0).child(0) -> 5L)
    val rollup = OTreeAlgorithm.computeRollup(counts, 1000L)
    assert(rollup(kids(1)) == kids(1)) // big enough to stand alone
    assert(rollup(kids(0)) == root) // small → parent
    assert(rollup(kids(0).child(0)) == root) // grandchild cascades up
    assert(rollup(root) == root)
  }

  test("rollup seals groups at the target size regardless of fanout") {
    // 4 children of 600 rows at rollupSize 1000: a close-only-at-level
    // rollup would emit ONE 2400-row root file; sealing must emit two
    // groups, each under 2×rollupSize
    val root = CubeId.root(2)
    val kids = root.children.toSeq
    val counts: Map[CubeId, Long] = kids.map(_ -> 600L).toMap
    val groups = OTreeAlgorithm.computeRollupGroups(counts, 1000L)
    assert(groups.size == 2, s"expected 2 sealed groups, got $groups")
    groups.foreach { case (_, ms) =>
      val rows = ms.map(m => counts.getOrElse(m, 0L)).sum
      assert(rows < 2000L, s"group exceeds 2×rollupSize: $ms -> $rows")
    }
    // every member cube lands in exactly one group
    val all = groups.flatMap(_._2)
    assert(all.distinct.size == all.size)
    assert(kids.forall(all.contains))
  }

  test("groupCubeSize scales down with partitions but never below floor") {
    assert(OTreeAlgorithm.groupCubeSize(5000000, 1, 1000, 100000) == 5000000)
    assert(OTreeAlgorithm.groupCubeSize(5000000, 100, 1000, 100000) == 50000)
    assert(OTreeAlgorithm.groupCubeSize(1000, 1000, 100, 100000) == OTreeAlgorithm.MinGroupCubeSize)
  }
}
