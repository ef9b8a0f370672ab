package graft

import graft.core.model.{CubeId, Weight}
import graft.expressions.{CubeFileAssign, CubeFileAssigner}
import graft.index.OTreeAlgorithm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The write path's cube+file assignment as a native codegen expression:
 * bit-parity with a direct Scala evaluation of the same algorithm, and
 * the projection must stay inside whole-stage codegen (no ScalaUDF). */
class CubeFileAssignSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // file payloads are INT indexes into the write's target-file name
  // table (>= 0 by construction; the assigner treats < 0 as absent)
  private val DefaultFile = 999999

  private def buildMaps(dims: Int)
      : (Map[CubeId, Weight], Map[CubeId, Int]) = {
    // a tiny 2-level tree: root at 40%, children at graduated weights
    val root = CubeId.root(dims)
    val children = root.children.toSeq
    val weights = Map(root -> Weight(Int.MaxValue / 5 * 2)) ++
      children.zipWithIndex.map { case (c, i) =>
        c -> Weight(Int.MaxValue / 5 * math.min(4, 3 + i))
      }
    // only root and the first child got rollup files; other cubes must
    // fall back to the nearest mapped ancestor (root)
    val files = Map(root -> 0, children.head -> 1)
    (weights, files)
  }

  test("expression output matches direct Scala evaluation row-for-row") {
    import spark.implicits._
    val dims = 2
    val (weights, files) = buildMaps(dims)
    val assigner = new CubeFileAssigner(
      spark.sparkContext.broadcast(weights),
      spark.sparkContext.broadcast(files), DefaultFile)

    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      (Array(rnd.nextDouble(), rnd.nextDouble()), rnd.nextInt())
    }
    val df = rows.toDF("coords", "w")
    val shims = org.apache.spark.sql.GraftShims
    val out = df.select(
      shims.column(CubeFileAssign(
        shims.expression(col("coords").cast("array<double>")),
        shims.expression(col("w")), assigner)).as("a"))
      .select(col("a.cube"), col("a.file"))
      .collect()

    rows.zip(out).foreach { case ((coords, w), row) =>
      val cube = OTreeAlgorithm.findTargetCube(coords, w, weights)
      var c = cube
      var file = files.getOrElse(c, -1)
      while (file < 0 && !c.isRoot) {
        c = c.parent.get
        file = files.getOrElse(c, -1)
      }
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("cube"), cube.bytes))
      assert(row.getAs[Int]("file") === (if (file < 0) DefaultFile else file))
    }
  }

  test("trie walk matches the map walk on a deep clustered tree") {
    // a depth-22 chimney with sparse branches and PARTIAL file coverage:
    // exercises absent-cube stops, ancestor file fallback across many
    // levels, and the depth accumulation of the trie's coords
    val dims = 2
    val rnd = new scala.util.Random(23)
    val clusters = (0 until 10).map(i => Array(i / 10.0 + 1e-7, i / 10.0 + 1e-7))
    val weightsB = Map.newBuilder[CubeId, Weight]
    val filesB = Map.newBuilder[CubeId, Int]
    clusters.zipWithIndex.foreach { case (c, ci) =>
      var cube = CubeId.root(dims)
      (0 until 22).foreach { lvl =>
        weightsB += cube -> Weight(Int.MinValue + (lvl + 1) * (Int.MaxValue / 16))
        if (lvl % 3 == ci % 3) filesB += cube -> (ci * 100 + lvl)
        cube = cube.childContaining(c)
      }
    }
    val (weights, files) = (weightsB.result(), filesB.result())
    val assigner = new CubeFileAssigner(
      spark.sparkContext.broadcast(weights),
      spark.sparkContext.broadcast(files), DefaultFile)

    import spark.implicits._
    val rows = (1 to 3000).map { _ =>
      val base = clusters(rnd.nextInt(clusters.size))
      val p =
        if (rnd.nextBoolean()) Array(rnd.nextDouble(), rnd.nextDouble())
        else Array(base(0) + rnd.nextDouble() * 1e-6, base(1) + rnd.nextDouble() * 1e-6)
      (p, rnd.nextInt())
    }
    val shims = org.apache.spark.sql.GraftShims
    val out = rows.toDF("coords", "w").select(
      shims.column(CubeFileAssign(
        shims.expression(col("coords").cast("array<double>")),
        shims.expression(col("w")), assigner)).as("a"))
      .select(col("a.cube"), col("a.file")).collect()
    rows.zip(out).foreach { case ((coords, w), row) =>
      val cube = OTreeAlgorithm.findTargetCube(coords, w, weights)
      var c = cube
      var file = files.getOrElse(c, -1)
      while (file < 0 && !c.isRoot) {
        c = c.parent.get
        file = files.getOrElse(c, -1)
      }
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("cube"), cube.bytes),
        s"cube mismatch at ${coords.mkString(",")} w=$w: " +
          s"got ${CubeId.fromBytes(dims, row.getAs[Array[Byte]]("cube"))}, want $cube")
      assert(row.getAs[Int]("file") === (if (file < 0) DefaultFile else file))
    }
  }

  test("assignment projection runs in whole-stage codegen with no ScalaUDF") {
    import spark.implicits._
    val dims = 2
    val (weights, files) = buildMaps(dims)
    val assigner = new CubeFileAssigner(
      spark.sparkContext.broadcast(weights),
      spark.sparkContext.broadcast(files), DefaultFile)
    val shims = org.apache.spark.sql.GraftShims
    val df = spark.range(100)
      .select(array((col("id") / 100.0), (col("id") % 10) / 10.0).as("coords"),
        col("id").cast("int").as("w"))
      .select(shims.column(CubeFileAssign(
        shims.expression(col("coords").cast("array<double>")),
        shims.expression(col("w")), assigner)).as("a"))
    df.collect()
    val executed = df.queryExecution.executedPlan
    val plan = executed.toString
    assert(!plan.contains("ScalaUDF"), s"write assignment must be UDF-free:\n$plan")
    val codegenned = executed.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenned.nonEmpty, s"expected a WholeStageCodegen stage:\n$plan")
  }

}
