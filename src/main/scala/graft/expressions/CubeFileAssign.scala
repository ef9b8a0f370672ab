package graft.expressions

import graft.core.model.{CubeId, Weight}
import graft.index.OTreeAlgorithm

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Per-row cube + rollup-file assignment for the indexed-write pipeline —
 * the codegen replacement for the write path's last Scala UDF
 * (`QbeastWriter.assignUdf`), which boxed every row's coordinates into a
 * `Seq[Double]` and round-tripped the result through a Scala tuple
 * encoder. Same algorithm (reference:
 * `core/src/main/scala/io/qbeast/spark/index/SparkPointWeightIndexer.scala:31-37`):
 * descend from the root to the first cube whose estimated max weight
 * admits the row, then map the cube to its rollup target file (nearest
 * known ancestor for fresh leaves).
 *
 * The cube-weight and file maps ride a Spark broadcast (one copy per
 * executor, not per task). The file payload is an INT index into the
 * write's target-file table — the 36-char UUID string used to ride the
 * write exchange on every row (36 B vs 4 B); the physical writer
 * resolves index → name once per FILE from its own broadcast of the
 * name table.
 */
final class CubeFileAssigner(
    bWeights: Broadcast[Map[CubeId, Weight]],
    bFiles: Broadcast[Map[CubeId, Int]],
    defaultFile: Int)
    extends Serializable {

  @transient private lazy val weights: Map[CubeId, Weight] = bWeights.value

  @transient private lazy val files: Map[CubeId, Int] = bFiles.value

  // ONE trie per executor, not per task: the assigner is serialized
  // into the task binary (addReferenceObj), so every task deserializes
  // a fresh instance — instance-local caching would rebuild the trie
  // (O(cubes·depth)) per task. The JVM-global cache keys on the
  // broadcast ids, which identify the (weights, files) pair across all
  // deserialized copies within this write. The per-row walk is then
  // child-pointer hops — no CubeId allocation, no byte-array hashing
  // per level.
  private def trieFor(dims: Int): graft.index.AssignTrie =
    if (dims > graft.index.CubeTrie.MaxTrieDims) null
    else CubeFileAssigner.trieCache.computeIfAbsent(
      (CubeFileAssigner.appDiscriminator, bWeights.id, bFiles.id, dims),
      { _ => new graft.index.AssignTrie(dims, weights, files, defaultFile) })

  def assign(coords: ArrayData, weight: Int): InternalRow = {
    val point = coords.toDoubleArray()
    val t = trieFor(point.length)
    if (t != null) {
      val cubeCoords = new Array[Long](point.length)
      val (depth, file) = t.walk(point, weight, cubeCoords)
      new GenericInternalRow(
        Array[Any](CubeId(point.length, depth, cubeCoords).bytes, file))
    } else {
      // high-dimensional fallback: the original map walk
      val cube = OTreeAlgorithm.findTargetCube(point, weight, weights)
      var c = cube
      var file = files.getOrElse(c, -1)
      // cube unseen at rollup time (fresh leaf): nearest known ancestor
      while (file < 0 && !c.isRoot) {
        c = c.parent.get
        file = files.getOrElse(c, -1)
      }
      new GenericInternalRow(
        Array[Any](cube.bytes, if (file < 0) defaultFile else file))
    }
  }

}

object CubeFileAssigner {

  /** Broadcast ids restart at 0 in every new SparkContext, so a JVM
   * that stops and recreates its session (tests, notebooks) could hit
   * a stale trie built from a PREVIOUS context's weights/files under
   * the same ids — silently wrong cube/file assignment. The
   * application id disambiguates contexts. */
  private[expressions] def appDiscriminator: String =
    Option(org.apache.spark.SparkEnv.get).map(_.conf.getAppId).getOrElse("")

  /** Executor-JVM-wide trie cache keyed by (appId, weightsBroadcastId,
   * filesBroadcastId, dims). Bounded: concurrent writes are rare
   * enough that dropping the oldest half on overflow is fine — a
   * rebuilt trie is only the cost this cache exists to amortize. */
  private[expressions] val trieCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long, Int), graft.index.AssignTrie] {
      override def computeIfAbsent(
          key: (String, Long, Long, Int),
          fn: java.util.function.Function[_ >: (String, Long, Long, Int), _ <: graft.index.AssignTrie])
          : graft.index.AssignTrie = {
        if (size() > 16) clear()
        super.computeIfAbsent(key, fn)
      }
    }

}

final case class CubeFileAssign(
    coords: Expression,
    weight: Expression,
    assigner: CubeFileAssigner)
    extends BinaryExpression {

  override def left: Expression = coords
  override def right: Expression = weight

  override def dataType: DataType = StructType(Seq(
    StructField("cube", BinaryType, nullable = false),
    StructField("file", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (coords.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && weight.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cube_file_assign expects (array<double>, int), got " +
        s"${coords.dataType.simpleString}, ${weight.dataType.simpleString}")
  }

  override protected def nullSafeEval(c: Any, w: Any): Any =
    assigner.assign(c.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  // the tree descent stays in a JVM helper; emitting the call via
  // nullSafeCodeGen keeps the whole write projection inside
  // whole-stage codegen instead of an interpreted ScalaUDF hop
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("assigner", assigner,
      classOf[CubeFileAssigner].getName)
    nullSafeCodeGen(ctx, ev, (c, w) => s"${ev.value} = $ref.assign($c, $w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CubeFileAssign =
    copy(coords = newLeft, weight = newRight)

}
