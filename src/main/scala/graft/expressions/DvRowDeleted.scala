package graft.expressions

import graft.write.DeletionVectors

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructField}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * The merge-on-read mask probe: TRUE iff `(file, rowIndex)` is covered
 * by one of the table's deletion vectors. Planted by `rules/DvMaskRule`
 * as `Filter(NOT DvRowDeleted(_metadata.file_path, _metadata.row_index))`
 * directly above a masked table's scan.
 *
 * `dvMap` maps data-file BASENAMES (writer-generated UUIDs — the same
 * basename convention vacuum relies on) to vector paths. It rides a
 * BROADCAST, not the serialized expression: the map is O(#masked
 * files), and an expression-embedded copy would ship with every stage's
 * task binary and deserialize once per task — a dv-heavy table (1e5+
 * masked files) would pay megabytes per task. The broadcast is fetched
 * once per executor and shared (Delta ships DV descriptors per scan
 * file for the same reason; the broadcast is the per-query equivalent).
 * Driver-side, [[DeletionVectors.broadcastFor]] caches one broadcast
 * per (table, dv state) so repeated queries reuse it.
 *
 * Vectors themselves load lazily ON THE EXECUTOR through
 * [[DeletionVectors.cached]] — the driver never funnels row indexes —
 * and the probe is a binary search over the sorted indexes, memoized
 * per file (file_path is constant within a partition, so the
 * lookup-per-row collapses to one map hit per file plus an
 * O(log deletes) search per row). The memo compares the incoming
 * `UTF8String` against a CLONED copy of the last one (bytes, no
 * per-row `toString`); the clone matters because scan rows can reuse
 * their backing buffers — holding the original reference would let the
 * memo key mutate under us.
 *
 * Codegen: a reference object + instance call, same pattern as
 * [[KMeansAssign]] — the filter stays inside whole-stage codegen.
 */
final case class DvRowDeleted(
    left: Expression,
    right: Expression,
    tablePath: String,
    dvMap: Broadcast[Map[String, String]],
    sconf: SerializableConfiguration)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dv_row_deleted expects (string, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  // per-task memo of the last probed file's vector (file_path is
  // constant within a partition); lastFile is a defensive clone — see
  // the class doc
  @transient private var lastFile: UTF8String = _
  @transient private var lastVec: Array[Long] = _

  def isDeleted(file: UTF8String, rowIndex: Long): Boolean = {
    if (lastFile == null || !file.equals(lastFile)) {
      lastFile = file.clone()
      val path = file.toString
      val slash = path.lastIndexOf('/')
      val name = if (slash < 0) path else path.substring(slash + 1)
      lastVec = dvMap.value.get(name) match {
        case Some(dvPath) => DeletionVectors.cached(tablePath, sconf.value, dvPath)
        case None => null
      }
    }
    lastVec != null && java.util.Arrays.binarySearch(lastVec, rowIndex) >= 0
  }

  override protected def nullSafeEval(file: Any, idx: Any): Any =
    isDeleted(file.asInstanceOf[UTF8String], idx.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvmask", this,
      classOf[DvRowDeleted].getName)
    nullSafeCodeGen(ctx, ev, (f, i) => s"${ev.value} = $ref.isDeleted($f, $i);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvRowDeleted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dv_row_deleted"

}

object DvRowDeleted {

  /** The two `_metadata` fields the mask needs. */
  val FilePathField: StructField = StructField("file_path", StringType, nullable = false)
  val RowIndexField: StructField = StructField("row_index", LongType, nullable = false)

}
