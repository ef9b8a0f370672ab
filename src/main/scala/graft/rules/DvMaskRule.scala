package graft.rules

import graft.expressions.DvRowDeleted
import graft.read.QbeastIndex

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{GetStructField, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/**
 * The read half of merge-on-read DELETE: every scan of a qbeast table
 * that has deletion vectors gets
 * `Project(output, Filter(NOT dv_row_deleted(_metadata.file_path,
 * _metadata.row_index), scan))` planted directly above it, so masked
 * rows never reach the query — same plan shape Delta's
 * PrepareDeltaScan family plants for DV tables. Tables without vectors
 * (the overwhelmingly common case) match nothing and pay nothing.
 *
 * The metadata columns come from the relation's own `metadataOutput`
 * (the V1 file-source `_metadata` struct), added to the relation's
 * output the same way the analyzer's AddMetadataColumns would; the
 * Project restores the user-visible schema. A table with vectors whose
 * scan cannot expose `_metadata` fails loudly — proceeding would
 * silently resurrect deleted rows.
 */
class DvMaskRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import DvMaskRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // internal readers (DML passes, rewrites, CDC diffs) mask
    // explicitly at DataFrame level — their relation already sits under
    // a dv_row_deleted filter; wrapping it again would make every row
    // pay the probe twice. Tag those before transforming.
    plan.foreach {
      case f: Filter
          if f.condition.exists(_.isInstanceOf[graft.expressions.DvRowDeleted]) =>
        f.child.foreach {
          case lr: LogicalRelation => lr.setTagValue(MaskedTag, ())
          case _ =>
        }
      case _ =>
    }
    maskScans(plan)
  }

  private def maskScans(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case lr @ LogicalRelation(HadoopFsRelation(fi: QbeastIndex, _, _, _, _, _), _, _, _, _)
        if lr.getTagValue(MaskedTag).isEmpty && fi.currentSnapshot.dvs.nonEmpty =>
      val snap = fi.currentSnapshot
      val withMeta: LogicalRelation = lr.withMetadataColumns()
      val metaAttr = withMeta.output.find(_.name == "_metadata").getOrElse(
        throw new IllegalStateException(
          s"qbeast table ${snap.tablePath} has deletion vectors but its scan " +
            "exposes no _metadata column — cannot mask deleted rows"))
      val st = metaAttr.dataType.asInstanceOf[StructType]
      val fp = GetStructField(metaAttr, st.fieldIndex("file_path"), Some("file_path"))
      val ri = GetStructField(metaAttr, st.fieldIndex("row_index"), Some("row_index"))
      val byName = snap.dvs.map { case (p, i) => new Path(p).getName -> i.dvPath }
      val probe = DvRowDeleted(fp, ri, snap.tablePath,
        graft.write.DeletionVectors.broadcastFor(spark, snap.tablePath, byName),
        new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
      withMeta.setTagValue(MaskedTag, ())
      Project(lr.output, Filter(Not(probe), withMeta))
  }

}

object DvMaskRule {

  /** Marks a relation the rule already wrapped (fixed-point batches
   * revisit the plan; tags ride node copies). */
  val MaskedTag: TreeNodeTag[Unit] = TreeNodeTag[Unit]("qbeast.dv.masked")

}
