package graft.rules

import graft.catalog.QbeastTableImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/**
 * Resolution rule swapping catalog (V2) qbeast relations for the V1
 * `HadoopFsRelation` read path (reference:
 * `src/.../rules/QbeastAnalysis.scala:33-57`) — keeping the same
 * attribute ids so parents resolve unchanged. This is what gives catalog
 * tables the custom FileIndex pruning + full FileSourceScanExec
 * performance instead of a row-based V2 scan.
 */
class QbeastAnalysis(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // DELETE FROM must keep the V2 relation: Spark plans it through
    // `SupportsDelete` on the connector table, not through a scan
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable => d
    case _ => plan transformUp {
      case v2 @ DataSourceV2Relation(table: QbeastTableImpl, output, _, _, _, _) =>
        LogicalRelation(
          table.toV1Relation(spark),
          output.map(_.asInstanceOf[AttributeReference]),
          None,
          false,
          None)
    }
  }

}
