package graft.sql

import graft.rules.{QbeastAnalysis, SampleRule}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Murmur3Hash}

/**
 * Session extension wiring (reference:
 * `src/.../sql/QbeastSparkSessionExtension.scala:29-45`). Register with
 * `spark.sql.extensions=graft.sql.QbeastSparkSessionExtension` or
 * `.withExtensions(new QbeastSparkSessionExtension)`.
 */
class QbeastSparkSessionExtension extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectResolutionRule { session => new QbeastAnalysis(session) }
    extensions.injectOptimizerRule { session => new SampleRule(session) }
    // SQL surface for the row-weight hash: `WHERE qbeast_hash(a, b) < t`
    // is the deterministic-sampling predicate, and when (a, b) are the
    // indexed columns the FileIndex prunes on block weight ranges
    extensions.injectFunction((
      new FunctionIdentifier("qbeast_hash"),
      new ExpressionInfo(classOf[Murmur3Hash].getName, "qbeast_hash"),
      (children: Seq[Expression]) => new Murmur3Hash(children)))
  }

}
