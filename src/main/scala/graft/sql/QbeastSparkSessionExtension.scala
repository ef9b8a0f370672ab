package graft.sql

import graft.rules.{QbeastAnalysis, SampleRule}

import org.apache.spark.sql.SparkSessionExtensions

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
  }

}
