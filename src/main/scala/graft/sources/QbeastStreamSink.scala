package graft.sources

import graft.core.model.QbeastOptions
import graft.write.QbeastWriter

import org.apache.spark.sql.{DataFrame, GraftShims, SaveMode}
import org.apache.spark.sql.execution.streaming.Sink

/**
 * Structured Streaming sink: `writeStream.format("qbeast")` appends each
 * micro-batch through the indexed write pipeline. Exactly-once on
 * retries falls out of the commit log's txn idempotency keys
 * (appId = checkpoint location, version = batchId) — the reference is
 * batch-only (`QbeastAnalysis.scala:49`); this extends its lifecycle to
 * streams without new commit machinery.
 */
private[sources] class QbeastStreamSink(
    path: String,
    appId: String,
    parameters: Map[String, String],
    overwrite: Boolean = false)
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // materialized once: the indexed write is two passes (domain stats,
    // then the physical write), which would re-execute the micro-batch's
    // whole upstream plan — including any stateful operators feeding the
    // sink — per pass. A micro-batch is admission-bounded, so caching it
    // is O(batch), never O(table).
    val batch = GraftShims.asBatchDataFrame(data).localCheckpoint(true)
    try {
      val defaultCubeSize = spark.conf.getOption("spark.qbeast.index.defaultCubeSize")
        .map(_.toInt).getOrElse(QbeastOptions.DefaultCubeSize)
      val options = QbeastOptions(
        parameters ++ Map(
          QbeastOptions.TxnAppId -> s"qbeast-stream-$appId",
          QbeastOptions.TxnVersion -> batchId.toString),
        defaultCubeSize)
      // Complete mode: each trigger's FULL result replaces the table —
      // appending it would accumulate every trigger's snapshot
      QbeastWriter.save(spark, path, batch, options,
        if (overwrite) SaveMode.Overwrite else SaveMode.Append)
    } finally {
      // Dataset.unpersist is a no-op for localCheckpoint blocks (never
      // CacheManager-registered): release the RDD's blocks directly, or
      // a long-running stream pins every past micro-batch until GC
      graft.table.QbeastTable.releaseLocalCheckpoint(batch)
    }
  }

  override def toString: String = s"QbeastStreamSink[$path]"

}
