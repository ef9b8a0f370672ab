package graft.core.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Parsed write options (reference: `core/.../model/QbeastOptions.scala`).
 * Option names match the reference's user API. */
final case class QbeastOptions(
    columnsToIndex: Seq[String],
    cubeSize: Int,
    columnStats: Option[String],
    txnAppId: Option[String],
    txnVersion: Option[Long],
    rollupSize: Option[Long],
    extra: Map[String, String]) {

  /** `bloomFilterColumns`: per-file bloom filters for equality skipping
   * on the named (non-indexed, high-cardinality) columns. None = not
   * specified (inherit the table's persisted config); Some(Nil) = the
   * explicit empty string, which TURNS OFF filters persisted earlier. */
  lazy val bloomFilterColumns: Option[Seq[String]] =
    extra.collectFirst {
      case (k, v) if k.equalsIgnoreCase(QbeastOptions.BloomFilterColumns) =>
        v.split(",").map(_.trim).toSeq.filter(_.nonEmpty)
    }

  lazy val bloomFilterBits: Option[Int] =
    extra.collectFirst {
      case (k, v) if k.equalsIgnoreCase(QbeastOptions.BloomFilterBits) => v.toInt
    }

  /** `hllColumns`: per-file HyperLogLog register stats for metadata-only
   * approximate distinct counts. Same tri-state discipline as
   * [[bloomFilterColumns]]: None = inherit the table's persisted
   * config; Some(Nil) = the explicit empty string, turn-off. */
  lazy val hllColumns: Option[Seq[String]] =
    extra.collectFirst {
      case (k, v) if k.equalsIgnoreCase(QbeastOptions.HllColumns) =>
        v.split(",").map(_.trim).toSeq.filter(_.nonEmpty)
    }

  /** `kllColumns`: per-file KLL quantile-sketch states for
   * metadata-only approximate quantiles. Same tri-state discipline as
   * [[bloomFilterColumns]]: None = inherit the table's persisted
   * config; Some(Nil) = the explicit empty string, turn-off. */
  lazy val kllColumns: Option[Seq[String]] =
    extra.collectFirst {
      case (k, v) if k.equalsIgnoreCase(QbeastOptions.KllColumns) =>
        v.split(",").map(_.trim).toSeq.filter(_.nonEmpty)
    }

  lazy val kllK: Option[Int] =
    extra.collectFirst {
      case (k, v) if k.equalsIgnoreCase(QbeastOptions.KllK) => v.toInt
    }

  /** True iff the caller explicitly passed cubeSize (vs the filled-in
   * default): appends without it inherit the existing revision's
   * configured size instead of resetting it (see RevisionFactory). */
  lazy val cubeSizeExplicit: Boolean =
    extra.keys.exists(_.equalsIgnoreCase(QbeastOptions.CubeSize))

  /** User-provided stats: `{"col_min":x,"col_max":y,"col_quantiles":[...]}` */
  lazy val parsedColumnStats: Map[String, JValue] = columnStats match {
    case None => Map.empty
    case Some(json) =>
      JsonMethods.parse(json) match {
        case JObject(fields) => fields.toMap
        case _ => Map.empty
      }
  }

}

object QbeastOptions {

  val DefaultCubeSize: Int = 5000000
  val DefaultBufferCapacity: Long = 100000L

  val ColumnsToIndex = "columnsToIndex"
  val CubeSize = "cubeSize"
  val ColumnStats = "columnStats"
  val TxnAppId = "txnAppId"
  val TxnVersion = "txnVersion"

  /** Comma-separated columns to build per-file bloom filters over at
   * write time (equality/IN file skipping on non-indexed columns). */
  val BloomFilterColumns = "bloomFilterColumns"

  /** Comma-separated columns to build per-file HLL register stats over
   * at write time (metadata-only approx distinct counts). */
  val HllColumns = "hllColumns"

  /** Bits per expected row for the per-file bloom filters (default
   * [[graft.write.BloomCollector.DefaultBitsPerKey]]-style sizing). */
  val BloomFilterBits = "bloomFilterBits"

  /** Comma-separated numeric/date/timestamp columns to build per-file
   * KLL quantile-sketch states over at write time (metadata-only
   * approximate quantiles). */
  val KllColumns = "kllColumns"

  /** Per-file KLL capacity: larger k = exact quantiles up to k rows per
   * file and lower merged rank error, at ~8·k bytes of log metadata per
   * file per column. */
  val KllK = "kllK"

  /** Target rows per output file (defaults to cubeSize). Larger values
   * cut file counts (fewer tasks/opens at scale); with rows sorted by
   * cube inside each file, parquet row-group stats recover the
   * intra-file pruning on 1 GB-class files. */
  val RollupSize = "rollupSize"

  def apply(parameters: Map[String, String], defaultCubeSize: Int = DefaultCubeSize): QbeastOptions = {
    val ci = CaseInsensitiveOpts(parameters)
    QbeastOptions(
      columnsToIndex = ci.get(ColumnsToIndex).map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty))
        .getOrElse(Nil),
      cubeSize = ci.get(CubeSize).map(_.toInt).getOrElse(defaultCubeSize),
      columnStats = ci.get(ColumnStats),
      txnAppId = ci.get(TxnAppId),
      txnVersion = ci.get(TxnVersion).map(_.toLong),
      rollupSize = ci.get(RollupSize).map(_.toLong),
      extra = parameters)
  }

  private case class CaseInsensitiveOpts(params: Map[String, String]) {
    private val lower = params.map { case (k, v) => k.toLowerCase -> v }
    def get(key: String): Option[String] = lower.get(key.toLowerCase)
  }

}
