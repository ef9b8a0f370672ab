package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with a typed metadata struct. The Spark-side shape —
 * schema, batch iteration via `mapPartitions`, partition sizing — is
 * real and tested; the actual codec calls are STUBBED (this container
 * ships no image/audio libraries) behind `DecodeStub` with a
 * deterministic fake, exactly where a JNI/FFmpeg/libvips call would go.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("checksum", StringType, nullable = false))), nullable = false)))

  /** Wrap a text table into the opaque-binary media shape (the test
   * corpus has no real images; payload = utf-8 bytes stands in). */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("application/octet-stream").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col(textCol), "UTF-8")).as("checksum")).as("meta"))

  /** STUB — replace with a real decoder (libvips / javacv / ffmpeg).
   * Deterministic fake so the pipeline shape is testable: "dimensions"
   * and "luma" derived from the payload's md5 digest, which makes the
   * fake exactly reproducible in the SQL oracle (hex-substring math over
   * `md5(text)`). */
  object DecodeStub {
    final case class Decoded(width: Int, height: Int, channels: Int, meanLuma: Double)

    private val digest =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    def decode(payload: Array[Byte]): Decoded = {
      // ??? <- real codec call goes here; deterministic fake below
      if (payload == null || payload.isEmpty) Decoded(0, 0, 0, 0.0)
      else {
        val md = digest.get()
        md.reset()
        val d = md.digest(payload)
        val w = 64 + (d(0) & 0x7f)
        val h = 64 + (d(1) & 0x7f)
        val luma = (((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)) / 16777215.0
        Decoded(w, h, 3, luma)
      }
    }
  }

  /** Frame sampling: split the payload into `frames` equal byte
   * segments — the plumbing shape of extracting video frames at fixed
   * timestamps (the seek/decode call is where a real codec goes). Works
   * over the hex encoding of the bytes so the checksum math is
   * byte-faithful AND replayable in the SQL oracle (DuckDB has no
   * md5(BLOB); both engines agree on hex(payload)). Emits one row per
   * frame with its size and checksum. */
  def frameSample(media: DataFrame, frames: Int = 4): DataFrame = {
    val hexs = hex(col("payload"))
    val segLen = floor(col("meta.n_bytes") / frames).cast("long")
    val frameArr = array((0 until frames).map { i =>
      hexs.substr((segLen * 2 * i + 1).cast("int"), (segLen * 2).cast("int"))
    }: _*)
    media.select(col("doc_id"), posexplode(frameArr).as(Seq("frame_idx", "fhex")))
      .select(col("doc_id"), col("frame_idx").cast("long"),
        (length(col("fhex")) / 2).cast("long").as("frame_bytes"),
        md5(col("fhex")).as("frame_md5"))
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Batch feature extraction: one decoder instance per partition (the
   * real-codec pattern), rows streamed through it. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("doc_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { rows =>
      // per-partition decoder init would happen here
      rows.map { row =>
        val d = DecodeStub.decode(row.getAs[Array[Byte]](payloadIdx))
        Row(row.getLong(idIdx), d.width, d.height, d.channels, d.meanLuma)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

}
