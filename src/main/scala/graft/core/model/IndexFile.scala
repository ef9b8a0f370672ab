package graft.core.model

/**
 * A slice of one cube stored inside one physical file (reference:
 * `core/.../model/Block.scala:32-44`). Weights are the *actual* observed
 * min/max row weights in the slice, so block-level sampling pruning is
 * exact regardless of how approximate the estimated cube weights were.
 */
final case class Block(
    cube: CubeId,
    minWeight: Weight,
    maxWeight: Weight,
    elementCount: Long)
    extends Serializable

/** One Parquet file of an indexed table plus its index metadata
 * (reference: `core/.../model/QbeastFiles.scala:51-83`). `path` is
 * relative to the table root. */
final case class IndexFile(
    path: String,
    size: Long,
    modificationTime: Long,
    revisionId: Long,
    blocks: Vector[Block],
    stats: Option[String] = None)
    extends Serializable {

  def elementCount: Long = blocks.map(_.elementCount).sum

  def minWeight: Weight =
    if (blocks.isEmpty) Weight.MinValue else blocks.map(_.minWeight).min

}

/** A removed file recorded in the log. `size` (bytes, best-effort — 0
 * when unknown, e.g. old log lines) lets the streaming CDF source
 * admission-control delete-only commits by byte budget. */
final case class RemoveFile(path: String, deletionTimestamp: Long, size: Long = 0L)
  extends Serializable
