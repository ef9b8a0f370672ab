package graft.core.model

import graft.core.transform.{Transformation, Transformer}

import scala.collection.immutable.SortedMap

/**
 * One generation of the index space: which columns are indexed, how each
 * maps onto [0,1], and the target cube size. A table accumulates
 * revisions as appends widen the space (reference:
 * `core/.../model/RevisionClasses.scala:131-195`).
 */
final case class Revision(
    revisionID: Long,
    timestamp: Long,
    tableID: String,
    desiredCubeSize: Int,
    columnTransformers: Vector[Transformer],
    transformations: Vector[Transformation])
    extends Serializable {

  def columnNames: Vector[String] = columnTransformers.map(_.columnName)

  def dimensionCount: Int = columnTransformers.size

  /** Staging revision 0 marks files written by plain parquet writers
   * (no index); they are root-only from the reader's perspective. */
  def isStaging: Boolean = revisionID == Revision.StagingID

  def transform(values: Array[Any]): Array[Double] = {
    val point = new Array[Double](values.length)
    var i = 0
    while (i < values.length) {
      point(i) = transformations(i).transform(values(i))
      i += 1
    }
    point
  }

  /** True iff `other`'s transformations require a wider space. */
  def isSupersededBy(newTransformations: Seq[Transformation]): Boolean =
    transformations.isEmpty ||
      transformations.lazyZip(newTransformations).exists((t, o) => t.isSupersededBy(o))

}

object Revision {

  val StagingID: Long = 0L

  def firstRevision(
      tableID: String,
      desiredCubeSize: Int,
      transformers: Vector[Transformer],
      transformations: Vector[Transformation]): Revision =
    Revision(1L, System.currentTimeMillis(), tableID, desiredCubeSize, transformers,
      transformations)

  def staging(tableID: String): Revision =
    Revision(StagingID, 0L, tableID, Int.MaxValue, Vector.empty, Vector.empty)

}

/** Reconstructed per-cube state of a revision's tree (reference:
 * `IndexStatusBuilder.scala:55-80`): `maxWeight` = min over blocks (the
 * guaranteed weight threshold), `elementCount` = sum over blocks. */
final case class CubeStatus(
    cubeId: CubeId,
    maxWeight: Weight,
    elementCount: Long)
    extends Serializable

final case class IndexStatus(
    revision: Revision,
    cubeStatuses: SortedMap[CubeId, CubeStatus])
    extends Serializable {

  /** Per-cube subtree sizes (elements reaching the cube), derived
   * bottom-up — the append-time prior for domain estimation. */
  def subtreeCounts: Map[CubeId, Long] = {
    if (cubeStatuses.isEmpty) return Map.empty
    val counts = scala.collection.mutable.HashMap.empty[CubeId, Long]
    // reverse pre-order = children before parents
    cubeStatuses.toSeq.reverseIterator.foreach { case (cube, status) =>
      val own = counts.getOrElse(cube, 0L) + status.elementCount
      counts.update(cube, own)
      cube.parent.foreach { p =>
        // propagate only into parents that exist in the index; missing
        // intermediate cubes roll into the nearest present ancestor
        var target = p
        while (!cubeStatuses.contains(target) && !target.isRoot)
          target = target.parent.get
        counts.update(target, counts.getOrElse(target, 0L) + own)
      }
    }
    counts.toMap
  }

}

object IndexStatus {
  def empty(revision: Revision): IndexStatus =
    IndexStatus(revision, SortedMap.empty[CubeId, CubeStatus])
}

/** Result of write-time analysis, broadcast to executors for the cube
 * assignment pass (reference: `BroadcastTableChanges.scala`). */
final case class TableChanges(
    revision: Revision,
    isNewRevision: Boolean,
    cubeWeights: Map[CubeId, Weight],
    estimatedCubeCounts: Map[CubeId, Long])
    extends Serializable
