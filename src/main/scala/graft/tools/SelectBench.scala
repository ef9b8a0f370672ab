package graft.tools

import graft.core.model._
import graft.core.transform._
import graft.log.{FileCheckpoint, QbeastSnapshot}
import graft.read.{DistributedQbeastFileIndex, QbeastFileIndex}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/**
 * Driver-selection microbench (VERDICT r10 item 6): flat
 * `QbeastFileIndex.selectFiles` (driver-side scan of the in-memory
 * file list) vs the distributed sidecar path
 * (`DistributedQbeastFileIndex` over a parquet checkpoint) at 1e5 /
 * 1e6 / 4e6 synthetic files, for the same 10%-selectivity range
 * filter. Justifies / tunes the sidecar crossover
 * (`spark.qbeast.metadata.sidecar.minFiles`, default 10 000).
 *
 * Run: sbt "runMain graft.tools.SelectBench [sizes...]"
 */
object SelectBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .appName("select-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(100000, 1000000, 4000000)
    sizes.foreach(run(spark, _))
    spark.stop()
  }

  private def run(spark: SparkSession, n: Int): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"selbench-$n").toString
    val snap = mkSnapshot(dir, n)
    // ~10% selectivity range on the first indexed column
    val a = AttributeReference("a", LongType)()
    val filters: Seq[Expression] = Seq(
      GreaterThanOrEqual(a, Literal(400000000L)),
      LessThan(a, Literal(500000000L)))

    def time[T](reps: Int)(f: => T): (Double, T) = {
      var best = Double.MaxValue
      var out: T = f // warmup
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        out = f
        best = math.min(best, (System.nanoTime() - t0) / 1e6)
      }
      (best, out)
    }

    val (flatMs, flatSel) = time(3)(QbeastFileIndex.selectFiles(snap, filters))

    // the flat path's true cost includes materializing the file list on
    // the driver: time the checkpoint-line parse (Jackson fast path) —
    // the floor any complete snapshot pays before selectFiles can run
    val lines = snap.files.take(math.min(n, 200000))
      .map(f => graft.log.QbeastLogSerde.actionToJsonLine(
        graft.log.AddFileAction(f, dataChange = true)))
    val dimsOf: Long => Int = _ => 2
    val (parseSampleMs, _) = time(3) {
      var i = 0
      while (i < lines.length) {
        graft.log.QbeastLogSerde.parseLine(lines(i), dimsOf); i += 1
      }
    }
    val replayMs = parseSampleMs * (n.toDouble / lines.length)

    FileCheckpoint.write(spark, snap)
    val light = snap.copy(filesComplete = false, files = Vector.empty,
      checkpointVersion = snap.version)
    val idx = new DistributedQbeastFileIndex(spark, light)
    val (distMs, distSel) = time(3)(idx.listFiles(Nil, filters))
    val distFiles = distSel.map(_.files.size).sum

    println(f"[selbench] n=$n%8d flat=${flatMs}%9.1f ms (+replay~${replayMs}%9.1f ms, " +
      f"${flatSel.size}%7d files) distributed=${distMs}%9.1f ms ($distFiles%7d files)")
    // best-effort cleanup of the sidecar parquet
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    } catch { case scala.util.control.NonFatal(_) => }
  }

  private def mkSnapshot(dir: String, n: Int): QbeastSnapshot = {
    val rev = Revision(1L, 0L, dir, 5000,
      Vector(LinearTransformer("a", "bigint"), LinearTransformer("b", "double")),
      Vector(LinearTransformation(0.0, 1e9, 0.5), LinearTransformation(0.0, 1.0, 0.5)))
    val depth = 9
    val rnd = new java.util.Random(42)
    val stats =
      """{"numRecords":5000,"minValues":{"c":1},"maxValues":{"c":9},"nullCount":{"c":0}}"""
    val files = Vector.tabulate(n) { i =>
      val p = Array(rnd.nextDouble(), rnd.nextDouble())
      val cube = CubeId.containerAt(p, depth)
      IndexFile(s"f$i.parquet", 1000000L, 0L, 1L,
        Vector(Block(cube, Weight(Int.MinValue), Weight(Int.MaxValue), 5000L)),
        Some(stats))
    }
    QbeastSnapshot(dir, 1L, None, Map("qbeast.lastRevisionID" -> "1"),
      Map(1L -> rev), files, Map.empty)
  }

}
