package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Metadata-scale probe for the round-12 additions: a synthetic log of
 * N files (default 1e5), each carrying per-file column stats PLUS a
 * realistic KLL state (k=256, 200 rows/file — the small-file worst
 * case for metadata volume), measuring
 *   1. log/stats bytes per file with the kll section attached,
 *   2. snapshot load time at that stats weight,
 *   3. QbeastTable.approxQuantile driver fold time (parse + merge of
 *      N states) and its estimate's rank error,
 *   4. selectFiles with a date-FUNCTION predicate (year(d) = …) vs the
 *      equivalent raw range — the DerivedPredicates expansion overhead
 *      and its selectivity parity.
 * Run: sbt "runMain graft.tools.KllScaleProbe [numFiles]"
 */
object KllScaleProbe {

  def main(args: Array[String]): Unit = {
    val numFiles = if (args.length > 0) args(0).toInt else 100000
    val rowsPerFile = 200
    val dir = java.nio.file.Files.createTempDirectory("kllscale").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "a BIGINT, v DOUBLE, d DATE")
    val rev = graft.core.model.Revision(1L, 0L, dir, 5000000,
      Vector(graft.core.transform.LinearTransformer("a", "linear")),
      Vector(graft.core.transform.LinearTransformation(0, numFiles.toLong * rowsPerFile, 42L)))
    val root = graft.core.model.CubeId.root(1)

    // deterministic per-file KLL state over a global uniform ramp:
    // file f holds values f*rows .. f*rows+rows-1 (time-ordered files,
    // like an ingest), d = one day per ~64 files (year-clustered dates)
    def statsJson(f: Int): String = {
      val st = new graft.expressions.KllState(256)
      val base = f.toLong * rowsPerFile
      var i = 0
      while (i < rowsPerFile) { st.add((base + i).toDouble); i += 1 }
      val b64 = java.util.Base64.getEncoder.encodeToString(st.serialize())
      val day = 9131 + f / 64 // 1995-01-01 onward, ~4.3 years at 1e5
      s"""{"numRecords":$rowsPerFile,"minValues":{"a":$base,"v":$base.0,"d":$day},""" +
        s""""maxValues":{"a":${base + rowsPerFile - 1},"v":${base + rowsPerFile - 1}.0,"d":$day},""" +
        s""""nullCount":{"a":0,"v":0,"d":0},"kll":{"v":"$b64"}}"""
    }

    val batch = 25000
    var version = -1L
    var written = 0
    var statsBytes = 0L
    val t0 = System.nanoTime()
    while (written < numFiles) {
      val n = math.min(batch, numFiles - written)
      val actions = new scala.collection.mutable.ArrayBuffer[graft.log.LogAction](n + 2)
      if (written == 0) {
        actions += graft.log.MetaDataAction(schema.json,
          Map("qbeast.lastRevisionID" -> "1", "qbeast.kllColumns" -> "v",
            "qbeast.kllK" -> "256"))
        actions += graft.log.RevisionAction(rev)
      }
      var i = 0
      while (i < n) {
        val k = written + i
        val js = statsJson(k)
        statsBytes += js.length
        actions += graft.log.AddFileAction(graft.core.model.IndexFile(
          path = s"f$k.parquet", size = 12800000L, modificationTime = 0L,
          revisionId = 1L,
          blocks = Vector(graft.core.model.Block(root,
            graft.core.model.Weight(0), graft.core.model.Weight.MaxValue,
            rowsPerFile.toLong)),
          stats = Some(js)), dataChange = true)
        i += 1
      }
      version = graft.log.QbeastLog.commit(dir, conf, version, actions.toSeq)
      written += n
    }
    println(f"[kllscale] wrote $numFiles%d AddFiles (${statsBytes / numFiles}%d stats B/file, " +
      f"${statsBytes / 1e6}%.0f MB total stats) in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val t1 = System.nanoTime()
    val snap = graft.log.QbeastLog.snapshot(dir, conf)
    println(f"[kllscale] snapshot: files=${snap.files.size}%d load=${(System.nanoTime() - t1) / 1e9}%.1f s")

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.table.QbeastTable.forPath(spark, dir)
    val total = numFiles.toLong * rowsPerFile
    var best = Double.MaxValue
    var got: Seq[Double] = Nil
    for (_ <- 1 to 3) {
      val ta = System.nanoTime()
      got = t.approxQuantile("v", Seq(0.5, 0.99)).getOrElse(sys.error("fold bailed"))
      best = math.min(best, (System.nanoTime() - ta) / 1e9)
    }
    val err50 = math.abs(got(0) / total - 0.5)
    val err99 = math.abs(got(1) / total - 0.99)
    println(f"[kllscale] approxQuantile fold over $numFiles%d states: best=$best%.2f s " +
      f"p50=${got(0)}%.0f (rank err ${err50 * 100}%.2f%%) p99=${got(1)}%.0f (rank err ${err99 * 100}%.2f%%)")

    // ---- derived date-function predicate vs raw range at 1e5 files ----
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val d = AttributeReference("d", DateType)()
    // a year the fixture's date ramp actually reaches at any N: the
    // middle file's year
    val midYear = java.time.LocalDate.ofEpochDay(9131L + (numFiles / 2) / 64).getYear
    val yearFilter = EqualTo(Year(d), Literal(midYear))
    val lo = java.time.LocalDate.of(midYear, 1, 1).toEpochDay.toInt
    val hi = java.time.LocalDate.of(midYear + 1, 1, 1).toEpochDay.toInt
    val rawFilter = And(GreaterThanOrEqual(d, Literal(lo, DateType)),
      LessThan(d, Literal(hi, DateType)))
    def time3(f: => Int): (Double, Int) = {
      var bs = Double.MaxValue; var n = 0
      for (_ <- 1 to 3) {
        val tt = System.nanoTime()
        n = f
        bs = math.min(bs, (System.nanoTime() - tt) / 1e9)
      }
      (bs, n)
    }
    val (ty, ny) = time3(graft.read.QbeastFileIndex.selectFiles(snap, Seq(yearFilter)).size)
    val (tr, nr) = time3(graft.read.QbeastFileIndex.selectFiles(snap, Seq(rawFilter)).size)
    println(f"[kllscale] selectFiles(year(d)=$midYear%d): $ny%d files in $ty%.2f s; " +
      f"raw range: $nr%d files in $tr%.2f s (parity=${ny == nr}%b)")

    // ---- sidecar-scale SKETCH folds (round-14 probe): the filtered
    // approxQuantile path runs tri-state stats proofs AND the KLL state
    // merge as ONE Spark job over the parquet checkpoint; only
    // per-partition state partials reach the driver ----
    val fsys = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val tcp = System.nanoTime()
    graft.log.QbeastLog.writeCheckpoint(fsys, snap)
    graft.log.FileCheckpoint.write(spark, snap)
    println(f"[kllscale] checkpoint + parquet sidecar write: " +
      f"${(System.nanoTime() - tcp) / 1e9}%.1f s")
    graft.log.QbeastLog.invalidateCache()
    spark.conf.set("spark.qbeast.metadata.sidecar.minFiles", "0")
    val tls = System.nanoTime()
    val lightSnap = graft.log.QbeastLog.lightSnapshot(dir, conf)
    println(f"[kllscale] light snapshot: complete=${lightSnap.filesComplete}%b " +
      f"load=${(System.nanoTime() - tls) / 1e9}%.2f s tail=${lightSnap.files.size}%d")
    val tws = System.nanoTime()
    graft.log.QbeastLog.lightSnapshot(dir, conf)
    println(f"[kllscale] light snapshot warm hit: ${(System.nanoTime() - tws) / 1e6}%.2f ms")

    def timeQ(label: String)(body: => Option[Seq[Double]]): Unit = {
      var bq = Double.MaxValue
      var res: Option[Seq[Double]] = None
      for (_ <- 1 to 3) {
        val tq = System.nanoTime()
        res = body
        bq = math.min(bq, (System.nanoTime() - tq) / 1e9)
      }
      println(f"[kllscale] $label%s: best=$bq%.2f s -> " +
        res.map(_.map(v => f"$v%.0f").mkString(",")).getOrElse("BAILED"))
    }
    // unfiltered sidecar fold (DistributedMetadata.kllState, one job)
    timeQ("sidecar approxQuantile(v, p50/p99)")(
      t.approxQuantile("v", Seq(0.5, 0.99)))
    // filtered folds: a 40%-of-files range cut and a derived-date cut —
    // every file proves TRUE or FALSE, so the fold must answer
    val cut = (total * 0.4).toLong - (total * 0.4).toLong % rowsPerFile
    timeQ(s"sidecar filtered approxQuantile(v | a < $cut)")(
      t.approxQuantile("v", Seq(0.5, 0.99), s"a < $cut"))
    timeQ(s"sidecar filtered approxQuantile(v | year(d) = $midYear)")(
      t.approxQuantile("v", Seq(0.5), s"year(d) = $midYear"))

    spark.stop()
  }

}
