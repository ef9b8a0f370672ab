package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-pruned LSH ANN (ops/Similarity.knnLshIndexed over
 * QTables.qbeastLshEmbeddings): the multi-probe predicate must reach
 * the qbeast file index as per-disjunct query spaces and prune files —
 * the indexed shape that makes the embedding surface scale like the
 * IVF path (e04). */
class AnnIndexedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("knnLshIndexed prunes files and matches the unindexed LSH result") {
    import spark.implicits._
    // synthetic embeddings big enough to cut MANY files (the sf0.001
    // fixture fits one file): same write recipe as
    // QTables.qbeastLshEmbeddings, smaller cubeSize
    val dim = 16
    val rnd = new scala.util.Random(97)
    val emb = (0 until 20000)
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val dir = TestSpark.tmpDir("ann-lsh-idx")
    emb.withColumn("bucket", ops.Similarity.lshBucket(col("embedding"), 6, dim))
      .repartition(col("bucket"))
      .write.format("qbeast")
      .option("columnsToIndex", "bucket")
      .option("columnStats", """{"bucket_min": 0, "bucket_max": 64}""")
      .option("cubeSize", "500")
      .save(dir)
    val lshTable = spark.read.format("qbeast").load(dir)
    val total = lshTable.inputFiles.length
    assert(total > 4, s"fixture too small to observe pruning: $total files")

    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val lsh = lshTable.filter(col("vec_id") =!= 0)
    val ann = ops.Similarity.knnLshIndexed(
      lsh, "vec_id", "embedding", "bucket", qv, k = 10)
    val read = filesRead(ann)
    assert(read < total, s"indexed LSH scan must prune: read $read of $total")

    // ground truth: same probes computed the direct way (bucket column
    // recomputed at read time, filter-only — the e02 shape at 6 bits)
    val qb = ops.Similarity.bucketOfVec(qv, bits = 6)
    val probes = ops.Similarity.probeBuckets(qb, bits = 6, radius = 2)
    assert(probes.length == 22) // 1 + 6 + C(6,2)
    val direct = emb.filter(col("vec_id") =!= 0)
      .withColumn("bucket", ops.Similarity.lshBucket(col("embedding"), 6, dim))
      .filter(col("bucket").isin(probes.toSeq: _*))
      .select(col("vec_id"), ops.Dedup.cosine(col("embedding"),
        lit(qv.toArray)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)

    val got = ann.collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
    val want = direct.collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
    assert(got.toSeq == want.toSeq,
      s"indexed result diverged from direct LSH: ${got.toSeq} vs ${want.toSeq}")

    // the e11 query itself runs end-to-end on the shipped fixture dir
    val e11 = SparkEntry.queries("e11_ann_lsh_indexed")(spark, sf)
    assert(e11.count() == 10)
  }

  test("pqTopKIndexed prunes files and matches the unindexed ADC scoring") {
    import spark.implicits._
    // synthetic corpus across 16 anchor clusters, many files
    val dim = 16
    val rnd = new scala.util.Random(41)
    val emb = (0 until 20000)
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") =!= 0)
    val anchors = ops.Similarity.collectAnchors(emb, "vec_id", "embedding")
    val codebooks = ops.Similarity.pqTrain(corpus, "vec_id", "embedding", m = 4, k = 4, iters = 1)
    val dir = TestSpark.tmpDir("ann-ivfpq-idx")
    corpus.select(col("vec_id"),
        ops.Similarity.anchorClusterCol(anchors, col("embedding")).as("cluster"),
        ops.Similarity.pqCodesCol(col("embedding"), codebooks).as("codes"))
      .repartition(col("cluster"))
      .write.format("qbeast")
      .option("columnsToIndex", "cluster")
      .option("columnStats", """{"cluster_min": 1, "cluster_max": 17}""")
      .option("cubeSize", "500")
      .option("deletionVectors", "true") // for the masked section below
      .save(dir)
    val tbl = spark.read.format("qbeast").load(dir)
    val total = tbl.inputFiles.length
    assert(total > 4, s"fixture too small to observe pruning: $total files")

    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val ann = ops.Similarity.pqTopKIndexed(
      tbl, "vec_id", "cluster", "codes", codebooks, anchors, qv, k = 10)
    val read = filesRead(ann)
    assert(read < total, s"indexed IVF-PQ scan must prune: read $read of $total")

    // ground truth: same probe set + ADC scoring computed the direct
    // way over recomputed cluster/codes columns (filter-only)
    val probes = anchors
      .map { case (aid, v) => (aid, ops.Similarity.cosineSeq(v.toSeq, qv)) }
      .sortBy { case (aid, c) => (-c, aid) }.take(3).map(_._1)
    val direct = corpus
      .withColumn("cluster", ops.Similarity.anchorClusterCol(anchors, col("embedding")))
      .filter(col("cluster").isin(probes: _*))
      .select(col("vec_id"),
        ops.Similarity.adcDistCol(codebooks, qv,
          ops.Similarity.pqCodesCol(col("embedding"), codebooks)).as("dist"))
      .orderBy(col("dist").asc, col("vec_id")).limit(10)
    val got = ann.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"indexed IVF-PQ diverged from direct ADC: $got vs $want")

    // codebook JSON sidecar round-trips exactly
    val json = ops.Similarity.pqCodebooksJson(codebooks)
    val back = ops.Similarity.pqCodebooksFromJson(json)
    assert(back.map(_.map { case (c, v) => (c, v.toSeq) }) ==
      codebooks.map(_.map { case (c, v) => (c, v.toSeq) }))

    // the e13 query itself runs end-to-end on the shipped fixture dir
    val e13 = SparkEntry.queries("e13_ann_ivf_pq")(spark, sf)
    assert(e13.count() == 10)

    // ---- masked IVF-PQ + re-rank: dv masks between coarse scan and
    // re-rank; REORG PURGE parity (the e16 shape) -------------------
    val t = graft.table.QbeastTable.forPath(spark, dir)
    assert(t.delete("vec_id % 17 = 3") > 0L)
    val s2 = t.snapshot
    assert(s2.dvs.nonEmpty, "the modulo delete must mask (opaque to stats)")
    val masked = spark.read.format("qbeast").load(dir)
    val annMasked = ops.Similarity.pqTopKIndexed(
      masked, "vec_id", "cluster", "codes", codebooks, anchors, qv, k = 10)
    // the pruned scan composes with the mask: still skips files
    assert(filesRead(annMasked) < total, "mask must not defeat cluster pruning")
    val gotMasked = annMasked.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // ground truth: direct ADC over the live (undeleted) corpus
    val directMasked = corpus
      .filter(col("vec_id") % 17 =!= 3)
      .withColumn("cluster", ops.Similarity.anchorClusterCol(anchors, col("embedding")))
      .filter(col("cluster").isin(probes: _*))
      .select(col("vec_id"),
        ops.Similarity.adcDistCol(codebooks, qv,
          ops.Similarity.pqCodesCol(col("embedding"), codebooks)).as("dist"))
      .orderBy(col("dist").asc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotMasked == directMasked, "masked candidates leaked into the coarse scan")
    assert(gotMasked.forall(_._1 % 17 != 3), "a deleted id ranked")
    // re-rank through raw vectors must not resurrect a masked candidate
    val rawTbl = TestSpark.tmpDir("ann-ivfpq-raw")
    corpus.write.format("qbeast").option("columnsToIndex", "vec_id")
      .option("cubeSize", "2000").save(rawTbl)
    val reranked = ops.Similarity.pqTopKReranked(masked,
      spark.read.format("qbeast").load(rawTbl), "vec_id", "embedding",
      "cluster", "codes", codebooks, anchors, qv, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(reranked.forall(_ % 17 != 3), "re-rank resurrected a masked candidate")
    // REORG PURGE: vectors materialized, content identical
    val purged = t.purgeDeletionVectors()
    assert(purged > 0 && t.snapshot.dvs.isEmpty)
    val annPurged = ops.Similarity.pqTopKIndexed(
      spark.read.format("qbeast").load(dir),
      "vec_id", "cluster", "codes", codebooks, anchors, qv, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(annPurged == gotMasked, "PURGE changed the masked ANN answer")
  }

  test("indexed ANN stays correct AND pruned across dv DELETE, dv UPDATE and REORG PURGE") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(131)
    val emb = (0 until 20000)
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val dir = TestSpark.tmpDir("ann-lsh-dml")
    emb.withColumn("bucket", ops.Similarity.lshBucket(col("embedding"), 6, dim))
      .repartition(col("bucket"))
      .write.format("qbeast")
      .option("columnsToIndex", "bucket")
      .option("columnStats", """{"bucket_min": 0, "bucket_max": 64}""")
      .option("cubeSize", "500")
      .option("deletionVectors", "true")
      .save(dir)
    val t = table.QbeastTable.forPath(spark, dir)
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)

    def tbl = spark.read.format("qbeast").load(dir).filter(col("vec_id") =!= 0)
    def ann() = ops.Similarity.knnLshIndexed(
      tbl, "vec_id", "embedding", "bucket", qv, k = 10)
    // direct ground truth over `expected` content (bucket recomputed,
    // filter-only — independent of the qbeast read path)
    val qb = ops.Similarity.bucketOfVec(qv, bits = 6)
    val probes = ops.Similarity.probeBuckets(qb, bits = 6, radius = 2)
    def direct(expected: DataFrame) = expected.filter(col("vec_id") =!= 0)
      .withColumn("bucket", ops.Similarity.lshBucket(col("embedding"), 6, dim))
      .filter(col("bucket").isin(probes.toSeq: _*))
      .select(col("vec_id"), ops.Dedup.cosine(col("embedding"),
        lit(qv.toArray)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
    def got() = ann().collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
    def assertPruned(tag: String): Unit = {
      val total = t.snapshot.files.size
      val read = filesRead(ann())
      assert(read < total, s"$tag: indexed scan must still prune ($read of $total)")
    }

    val base = got()
    assert(base == direct(emb), "baseline parity")
    assertPruned("baseline")

    // dv DELETE of the current top-3: rows must vanish from the ranking
    // while their files keep their bytes (mask, not rewrite)
    val victims = base.take(3).map(_._1)
    assert(t.delete(s"vec_id IN (${victims.mkString(",")})") == 3L)
    assert(t.snapshot.dvs.nonEmpty, "IN-delete on a bucket index must mask")
    val afterDel = got()
    assert(victims.forall(v => !afterDel.exists(_._1 == v)),
      s"masked rows resurfaced in ANN: $afterDel")
    val expDel = emb.filter(!col("vec_id").isin(victims: _*))
    assert(afterDel == direct(expDel), "post-delete parity")
    assertPruned("post-delete")

    // dv UPDATE (merge-on-read): re-key two of the new top-10; the
    // rewritten images land in fresh files, masks cover the originals
    val moved = afterDel.take(2).map(_._1)
    t.update(s"vec_id IN (${moved.mkString(",")})",
      Map("vec_id" -> "vec_id + 1000000"))
    val expUpd = expDel.withColumn("vec_id",
      when(col("vec_id").isin(moved: _*), col("vec_id") + 1000000L)
        .otherwise(col("vec_id")))
    val afterUpd = got()
    assert(afterUpd == direct(expUpd), "post-update parity")
    assert(moved.forall(m => afterUpd.exists(_._1 == m + 1000000L)),
      s"updated images missing from ANN: $afterUpd")
    assertPruned("post-update")

    // REORG APPLY (PURGE): masks materialize into rewritten files;
    // content and ranking must not move, vectors must clear
    val masked = t.snapshot.dvs.size
    assert(masked > 0)
    val purged = t.purgeDeletionVectors()
    assert(purged == masked, s"purged $purged of $masked masked files")
    assert(t.snapshot.dvs.isEmpty, "purge must clear every vector")
    assert(got() == afterUpd, "purge changed ANN content")
    assertPruned("post-purge")
  }

  test("probe radius bounds the bucket set correctly") {
    val qb = 0b101010L
    assert(ops.Similarity.probeBuckets(qb, 6, 0).toSeq == Seq(qb))
    val r1 = ops.Similarity.probeBuckets(qb, 6, 1)
    assert(r1.length == 7 && r1.forall(p =>
      java.lang.Long.bitCount(p ^ qb) <= 1))
    val r2 = ops.Similarity.probeBuckets(qb, 6, 2)
    assert(r2.length == 22 && r2.distinct.length == 22 &&
      r2.forall(p => java.lang.Long.bitCount(p ^ qb) <= 2))
  }
}
