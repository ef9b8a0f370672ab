package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Baseline: brute-force cosine top-k — a single map-side pass plus a
 * top-k sort (Spark's `orderBy + limit` executes as per-partition top-k
 * + driver merge, no full shuffle). Scale path: sign-projection LSH
 * buckets (deterministic hyperplanes) so candidate generation is an
 * equi-join on bucket id; at 100 TB only same-bucket pairs are scored.
 */
object Similarity {

  /** Deterministic pseudo-random hyperplanes (seed 42) for `bits`-bit
   * sign-projection LSH over `dim`-dimensional embeddings. */
  def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: sign bit per hyperplane. */
  def lshBucketUdf(bits: Int, dim: Int) = {
    val planes = hyperplanes(bits, dim)
    udf { (emb: Seq[Float]) =>
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        val p = planes(b)
        var i = 0
        while (i < dim && i < emb.length) { dot += p(i) * emb(i); i += 1 }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      bucket
    }
  }

  /** Exact cosine top-k neighbours of `queryVec`. */
  def knnExact(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      queryVec: Seq[Double],
      k: Int): DataFrame = {
    val q = lit(queryVec.toArray)
    val sim = Dedup.cosine(col(embCol), q)
    embeddings
      .select(col(idCol), sim.as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Approximate top-k: candidates share the query's LSH bucket (or any
   * bucket within Hamming distance 1 — cheap multi-probe), scored
   * exactly. Trades recall for touching only ~1/2^bits of the data. */
  def knnLsh(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      queryVec: Seq[Double],
      k: Int,
      bits: Int = 8): DataFrame = {
    val dim = queryVec.length
    val bucketOf = lshBucketUdf(bits, dim)
    val qEmb = queryVec.map(_.toFloat)
    val qBucket = {
      val planes = hyperplanes(bits, dim)
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += planes(b)(i) * qEmb(i); i += 1 }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      bucket
    }
    val probes = (qBucket +: (0 until bits).map(b => qBucket ^ (1L << b))).toArray
    val sim = Dedup.cosine(col(embCol), lit(queryVec.toArray))
    embeddings
      .withColumn("bucket", bucketOf(col(embCol)))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), sim.as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /**
   * IVF (inverted-file) approximate top-k: k-means centroids partition
   * the vectors; the query scans only the `nProbe` clusters with the
   * nearest centroids. At 100 TB the cluster assignment is a write-time
   * column (data co-located by `repartition(cluster)`), making each
   * query a partition-pruned scan; here the assignment happens inline.
   */
  def knnIvf(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      queryVec: Seq[Double],
      k: Int,
      nClusters: Int = 16,
      nProbe: Int = 3): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = embeddings.withColumn("_vec",
      array_to_vector(col(embCol).cast("array<double>")))
    val model = new KMeans().setK(nClusters).setSeed(42L)
      .setFeaturesCol("_vec").setPredictionCol("_cluster")
      .fit(withVec)
    val assigned = model.transform(withVec)
    val centroids = model.clusterCenters
    val qArr = queryVec.toArray
    val probes = centroids.zipWithIndex.map { case (c, i) =>
      val arr = c.toArray
      var d = 0.0
      var j = 0
      while (j < arr.length && j < qArr.length) {
        val diff = arr(j) - qArr(j); d += diff * diff; j += 1
      }
      (i, d)
    }.sortBy(_._2).take(nProbe).map(_._1)
    val sim = Dedup.cosine(col(embCol), lit(qArr))
    assigned
      .filter(col("_cluster").isin(probes.toSeq: _*))
      .select(col(idCol), sim.as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** All pairs with cosine ≥ threshold, LSH-blocked (equi-join on bucket;
   * near-identical vectors collide with high probability). */
  def nearDupPairs(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      bits: Int = 8,
      dim: Int = 64): DataFrame = {
    val bucketOf = lshBucketUdf(bits, dim)
    val withBucket = embeddings.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("bucket", bucketOf(col("emb")))
    val a = withBucket.alias("a")
    val b = withBucket.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Dedup.cosine(col("a.emb"), col("b.emb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

}
