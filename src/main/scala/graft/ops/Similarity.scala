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

  /** Deterministic hyperplanes for `bits`-bit sign-projection LSH over
   * `dim`-dimensional embeddings: components are md5-derived uniforms in
   * [-1, 1), so the oracle re-derives the identical planes in SQL
   * (`('0x'||substr(md5('p_b_i'),1,8))::BIGINT / 2^31 - 1`). */
  def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] =
    hyperplanesFrom(0, bits, dim)

  /** Deterministic hyperplanes starting at plane index `offset` — used to
   * draw an independent bank of planes for hot-bucket refinement without
   * disturbing the base bank the oracle unrolls (`p_0..p_{bits-1}`). */
  def hyperplanesFrom(offset: Int, bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits)(b =>
      Array.tabulate(dim)(i => HashUtils.h32(s"p_${offset + b}_$i") / 2147483648.0 - 1.0))

  /** LSH bucket id: sign bit per hyperplane. `planeOffset` selects an
   * independent plane bank (offset into the deterministic plane stream).
   * Native codegen expression ([[graft.expressions.LshBucket]]): runs
   * once per row on every side of the LSH joins, so keeping it inside
   * whole-stage codegen (no `Seq[Float]` boxing per row) matters. */
  def lshBucket(c: Column, bits: Int, dim: Int, planeOffset: Int = 0): Column = {
    val shims = org.apache.spark.sql.GraftShims
    shims.column(graft.expressions.LshBucket(
      shims.expression(c), bits, dim, planeOffset))
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

  /** Approximate top-k: candidates share the query's LSH bucket or any
   * bucket within Hamming distance ≤ 2 (multi-probe), scored exactly.
   * Radius 2 over 8 bits probes 37/256 buckets ≈ 14% of the data —
   * measured to roughly triple recall on unclustered vectors vs
   * radius 1 while staying a pruned scan. */
  def knnLsh(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      queryVec: Seq[Double],
      k: Int,
      bits: Int = 8): DataFrame = {
    val dim = queryVec.length
    val qBucket = bucketOfVec(queryVec, bits)
    val probes = probeBuckets(qBucket, bits, radius = 2)
    val sim = Dedup.cosine(col(embCol), lit(queryVec.toArray))
    embeddings
      .withColumn("bucket", lshBucket(col(embCol), bits, dim))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), sim.as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side LSH bucket of a query vector — float-rounds the
   * components first so it is bit-consistent with the executor-side
   * [[lshBucket]] over `array<float>` columns. */
  def bucketOfVec(queryVec: Seq[Double], bits: Int): Long = {
    val dim = queryVec.length
    val qEmb = queryVec.map(_.toFloat)
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

  /** Multi-probe bucket set: every bucket within Hamming distance ≤
   * `radius` (∈ {0,1,2}) of `qBucket`, the query bucket first. */
  def probeBuckets(qBucket: Long, bits: Int, radius: Int): Array[Long] = {
    require(radius >= 0 && radius <= 2, s"probe radius $radius not in [0,2]")
    val r1 = if (radius >= 1) (0 until bits).map(b => qBucket ^ (1L << b)) else Nil
    val r2 =
      if (radius >= 2)
        for (a <- 0 until bits; b <- a + 1 until bits)
          yield qBucket ^ (1L << a) ^ (1L << b)
      else Nil
    (qBucket +: (r1 ++ r2)).toArray
  }

  /**
   * ANN over a table that carries a WRITE-TIME LSH bucket column (see
   * `QTables.qbeastLshEmbeddings`), qbeast-indexed and co-located on
   * it: the multi-probe predicate is an OR of bucket EQUALITIES — each
   * disjunct becomes its own query space in the file index
   * (QuerySpecBuilder expands up to 32 disjuncts), so the scan reads
   * only the files holding probed buckets. An IN-list would instead
   * collapse to one covering range over scattered probe values and
   * prune nothing. Defaults bits=6, radius=2 → 22 probes ≤ the
   * 32-disjunct expansion cap, scanning ~22/64 of the table; at 100 TB
   * this is the same indexed shape as IVF (e04) with no anchor model —
   * the bucket function is deterministic hyperplane signs.
   */
  def knnLshIndexed(
      lshTable: DataFrame,
      idCol: String,
      embCol: String,
      bucketCol: String,
      queryVec: Seq[Double],
      k: Int,
      bits: Int = 6,
      radius: Int = 2): DataFrame = {
    val qBucket = bucketOfVec(queryVec, bits)
    val probes = probeBuckets(qBucket, bits, radius)
    val pred = probes.map(p => col(bucketCol) === lit(p)).reduce(_ || _)
    val sim = Dedup.cosine(col(embCol), lit(queryVec.toArray))
    lshTable
      .filter(pred)
      .select(col(idCol), sim.as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side cosine with the same sequential fold as
   * [[Dedup.cosine]], so probe selection is bit-consistent with the
   * distributed computation (and the SQL oracle). */
  def cosineSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length && i < b.length) { dot += a(i) * b(i); i += 1 }
    i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Collect the IVF anchor vectors: rows with 1 ≤ id ≤ nAnchors. The
   * anchors double as cluster centroids — deterministic (no fitted
   * model), so both the write-time assignment and the oracle reproduce
   * them exactly. */
  def collectAnchors(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      nAnchors: Int = 16): Seq[(Int, Array[Double])] =
    embeddings.filter(col(idCol).between(1, nAnchors))
      .select(col(idCol).cast("int"), col(embCol))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
      .toSeq

  /** Cluster-assignment column: argmax over anchors of cosine similarity
   * (ties → lowest anchor id). Pure `functions._` — evaluated map-side
   * at write time, no shuffle, no model. */
  def anchorClusterCol(anchors: Seq[(Int, Array[Double])], embCol: Column): Column = {
    val scored = anchors.map { case (aid, vec) =>
      struct(Dedup.cosine(embCol, lit(vec)).as("sim"), lit(-aid).as("naid"))
    }
    (-greatest(scored: _*).getField("naid")).cast("int")
  }

  /**
   * IVF (inverted-file) approximate top-k over a table that carries a
   * write-time `cluster` column (see `QTables.qbeastIvfEmbeddings`): the
   * query scores anchors on the driver (tiny), then scans only the
   * `nProbe` nearest clusters. With the table qbeast-indexed and
   * co-located on `cluster`, the scan is file-pruned — at 100 TB this is
   * a pruned read of ~nProbe/nClusters of the data, and no clustering
   * model is fit anywhere in the query path.
   */
  def knnIvfIndexed(
      ivfTable: DataFrame,
      idCol: String,
      embCol: String,
      clusterCol: String,
      anchors: Seq[(Int, Array[Double])],
      queryVec: Seq[Double],
      k: Int,
      nProbe: Int = 3): DataFrame = {
    val probes = anchors
      .map { case (aid, vec) => (aid, cosineSeq(vec.toSeq, queryVec)) }
      .sortBy { case (aid, c) => (-c, aid) }
      .take(nProbe)
      .map(_._1)
    val sim = Dedup.cosine(col(embCol), lit(queryVec.toArray))
    ivfTable
      .filter(col(clusterCol).isin(probes: _*))
      .select(col(idCol), sim.as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // ---- int8 quantization ---------------------------------------------------

  /** Symmetric int8 quantization of an embedding column: per-vector
   * scale 127/max|v|, values rounded with floor(x+0.5) (identical
   * semantics in Java and SQL — Math.round and C round() disagree on
   * negative ties). 4× memory/bandwidth reduction for ANN at scale.
   * Native codegen expression ([[graft.expressions.Int8Quantize]]): one
   * fused loop instead of three interpreted HOF passes, and the
   * enclosing projection stays inside whole-stage codegen. */
  def int8Quantize(emb: Column): Column = {
    val shims = org.apache.spark.sql.GraftShims
    shims.column(graft.expressions.Int8Quantize(shims.expression(emb)))
  }

  /** Integer dot product of two quantized vectors (exact, order-free;
   * native codegen — [[graft.expressions.IntegerDotProduct]]). */
  def intDot(a: Column, b: Column): Column = {
    val shims = org.apache.spark.sql.GraftShims
    shims.column(graft.expressions.IntegerDotProduct(
      shims.expression(a), shims.expression(b)))
  }

  /** Approximate cosine from quantized vectors: intDot / (|a|·|b|). */
  def int8Cosine(a: Column, b: Column): Column =
    intDot(a, b).cast("double") /
      (sqrt(intDot(a, a).cast("double")) * sqrt(intDot(b, b).cast("double")))

  /** Driver-side quantization with the identical formula, for query
   * vectors. */
  def int8QuantizeSeq(v: Seq[Double]): Array[Long] = {
    val amax = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x)))
    val scale = if (amax > 0) 127.0 / amax else 0.0
    v.map(x => math.floor(x * scale + 0.5).toLong).toArray
  }

  /**
   * Batch KNN join: top-k cosine neighbours for EVERY query vector in
   * one pass — broadcast the (small) query batch, score map-side while
   * the big side streams through once, then a per-query top-k window.
   * The window shuffle carries only (query, neighbour, sim) triples.
   * For query batches too big to broadcast use [[knnJoinLsh]], which
   * cuts candidates with a bucket equi-join instead of all N×Q pairs.
   */
  def knnJoin(
      embeddings: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = embeddings.select(col(idCol).as("nbr_id"), col(embCol).as("nbr_emb"))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val scored = base
      .join(broadcast(q), col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        Dedup.cosine(col("nbr_emb"), col("q_emb")).as("sim"))
    val perQuery = Window.partitionBy("query_id").orderBy(col("sim").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(perQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "rank", "sim")
  }

  /**
   * Batch KNN join for query batches too big to broadcast — the scale
   * path [[knnJoin]]'s scaladoc points to. Both sides are LSH-bucketed
   * with the shared deterministic plane bank; queries are exploded to
   * every bucket within Hamming distance ≤ `probeRadius` (multi-probe,
   * same trade-off as [[knnLsh]]), and candidates come from a plain
   * bucket equi-join — a shuffle on bucket ids, NO broadcast, so the
   * query side can be arbitrarily large. Candidates are scored exactly
   * and top-k'd per query; recall is approximate (a true neighbour in a
   * bucket farther than the probe radius is missed). With
   * `probeRadius >= bits` every bucket is probed and the result equals
   * [[knnJoin]] exactly.
   *
   * Scale: shuffle volume is |base| + |queries|·(1 + bits + C(bits,2))
   * rows of (id, emb, bucket); per-bucket work is |base_bucket| ×
   * |probing queries|. For skewed corpora apply the same hot-bucket
   * discipline as [[refinedBuckets]] upstream (pre-split hot buckets),
   * or raise `bits`.
   */
  def knnJoinLsh(
      embeddings: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      bits: Int = 8,
      dim: Int = 64,
      probeRadius: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val radius = math.min(probeRadius, bits)
    require(radius <= 3 || radius >= bits,
      s"probeRadius $radius unsupported (use 0-3, or >= bits for exhaustive)")
    val probesOf = udf { (bucket: Long) =>
      if (radius >= bits) (0L until (1L << bits)).toSeq
      else {
        val out = scala.collection.mutable.ArrayBuffer(bucket)
        if (radius >= 1)
          (0 until bits).foreach(b => out += (bucket ^ (1L << b)))
        if (radius >= 2)
          for (a <- 0 until bits; b <- a + 1 until bits)
            out += (bucket ^ (1L << a) ^ (1L << b))
        if (radius >= 3)
          for (a <- 0 until bits; b <- a + 1 until bits; c <- b + 1 until bits)
            out += (bucket ^ (1L << a) ^ (1L << b) ^ (1L << c))
        out.toSeq
      }
    }
    val base = embeddings.select(col(idCol).as("nbr_id"), col(embCol).as("nbr_emb"))
      .withColumn("bucket", lshBucket(col("nbr_emb"), bits, dim))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .withColumn("bucket", explode(probesOf(lshBucket(col("q_emb"), bits, dim))))
    val scored = base.join(q, Seq("bucket"))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        Dedup.cosine(col("nbr_emb"), col("q_emb")).as("sim"))
    val perQuery = Window.partitionBy("query_id").orderBy(col("sim").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(perQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "rank", "sim")
  }

  /** Corpus-aware LSH bit count: enough sign bits that the EXPECTED
   * bucket population `n / 2^bits` is at most `targetBucketSize`,
   * clamped to [minBits, 30]. Use when the caller knows the corpus
   * cardinality (e.g. from table stats) and wants the base bucket
   * space sized for it instead of relying on hot-bucket refinement.
   * The default target sits 4× below [[nearDupPairs]]' default
   * `maxBucket` (4096) so an average-population bucket has headroom
   * under the hot cap — only genuinely clustered buckets trip
   * refinement, keeping the hot set small. */
  def autoBits(n: Long, targetBucketSize: Int = 1024, minBits: Int = 8): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucketSize)) / math.log(2.0)).toInt
    math.min(30, math.max(minBits, needed))
  }

  /** Hot sets larger than this are joined with a shuffle instead of a
   * broadcast — ~1e6 (bucket, flag) rows is tens of MB, the safe end of
   * driver/executor broadcast budgets. */
  private val BroadcastSafeHotBuckets = 1000000L

  /**
   * (id, emb, bucket) with hot buckets iteratively re-split: any bucket
   * holding more than `maxBucket` rows gets `refineBits` additional sign
   * bits from an independent plane bank, and the count-refine step
   * repeats (a fresh plane bank per level) until every bucket fits the
   * cap or `maxLevels` refinement levels have been applied — so the
   * in-bucket self-join stays O(maxBucket) per bucket instead of
   * O((N/2^bits)²). Same hot-key discipline as `winnowPairs`'
   * `maxDocFreq` and the minhash banding in [[Dedup]], but re-splitting
   * (recall-preserving for near-identical vectors, which agree on the
   * refinement signs w.h.p.) instead of dropping.
   *
   * Cost at scale: one count-per-bucket aggregation per level (map-side
   * partial agg collapses it to one row per bucket per task) plus the
   * refinement signs, and one final aggregation pass to confirm nothing
   * is hot — levels after convergence cost nothing. The hot set
   * (buckets above the cap, ≤ N/maxBucket rows) is persisted and
   * broadcast when small; past [[BroadcastSafeHotBuckets]] it falls back
   * to a shuffle join so a pathological corpus cannot blow the driver.
   * When no bucket exceeds the cap the output is bit-identical to plain
   * base bucketing (the oracle's semantics) and no refinement joins
   * enter the plan.
   *
   * Level-0 refined ids are `bucket + (refine+1)·2^bits` (collision-free
   * with cold ids, which the SQL oracle can unroll); deeper levels hash
   * `(bucket, refine)` through xxhash64 — a 64-bit label space, where a
   * collision merely merges two candidate buckets (pairs are exactly
   * cosine-scored afterwards, so collisions cost work, never
   * correctness).
   *
   * Residual: a bucket of > maxBucket EXACT-duplicate vectors cannot be
   * split by any projection (identical signs) and terminates only via
   * `maxLevels`; pair output over such a clique is inherently quadratic.
   * Run exact dedup (t01) first — the standard SemDeDup pipeline order.
   * For merely near-identical clusters the split is probabilistic per
   * level; extra levels make a still-hot bucket exponentially unlikely.
   */
  private[graft] def refinedBuckets(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      bits: Int,
      dim: Int,
      maxBucket: Int,
      refineBits: Int,
      maxLevels: Int = 3,
      planeBank: Int = 0): DataFrame = {
    var cur = embeddings.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("bucket", lshBucket(col("emb"), bits, dim))
    if (refineBits <= 0) return cur
    var level = 0
    var converged = false
    while (!converged && level < maxLevels) {
      val hot = cur.groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > maxBucket)
        .select(col("bucket"), lit(true).as("hot"))
        .persist()
      val nHot = hot.count()
      if (nHot == 0) {
        hot.unpersist()
        converged = true
      } else {
        val refineOf = (c: Column) => lshBucket(c, refineBits, dim,
          planeOffset = bits + (planeBank * maxLevels + level) * refineBits)
        val hotSide = if (nHot <= BroadcastSafeHotBuckets) broadcast(hot) else hot
        val refined =
          if (level == 0)
            col("bucket") + (refineOf(col("emb")) + lit(1L)) * lit(1L << bits)
          else xxhash64(col("bucket"), refineOf(col("emb")))
        cur = cur.join(hotSide, Seq("bucket"), "left")
          .withColumn("bucket",
            when(col("hot"), refined).otherwise(col("bucket")))
          .drop("hot")
        level += 1
      }
    }
    cur
  }

  /** All pairs with cosine ≥ threshold, LSH-blocked (equi-join on bucket;
   * near-identical vectors collide with high probability). Hot buckets
   * (> maxBucket rows) are iteratively re-split with `refineBits` extra
   * sign bits per level — see [[refinedBuckets]] — so the per-bucket
   * self-join is bounded at any corpus size. Pass `bits = autoBits(n)`
   * to also size the base bucket space to the corpus.
   *
   * Recall hedge for looser thresholds: a true pair split by refinement
   * must disagree on a refinement sign, which near-identical vectors
   * (cos ≥ ~0.95) rarely do, but looser pairs (cos ≈ 0.85) miss often.
   * `refineBanks > 1` refines with that many INDEPENDENT plane-bank
   * sequences and unions the resulting pairs (exactly re-scored, then
   * deduplicated) — a pair survives if ANY bank keeps it together, at
   * ~`refineBanks`× candidate volume. Use 2 banks below ~0.9. */
  def nearDupPairs(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      bits: Int = 8,
      dim: Int = 64,
      maxBucket: Int = 4096,
      refineBits: Int = 16,
      refineBanks: Int = 1,
      maxLevels: Int = 3): DataFrame = {
    def pairsOf(withBucket: DataFrame): DataFrame = {
      val a = withBucket.alias("a")
      val b = withBucket.alias("b")
      a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          Dedup.cosine(col("a.emb"), col("b.emb")).as("cos"))
        .filter(col("cos") >= threshold)
    }
    val banks = math.max(1, refineBanks)
    val perBank = (0 until banks).map { bank =>
      pairsOf(refinedBuckets(
        embeddings, idCol, embCol, bits, dim, maxBucket, refineBits, maxLevels, bank))
    }
    if (banks == 1) perBank.head
    else perBank.reduce(_.unionAll(_)).dropDuplicates("id_a", "id_b")
  }

  /**
   * Lloyd's k-means over int8-quantized embeddings — the codebook /
   * cluster-assignment primitive behind IVF partitioning and PQ
   * training, shaped for exact verification: every distance is an
   * INTEGER sum over the quantized vectors ([[quantize]], same math as
   * e06) and centroid updates use floor-division — no floating-point
   * anywhere, so an independent engine replays the whole trajectory
   * bit-for-bit (DuckDB does, in e10's oracle).
   *
   * Distributed shape per iteration: centroids ride into every task as
   * a referenced k·d long[][] matrix inside the
   * [[graft.expressions.KMeansAssign]] codegen expression (tiny —
   * serialized with the task closure), assignment is a fused
   * distance+argmin loop in whole-stage codegen (cluster id is the
   * deterministic tie-break), and the centroid update shuffles only
   * (cluster, dim) partial sums — k·d groups with map-side
   * combine, never the vectors. Driver holds k·d longs. This is the
   * textbook scale-safe k-means: cost O(N·k·d) compute + O(k·d)
   * shuffle per iteration. Empty clusters keep their previous
   * centroid. Initial centroids: the k smallest ids' vectors, cluster
   * ids 0..k-1 in that id order.
   *
   * Returns (id, cluster) assignments AFTER `iters` centroid updates.
   */
  def kmeansInt8(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 4,
      iters: Int = 2): DataFrame = {
    require(k > 0 && iters >= 0, s"kmeansInt8(k=$k, iters=$iters)")
    val q = embeddings
      .select(col(idCol).as("id"), int8Quantize(col(embCol)).as("q"))
      .localCheckpoint(true) // quantize once, reuse across iterations
    val centroids = trainQuantized(q, col("q"), k, iters)
    q.select(col("id").as(idCol), assignQuantized(col("q"), centroids).as("cluster"))
  }

  /** Native codegen argmin over a centroid matrix
   * (expressions/Int8Ops.scala KMeansAssign): the HOF formulation
   * (array_min over transform+aggregate/zip_with structs) evaluates
   * interpreted lambdas per row; the fused loop is ~10× faster and
   * keeps the stage in whole-stage codegen. Centroids are ordered by
   * cluster id so the matrix index IS the id. */
  private def assignQuantized(qc: Column, centroids: Seq[(Int, Array[Long])]): Column = {
    val matrix = centroids.sortBy(_._1).map(_._2).toArray
    val shims = org.apache.spark.sql.GraftShims
    shims.column(graft.expressions.KMeansAssign(shims.expression(qc), matrix))
  }

  /** Lloyd's iterations over an already-quantized column `qc` of
   * `q(id, …)` — the integer-exact trajectory shared by [[kmeansInt8]]
   * and the per-subspace PQ training. Per iteration: assignment is a
   * map-side codegen projection, the centroid update shuffles only
   * (cluster, dim) partial sums; the driver holds k·d longs. */
  private def trainQuantized(
      q: DataFrame,
      qc: Column,
      k: Int,
      iters: Int): Seq[(Int, Array[Long])] = {
    // init: the k smallest ids' vectors (k rows to the driver)
    var centroids: Seq[(Int, Array[Long])] = q.select(col("id"), qc.as("_qv"))
      .orderBy("id").limit(k)
      .collect().zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Long](1).toArray
      }.toSeq
    (1 to iters).foreach { _ =>
      // partial sums per (cluster, dim): the ONLY shuffle, k·d groups
      val sums = q.select(assignQuantized(qc, centroids).as("cid"), posexplode(qc))
        .groupBy("cid", "pos")
        .agg(sum("col").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, prev) =>
        byCluster.get(cid) match {
          case None => cid -> prev // empty cluster keeps its centroid
          case Some(rows) =>
            val vec = prev.clone()
            rows.foreach { r =>
              vec(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
            }
            cid -> vec
        }
      }
    }
    centroids
  }

  // ---- product quantization ------------------------------------------------

  /**
   * Train per-subspace PQ codebooks over int8-quantized embeddings:
   * the vector splits into `m` contiguous subvectors of dim/m
   * components, each subspace runs its own [[trainQuantized]] Lloyd's
   * loop (k centroids, integer distances, floor-division updates — the
   * e10 math, so DuckDB replays every codebook bit-for-bit). Returns
   * `m` codebooks of k×(dim/m) longs — driver/broadcast-sized
   * (m·k·dim/m = k·dim longs total, independent of N).
   *
   * Scale shape: training touches the data m·iters times but each pass
   * is a map-side assignment + a (k·dim/m)-group shuffle; nothing
   * row-proportional reaches the driver.
   */
  def pqTrain(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      m: Int = 4,
      k: Int = 4,
      iters: Int = 2): Seq[Seq[(Int, Array[Long])]] = {
    val q = embeddings
      .select(col(idCol).as("id"), int8Quantize(col(embCol)).as("q"))
      .localCheckpoint(true)
    val dim = q.select(size(col("q"))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val sub = dim / m
    // All m subspaces train TOGETHER: one init collect (the k smallest
    // ids' full vectors, sliced locally) and ONE assignment+partial-sum
    // job per Lloyd's iteration instead of m of each — the per-subspace
    // loop paid m·iters scheduler round-trips for byte-identical math
    // (each subspace still assigns against its own codebook and updates
    // by the same floor-division, so the oracle replay is unchanged).
    val initRows = q.select(col("id"), col("q")).orderBy("id").limit(k).collect()
    var books: IndexedSeq[Seq[(Int, Array[Long])]] = (0 until m).map { s =>
      initRows.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Long](1).slice(s * sub, (s + 1) * sub).toArray
      }.toSeq
    }
    (1 to iters).foreach { _ =>
      val cids = (0 until m).map(s =>
        assignQuantized(slice(col("q"), s * sub + 1, sub), books(s)))
      val subOf = floor(col("pos") / lit(sub)).cast("int")
      val sums = q
        .select(array(cids: _*).as("cids"), posexplode(col("q")).as(Seq("pos", "v")))
        .select(subOf.as("s"),
          col("cids").getItem(subOf).as("cid"),
          (col("pos") % lit(sub)).cast("int").as("p"),
          col("v"))
        .groupBy("s", "cid", "p")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .collect()
      val bySub = sums.groupBy(_.getInt(0))
      books = (0 until m).map { s =>
        val byCluster = bySub.getOrElse(s, Array.empty[org.apache.spark.sql.Row])
          .groupBy(_.getInt(1))
        books(s).map { case (cid, prev) =>
          byCluster.get(cid) match {
            case None => cid -> prev // empty cluster keeps its centroid
            case Some(rows) =>
              val vec = prev.clone()
              rows.foreach(r => vec(r.getInt(2)) = Math.floorDiv(r.getLong(3), r.getLong(4)))
              cid -> vec
          }
        }
      }
    }
    // release the checkpoint's RDD blocks (Dataset.unpersist is a no-op
    // for localCheckpoint frames — see QbeastTable.releaseLocalCheckpoint)
    graft.table.QbeastTable.releaseLocalCheckpoint(q)
    books
  }

  /** Encode every vector as its `m` per-subspace nearest-codeword ids
   * (one map-side codegen pass, no shuffle): `(id, codes array<int>)`. */
  def pqEncode(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      codebooks: Seq[Seq[(Int, Array[Long])]]): DataFrame = {
    val m = codebooks.length
    val q = embeddings.select(col(idCol).as("id"), int8Quantize(col(embCol)).as("q"))
    val dim = codebooks.map(_.head._2.length).sum
    val sub = dim / m
    val codeCols = (0 until m).map(s =>
      assignQuantized(slice(col("q"), s * sub + 1, sub), codebooks(s)))
    q.select(col("id").as(idCol), array(codeCols: _*).as("codes"))
  }

  /**
   * ADC (asymmetric distance computation) top-k: the query quantizes
   * with its own scale, a driver-side m×k distance table holds the
   * integer squared-L2 between each query subvector and each codeword,
   * and every encoded row's score is `m` table lookups — at 100 TB the
   * scan reads only the (id, codes) sidecar (m bytes a vector instead
   * of 4·dim), which is the whole point of PQ. Returns
   * `(idCol, dist)` ascending, ties by id; exact over the CODES, so an
   * independent engine reproduces it bit-for-bit.
   */
  def pqTopK(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      queryVec: Seq[Double],
      k: Int,
      m: Int = 4,
      kCodes: Int = 4,
      iters: Int = 2): DataFrame = {
    val codebooks = pqTrain(embeddings, idCol, embCol, m, kCodes, iters)
    val encoded = pqEncode(embeddings, idCol, embCol, codebooks)
    encoded.select(col(idCol), adcDistCol(codebooks, queryVec, col("codes")).as("dist"))
      .orderBy(col("dist").asc, col(idCol))
      .limit(k)
  }

  /** ADC distance column over an already-encoded `codes` array: the
   * driver computes the m×k integer table of squared-L2 distances
   * between each query subvector (quantized with the query's own
   * scale) and each codeword; every row's score is then m literal
   * array lookups — no vectors touched at scan time. */
  def adcDistCol(
      codebooks: Seq[Seq[(Int, Array[Long])]],
      queryVec: Seq[Double],
      codesCol: Column): Column = {
    val m = codebooks.length
    val dim = codebooks.map(_.head._2.length).sum
    val sub = dim / m
    val qq = int8QuantizeSeq(queryVec)
    require(qq.length == dim, s"query dim ${qq.length} != codebook dim $dim")
    val table: Seq[Seq[Long]] = codebooks.zipWithIndex.map { case (cb, s) =>
      cb.sortBy(_._1).map { case (_, cv) =>
        var acc = 0L
        var i = 0
        while (i < sub) { val d = qq(s * sub + i) - cv(i); acc += d * d; i += 1 }
        acc
      }
    }
    (0 until m).map(s =>
      element_at(typedlit(table(s)), codesCol.getItem(s) + 1)).reduce(_ + _)
  }

  /** The PQ `codes` column alone (array<int>, one code per subspace) so
   * an index build can encode alongside other write-time columns in a
   * single map-side pass — no second scan, no join-back. */
  def pqCodesCol(embCol: Column, codebooks: Seq[Seq[(Int, Array[Long])]]): Column = {
    val m = codebooks.length
    val dim = codebooks.map(_.head._2.length).sum
    val sub = dim / m
    val q = int8Quantize(embCol)
    array((0 until m).map(s =>
      assignQuantized(slice(q, s * sub + 1, sub), codebooks(s))): _*)
  }

  /** Codebooks → JSON (`[[cid, [v, ...]], ...]` per subspace) for
   * persisting next to the indexed table — the PQ model artifact, the
   * moral equivalent of a FAISS index file's codebook section. */
  def pqCodebooksJson(codebooks: Seq[Seq[(Int, Array[Long])]]): String = {
    import org.json4s.JsonDSL._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j: JValue = JArray(codebooks.map(cb => JArray(cb.map { case (cid, v) =>
      JArray(List(JInt(cid), JArray(v.map(x => JInt(BigInt(x))).toList)))
    }.toList)).toList)
    JsonMethods.compact(JsonMethods.render(j))
  }

  def pqCodebooksFromJson(s: String): Seq[Seq[(Int, Array[Long])]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val JArray(subs) = JsonMethods.parse(s): @unchecked
    subs.map {
      case JArray(cb) => cb.map {
        case JArray(List(cid, JArray(vs))) =>
          val id = cid match { case JInt(i) => i.toInt; case JLong(l) => l.toInt
            case other => sys.error(s"bad codebook id $other") }
          id -> vs.map {
            case JInt(i) => i.toLong; case JLong(l) => l
            case other => sys.error(s"bad codeword value $other")
          }.toArray
        case other => sys.error(s"bad codebook entry $other")
      }
      case other => sys.error(s"bad codebook $other")
    }
  }

  /**
   * IVF-PQ composition — the 100 TB ANN shape (IVFADC, Jégou et al.
   * 2011, sans residual encoding — distances are over raw-vector PQ
   * codes so the integer-exact oracle replay of e10/e12 carries over):
   * the corpus is written ONCE as a qbeast table carrying
   * `(id, cluster, codes)` where `cluster` is the write-time IVF anchor
   * assignment (e04's [[anchorClusterCol]]) and `codes` the PQ encoding
   * ([[pqCodesCol]]) — the table IS the index, the codebooks persist as
   * a JSON sidecar. A query (a) scores the anchors on the driver (tiny),
   * (b) scans only the `nProbe` probed clusters, issued as an OR of
   * cluster EQUALITIES so each disjunct becomes its own query space in
   * the file index (an IN-list would collapse to one covering range and
   * prune nothing — the e11 finding), and (c) ADC-scores the surviving
   * codes through a driver-side m×k integer distance table
   * ([[adcDistCol]]). The scan therefore reads m bytes per vector of
   * ~nProbe/nClusters of the corpus: neither raw vectors nor unprobed
   * clusters are touched — at 100 TB that is the difference between an
   * index lookup and a full-corpus pass.
   */
  def pqTopKIndexed(
      ivfPqTable: DataFrame,
      idCol: String,
      clusterCol: String,
      codesCol: String,
      codebooks: Seq[Seq[(Int, Array[Long])]],
      anchors: Seq[(Int, Array[Double])],
      queryVec: Seq[Double],
      k: Int,
      nProbe: Int = 3): DataFrame = {
    val probes = anchors
      .map { case (aid, vec) => (aid, cosineSeq(vec.toSeq, queryVec)) }
      .sortBy { case (aid, c) => (-c, aid) }
      .take(nProbe)
      .map(_._1)
    val pred = probes.map(p => col(clusterCol) === lit(p)).reduce(_ || _)
    ivfPqTable
      .filter(pred)
      .select(col(idCol), adcDistCol(codebooks, queryVec, col(codesCol)).as("dist"))
      .orderBy(col("dist").asc, col(idCol))
      .limit(k)
  }

  /**
   * Two-stage ANN serving (the standard IVF-PQ + refine shape): stage 1
   * takes `candK` ADC candidates from the PRUNED codes scan
   * ([[pqTopKIndexed]] — m bytes/vector of nProbe clusters), stage 2
   * re-ranks ONLY those candidates by exact cosine against the raw
   * vectors — recovering the recall the coarse PQ codes lose while
   * touching raw embeddings for just `candK` rows. The candidate ids
   * are driver-sized (candK), so the fetch is an IN-filter on
   * `embeddings` — point lookups that prune files when the table is
   * qbeast-indexed on `idCol` (the e14 fixture shape). Fully
   * deterministic: candidate selection orders by (dist, id), the
   * re-rank by (cosine desc, id).
   */
  def pqTopKReranked(
      ivfPqTable: DataFrame,
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      clusterCol: String,
      codesCol: String,
      codebooks: Seq[Seq[(Int, Array[Long])]],
      anchors: Seq[(Int, Array[Double])],
      queryVec: Seq[Double],
      k: Int,
      candK: Int = 50,
      nProbe: Int = 3): DataFrame = {
    val ids = pqTopKIndexed(ivfPqTable, idCol, clusterCol, codesCol,
        codebooks, anchors, queryVec, candK, nProbe)
      .select(col(idCol)).collect().map(_.getLong(0)).toSeq
    val sim = Dedup.cosine(col(embCol), lit(queryVec.toArray))
    embeddings
      .filter(col(idCol).isin(ids: _*))
      .select(col(idCol), sim.as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

}
