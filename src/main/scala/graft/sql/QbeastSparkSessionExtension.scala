package graft.sql

import graft.rules.{DvMaskRule, MetadataCountRule, QbeastAnalysis, QbeastDmlRules, SampleRule, ScanSizeRule}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Murmur3Hash}

/**
 * Session extension wiring (reference:
 * `src/.../sql/QbeastSparkSessionExtension.scala:29-45`). Register with
 * `spark.sql.extensions=graft.sql.QbeastSparkSessionExtension` or
 * `.withExtensions(new QbeastSparkSessionExtension)`.
 */
class QbeastSparkSessionExtension extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    // maintenance statements: OPTIMIZE '<path>' / VACUUM '<path>'
    // [RETAIN n HOURS] [FORCE]; everything else delegates untouched
    extensions.injectParser { (_, delegate) => new QbeastSqlParser(delegate) }
    extensions.injectResolutionRule { session => new QbeastAnalysis(session) }
    // SQL UPDATE / MERGE INTO → the copy-on-write DML machinery
    extensions.injectResolutionRule { session => new QbeastDmlRules(session) }
    extensions.injectOptimizerRule { session => new SampleRule(session) }
    // unfiltered count(*) over a qbeast scan answered from log metadata
    extensions.injectOptimizerRule { session => new MetadataCountRule(session) }
    // filter-aware scan sizing: pruned slices report pruned bytes so
    // joins against them broadcast without hints
    extensions.injectOptimizerRule { session => new ScanSizeRule(session) }
    // deletion-vector masking: scans of DV tables get the row mask
    extensions.injectOptimizerRule { session => new DvMaskRule(session) }
    // change-data-feed TVF (Delta's table_changes, path-addressed):
    //   SELECT * FROM table_changes('/path/to/table', 1)        -- 1..head
    //   SELECT * FROM table_changes('/path/to/table', 1, 3)
    // resolves to QbeastTable.changes' plan — the per-commit file-diff
    // replay, O(touched files) per version
    extensions.injectTableFunction((
      new FunctionIdentifier("table_changes"),
      new ExpressionInfo(classOf[graft.table.QbeastTable].getName, "table_changes"),
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 3,
          "table_changes('<path>', startVersion[, endVersion]) — literal arguments")
        def lit(e: Expression, what: String): Any = e match {
          case l: org.apache.spark.sql.catalyst.expressions.Literal => l.value
          case other => throw new IllegalArgumentException(
            s"table_changes: $what must be a literal, got $other")
        }
        val path = String.valueOf(lit(children.head, "path"))
        def ver(e: Expression, what: String): Long = lit(e, what) match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"table_changes: $what must be an integer version, got $other")
        }
        val start = ver(children(1), "startVersion")
        val end = if (children.length == 3) ver(children(2), "endVersion") else -1L
        val spark = org.apache.spark.sql.SparkSession.active
        graft.table.QbeastTable.forPath(spark, path)
          .changes(start, end).queryExecution.logical
      }))
    // SQL surface for the row-weight hash: `WHERE qbeast_hash(a, b) < t`
    // is the deterministic-sampling predicate, and when (a, b) are the
    // indexed columns the FileIndex prunes on block weight ranges
    extensions.injectFunction((
      new FunctionIdentifier("qbeast_hash"),
      new ExpressionInfo(classOf[Murmur3Hash].getName, "qbeast_hash"),
      (children: Seq[Expression]) => new Murmur3Hash(children)))
    // SQL surface for the codegen cosine expression, so similarity
    // search composes in plain SQL:
    //   ORDER BY graft_cosine(embedding, array(...)) DESC LIMIT 10
    extensions.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[graft.expressions.CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine(a, b) takes two array arguments")
        graft.expressions.CosineSimilarity(children.head, children(1))
      }))
    // the rest of the codegen similarity kit, same pattern:
    //   WHERE graft_token_jaccard(tokens_a, tokens_b) >= 0.8
    //   GROUP BY graft_lsh_bucket(embedding, 8, 64)
    extensions.injectFunction((
      new FunctionIdentifier("graft_token_jaccard"),
      new ExpressionInfo(
        classOf[graft.expressions.TokenSetJaccard].getName, "graft_token_jaccard"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_token_jaccard(a, b) takes two array<string> arguments")
        graft.expressions.TokenSetJaccard(children.head, children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(
        classOf[graft.expressions.LshBucket].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) => {
        require(children.length == 3 || children.length == 4,
          "graft_lsh_bucket(emb, bits, dim[, planeOffset]) — bits/dim/offset " +
            "must be integer literals")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_lsh_bucket: $what must be an integer literal, got $other")
        }
        graft.expressions.LshBucket(children.head,
          intLit(children(1), "bits"), intLit(children(2), "dim"),
          if (children.length == 4) intLit(children(3), "planeOffset") else 0)
      }))
    // text-signature kit (dedup pipelines in plain SQL):
    //   SELECT doc_id, graft_minhash(text) ...
    //   WHERE graft_simhash(a) = graft_simhash(b)
    //   LATERAL VIEW explode(graft_winnow(text, 3, 4)) f AS fp
    def intLitArg(fn: String)(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
    extensions.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(
        classOf[graft.expressions.MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 2,
          "graft_minhash(text[, numHashes]) — numHashes must be an integer literal")
        graft.expressions.MinHashSignature(children.head,
          if (children.length == 2) intLitArg("graft_minhash")(children(1), "numHashes")
          else graft.ops.Dedup.DefaultNumHashes)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.expressions.SimHash60].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash(text) takes one string argument")
        graft.expressions.SimHash60(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(
        classOf[graft.expressions.WinnowFingerprints].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 3,
          "graft_winnow(text[, k, w]) — k/w must be integer literals")
        if (children.length == 3)
          graft.expressions.WinnowFingerprints(children.head,
            intLitArg("graft_winnow")(children(1), "k"),
            intLitArg("graft_winnow")(children(2), "w"))
        else graft.expressions.WinnowFingerprints(children.head,
          graft.ops.Dedup.DefaultShingleTokens, 4)
      }))
    // sketch kit:
    //   SELECT src, graft_kmv_distinct(hash_col, 64).est ... GROUP BY src
    //   WHERE graft_might_contain(bits_lit, key[, numHashes])
    extensions.injectFunction((
      new FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(
        classOf[graft.expressions.KmvDistinctAgg].getName, "graft_kmv_distinct"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_kmv_distinct(hash, k) — k must be an integer literal")
        graft.expressions.KmvDistinctAgg(children.head,
          intLitArg("graft_kmv_distinct")(children(1), "k"))
      }))
    //   SELECT src, graft_hll_distinct(hash_col).est ... GROUP BY src
    extensions.injectFunction((
      new FunctionIdentifier("graft_hll_distinct"),
      new ExpressionInfo(
        classOf[graft.expressions.HllDistinctAgg].getName, "graft_hll_distinct"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_hll_distinct(hash) takes one bigint hash argument")
        graft.expressions.HllDistinctAgg(children.head)
      }))
    //   mergeable rollup: graft_hll_state(hash) per fine group, then
    //   graft_hll_merge(state).est per coarse group — no rescan
    extensions.injectFunction((
      new FunctionIdentifier("graft_hll_state"),
      new ExpressionInfo(
        classOf[graft.expressions.HllStateAgg].getName, "graft_hll_state"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_hll_state(hash) takes one bigint hash argument")
        graft.expressions.HllStateAgg(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_hll_merge"),
      new ExpressionInfo(
        classOf[graft.expressions.HllMergeAgg].getName, "graft_hll_merge"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_hll_merge(state) takes one binary state argument")
        graft.expressions.HllMergeAgg(children.head)
      }))
    // mergeable quantile rollup:
    //   SELECT src, graft_kll_quantiles(CAST(n AS DOUBLE), 0.5, 0.99)[1]
    //   ... GROUP BY src — or graft_kll_state per fine group, then
    //   graft_kll_merge(state, qs...) per coarse group with no rescan
    def doubleLitArg(fn: String)(e: Expression, what: String): Double = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Float, _) => v.toDouble
      // SQL `1` / `0` parse as integer literals — both are valid quantiles
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toDouble
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toDouble
      case org.apache.spark.sql.catalyst.expressions.Literal(v: java.math.BigDecimal, _) =>
        v.doubleValue()
      case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.sql.types.Decimal, _) =>
        v.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a numeric literal, got $other")
    }
    extensions.injectFunction((
      new FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(
        classOf[graft.expressions.KllQuantilesAgg].getName, "graft_kll_quantiles"),
      (children: Seq[Expression]) => {
        require(children.length >= 2,
          "graft_kll_quantiles(value, q...) — quantiles must be numeric literals")
        graft.expressions.KllQuantilesAgg(children.head,
          children.tail.map(doubleLitArg("graft_kll_quantiles")(_, "q")))
      }))
    //   corpus overlap from persisted states: graft_kmv_state(hash, k)
    //   per group, then graft_kmv_overlap(a.st, b.st).jaccard per pair
    extensions.injectFunction((
      new FunctionIdentifier("graft_kmv_state"),
      new ExpressionInfo(
        classOf[graft.expressions.KmvSetStateAgg].getName, "graft_kmv_state"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_kmv_state(hash, k) — k must be an integer literal")
        graft.expressions.KmvSetStateAgg(children.head,
          intLitArg("graft_kmv_state")(children(1), "k"))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_kmv_overlap"),
      new ExpressionInfo(
        classOf[graft.expressions.KmvOverlapExpr].getName, "graft_kmv_overlap"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_kmv_overlap(stateA, stateB) takes two binary states")
        graft.expressions.KmvOverlapExpr(children.head, children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_kll_state"),
      new ExpressionInfo(
        classOf[graft.expressions.KllStateAgg].getName, "graft_kll_state"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 2,
          "graft_kll_state(value[, k]) — k must be an integer literal")
        if (children.length == 2)
          graft.expressions.KllStateAgg(children.head,
            intLitArg("graft_kll_state")(children(1), "k"))
        else graft.expressions.KllStateAgg(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(
        classOf[graft.expressions.KllMergeAgg].getName, "graft_kll_merge"),
      (children: Seq[Expression]) => {
        require(children.length >= 2,
          "graft_kll_merge(state, q...) — quantiles must be numeric literals")
        graft.expressions.KllMergeAgg(children.head,
          children.tail.map(doubleLitArg("graft_kll_merge")(_, "q")))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[graft.expressions.BloomMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 3,
          "graft_might_contain(bits, key[, numHashes]) — numHashes must be " +
            "an integer literal")
        graft.expressions.BloomMightContain(children.head, children(1),
          if (children.length == 3)
            intLitArg("graft_might_contain")(children(2), "numHashes")
          else 3)
      }))
    //   SELECT graft_cms(hash[, depth, width]) ... (counter matrix)
    //   WHERE graft_cms_estimate(counters_lit, hash[, depth, width]) >= T
    extensions.injectFunction((
      new FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[graft.expressions.CmsAgg].getName, "graft_cms"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 3,
          "graft_cms(hash[, depth, width]) — depth/width must be integer literals")
        if (children.length == 3)
          graft.expressions.CmsAgg(children.head,
            intLitArg("graft_cms")(children(1), "depth"),
            intLitArg("graft_cms")(children(2), "width"))
        else graft.expressions.CmsAgg(children.head, 4, 4096)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(
        classOf[graft.expressions.CmsEstimate].getName, "graft_cms_estimate"),
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 4,
          "graft_cms_estimate(counters, hash[, depth, width]) — depth/width " +
            "must be integer literals")
        if (children.length == 4)
          graft.expressions.CmsEstimate(children.head, children(1),
            intLitArg("graft_cms_estimate")(children(2), "depth"),
            intLitArg("graft_cms_estimate")(children(3), "width"))
        else graft.expressions.CmsEstimate(children.head, children(1), 4, 4096)
      }))
  }

}
