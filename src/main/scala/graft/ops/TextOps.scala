package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * quality scoring, language identification, document fingerprinting.
 * Everything except the rolling-hash fingerprint is pure `functions._`
 * (whole-stage codegen; no UDF in the hot path).
 */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(split(trim(c), "\\s+"))

  /** BPE-ish sub-token count: word pieces of ≤4 chars — a cheap,
   * deterministic proxy for LLM token budgeting. */
  def subTokenCount(c: Column): Column =
    aggregate(
      transform(split(trim(c), "\\s+"), w => (length(w) + lit(3)) / lit(4)),
      lit(0L), (acc, x) => acc + x.cast("long"))

  /** Quality features: length, token count, mean token length,
   * punctuation count, digit count, uppercase-start ratio proxy. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("n_chars_m", length(c).cast("long"))
      .withColumn("n_tokens", tokenCount(c).cast("long"))
      .withColumn("mean_token_len",
        (length(c) - (tokenCount(c) - lit(1))).cast("double") / tokenCount(c))
      .withColumn("n_punct", (length(c) - length(regexp_replace(c, "[.!?,;:]", ""))).cast("long"))
      .withColumn("n_digits", (length(c) - length(regexp_replace(c, "[0-9]", ""))).cast("long"))
  }

  /** Stopword-marker language votes (en/es/de/fr/zh), counted with the
   * replace-length trick so the identical computation is expressible in
   * ANSI SQL for the oracle. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " que "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "zh" -> Seq("的", "是", "了"))

  def markerCount(c: Column, marker: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(marker), ""))) /
      lit(marker.length)

  /** Detected language = argmax of marker counts, ties broken by
   * language code order; "und" when no marker hits. */
  def langId(textCol: Column): Column = {
    val padded = concat(lit(" "), textCol, lit(" "))
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val s = markers.map(m => markerCount(padded, m)).reduce(_ + _)
      struct(s.cast("long").as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Composite training-data quality filter: every rule is expressible
   * in both engines, and the reported reason is the FIRST failing rule
   * (deterministic CASE order). The thresholds are the usual web-corpus
   * heuristics (length band, token shape, punctuation/digit density,
   * identifiable language). */
  def qualityFilter(df: DataFrame, textCol: String): DataFrame = {
    // `reason`/`keep` are this op's OUTPUT contract; silently
    // overwriting a source column of the same name would replace real
    // data with gate values downstream (the corpus-ingest pipeline
    // writes the gated frame back out)
    val clash = df.columns.filter(n =>
      n.equalsIgnoreCase("reason") || n.equalsIgnoreCase("keep"))
    require(clash.isEmpty,
      s"qualityFilter appends columns ${clash.mkString(", ")} but the input " +
        "already has them; rename the source column(s) first")
    val c = col(textCol)
    val nTokens = tokenCount(c)
    val meanTokLen = (length(c) - (nTokens - lit(1))).cast("double") / nTokens
    val punctRatio = (length(c) - length(regexp_replace(c, "[.!?,;:]", "")))
      .cast("double") / length(c)
    val digitRatio = (length(c) - length(regexp_replace(c, "[0-9]", "")))
      .cast("double") / length(c)
    val reason = when(nTokens < 10, "too_short")
      .when(nTokens > 100000, "too_long")
      .when(meanTokLen < 2.0, "tokens_too_short")
      .when(meanTokLen > 14.0, "tokens_too_long")
      .when(punctRatio > 0.2, "too_much_punct")
      .when(digitRatio > 0.3, "too_many_digits")
      .when(langId(c) === "und", "no_language")
      .otherwise("ok")
    df.withColumn("reason", reason)
      .withColumn("keep", col("reason") === "ok")
  }

  // ---- repetition signals (Gopher-style) ---------------------------------

  /** Fraction of duplicated elements in an array: (n - n_distinct)/n,
   * 0.0 for empty arrays. Pure codegen arithmetic, identical in SQL. */
  private def dupFrac(arr: Column): Column =
    when(size(arr) > 0,
      (size(arr) - size(array_distinct(arr))).cast("double") / size(arr))
      .otherwise(lit(0.0))

  /** Word n-grams as an array column (empty when there are fewer than n
   * tokens — guarded because Spark's `sequence(1, 0)` counts DOWN). */
  private def wordGrams(toks: Column, n: Int): Column = {
    val count = size(toks) - lit(n - 1)
    val gram = (i: Column) =>
      concat((0 until n).flatMap(j =>
        if (j == 0) Seq(element_at(toks, i))
        else Seq(lit(" "), element_at(toks, i + lit(j)))): _*)
    when(count >= 1, transform(sequence(lit(1), count), gram))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Repetition signals (the Gopher / MassiveText quality heuristics):
   * fraction of duplicated tokens, 2-grams and 3-grams. High values mean
   * boilerplate or degenerate generation loops. Pure `functions._` —
   * map-side, codegen, no shuffle.
   */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    df.withColumn("dup_token_frac", dupFrac(toks))
      .withColumn("dup_2gram_frac", dupFrac(wordGrams(toks, 2)))
      .withColumn("dup_3gram_frac", dupFrac(wordGrams(toks, 3)))
  }

  // ---- pattern redaction (PII / contamination scrub) ----------------------

  /** (name, regex, replacement) redaction rules: PII shapes plus a
   * benchmark-contamination term. The regex subset used (char classes,
   * bounded repeats, \b, \d) behaves identically in java.util.regex and
   * RE2, so the oracle replays the exact scrub. */
  val defaultRedactions: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
    ("term", "\\bspark\\b", "<TERM>"))

  /**
   * Scrub sensitive / contaminating patterns from a text column: emits
   * one match-count column per rule (`n_<name>`) plus the scrubbed text
   * (rules applied in order). Map-side only; at 100 TB this runs inside
   * the scan with zero shuffle.
   */
  def redactPatterns(
      df: DataFrame,
      textCol: String,
      rules: Seq[(String, String, String)] = defaultRedactions): DataFrame = {
    val withCounts = rules.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    val scrubbed = rules.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    withCounts.withColumn("scrubbed", scrubbed)
  }

  // ---- normalization ------------------------------------------------------

  /** Unicode NFC normalization (JDK `java.text.Normalizer`; DuckDB's
   * `nfc_normalize` implements the same standard algorithm). */
  val nfcUdf = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  /** Canonical text normalization: NFC → trim → collapse whitespace
   * runs → lowercase. The standard pre-dedup canonicalization so that
   * near-identical documents hash identically. */
  def normalizeText(c: Column): Column =
    lower(regexp_replace(trim(nfcUdf(c)), "\\s+", " "))

  // ---- corpus vocabulary --------------------------------------------------

  /** Top-k corpus vocabulary with counts and rank (ties broken by token
   * order). Classic word count: tokens shuffle once with map-side
   * partial aggregation; the top-k is per-partition top-k + driver
   * merge, then rank is assigned over just k rows. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
  }

  // ---- BM25 relevance -------------------------------------------------------

  /**
   * BM25 relevance of every document against a fixed bag of query
   * terms (Robertson–Spärck Jones idf with Lucene's +1 floor, k1/b
   * length normalization) — the standard retrieval score a curation
   * pipeline uses to mine topical subsets out of a web corpus.
   *
   * Output: one row per (doc, matched term): doc_id, term, tf, score.
   * Per-term rows instead of a per-doc sum keep the doubles
   * order-independent (IEEE addition is not associative; summing k
   * scores in shuffle order would be nondeterministic) — consumers
   * rank on `sum(score)` per doc AFTER fixing an order, or on the
   * dominant term.
   *
   * Scale shape: explode→isin prunes to the query vocabulary map-side
   * BEFORE any shuffle; one (doc, term) aggregation; document
   * frequencies (≤ |terms| rows) and the two corpus scalars broadcast.
   * Nothing driver-side, nothing quadratic.
   */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val base = df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val matches = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = matches.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first("dl").as("dl"))
    val dfreq = matches.groupBy("term")
      .agg(countDistinct("doc_id").as("df"))
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"), sum("dl").as("sumdl"))
    // expression trees mirror the SQL oracle associativity exactly:
    // double * and / are IEEE-deterministic, so score bits match
    val avgdl = col("sumdl").cast("double") / col("n")
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfd = col("tf").cast("double")
    val score = idf * (tfd * lit(k1 + 1)) /
      (tfd + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), score.as("score"))
  }

  // ---- chunking (embedding-pipeline prep) ----------------------------------

  /**
   * Sliding-window token chunking: one output row per (doc, chunk),
   * `chunkSize` tokens with `stride` offsets (overlap = chunkSize -
   * stride) — the standard prep step before embedding long documents.
   * Pure codegen (sequence + slice + explode); the explode multiplies
   * rows, not bytes-per-token, and runs map-side.
   */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 64,
      stride: Int = 48): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride))
    val chunks = transform(starts,
      s => array_join(slice(toks, s + lit(1), lit(chunkSize)), " "))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol), col("chunk_idx").cast("long"),
        length(col("chunk_text")).cast("long").as("chunk_chars"),
        md5(col("chunk_text")).as("chunk_md5"))
  }

  /**
   * Token-budget sequence packing — the training-prep step that groups
   * documents into fixed-budget training sequences. Documents are
   * assigned to `nBuckets` independent packing streams (`doc_id mod
   * nBuckets`) and packed greedily in doc-id order: a doc opens a new
   * sequence when it would overflow `targetTokens` (a doc longer than
   * the budget gets a sequence of its own). Deterministic: same corpus
   * → same packing, regardless of parallelism.
   *
   * Scale shape: packing is inherently sequential — each placement
   * depends on the running fill — so the sequential part is confined to
   * one pass per bucket; buckets run in parallel (set nBuckets ≈ total
   * cores at 100 TB). Only (doc_id, n_tokens) shuffles, never text.
   *
   * Output: doc_id, n_tokens, bucket, seq (per-bucket sequence number),
   * offset (token start inside the sequence).
   */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetTokens: Int = 256,
      nBuckets: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(
      col(idCol).cast("long").as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"),
      pmod(col(idCol).cast("long"), lit(nBuckets.toLong)).cast("int").as("bucket"))
    toks
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // a partition may hold several buckets (hash collisions); rows
        // arrive sorted by (bucket, doc_id), so per-bucket state resets
        // on the bucket boundary
        var bucket = Int.MinValue
        var seq = -1L
        var fill = 0L
        it.map { case (docId, n, b) =>
          if (b != bucket) { bucket = b; seq = -1L; fill = 0L }
          if (seq < 0 || fill + n > targetTokens) { seq += 1; fill = 0L }
          val offset = fill
          fill += n
          (docId, n, b, seq, offset)
        }
      }
      .toDF("doc_id", "n_tokens", "bucket", "seq_id", "seq_offset")
  }

  /** Per-source document cap — mixture balancing: keep at most `cap`
   * docs per source, preferring longer documents (tie-break doc id).
   * One window over a source-hash shuffle; per-source groups are the
   * parallel unit (salt a dominating source upstream if needed). */
  def sourceCap(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      lenCol: String,
      cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col(lenCol).desc, col(idCol))
    df.select(col(idCol), col(sourceCol), col(lenCol))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= cap)
  }

  /** Deterministic global shuffle into training shards — the final prep
   * step before sharded training reads. Order = md5(seed ‖ doc id):
   * uniform, reproducible, and independent of input partitioning.
   * Shard = hash-range bucket of the same key, position = rank within
   * the shard (one window per shard partition, no global sort). */
  def globalShuffle(
      df: DataFrame,
      idCol: String,
      seed: String,
      nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    // first 8 hex chars → 32-bit range-partitioned shard: keeps shard
    // sizes balanced without a global sort
    val shard = (conv(substring(key, 1, 8), 16, 10).cast("long") *
      lit(nShards.toLong) / lit(4294967296L)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("shuffle_key"))
    df.select(col(idCol), key.as("shuffle_key"))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  // ---- paragraph-level exact dedup (C4-style) ------------------------------

  /**
   * Global segment-level exact dedup — the C4/RefinedWeb "drop repeated
   * paragraphs corpus-wide" step, with fixed `segTokens`-token segments
   * standing in for paragraphs (the fixtures carry no newline
   * structure). A segment keeps only its first occurrence by
   * (doc id, position); every doc is then reassembled from its
   * surviving segments in order.
   *
   * Scale shape: the keep-first window and the survivor aggregation
   * shuffle only (id, seg_idx, xxhash64(seg)) — 64-bit fingerprints,
   * never segment text. The clean text is rebuilt map-side from each
   * doc's own `textCol` (re-sliced by the surviving positions) after
   * ONE id-keyed join of the compact survivor-index arrays, so segment
   * strings never enter a shuffle at all. The 64-bit fingerprint
   * stands in for segment identity (the standard production trade:
   * ~n²/2⁶⁴ collision odds corpus-wide).
   */
  def paragraphDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(col(textCol)), "\\s+")
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(segTokens))
    val segs = transform(starts,
      s => array_join(slice(toks, s + lit(1), lit(segTokens)), " "))
    // explode → project to the hash INSIDE the same stage: only the
    // 8-byte fingerprint reaches the window shuffle
    val narrow = df
      .select(col(idCol), posexplode(segs).as(Seq("seg_idx", "seg")))
      .filter(col("seg") =!= "")
      .select(col(idCol), col("seg_idx"), xxhash64(col("seg")).as("seg_h"))
    val keepFirst = Window.partitionBy("seg_h").orderBy(col(idCol), col("seg_idx"))
    val survivors = narrow
      .withColumn("rn", row_number().over(keepFirst))
      .filter(col("rn") === 1)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("seg_idx"))).as("kept_idx"))
    df.select(col(idCol), segs.as("segs"))
      .join(survivors, Seq(idCol))
      .select(col(idCol),
        size(col("kept_idx")).cast("long").as("n_kept"),
        array_join(transform(col("kept_idx"),
          i => element_at(col("segs"), i + lit(1))), " ").as("clean"))
      .select(col(idCol), col("n_kept"),
        length(col("clean")).cast("long").as("clean_chars"),
        md5(col("clean")).as("clean_md5"))
  }

  // ---- benchmark decontamination -------------------------------------------

  /**
   * N-gram decontamination: flag training documents sharing any
   * `n`-token sliding n-gram with the held-out set selected by
   * `evalPred` (the standard "remove eval overlap from the training
   * corpus" step). The eval n-gram set is tiny relative to the corpus,
   * so it BROADCASTS — the training side streams through map-side, one
   * aggregation shuffle for the per-doc counts.
   *
   * N-grams are compared by 64-bit fingerprint, not text, and the
   * fingerprint never materializes the gram string: each token is
   * hashed ONCE (xxhash64), then every gram hash is a rolling
   * polynomial over `n` consecutive token hashes (wrapping 64-bit
   * arithmetic — deterministic on every JVM). Building the ~50-byte
   * gram strings was the dominant allocation cost of this operator;
   * the arithmetic combine is pure codegen with zero per-gram
   * allocation, and only (id, 8-byte fingerprint) ever leaves the
   * scan stage (same ~n²/2⁶⁴ collision trade every production
   * decontamination pipeline makes).
   */
  def decontaminate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      evalPred: Column,
      n: Int = 8): DataFrame = {
    // eval/train split BEFORE the explode so the (tiny) eval side scans
    // only its own partitions' rows — the predicate reaches the source.
    val evalGrams = ngramHashes(df.filter(evalPred), idCol, textCol, n)
      .select("ngh").distinct()
    ngramHashes(df.filter(not(evalPred)), idCol, textCol, n)
      .join(broadcast(evalGrams), "ngh")
      .groupBy(col(idCol))
      .agg(countDistinct(col("ngh")).as("n_shared"))
  }

  /** One row per (doc, n-gram-hash). The token-hash array is
   * materialized by its own projection: a lambda body is NOT
   * subexpression-eliminated across invocations, so referencing the
   * transform() directly inside the per-gram lambda would recompute
   * every token hash per gram (O(T²) per doc). */
  private def ngramHashes(
      side: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val withTh = side.select(col(idCol), transform(toks, t => xxhash64(t)).as("th"))
    val th = col("th")
    // rotate-left(5) ⊕ next-token-hash: order-sensitive 64-bit combine
    // in pure bit-ops (ANSI mode forbids wrapping multiply/add)
    val gram = (s: Column) => aggregate(
      sequence(lit(1), lit(n)), lit(-7046029254386353131L),
      (acc, j) => shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59))
        .bitwiseXOR(element_at(th, s + j)))
    val ghs = when(size(th) >= n,
      transform(sequence(lit(0), size(th) - lit(n), lit(1)), gram))
      .otherwise(array().cast("array<bigint>"))
    withTh.select(col(idCol), explode(ghs).as("ngh"))
  }

  /** Per-document contamination REPORTING (the fraction companion of
   * [[decontaminate]]'s binary verdict): for every train doc with at
   * least one n-gram, its distinct-gram count, how many hit the eval
   * set, and the overlap fraction — the signal threshold-based
   * decontamination policies act on. Same plan shape as decontaminate
   * (broadcast eval grams, map-side train stream) plus one map-side
   * total-count aggregate. */
  def contaminationScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      evalPred: Column,
      n: Int = 8): DataFrame = {
    val evalGrams = ngramHashes(df.filter(evalPred), idCol, textCol, n)
      .select("ngh").distinct().withColumn("__hit", lit(true))
    // ONE pass over the train grams: tag each gram by a broadcast left
    // join against the eval set and compute totals and hits in the same
    // aggregation — the two-aggregate formulation scanned and exploded
    // the train side twice and paid a third join to stitch the counts
    // (countDistinct over the `when` is exactly the inner-join count;
    // docs sharing nothing get 0 from countDistinct, as coalesce did)
    ngramHashes(df.filter(not(evalPred)), idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("ngh"), "left")
      .groupBy(col(idCol))
      .agg(countDistinct(col("ngh")).as("n_grams"),
        countDistinct(when(col("__hit"), col("ngh"))).as("n_shared"))
      .select(col(idCol), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("contamination"))
  }

  // ---- vocabulary coverage (cheap LM-style quality signal) -----------------

  /**
   * Per-document coverage of the corpus top-k vocabulary: the fraction
   * of a doc's tokens that are common corpus-wide — a deterministic
   * stand-in for LM-likelihood quality scoring (no floating-point log,
   * so the oracle matches bit-for-bit). Two passes: word-count top-k
   * (one shuffle over tokens), then a broadcast join of the tiny vocab
   * against the exploded tokens.
   */
  def vocabCoverage(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 100): DataFrame = {
    val vocab = vocabTopK(df, textCol, topK).select(col("token"), lit(1).as("in_vocab"))
    val tokens = df
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    tokens.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), count(col("in_vocab")).as("n_in_vocab"))
      .withColumn("coverage",
        col("n_in_vocab").cast("double") / col("n_tokens"))
  }

  // ---- deterministic stratified sampling ----------------------------------

  /** Per-stratum deterministic hash sampling: keep a row iff
   * md5(id)'s first 32 bits fall under the stratum's fraction — the
   * mixture-weighting step of a training-data pipeline, reproducible
   * across engines and runs (no RNG). Map-side filter, no shuffle. */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(lit(defaultFraction * 4294967296.0)) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit(f * 4294967296.0)).otherwise(acc)
    }
    df.filter(h.cast("double") < threshold)
  }

  /** Rolling polynomial fingerprint (Karp-Rabin over tokens): order-
   * sensitive content fingerprint, robust to whitespace changes. Mod-p
   * arithmetic (p = 2^31-1) over Unicode code points so the identical
   * value is computable in overflow-free BIGINT SQL for the oracle;
   * token hash = poly(31) over code points, rolling combine = poly(131). */
  val FingerprintMod: Long = 2147483647L

  def fingerprintUdf = udf { (text: String) =>
    if (text == null) 0L
    else {
      var h = 0L
      text.trim.split("\\s+").foreach { tok =>
        if (tok.nonEmpty) {
          var th = 0L
          val it = tok.codePoints().iterator()
          while (it.hasNext) { th = (th * 31 + it.nextInt()) % FingerprintMod }
          h = (h * 131 + th) % FingerprintMod
        }
      }
      h
    }
  }

}
