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
