package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/**
 * Text-analysis operators for training-data pipelines: per-document quality
 * statistics (pure column math — SQL-mirrorable), character-profile
 * language ID, and content fingerprints.
 */
object TextAnalysis {

  /** Small fixed stopword list shared with the SQL oracle. */
  val STOPWORDS: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is")

  /**
   * Per-doc quality statistics, all native column math over the raw text:
   * token count, distinct-token count, avg word length, stopword ratio,
   * uniqueness ratio, and a clamped linear quality score (a deterministic
   * proxy for the usual length/stopword/repetition heuristics).
   */
  /** The 6-dp-rounded quality score as a standalone column expression, for
   * callers that compose it into a single projection (see
   * [[graft.pipeline.Curation.curate]]). */
  def qualityExpr(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = split(textCol, " ")
    val nTokens = size(toks).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    val nStop = size(filter(toks, t => array_contains(lit(STOPWORDS.toArray), t))).cast("double")
    val stopRatio = nStop / nTokens
    val uniqRatio = nUniq / nTokens
    round(least(lit(1.0), greatest(lit(0.0),
      lit(0.3) + lit(0.5) * uniqRatio + lit(1.5) * stopRatio - lit(0.002) * abs(nTokens - 60))), 6)
  }

  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val nTokens = size(toks).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    // occurrence count (not distinct) of stopwords
    val nStop = size(filter(toks, t => array_contains(lit(STOPWORDS.toArray), t))).cast("double")
    // Σ word lengths = chars − (tokens − 1) separators
    val avgWordLen = (length(col(textCol)).cast("double") - (nTokens - 1)) / nTokens
    val stopRatio = nStop / nTokens
    val uniqRatio = nUniq / nTokens
    val quality = least(lit(1.0), greatest(lit(0.0),
      lit(0.3) + lit(0.5) * uniqRatio + lit(1.5) * stopRatio - lit(0.002) * abs(nTokens - 60)))
    df.select(col(idCol).as("id"),
      nTokens.cast("long").as("n_tokens"),
      nUniq.cast("long").as("n_uniq"),
      round(avgWordLen, 6).as("avg_word_len"),
      round(stopRatio, 6).as("stop_ratio"),
      round(uniqRatio, 6).as("uniq_ratio"),
      round(quality, 6).as("quality"))
  }

  // ---- language ID (character n-gram profile heuristic) --------------------

  /** Tiny per-language marker profiles: frequent function words + diagnostic
   * character n-grams. Deterministic scoring: Σ marker hits, normalized. */
  val PROFILES: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to ", "th", "ing ", " you "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " los ", "ción", " es ", " un "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ist ", "sch", " ein ", "ung "),
    "fr" -> Seq(" le ", " la ", " les ", " des ", " est ", " une ", "eau", " qui "),
    "zh" -> Seq("的", "是", "了", "在", "我", "不", "人", "有"))

  /** Best-scoring language plus its score. Marker occurrences are counted
   * NON-overlapping (advance past each match) — the same count a SQL oracle
   * gets from `(len(s) − len(replace(s, m, ''))) / len(m)`, which makes the
   * whole predictor hash-gateable against DuckDB. Ties in score go to the
   * lexicographically larger language (max of the (score, lang) pair). */
  def languageScoreOf(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val padded = " " + text.toLowerCase + " "
    val scores = PROFILES.map { case (lang, markers) =>
      val hits = markers.map { m =>
        var c = 0; var i = padded.indexOf(m)
        while (i >= 0) { c += 1; i = padded.indexOf(m, i + m.length) }
        c
      }.sum
      (lang, hits.toDouble / math.max(1, padded.length))
    }
    val best = scores.maxBy { case (lang, s) => (s, lang) }
    if (best._2 == 0.0) ("und", 0.0) else best
  }

  /** Predict the best-scoring language; ties broken as in [[languageScoreOf]]. */
  def languageOf(text: String): String = languageScoreOf(text)._1

  def withLanguage(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = udf(languageOf _)
    df.select(col(idCol).as("id"), f(col(textCol)).as("lang_pred"))
  }

  /** Language prediction with the winning score (raw double — round at the
   * query boundary for cross-engine compares). */
  def withLanguageScored(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = udf((t: String) => languageScoreOf(t))
    df.select(col(idCol).as("id"), f(col(textCol)).as("ls"))
      .select(col("id"), col("ls._1").as("lang_pred"), col("ls._2").as("lang_score"))
  }

  // ---- fingerprints --------------------------------------------------------

  /** Rolling polynomial 64-bit content hash over analyzed tokens — stable
   * under whitespace/punctuation variation (the analyzer normalizes). */
  def rollingFingerprint(text: String): Long = {
    var h = 1125899906842597L
    Analyzer.analyze(text).foreach { t =>
      h = h * 31L + Dedup.hash64(t)
    }
    h
  }

  /** Normalization fingerprint: md5 of the space-joined analyzed tokens —
   * equal iff two texts analyze identically. Column-level (SQL-mirrorable
   * for already-normalized text). */
  def normalizedFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = udf((t: String) => Analyzer.analyze(t).mkString(" "))
    df.select(col(idCol).as("id"), md5(norm(col(textCol))).as("fingerprint"))
  }

  /** Approximate token count with a BPE-ish heuristic: alphanumeric runs
   * count ceil(len/4) subtokens, every punctuation char counts 1 — the
   * standard cheap estimator for LLM token budgeting. */
  def approxLlmTokens(text: String): Long = {
    if (text == null) return 0L
    var count = 0L
    var run = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c)) run += 1
      else {
        if (run > 0) { count += (run + 3) / 4; run = 0 }
        if (!Character.isWhitespace(c)) count += 1
      }
      i += 1
    }
    if (run > 0) count += (run + 3) / 4
    count
  }

  def withApproxTokens(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = udf(approxLlmTokens _)
    df.select(col(idCol).as("id"), f(col(textCol)).as("approx_llm_tokens"))
  }

  /**
   * Per-doc n-gram repetition statistics — the Gopher/C4-style quality
   * filters (Rae et al. 2021 §A1.1; "fraction of characters in the most
   * common n-gram", "fraction in duplicated n-grams") adapted to the
   * whitespace-token corpus:
   *
   *  - `top_unigram_frac` / `top_bigram_frac`: occurrences of the most
   *    frequent token / token-bigram over all token / bigram slots;
   *  - `dup_unigram_frac` / `dup_bigram_frac`: fraction of slots whose
   *    gram occurs more than once in the doc.
   *
   * Shape at 100 TB: explode to (id, kind, gram) → ONE hash aggregation on
   * that key (map-side partial combine collapses each doc's repeats before
   * the shuffle — the shuffle carries ≤ |distinct grams per doc| rows) →
   * a per-doc roll-up on the id key. No windows, no joins, no UDFs; docs
   * with < 2 tokens report bigram fractions of 0 by convention (6-dp
   * rounded, like every cross-engine-gated ratio).
   */
  /** Spark `round(col, 6)` semantics exactly (BigDecimal.valueOf + HALF_UP)
   * so the kernel's fractions are bit-identical to the former column-math
   * form (and to the DuckDB oracle, which r05 hash-matched against it). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (topFrac, dupFrac) of one gram sequence: occurrences of the most
   * frequent gram / of all grams occurring more than once, over all slots. */
  private def gramFracs(grams: Array[String]): (Double, Double) = {
    val n = grams.length
    if (n == 0) return (0.0, 0.0)
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < n) { counts.merge(grams(i), 1, (a, b) => a + b); i += 1 }
    var top = 0
    var dup = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    (round6(top.toDouble / n), round6(dup.toDouble / n))
  }

  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Round 6 (optimization guide §2.4 + §1.2): the r5 form exploded every
    // gram and ran a 3-shuffle aggregation — a corpus-sized shuffle for a
    // PER-DOCUMENT statistic. The statistic is a pure function of one row,
    // so it is now a single JVM kernel per doc (the same shape as the
    // sibling langid/fingerprint/token-estimate operators): zero shuffles,
    // zero corpus-sized wire traffic, one hash-count pass per doc. (A pure
    // column-math fold over the sorted gram array was tried first and was
    // SLOWER than the shuffle form — Spark evaluates higher-order-function
    // lambdas interpreted per element.) Arithmetic is unchanged: exact
    // integer counts, the same double divisions, Spark-round at 6 dp; docs
    // with < 2 tokens report bigram fractions 0; null-text docs emitted no
    // gram rows before and stay absent.
    val f = udf { (text: String) =>
      val t = text.split(" ", -1) // exact split(col, " ") semantics
      val (tu, du) = gramFracs(t)
      val bi =
        if (t.length < 2) Array.empty[String]
        else Array.tabulate(t.length - 1)(i => t(i) + " " + t(i + 1))
      val (tb, db) = gramFracs(bi)
      (tu, tb, du, db)
    }
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), f(col(textCol)).as("r"))
      .select(col("id"),
        col("r._1").as("top_unigram_frac"),
        col("r._2").as("top_bigram_frac"),
        col("r._3").as("dup_unigram_frac"),
        col("r._4").as("dup_bigram_frac"))
  }
}
