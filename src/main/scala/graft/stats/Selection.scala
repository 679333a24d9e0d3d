package graft.stats

import graft.model.Topic

/**
 * Selective stemming / model selection (SURVEY.md §2.10;
 * reference `SelectionMethods.java:79-200`, `knn/KNNTool.java:31-98`).
 *
 * These operate on per-query term statistics and tiny per-query vectors
 * (≤ a few hundred queries × ≤8 terms), so they are driver-side pure Scala —
 * the distributed part is producing the df/cf tables and histograms they
 * consume.
 */
object Selection {

  /**
   * Kendall's tau correlation between two rankings given as paired value
   * sequences (the reference uses commons-math3 KendallsCorrelation over
   * per-query term df/cf orders, `SelectionMethods.java:79-96`).
   * Tie-aware (tau-b).
   */
  def kendallTau(x: Seq[Double], y: Seq[Double]): Double = {
    require(x.size == y.size && x.size >= 2, "need ≥2 paired observations")
    val n = x.size
    var concordant = 0L
    var discordant = 0L
    var tiesX = 0L
    var tiesY = 0L
    for (i <- 0 until n; j <- (i + 1) until n) {
      val dx = java.lang.Double.compare(x(i), x(j))
      val dy = java.lang.Double.compare(y(i), y(j))
      if (dx == 0 && dy == 0) { tiesX += 1; tiesY += 1 }
      else if (dx == 0) tiesX += 1
      else if (dy == 0) tiesY += 1
      else if (dx * dy > 0) concordant += 1
      else discordant += 1
    }
    val n0 = n.toLong * (n - 1) / 2
    val denom = math.sqrt((n0 - tiesX).toDouble * (n0 - tiesY).toDouble)
    if (denom == 0) 0.0 else (concordant - discordant) / denom
  }

  /**
   * TermFreqDistribution-order selective stemming
   * (`SelectionMethods.java:79-96` "DF order" semantics): for a query,
   * choose the stemmed index when the df-order and cf-order of its analyzed
   * terms agree (tau == 1), else keep NoStem. Inputs: per-term (df, cf)
   * under the candidate tag.
   */
  def agreeOnOrder(dfs: Seq[Long], cfs: Seq[Long]): Boolean =
    dfs.size < 2 || kendallTau(dfs.map(_.toDouble), cfs.map(_.toDouble)) == 1.0

  /** Per-term statistics under one analyzer tag, aligned by query-term
   * position (reference `TermStats`: docFreq, totalTermFreq). */
  final case class TermStat(df: Long, cf: Long)

  /** Reference ClueWeb09 binning constants (`SelectionMethods.TermTFDF`
   * `maxDF`/`maxTF`/`NumberOfBIN`). */
  val DefaultMaxDf: Long = 20450000L
  val DefaultMaxTf: Long = 893148000L
  val DefaultBins: Int = 10
  val KendallTauThreshold: Double = 1.0

  /**
   * Full selective-stemming tag prediction — all 12 reference selection
   * methods (`SelectionMethods.getPredictedTag`, `SelectionMethods.java:
   * 79-97` dispatch; bodies at 98-330):
   *
   *  - MSTTF / MSTDF (+Binning): stable-sort the query's terms by cf / df
   *    under each tag; if the minimum-stat term POSITION differs between
   *    tags → tag1 (NoStem), else tag2 (stemmed).
   *  - TFOrder / DFOrder (+Binning): if the full sorted position sequences
   *    differ → tag2 (stemmed), else tag1.
   *  - KendallTauTFOrder / KendallTauDFOrder (+Binning): single-term
   *    queries → tag1; else Kendall's tau between the two sorted position
   *    sequences (`KendallVal`, identical sequences short-cut to 1); tau ≥
   *    threshold → tag1, else tag2.
   *
   * Binning deviation: the reference computes `(int) TF / size` — a 32-bit
   * truncation that overflows for cf > 2³¹ on its own corpus; we keep the
   * division in 64 bits (`TF / size`), which is the evident intent.
   *
   * @param stats1 per-term stats under tag1 (query order)
   * @param stats2 per-term stats under tag2 (same order)
   */
  def predictTag(method: String,
                 stats1: Seq[TermStat], stats2: Seq[TermStat],
                 tag1: String, tag2: String,
                 bins: Int = DefaultBins,
                 maxDf: Long = DefaultMaxDf, maxTf: Long = DefaultMaxTf,
                 tauThreshold: Double = KendallTauThreshold): String = {
    require(stats1.nonEmpty && stats1.size == stats2.size,
      "need aligned, non-empty per-tag term stats")
    val useTf = method.contains("TF")
    val binning = method.endsWith("Binning")
    def values(s: Seq[TermStat]): Seq[Long] = {
      val raw = s.map(t => if (useTf) t.cf else t.df)
      if (!binning) raw
      else {
        val size = math.max(1L, (if (useTf) maxTf else maxDf) / bins)
        raw.map(_ / size)
      }
    }
    // stable sort by value => ties keep query order, like ArrayList.sort
    def sortedIdx(vs: Seq[Long]): Seq[Int] =
      vs.zipWithIndex.sortBy(_._1).map(_._2)
    val (idx1, idx2) = (sortedIdx(values(stats1)), sortedIdx(values(stats2)))

    method.stripSuffix("Binning") match {
      case "MSTTF" | "MSTDF" =>
        if (idx1.head != idx2.head) tag1 else tag2
      case "TFOrder" | "DFOrder" =>
        if (idx1 != idx2) tag2 else tag1
      case "KendallTauTFOrder" | "KendallTauDFOrder" =>
        if (stats1.size == 1) tag1
        else {
          val tau =
            if (idx1 == idx2) 1.0
            else kendallTau(idx1.map(_.toDouble), idx2.map(_.toDouble))
          if (tau - tauThreshold >= 0) tag1 else tag2
        }
      case other => throw new IllegalArgumentException(s"unknown selection method: $other")
    }
  }

  /**
   * Rule-Based (RB) model selection (`eval/RBEvaluator.scoreRuleBased`,
   * `RBEvaluator.java:40-57`), over per-query term statistics:
   *
   *  1. single-word query → RawTF
   *  2. any term's expected tf under avg doc length (cf/N,
   *     `QuerySelector.expectedUnderDBar:232-241`) > e → DFIC
   *  3. two-word query → df discriminative ratio max/min
   *     (`QuerySelector.termRatio:243-270`) < 2 → LogTFNv0L0, else DPH
   *  4. otherwise → DFIC
   *
   * @param queryLen the query WORD count (incl. duplicate words —
   *   `InfoNeed.wordCount`), not the distinct-term count
   */
  def ruleBasedModel(queryLen: Int, cfs: Seq[Long], dfs: Seq[Long],
                     numDocs: Double, e: Double): String = {
    require(cfs.nonEmpty && dfs.nonEmpty, "need per-term stats")
    if (queryLen == 1) "RawTF"
    else if (cfs.exists(_.toDouble / numDocs > e)) "DFIC"
    else if (queryLen == 2) {
      if (dfs.max.toDouble / dfs.min < 2.0) "LogTFNv0L0" else "DPH"
    } else "DFIC"
  }

  /** J7 — majority vote of per-neighbor best models
   * (`knn/MajorityVoter`): most frequent label, ties → lexicographically
   * smallest. */
  def majorityVote(labels: Seq[String]): String =
    labels.groupBy(identity).map { case (l, o) => (l, o.size) }
      .toSeq.sortBy { case (l, c) => (-c, l) }.head._1

  /** J7 — mean vote (`knn/MeanVoter`): label with the best mean score;
   * lower-is-better divergence scores. */
  def meanVote(scored: Seq[(String, Double)]): String =
    scored.groupBy(_._1).view.mapValues(v => v.map(_._2).sum / v.size)
      .toSeq.minBy { case (l, m) => (m, l) } match { case (l, _) => l }

  /**
   * KNN model selection (`knn/KNNTool.java:42-98`): for each query, find the
   * k nearest neighbor queries by histogram divergence (e.g. chi-square over
   * TFD vectors) and vote the best-performing model among them.
   *
   * @param tfds     qid → per-query TFD vector (already decorated)
   * @param bestOf   qid → best model label on that query (from evaluation)
   * @param distance divergence between two vectors (lower = closer)
   */
  def knnSelect(topics: Seq[Topic], tfds: Map[Int, Array[Double]],
                bestOf: Map[Int, String], k: Int,
                distance: (Array[Double], Array[Double]) => Double): Map[Int, String] =
    topics.flatMap { t =>
      tfds.get(t.qid).map { v =>
        val neighbors = topics.filter(o => o.qid != t.qid && tfds.contains(o.qid) && bestOf.contains(o.qid))
          .map(o => (o.qid, distance(v, tfds(o.qid))))
          .sortBy { case (qid, d) => (d, qid) }
          .take(k)
        t.qid -> majorityVote(neighbors.map(n => bestOf(n._1)))
      }
    }.toMap
}
