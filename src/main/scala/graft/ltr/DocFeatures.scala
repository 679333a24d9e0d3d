package graft.ltr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.query.Scoring

/**
 * LTR document / query-document features (SURVEY.md §2; reference `ltr/`
 * package — the text-applicable subset of its 80 feature classes; the
 * HTML/SEO features (Favicon, Https, InLinkCount…) have no analog on
 * transcript text and are out of scope).
 *
 *  - DocLength (`ltr/DocLength.java`): analyzed token count.
 *  - Entropy (`ltr/Entropy.java:14-34`): Σ_t p·(−log2 p), p = tf/docLen.
 *  - AvgTermLength (`ltr/AvgTermLength.java:10-16`): mean length over the
 *    doc's DISTINCT terms (mapTf.keySet).
 *  - CoveredTermCount / CoveredTermRatio (`ltr/CoveredTermCount.java`,
 *    `CoveredTermRatio.java`): per query word, does the doc contain it;
 *    count is the sum, ratio the mean over query words (duplicates weigh
 *    via their multiplicity).
 *
 * Feature vectors feed `Trec.formatLtr` (K5, SVMlight output).
 */
object DocFeatures {

  /** Per-doc features from the posting source `termDocs(docId, docLen,
   * term, tf)` — one broadcast-free scan, map-side combined. */
  def docFeatures(termDocs: DataFrame): DataFrame = {
    val p = col("tf").cast("double") / col("docLen").cast("double")
    termDocs.groupBy("docId").agg(
      first("docLen").as("doclen"),
      sum(p * -(log(p) / lit(Scoring.LN2))).as("entropy"),
      avg(length(col("term")).cast("double")).as("avg_term_len"))
  }

  /** Query-document coverage features for the analyzed query terms
   * `qterms(qid, term, mult, qLen)`: covered count (Σ mult of matched
   * terms) and ratio (covered / qLen). */
  def coverage(termDocs: DataFrame, qterms: DataFrame): DataFrame =
    termDocs
      .join(broadcast(qterms), Seq("term"))
      .groupBy("qid", "docId")
      .agg(sum("mult").as("covered_cnt"), first("qLen").as("qlen"))
      .select(col("qid"), col("docId"), col("covered_cnt"),
        (col("covered_cnt").cast("double") / col("qlen").cast("double")).as("covered_ratio"))
}
