package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.model.CorpusStats

/**
 * Per-term frequency-distribution histograms (SURVEY.md §2.6 A4-A7).
 *
 * All four distributions of the reference's freq family over the
 * denormalized posting source `termDocs(docId, docLen, term, tf)`:
 * bin a per-posting relative frequency with the LengthNormalized rule
 * (`freq/LengthNormalized.java:15-41`) and count per (term, bin).
 * One broadcast-filtered scan + one partial-aggregated groupBy each.
 */
object Histograms {

  /** Fast binning rule: v = trunc(pct·bins); bin = (v == bins) ? v : v+1.
   * Property-tested fast == slow (BinningSpec). */
  def binCol(pct: Column, bins: Int): Column = {
    val v = floor(pct * bins)
    when(v === bins, v).otherwise(v + 1).cast("int")
  }

  /** A4 — raw tf normalized by doc length (`TermFreqDistribution.java:40-78`):
   * pct = tf/docLen. */
  def lengthNormalized(termDocs: DataFrame, terms: Seq[String], bins: Int): DataFrame =
    termDocs.filter(col("term").isin(terms: _*))
      .withColumn("bin", binCol(col("tf").cast("double") / col("docLen").cast("double"), bins))
      .groupBy("term", "bin").agg(count(lit(1)).as("cnt"))

  /** Standard normal CDF via commons-math3 (the exact library the reference
   * uses, `freq/Phi.java:18,75`) — ships in /opt/spark/jars. */
  val phiUdf: UserDefinedFunction = udf { (x: Double) =>
    new org.apache.commons.math3.distribution.NormalDistribution(null, 0d, 1d)
      .cumulativeProbability(x)
  }

  /** A5 — Phi distribution (`freq/Phi.java:46-90`):
   * pct = Φ((tf - e_ij)/√e_ij), e_ij = cf·dl/C. */
  def phi(termDocs: DataFrame, dict: DataFrame, stats: CorpusStats,
          terms: Seq[String], bins: Int): DataFrame = {
    val e = (col("cf") * col("docLen")).cast("double") / lit(stats.numTokens.toDouble)
    termDocs.filter(col("term").isin(terms: _*))
      .join(broadcast(dict.filter(col("term").isin(terms: _*)).select("term", "cf")), "term")
      .withColumn("bin", binCol(phiUdf((col("tf").cast("double") - e) / sqrt(e)), bins))
      .groupBy("term", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** A6a — Zero (add-one smoothed) distribution
   * (`freq/ZeroDistribution.java:55-120`): docs containing the term bin
   * (tf+1)/(dl+1); ALL OTHER docs bin 1/(dl+1) (the reference realizes the
   * complement with a MatchAll + MUST_NOT query; here a left-anti join). */
  def zero(termDocs: DataFrame, docs: DataFrame, terms: Seq[String], bins: Int): DataFrame = {
    val matching = termDocs.filter(col("term").isin(terms: _*))
      .withColumn("bin", binCol(
        (col("tf").cast("double") + 1) / (col("docLen").cast("double") + 1), bins))
      .select("term", "bin")

    // per term: docs NOT containing it (left_anti), binned at tf=0
    val spark = termDocs.sparkSession
    import spark.implicits._
    val termsDf = broadcast(terms.toDF("term"))
    val nonMatching = docs.select(col("docId"), col("docLen")).crossJoin(termsDf)
      .join(termDocs.filter(col("term").isin(terms: _*)).select("docId", "term"),
        Seq("docId", "term"), "left_anti")
      .withColumn("bin", binCol(lit(1.0) / (col("docLen").cast("double") + 1), bins))
      .select("term", "bin")

    matching.unionByName(nonMatching)
      .groupBy("term", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** A6b — Dirichlet-smoothed distribution
   * (`freq/DirichletDistribution.java`, relativeFrequency at the file's
   * private helper): pct = (tf + e_ij)/(dl + e_ij), e_ij = cf·dl/C. */
  def dirichlet(termDocs: DataFrame, dict: DataFrame, stats: CorpusStats,
                terms: Seq[String], bins: Int): DataFrame = {
    val e = (col("cf") * col("docLen")).cast("double") / lit(stats.numTokens.toDouble)
    termDocs.filter(col("term").isin(terms: _*))
      .join(broadcast(dict.filter(col("term").isin(terms: _*)).select("term", "cf")), "term")
      .withColumn("bin", binCol((col("tf").cast("double") + e) / (col("docLen").cast("double") + e), bins))
      .groupBy("term", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Dense `Long[bins+1]` arrays per term (index 0 unused, as the
   * reference's `rollCountArray`); histograms are tiny, built driver-side. */
  def toDense(hist: DataFrame, bins: Int): Map[String, Array[Long]] =
    hist.collect()
      .groupBy(_.getString(0))
      .map { case (term, rows) =>
        val arr = new Array[Long](bins + 1)
        rows.foreach(r => arr(r.getInt(1)) = r.getLong(2))
        term -> arr
      }
}
