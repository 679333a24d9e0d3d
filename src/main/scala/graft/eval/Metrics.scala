package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Native effectiveness metrics (SURVEY.md §2.11). The reference shells out
 * to trec_eval / gdeval.pl and parses their outputs (`eval/TrecEval.java:33-77`,
 * `eval/GdEval.java:18-60`); zero-egress forbids that, so the standard
 * formulas are computed with window functions over runs ⋈ qrels:
 *
 *  - AP      = Σ_{rel ranks r} P@r / |rel(q)|            (binary rel: judge > 0)
 *  - P@k     = |rel in top k| / k
 *  - R@k     = |rel in top k| / |rel(q)|
 *  - NDCG@k  = DCG@k / IDCG@k, gain (2^judge − 1)/log2(rank+1)   (gdeval form)
 *  - ERR@k   = Σ (R_r/r)·Π_{i<r}(1−R_i), R = (2^judge − 1)/2^gmax (gdeval form)
 *
 * `runs(qid, docId, rank, score)`, `qrels(qid, docId, judge)`.
 */
object Metrics {

  /** runs ⋈ qrels with judge coalesced to 0; negative judges (spam) count
   * as non-relevant, as trec_eval does. */
  def judged(runs: DataFrame, qrels: DataFrame): DataFrame =
    runs.join(qrels, Seq("qid", "docId"), "left")
      .withColumn("judge", coalesce(col("judge"), lit(0)))
      .withColumn("rel", (col("judge") > 0).cast("int"))

  /** Per-qid relevant-document totals (from qrels, not runs). */
  def numRel(qrels: DataFrame): DataFrame =
    qrels.filter(col("judge") > 0).groupBy("qid").agg(count(lit(1)).as("numRel"))

  /** All metrics per qid in one pass over the judged run. */
  def perQuery(runs: DataFrame, qrels: DataFrame, k: Int = 20, gmax: Int = 4): DataFrame =
    perQueryGrouped(runs, qrels, k, gmax, Nil)

  /** [[perQuery]] with extra grouping columns carried through (e.g. a
   * `model` column from a one-pass parameter sweep): every window/groupBy
   * partitions by (groupCols :+ qid); qrels stay keyed by qid alone. */
  def perQueryGrouped(runs: DataFrame, qrels: DataFrame, k: Int, gmax: Int,
                      groupCols: Seq[String]): DataFrame = {
    val keys = groupCols :+ "qid"
    val j = judged(runs, qrels)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("rank").asc)

    val enriched = j
      .withColumn("cumRel", sum("rel").over(w))
      .withColumn("precAt", col("cumRel").cast("double") / col("rank"))
      // ERR stopping probability (gdeval.pl): R = (2^judge - 1) / 2^gmax
      .withColumn("errR", (pow(lit(2.0), col("judge")) - 1) / lit(math.pow(2.0, gmax)))
      .withColumn("errContrib",
        (col("errR") / col("rank")) *
          exp(coalesce(
            sum(log(lit(1.0) - when(col("errR") >= 1.0, lit(0.999999)).otherwise(col("errR"))))
              .over(w.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0.0))))
      .withColumn("dcgGain",
        (pow(lit(2.0), col("judge")) - 1) / (log(col("rank").cast("double") + 1) / log(lit(2.0))))

    val base = enriched.groupBy(keys.map(col): _*).agg(
      sum(when(col("rel") === 1, col("precAt")).otherwise(lit(0.0))).as("apNum"),
      sum(when(col("rank") <= k, col("rel")).otherwise(lit(0))).cast("double").as("relAtK"),
      sum(when(col("rank") <= k, col("dcgGain")).otherwise(lit(0.0))).as("dcgAtK"),
      sum(when(col("rank") <= k, col("errContrib")).otherwise(lit(0.0))).as("errAtK"))

    // ideal DCG@k from qrels sorted by judge desc
    val wIdeal = Window.partitionBy("qid").orderBy(col("judge").desc, col("docId").asc)
    val idcg = qrels.filter(col("judge") > 0)
      .withColumn("irank", row_number().over(wIdeal))
      .filter(col("irank") <= k)
      .groupBy("qid")
      .agg(sum((pow(lit(2.0), col("judge")) - 1) /
        (log(col("irank").cast("double") + 1) / log(lit(2.0)))).as("idcgAtK"))

    base
      .join(numRel(qrels), Seq("qid"), "left")
      .join(idcg, Seq("qid"), "left")
      .select(keys.map(col) ++ Seq(
        when(col("numRel").isNull || col("numRel") === 0, lit(0.0))
          .otherwise(col("apNum") / col("numRel")).as("ap"),
        (col("relAtK") / k).as(s"p$k"),
        when(col("numRel").isNull || col("numRel") === 0, lit(0.0))
          .otherwise(col("relAtK") / col("numRel")).as(s"recall$k"),
        when(col("idcgAtK").isNull || col("idcgAtK") === 0, lit(0.0))
          .otherwise(col("dcgAtK") / col("idcgAtK")).as(s"ndcg$k"),
        col("errAtK").as(s"err$k")): _*)
  }

  /** Mean over queries per metric (A11, `Evaluator.java:239-260`). */
  def means(perQuery: DataFrame): DataFrame = {
    val cols = perQuery.columns.filterNot(_ == "qid")
    perQuery.agg(avg(cols.head).as(s"mean_${cols.head}"),
      cols.tail.map(c => avg(c).as(s"mean_$c")): _*)
  }

  /** R6 — Waterloo-spam re-rank (`spam/SpamTool.java:99-120`): drop run docs
   * with spam percentile < threshold, re-rank by (score desc, docId desc —
   * the reference's SubmissionFile.Tuple tie-break, `SubmissionFile.java:58-65`),
   * truncate to k. */
  def spamRerank(runs: DataFrame, spamScores: DataFrame, threshold: Int, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("docId").desc)
    runs.join(spamScores, Seq("docId"), "left")
      .withColumn("percentile", coalesce(col("percentile"), lit(0)))
      .filter(col("percentile") >= threshold)
      .withColumn("newRank", row_number().over(w))
      .filter(col("newRank") <= k)
      .select(col("qid"), col("docId"), col("newRank").as("rank"), col("score"))
  }
}
