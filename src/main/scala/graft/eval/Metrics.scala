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

  /** NCG@k — Normalized Cumulative Gain, the reference's `Measure.NCG1000`
   * (`knn/Measure.java:20`), parsed from its bundled trec_eval's
   * `ncg_cut_k` lines (`eval/TrecEval.java:64-68`): cumulated LINEAR gain
   * (gain = judge level, negatives floored at 0 — spam judgments don't
   * subtract) over the ideal cumulated gain at the same cutoff. One row per
   * queried qid; 0.0 when the query has no relevant documents. */
  def ncgAtK(runs: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val gains = judged(runs, qrels)
      .filter(col("rank") <= k)
      .groupBy("qid")
      .agg(sum(greatest(col("judge"), lit(0)).cast("double")).as("cg"))
    val wIdeal = Window.partitionBy("qid").orderBy(col("judge").desc, col("docId").asc)
    val ideal = qrels.filter(col("judge") > 0)
      .withColumn("irank", row_number().over(wIdeal))
      .filter(col("irank") <= k)
      .groupBy("qid")
      .agg(sum(col("judge").cast("double")).as("icg"))
    runs.select("qid").distinct()
      .join(gains, Seq("qid"), "left")
      .join(ideal, Seq("qid"), "left")
      .select(col("qid"),
        when(col("icg").isNull || col("icg") === 0, lit(0.0))
          .otherwise(coalesce(col("cg"), lit(0.0)) / col("icg")).as(s"ncg$k"))
  }

  /**
   * statAP — sampling-based inferred AP (Pavlu & Aslam's statAP estimator;
   * the reference parses `scripts/statAP_MQ_eval_v4.pl` output in
   * `eval/StatAP.java:1-167`; the estimator itself is re-derived from the
   * script's core loop, `statAP_MQ_eval_v4.pl:229-333`):
   *
   *  - R̂(q)    = Σ_{sampled rel docs} 1/iprob          (estimated #relevant)
   *  - walking the run by rank: for each sampled relevant doc at rank r,
   *    prec_r = (1 + Σ_{sampled rel above r} 1/iprob) / r
   *  - statAP = Σ prec_r / iprob_r / R̂(q)
   *
   * `prels(qid, docId, judge, iprob)` — the perl script's 5-column prel file
   * with per-doc inclusion probabilities. Docs absent from prels are
   * unsampled and contribute nothing. statAP = 0.0 when R̂ = 0 (the parser's
   * "0.00000"/NA default, `StatAP.java:73`).
   */
  def statAP(runs: DataFrame, prels: DataFrame): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("rank").asc)
    val j = runs.join(prels, Seq("qid", "docId"), "left")
      .withColumn("relW",
        when(col("judge") > 0, lit(1.0) / col("iprob")).otherwise(lit(0.0)))
      .withColumn("prevSum",
        coalesce(sum("relW").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("contrib",
        when(col("judge") > 0,
          ((lit(1.0) + col("prevSum")) / col("rank")) / col("iprob"))
          .otherwise(lit(0.0)))
    val up = j.groupBy("qid").agg(sum("contrib").as("up"))
    val rq = prels.filter(col("judge") > 0)
      .groupBy("qid").agg(sum(lit(1.0) / col("iprob")).as("rq"))
    runs.select("qid").distinct()
      .join(up, Seq("qid"), "left")
      .join(rq, Seq("qid"), "left")
      .select(col("qid"),
        when(col("rq").isNull || col("rq") === 0, lit(0.0))
          .otherwise(coalesce(col("up"), lit(0.0)) / col("rq")).as("statap"))
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

  /** Judgement-coverage histogram per model (`cmdline/JudgeTool.java:120-152`
   * radix counts): over each model's top-k, how many retrieved docs are
   * unjudged, spam-graded (−2), or graded 0..4 — the run-pool coverage
   * analytic behind the reference's judged@k tables. One left join + one
   * grouped aggregation; never per-row driver work.
   *
   * @param runs (model, qid, docId, rank) ranked runs (e.g. a ParamTrain
   *   sweep); rank ≤ k rows are counted
   */
  def judgeHistogram(runs: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    def cnt(cond: org.apache.spark.sql.Column) = sum(when(cond, 1L).otherwise(0L))
    // JudgeTool reads qrels into a (qid, docId) → judge MAP, so a retrieved
    // doc counts ONCE even when a qrels file carries duplicate lines; a raw
    // join would emit one row per duplicate. max(judge) is the
    // deterministic stand-in for the reference's load-order last-wins.
    val uniqueQrels = qrels.select("qid", "docId", "judge")
      .groupBy("qid", "docId").agg(max("judge").as("judge"))
    runs.filter(col("rank") <= k)
      .join(uniqueQrels, Seq("qid", "docId"), "left")
      .groupBy("model")
      .agg(
        cnt(col("judge").isNull).as("unjudged"),
        cnt(col("judge") === -2).as("spam"),
        cnt(col("judge") === 0).as("g0"),
        cnt(col("judge") === 1).as("g1"),
        cnt(col("judge") === 2).as("g2"),
        cnt(col("judge") === 3).as("g3"),
        cnt(col("judge") === 4).as("g4"))
  }
}
