package graft.train

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * LearningToSelect — per-query selective model selection via run-divergence
 * KNN (reference `LearningToSelect.java:1-440`): the end-to-end assembly of
 * the divergence + KNN-vote + evaluation kernels over a parameter-sweep's
 * runs.
 *
 *  1. Feature per (query, candidate model): Kullback-Leibler divergence
 *     between the BASE model's and the candidate's retrieval-score
 *     distributions over the intersection of their top-n documents, each
 *     min-max normalized per Lee (1997) with additive constant c
 *     (`LearningToSelect.java:125-175`). Empty intersection → a large
 *     sentinel divergence (the reference uses Double.MAX_VALUE,
 *     `LearningToSelect.java:203-206`; a finite sentinel keeps the value
 *     round-trippable across engines).
 *  2. Selection per query (`LearningToSelect.java:254-330`): leave-one-out
 *     KNN — for each candidate model, the k queries with the closest
 *     feature under THAT model are its neighbors; the candidate's predicted
 *     effectiveness is the mean evaluation metric of those neighbors; the
 *     chosen model is the best predicted (desc, ties → model name asc —
 *     `eval/ModelScore.java:41-48` ordering).
 *
 * Everything is DataFrame algebra: features are one run self-join + one
 * window per (model, query); selection is a bounded |queries|² × |models|
 * join — at reference scale (≤200 topics × ≤200 models) trivially small,
 * and still shuffle-bounded by |Q|²·|M| rows (never corpus-sized).
 */
object LearnToSelect {

  val LeeC: Double = 0.01 // Lee (1997) additive constant (`LearningToSelect.java:27`)
  val EmptyIntersectionKl: Double = 1e9

  /**
   * KL feature per (candidate model, qid) vs `baseModel` over the top-n
   * run intersection. `runs`: (model, qid, docId, rank, score).
   * Output: (model, qid, kl) with kl rounded to 6 decimals (cross-engine
   * float discipline — every downstream comparison sees identical values).
   */
  def klFeatures(runs: DataFrame, baseModel: String, n: Int,
                 c: Double = LeeC): DataFrame = {
    val base = runs.filter(col("model") === baseModel && col("rank") <= n)
      .select(col("qid"), col("docId"), col("score").cast("double").as("bs"))
    val cand = runs.filter(col("model") =!= baseModel && col("rank") <= n)
      .select(col("model"), col("qid"), col("docId"), col("score").cast("double").as("cs"))
    val inter = cand.join(base, Seq("qid", "docId"))

    val w = Window.partitionBy("model", "qid")
    // Lee (1997) normalization (`LearningToSelect.java:125-161`):
    // one shared doc → all 1+c; constant scores → all c; else min-max + c
    def norm(s: Column, mn: Column, mx: Column, cnt: Column): Column =
      when(cnt === 1, lit(1.0 + c))
        .when(mn === mx, lit(c))
        .otherwise((s - mn) / (mx - mn) + lit(c))
    val normed = inter
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("rb", norm(col("bs"), min("bs").over(w), max("bs").over(w), col("cnt")))
      .withColumn("rc", norm(col("cs"), min("cs").over(w), max("cs").over(w), col("cnt")))
    // KL = (1/len) Σ rb·log2(rb/rc)  (`LearningToSelect.java:164-175`)
    val kl = normed.groupBy("model", "qid")
      .agg(round(sum(col("rb") * (log(col("rb") / col("rc")) / log(lit(2.0)))) /
        count(lit(1)), 6).as("kl"))

    val domain = cand.select("model", "qid").distinct()
    domain.join(kl, Seq("model", "qid"), "left")
      .select(col("model"), col("qid"),
        coalesce(col("kl"), lit(EmptyIntersectionKl)).as("kl"))
  }

  /**
   * Leave-one-out KNN selection. `features`: (model, qid, kl);
   * `perQ`: (model, qid, <metric>). Output one row per query:
   * (qid, model_pred, pred, actual) — the chosen candidate, its predicted
   * (mean-of-neighbors) effectiveness, and the query's actual metric under
   * the chosen model.
   */
  def select(features: DataFrame, perQ: DataFrame, metric: String, k: Int): DataFrame = {
    val f = features.select(col("model"), col("qid"), col("kl"))
    // per-candidate neighbor distances |f(test) − f(train)|
    // (`LearningToSelect.java:286-298`); ties → neighbor qid asc (the
    // reference's stable sort over the qid-ordered training list)
    val pairs = f.as("t").join(f.as("o"),
        col("t.model") === col("o.model") && col("t.qid") =!= col("o.qid"))
      .select(col("t.model").as("model"), col("t.qid").as("qid"),
        col("o.qid").as("nqid"), abs(col("t.kl") - col("o.kl")).as("dist"))
    val wN = Window.partitionBy("model", "qid").orderBy(col("dist").asc, col("nqid").asc)
    val neigh = pairs.withColumn("nrank", row_number().over(wN)).filter(col("nrank") <= k)

    val m = perQ.select(col("model"), col("qid").as("nqid"), col(metric).as("mval"))
    val pred = neigh.join(m, Seq("model", "nqid"))
      .groupBy("model", "qid")
      .agg(round(avg("mval"), 6).as("pred"))

    // best predicted candidate (desc, name asc — ModelScore.java:41-48)
    val wBest = Window.partitionBy("qid").orderBy(col("pred").desc, col("model").asc)
    val chosen = pred.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)

    chosen.join(
        perQ.select(col("model"), col("qid"), col(metric).as("actual")),
        Seq("model", "qid"), "left")
      .select(col("qid"), col("model").as("model_pred"), col("pred"),
        coalesce(col("actual"), lit(0.0)).as("actual"))
  }
}
