package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Risk-sensitive evaluation + significance statistics (SURVEY.md §2.10;
 * reference `exp/ZRisk.java:1-100`, `knn/TStats.java:30-200`,
 * `Evaluator.java:38-40`). Per-query score vectors are tiny (≤ a few
 * hundred queries), so the vector statistics are driver-side pure Scala;
 * ZRisk over a (system × topic) matrix is a distributed operator because
 * the matrix arrives as a DataFrame from the sweep.
 */
object Risk {

  /** Paired t statistic (TStats.tStats / commons-math TTest.pairedT):
   * t = mean(d) / √(var(d)/n), d = run − base, sample variance. */
  def pairedT(base: Seq[Double], run: Seq[Double]): Double = {
    require(base.size == run.size && base.size >= 2, "need ≥2 paired observations")
    val d = run.zip(base).map { case (r, b) => r - b }
    val n = d.size
    val mean = d.sum / n
    val varD = d.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    mean / math.sqrt(varD / n)
  }

  /** TRisk (`TStats.tRisk:55-100`; Dinçer, Macdonald & Ounis, SIGIR'14):
   * one-sample t over α-discounted deltas — loss deltas are scaled by
   * (1+α). < −2 ⇒ significant risk, > +2 ⇒ significant gain. */
  def tRisk(base: Seq[Double], run: Seq[Double], alpha: Double): Double = {
    require(base.size == run.size && base.nonEmpty, "array lengths are not equal")
    val n = base.size
    val deltas = run.zip(base).map { case (r, b) =>
      val sdiff = r - b
      if (sdiff >= 0) sdiff else (1d + alpha) * sdiff
    }
    val mean = deltas.sum / n
    val sum1 = deltas.map(d => (d - mean) * (d - mean)).sum
    val sum2 = deltas.map(_ - mean).sum
    val varD = (sum1 - sum2 * sum2 / n) / (n - 1)
    mean / math.sqrt(varD / n)
  }

  /** URisk (`TStats.URisk:104-126`; Collins-Thompson, CIKM'09):
   * mean(win) − (1+α)·mean(loss). */
  def uRisk(base: Seq[Double], run: Seq[Double], alpha: Double): Double = {
    require(base.size == run.size && base.nonEmpty, "array lengths are not equal")
    val win = run.zip(base).map { case (r, b) => math.max(0, r - b) }
    val loss = run.zip(base).map { case (r, b) => math.max(0, b - r) }
    win.sum / win.size - (1 + alpha) * (loss.sum / loss.size)
  }

  /** Average-tie natural ranking of |values| (commons-math NaturalRanking
   * with TiesStrategy.AVERAGE, as `TStats.naturalRanking`). */
  private def avgRanks(xs: Seq[Double]): Seq[Double] = {
    val idx = xs.zipWithIndex.sortBy(_._1)
    val out = new Array[Double](xs.size)
    var i = 0
    while (i < idx.size) {
      var j = i
      while (j + 1 < idx.size && idx(j + 1)._1 == idx(i)._1) j += 1
      val avg = (i + j + 2) / 2.0 // ranks are 1-based: mean of i+1 .. j+1
      (i to j).foreach(k => out(idx(k)._2) = avg)
      i = j + 1
    }
    out.toSeq
  }

  /** Wilcoxon signed-rank z with continuity correction (`TStats.z:160-197`):
   * z = (W⁺ − ES − 0.5)/√VarS, ES = N(N+1)/4, VarS = ES·(2N+1)/6.
   * Matches the reference exactly, including ranking zeros (NaNStrategy
   * FIXED keeps them; a zero diff is not > 0 so contributes nothing to W⁺). */
  def wilcoxonZ(x: Seq[Double], y: Seq[Double]): Double = {
    require(x.size == y.size && x.nonEmpty, "array lengths are not equal")
    val z = x.zip(y).map { case (a, b) => b - a }
    val ranks = avgRanks(z.map(math.abs))
    val wPlus = z.zip(ranks).collect { case (d, r) if d > 0 => r }.sum
    val n = x.size
    val es = n.toDouble * (n + 1) / 4.0
    val varS = es * ((2.0 * n + 1) / 6.0)
    (wPlus - es - 0.5) / math.sqrt(varS)
  }

  /**
   * ZRisk over a (system, topic, value) matrix (`exp/ZRisk.java:23-88`):
   * zrisk_i = Σ_j (x_ij − e_ij)²/e_ij with e_ij = rowSum_i·colSum_j / N —
   * the χ² deviation of each system's per-topic profile from independence.
   *
   * Distributed: two tiny aggregations (row sums, col sums) broadcast back
   * onto one pass over the matrix; no all-pairs, no collect.
   */
  /**
   * All-model-pairs significance matrix (the `Evaluator.java` pairwise
   * facet, §2.10): for every unordered model pair (a < b) over the same
   * per-topic metric vector, the paired-t statistic ([[pairedT]], d = b − a)
   * and the Wilcoxon signed-rank z with continuity correction
   * ([[wilcoxonZ]]), as ONE grouped DataFrame op — no driver loop over
   * pairs, no collect of the matrix.
   *
   * Average-tie ranks of |d| come from window functions
   * (`rank() + (tieCount − 1)/2` ≡ commons-math NaturalRanking AVERAGE);
   * zeros keep their ranks but contribute nothing to W⁺ (NaNStrategy.FIXED
   * semantics, as [[wilcoxonZ]]).
   *
   * Scale shape: the self-join shuffles on the topic column; per-pair
   * groups are |topics|-sized. |models|²·|topics| rows total — for the
   * reference's 13-model × 200-topic matrices this is trivially small, and
   * at larger model zoos it stays shuffle-partitioned, never driver-side.
   */
  def sigMatrixDf(perQuery: DataFrame, systemCol: String, topicCol: String,
                  valueCol: String): DataFrame = {
    val a = perQuery.select(col(systemCol).as("model_a"), col(topicCol).as("topic"),
      col(valueCol).cast("double").as("va"))
    val b = perQuery.select(col(systemCol).as("model_b"), col(topicCol).as("topic"),
      col(valueCol).cast("double").as("vb"))
    val pairs = a.join(b, Seq("topic"))
      .filter(col("model_a") < col("model_b"))
      .withColumn("d", col("vb") - col("va"))
      .withColumn("absd", abs(col("d")))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("model_a", "model_b").orderBy("absd")
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy("model_a", "model_b", "absd")
    val ranked = pairs
      .withColumn("minRank", rank().over(wRank))
      .withColumn("ties", count(lit(1)).over(wTie))
      .withColumn("avgRank", col("minRank") + (col("ties") - 1) / 2.0)
    ranked.groupBy("model_a", "model_b")
      .agg(
        count(lit(1)).as("n"),
        avg("d").as("meanD"),
        var_samp("d").as("varD"),
        sum(when(col("d") > 0, col("avgRank")).otherwise(0.0)).as("wPlus"))
      .withColumn("t", col("meanD") / sqrt(col("varD") / col("n")))
      .withColumn("es", col("n") * (col("n") + 1) / 4.0)
      .withColumn("wz", (col("wPlus") - col("es") - 0.5)
        / sqrt(col("es") * (lit(2.0) * col("n") + 1) / 6.0))
      .select(col("model_a"), col("model_b"), col("n"), col("t"), col("wz"))
  }

  def zriskDf(matrix: DataFrame, systemCol: String, topicCol: String,
              valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val rows = matrix.groupBy(systemCol).agg(sum(v).as("rowSum"))
    val cols_ = matrix.groupBy(topicCol).agg(sum(v).as("colSum"))
    // round 6: the grand total rides as a broadcast 1-row frame instead of
    // an eager `.head` — one fewer driver action/job, nothing collected on
    // the query path; same Spark aggregate produces the same value
    val total = matrix.agg(sum(v).as("__total"))
    matrix
      .join(broadcast(rows), systemCol)
      .join(broadcast(cols_), topicCol)
      .crossJoin(broadcast(total))
      .withColumn("e", col("rowSum") * col("colSum") / col("__total"))
      .withColumn("x", (v - col("e")) * (v - col("e")) / col("e"))
      .groupBy(systemCol)
      .agg(sum("x").as("zrisk"))
  }
}
