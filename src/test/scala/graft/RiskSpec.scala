package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Risk

/** Risk/significance statistics vs hand-computed values
 * (`knn/TStats.java`, `exp/ZRisk.java`, `Evaluator.java:38-40`). */
class RiskSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-9) =
    assert(math.abs(a - b) <= eps, s"$a vs $b")

  test("paired t statistic (hand value)") {
    // d = [1,2,3]: mean 2, var 1 → t = 2/√(1/3) = 2√3
    approx(Risk.pairedT(Seq(1, 2, 3), Seq(2, 4, 6)), 2 * math.sqrt(3.0))
    // symmetric: swapping negates
    approx(Risk.pairedT(Seq(2, 4, 6), Seq(1, 2, 3)), -2 * math.sqrt(3.0))
  }

  test("TRisk (TStats.tRisk:55-100, hand values)") {
    // all-positive deltas degenerate to the paired t
    approx(Risk.tRisk(Seq(1, 2, 3), Seq(2, 4, 6), alpha = 1), 2 * math.sqrt(3.0))
    // base=[2,4], run=[1,5], α=1: deltas [-2,1], mean −0.5,
    // var = ((−1.5)²+(1.5)²)/1 = 4.5 → t = −0.5/√(4.5/2) = −1/3
    approx(Risk.tRisk(Seq(2, 4), Seq(1, 5), alpha = 1), -1.0 / 3.0)
  }

  test("URisk (TStats.URisk:104-126, hand value)") {
    // win=[0,1], loss=[1,0], α=1 → 0.5 − 2·0.5 = −0.5
    approx(Risk.uRisk(Seq(2, 4), Seq(1, 5), alpha = 1), -0.5)
    // no losses → pure mean gain
    approx(Risk.uRisk(Seq(1, 1), Seq(2, 3), alpha = 5), 1.5)
  }

  test("Wilcoxon signed-rank z (TStats.z:160-197, hand value)") {
    // z=[1,−1,2,3], |z| ranks (avg ties)=[1.5,1.5,3,4], W⁺=8.5,
    // ES=5, VarS=7.5 → (8.5−5−0.5)/√7.5
    approx(Risk.wilcoxonZ(Seq(1, 2, 3, 4), Seq(2, 1, 5, 7)), 3.0 / math.sqrt(7.5))
  }

  test("ZRisk matrix statistic (exp/ZRisk.java:23-88, hand value)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 2×2 matrix [[10, 20], [30, 40]]: rowSums [30,70], colSums [40,60], N=100
    // e = [[12,18],[28,42]] → zrisk_0 = 4/12 + 4/18 = 5/9; zrisk_1 = 4/28 + 4/42 = 5/21
    val m = Seq((0L, 0L, 10L), (0L, 1L, 20L), (1L, 0L, 30L), (1L, 1L, 40L))
      .toDF("system", "topic", "value")
    val got = Risk.zriskDf(m, "system", "topic", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    approx(got(0L), 5.0 / 9.0)
    approx(got(1L), 5.0 / 21.0)
  }

  test("sigMatrixDf ≡ driver-side pairedT/wilcoxonZ on every model pair") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 3 models × 6 topics, with ties in |d| and a zero diff (rank-kept,
    // W⁺-excluded) to exercise the windowed average-tie ranking
    val ap = Map(
      "m1" -> Seq(0.10, 0.20, 0.30, 0.40, 0.50, 0.60),
      "m2" -> Seq(0.15, 0.25, 0.30, 0.35, 0.65, 0.55),
      "m3" -> Seq(0.05, 0.45, 0.10, 0.40, 0.80, 0.20))
    val rows = ap.toSeq.flatMap { case (m, vs) =>
      vs.zipWithIndex.map { case (v, q) => (m, q, v) } }
    val got = Risk.sigMatrixDf(rows.toDF("model", "qid", "ap"), "model", "qid", "ap")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size == 3) // (m1,m2), (m1,m3), (m2,m3)
    for (Seq(a, b) <- Seq("m1", "m2", "m3").combinations(2)) {
      val (n, t, wz) = got((a, b))
      assert(n == 6L)
      approx(t, Risk.pairedT(ap(a), ap(b)))
      // wilcoxonZ(x, y) ranks d = y − x; sigMatrixDf's d = vb − va
      approx(wz, Risk.wilcoxonZ(ap(a), ap(b)))
    }
  }

  test("ParamTrain grids match the reference sizes (SearcherTool.java:34-37)") {
    import graft.train.ParamTrain._
    assert(cValues.size == 19 && kValues.size == 15 && bValues.size == 9 && muValues.size == 17)
    val grid = parametricModels()
    assert(grid.size == 19 * 2 + 15 * 9 + 17) // 190
    assert(grid.map(familyOf).toSet == Set("BM25", "PL2", "LGD", "DirichletLM"))
  }
}
