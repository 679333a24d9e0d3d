package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Divergence._

/** Port of `knn/ChiSquareTest.java:30-53` (naive vs fast agreement on random
 * 1001-bin histograms) plus divergence sanity and decorator transforms. */
class DivergenceSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private def randHist(n: Int): Array[Double] =
    Array.fill(n)(if (rng.nextDouble() < 0.2) 0.0 else rng.nextDouble() * 100)

  /** Naive χ² written independently: same definition, different loop shape. */
  private def naiveChi(r: Array[Double], s: Array[Double], divide: Boolean): Double = {
    val terms = r.indices.filterNot(i => r(i) == 0 && s(i) == 0)
      .map(i => (r(i) - s(i)) * (r(i) - s(i)) / (r(i) + s(i)))
    if (divide) terms.sum / terms.size else terms.sum
  }

  test("chiPDF fast == naive on 1000 random 1001-bin histograms") {
    (1 to 1000).foreach { _ =>
      val r = randHist(1001); val s = randHist(1001)
      assert(math.abs(chiPdf(r, s, divide = true) - naiveChi(r, s, divide = true)) < 1e-9)
      assert(math.abs(chiPdf(r, s, divide = false) - naiveChi(r, s, divide = false)) < 1e-9)
    }
  }

  test("chi is symmetric; zero on identical inputs") {
    val r = randHist(100); val s = randHist(100)
    assert(chiPdf(r, s, divide = false) == chiPdf(s, r, divide = false))
    assert(chiPdf(r, r, divide = false) == 0.0)
    assert(chiCdf(r, r) == 0.0)
  }

  test("symmetrized KL/JS are symmetric and zero on identical inputs") {
    val r = randHist(100).map(_ + 1); val s = randHist(100).map(_ + 1) // no zeros
    assert(math.abs(klSym(r, s) - klSym(s, r)) < 1e-12)
    assert(klSym(r, r) == 0.0)
    assert(math.abs(jsSym(r, s) - jsSym(s, r)) < 1e-12)
    assert(jsSym(r, r) == 0.0)
    assert(jsSym(r, s) >= 0.0)
  }

  test("TFD query-vector derivations (TFDAwareNeed.java:168-335) hand-check") {
    val a = Array(2.0, 4.0)
    val b = Array(8.0, 16.0)
    assert(dfSum(a) == 6.0)
    assert(average(Seq(a, b)).toSeq == Seq(5.0, 10.0))
    // geo: (√(2·8), √(4·16)) = (4, 8)
    assert(geo(Seq(a, b)).toSeq == Seq(4.0, 8.0))
    // averageAndDf: avg (5,10), total 15 → (1/3, 2/3)
    val adf = averageAndDf(Seq(a, b))
    assert(math.abs(adf(0) - 1.0 / 3) < 1e-12 && math.abs(adf(1) - 2.0 / 3) < 1e-12)
    // dfAndAverage: a/6 = (1/3, 2/3), b/24 = (1/3, 2/3) → mean (1/3, 2/3)
    val dfa = dfAndAverage(Seq(a, b))
    assert(math.abs(dfa(0) - 1.0 / 3) < 1e-12 && math.abs(dfa(1) - 2.0 / 3) < 1e-12)
    // geoAndDf: geo (4,8), total 12 → (1/3, 2/3)
    val gdf = geoAndDf(Seq(a, b))
    assert(math.abs(gdf(0) - 1.0 / 3) < 1e-12 && math.abs(gdf(1) - 2.0 / 3) < 1e-12)
    // dfAndGeo over proportional vectors = the common proportion
    val dfg = dfAndGeo(Seq(a, b))
    assert(math.abs(dfg(0) - 1.0 / 3) < 1e-12 && math.abs(dfg(1) - 2.0 / 3) < 1e-12)
    // ratioOfCdf of (1,1,2): forward cdf (1,2,4) → (2, 2)
    assert(ratioOfCdf(Array(1.0, 1.0, 2.0)).toSeq == Seq(2.0, 2.0))
    // single-term short-circuits return the histogram itself
    assert(average(Seq(a)).toSeq == a.toSeq && geo(Seq(a)).toSeq == a.toSeq)
  }

  test("decorator transforms (DecoratorTest.java:10-37 semantics)") {
    val a = Array(1.0, 2.0, 3.0)
    assert(insertZerothPosition(a, 9.0).toSeq == Seq(9.0, 1.0, 2.0, 3.0))
    assert(cdf(a).toSeq == Seq(6.0, 5.0, 3.0)) // suffix sums
    assert(math.abs(normalize(a).sum - 1.0) < 1e-12)
    assert(sqrtTransform(Array(4.0, 9.0)).toSeq == Seq(2.0, 3.0))
  }
}
