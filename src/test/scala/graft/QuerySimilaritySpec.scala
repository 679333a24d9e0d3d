package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.QuerySimilarity
import graft.stats.QuerySimilarity._

/** Cartesian query-term similarity vs hand-computed values
 * (`knn/CartesianQueryTermSimilarity.java:15-260`). */
class QuerySimilaritySpec extends AnyFunSuite {

  // toy divergence: absolute difference of first components
  private val d = (a: Array[Double], b: Array[Double]) => math.abs(a(0) - b(0))
  private def v(x: Double) = Array(x)

  test("aggregate modes") {
    assert(aggregate(Array(3.0, 4.0), Euclid) == 2.5) // √25/2
    assert(aggregate(Array(3.0, 4.0), Ari) == 3.5)
    assert(math.abs(aggregate(Array(2.0, 8.0), Geo) - 4.0) < 1e-12)
    assert(math.abs(aggregate(Array(0.0, 8.0), Geo) - math.sqrt(8.0)) < 1e-12) // 0 → 1
  }

  test("way modes") {
    val s = Seq(1.0, 2.0, 5.0)
    assert(way(s, WayS) == 6.0)
    assert(way(s, WayM) == 3.0)
    assert(way(s, WayMean) == 8.0 / 3)
    assert(way(s, WayX) == 5.0)
    assert(math.abs(way(s, WayDisMax) - (5.0 + 0.01 * 3.0)) < 1e-12)
  }

  test("couple: greedy minimal matching, not row-order matching") {
    // R = [0, 10], S = [9, 1]: greedy matches (0↔1)=1 first, then (10↔9)=1
    // → mean 1.0; naive row-order would give (|0-9| + |10-1|)/2 = 9
    val got = couple(Seq(v(0), v(10)), Seq(v(9), v(1)), d, Ari)
    assert(got == 1.0)
  }

  test("couple removes matched rows AND columns") {
    // R = [0, 1], S = [0.5, 100]: stable-sorted best pair is (0, 0.5) = 0.5
    // (ties broken by scan order) — then 1 must pair with 100 (column 0.5
    // consumed) giving 99, NOT re-use 0.5
    val got = couple(Seq(v(0), v(1)), Seq(v(0.5), v(100)), d, Ari)
    assert(got == (0.5 + 99.0) / 2)
  }

  test("cartesian with unequal sizes enumerates subsets and applies way") {
    // small = [0]; large = [1, 4]: subset scores {1, 4} → WayM = 2.5, WayX = 4
    assert(cartesian(Seq(v(0)), Seq(v(1), v(4)), d, Ari, WayM) == 2.5)
    assert(cartesian(Seq(v(0)), Seq(v(1), v(4)), d, Ari, WayX) == 4.0)
    // orientation-symmetric
    assert(cartesian(Seq(v(1), v(4)), Seq(v(0)), d, Ari, WayM) == 2.5)
  }

  test("derived-vector family: ADF compares averageAndDf vectors") {
    import graft.stats.Divergence
    val r = Seq(Array(2.0, 4.0), Array(8.0, 16.0))   // both derive to (1/3, 2/3)
    val s = Seq(Array(1.0, 2.0))
    val chi = (x: Array[Double], y: Array[Double]) => Divergence.chiPdf(x, y, divide = true)
    assert(QuerySimilarity.derived(r, s, Divergence.averageAndDf, chi) == 0.0)
    val t = Seq(Array(4.0, 2.0))                      // derives to (2/3, 1/3)
    assert(QuerySimilarity.derived(r, t, Divergence.averageAndDf, chi) > 0.0)
  }

  test("discountCartesian ignores terms shared by both queries (DiscountCartesianSimilarity.java:12-49)") {
    // absolute-difference kernel on 1-element vectors for hand math
    val d = (x: Array[Double], y: Array[Double]) => math.abs(x(0) - y(0))
    def q(ts: (String, Double)*) = ts.map { case (t, x) => (t, Array(x)) }
    // shared term "w" dropped from both → couple(("a",1),("b",5)) = |1−5| = 4
    assert(QuerySimilarity.discountCartesian(
      q("w" -> 100.0, "a" -> 1.0), q("w" -> 0.0, "b" -> 5.0), d, Ari) == 4.0)
    // no intersection → plain cartesian: couple of equal-size lists
    assert(QuerySimilarity.discountCartesian(
      q("a" -> 1.0, "b" -> 2.0), q("c" -> 1.0, "d" -> 2.0), d, Ari) == 0.0)
    // single-term query → plain cartesian even when the term is shared
    assert(QuerySimilarity.discountCartesian(
      q("w" -> 3.0), q("w" -> 1.0, "b" -> 3.0), d, Ari, WayX) == 2.0)
  }

  test("integrates with the Divergence kernels (χ² over a real histogram pair)") {
    val a = Array(1.0, 2.0, 3.0)
    val b = Array(1.0, 2.0, 3.0)
    val c = Array(3.0, 2.0, 1.0)
    val chi = (x: Array[Double], y: Array[Double]) =>
      graft.stats.Divergence.chiPdf(x, y, divide = true)
    assert(couple(Seq(a), Seq(b), chi, Ari) == 0.0)
    assert(couple(Seq(a), Seq(c), chi, Ari) > 0.0)
  }
}
