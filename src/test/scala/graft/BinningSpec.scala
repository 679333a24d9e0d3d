package graft

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's LengthNormalized fast-vs-slow binning property
 * test (`src/test/java/edu/anadolu/freq/LengthNormalizedTest.java:14-124`).
 * Fast rule (`freq/LengthNormalized.java:15-41`):
 * v = (int)(pct*bins); bin = (v == bins) ? v : v + 1. */
class BinningSpec extends AnyFunSuite {

  private def fastBin(pct: Double, bins: Int): Int = {
    val v = (pct * bins).toInt
    if (v == bins) v else v + 1
  }

  /** Slow range scan: smallest i in 1..bins with pct*bins < i; pct*bins ≥
   * bins lands in the last bin. */
  private def slowBin(pct: Double, bins: Int): Int = {
    if (pct * bins >= bins) return bins
    var i = 1
    while (i < bins && !(pct * bins < i)) i += 1
    i
  }

  test("fast == slow over 100k random (pct, bins)") {
    val rng = new scala.util.Random(42)
    (1 to 100000).foreach { _ =>
      val pct = rng.nextDouble()
      val bins = 5 + rng.nextInt(4996)
      assert(fastBin(pct, bins) == slowBin(pct, bins), s"pct=$pct bins=$bins")
    }
  }

  test("boundaries") {
    assert(fastBin(0.0, 10) == 1)     // zero rel-freq → first bin
    assert(fastBin(1.0, 10) == 10)    // full rel-freq → last bin
    assert(fastBin(0.999, 10) == 10)
    assert(fastBin(0.1, 10) == 2)     // exactly on an edge → next bin
    assert(fastBin(0.0999, 10) == 1)
  }
}
