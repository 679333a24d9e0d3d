package graft.stats

import graft.query.Scoring.log2

/**
 * Histogram divergences + TFD vector transforms (SURVEY.md §2.10; reference
 * `knn/ChiSquare.java`, `knn/KullbackLeibler.java`, `knn/JensenShannon.java`,
 * `knn/Decorator.java`, `knn/TFDAwareNeed.java`). Histograms are ≤1001-bin
 * arrays: pure driver-side Scala over collected arrays (the distributed part
 * is building the histograms, Histograms.scala).
 */
object Divergence {

  /** χ² over aligned bins, skipping both-zero bins; optionally divided by
   * the participating-bin count (`knn/ChiSquare.java:26-44`). */
  def chiPdf(r: Array[Double], s: Array[Double], divide: Boolean): Double = {
    var chi = 0.0; var counter = 0; var i = 0
    while (i < r.length) {
      if (!(r(i) == 0 && s(i) == 0)) {
        counter += 1
        chi += math.pow(r(i) - s(i), 2.0) / (r(i) + s(i))
      }
      i += 1
    }
    if (divide) chi / counter else chi
  }

  /** χ² over suffix-cumulated bins (`knn/ChiSquare.java:46-71`). */
  def chiCdf(r: Array[Double], s: Array[Double]): Double = {
    var chi = 0.0; var rr = 0.0; var ss = 0.0
    var i = r.length - 1
    while (i >= 0) {
      rr += r(i); ss += s(i)
      if (!(rr == 0 && ss == 0)) chi += math.pow(rr - ss, 2.0) / (rr + ss)
      i -= 1
    }
    chi
  }

  /** One-sided KL skipping zero bins on either side
   * (`knn/KullbackLeibler.java:29-46`). */
  def kl(r: Array[Double], s: Array[Double], divide: Boolean): Double = {
    var v = 0.0; var counter = 0; var i = 0
    while (i < r.length) {
      if (r(i) != 0 && s(i) != 0) {
        counter += 1
        v += r(i) * log2(r(i) / s(i))
      }
      i += 1
    }
    if (divide) v / counter else v
  }

  /** Symmetrized KL: KL(R,S) + KL(S,R) (`KullbackLeibler.java:23-26`). */
  def klSym(r: Array[Double], s: Array[Double], divide: Boolean = false): Double =
    kl(r, s, divide) + kl(s, r, divide)

  /** One-sided JS against the midpoint (`knn/JensenShannon.java:34-51`). */
  def js(r: Array[Double], s: Array[Double], divide: Boolean): Double = {
    var v = 0.0; var counter = 0; var i = 0
    while (i < r.length) {
      if (r(i) != 0) {
        counter += 1
        v += r(i) * log2(r(i) / (0.5 * r(i) + 0.5 * s(i)))
      }
      i += 1
    }
    if (divide) v / counter else v
  }

  /** Symmetrized JS (`JensenShannon.java:26-32`). */
  def jsSym(r: Array[Double], s: Array[Double], divide: Boolean = false): Double =
    js(r, s, divide) + js(s, r, divide)

  // ---- TFDAwareNeed vector transforms (`knn/Decorator.java:81-138`) ----

  /** Insert a value at position 0 (df at slot 0, `DecoratorTest.java:10-37`). */
  def insertZerothPosition(arr: Array[Double], v: Double): Array[Double] =
    v +: arr

  /** Suffix CDF: cdf(i) = Σ_{j ≥ i} arr(j) (TFDAwareNeed cdf vectors). */
  def cdf(arr: Array[Double]): Array[Double] = {
    val out = new Array[Double](arr.length)
    var acc = 0.0
    var i = arr.length - 1
    while (i >= 0) { acc += arr(i); out(i) = acc; i -= 1 }
    out
  }

  /** Normalize bins to fractions of their sum (df-normalized vectors). */
  def normalize(arr: Array[Double]): Array[Double] = {
    val sum = arr.sum
    if (sum == 0) arr.clone() else arr.map(_ / sum)
  }

  def sqrtTransform(arr: Array[Double]): Array[Double] = arr.map(math.sqrt)
  def log1pTransform(arr: Array[Double]): Array[Double] = arr.map(x => math.log(x + 1))

  // ---- TFDAwareNeed query-level vector derivations ----
  // (`knn/TFDAwareNeed.java:168-335`): a query's per-term histograms
  // collapse into one vector per decoration; the KNN similarity family
  // (ADF / GeoDF / DFGeo …) compares these.

  /** Sum of a histogram's bins — the reference's `df(R)`
   * (`TFDAwareNeed.java:216-227`). */
  def dfSum(a: Array[Double]): Double = a.sum

  /** Element-wise mean over the query's term histograms
   * (`TFDAwareNeed.average:168-185`). */
  def average(list: Seq[Array[Double]]): Array[Double] = {
    require(list.nonEmpty && list.forall(_.length == list.head.length))
    if (list.size == 1) return list.head.clone()
    val out = new Array[Double](list.head.length)
    list.foreach(a => { var i = 0; while (i < out.length) { out(i) += a(i); i += 1 } })
    out.map(_ / list.size)
  }

  /** Element-wise geometric mean (`TFDAwareNeed.geo:293-313`). */
  def geo(list: Seq[Array[Double]]): Array[Double] = {
    require(list.nonEmpty && list.forall(_.length == list.head.length))
    if (list.size == 1) return list.head.clone()
    Array.tabulate(list.head.length) { i =>
      math.pow(list.map(_(i)).product, 1.0 / list.size)
    }
  }

  // Each df-normalizing order composes [[average]]/[[geo]] with the ONE
  // shared [[normalize]] (whose zero-sum guard returns the input unchanged
  // — an all-zero term histogram yields zeros, not NaNs).

  /** Average first, then normalize by the average's total — the ADF
   * similarity's input (`TFDAwareNeed.averageAndDF:263-275`). */
  def averageAndDf(list: Seq[Array[Double]]): Array[Double] =
    normalize(average(list))

  /** Normalize each term by its own df first, then average
   * (`TFDAwareNeed.dfAndAverage:187-206`). */
  def dfAndAverage(list: Seq[Array[Double]]): Array[Double] =
    average(list.map(normalize))

  /** Geometric mean, then normalize by its total
   * (`TFDAwareNeed.geoAndDF:277-291`). */
  def geoAndDf(list: Seq[Array[Double]]): Array[Double] =
    normalize(geo(list))

  /** Normalize each term by its own df first, then geometric mean
   * (`TFDAwareNeed.dfAndGeo:208-214`). */
  def dfAndGeo(list: Seq[Array[Double]]): Array[Double] =
    geo(list.map(normalize))

  /** Ratio-of-cdf decoration: forwardCdf[i]/forwardCdf[i−1], length−1
   * (`Decorator.ratio:124-137` — note the FORWARD cumulative sum, unlike
   * [[cdf]] above which is the tail-cumulative decoration). Like the
   * reference, a zero cdf prefix yields ∞/NaN ratios — callers are
   * expected to decorate a nonzero zeroth position first
   * ([[insertZerothPosition]], the df-at-0 convention). */
  def ratioOfCdf(arr: Array[Double]): Array[Double] = {
    if (arr.isEmpty) return Array.empty
    val c = new Array[Double](arr.length)
    var acc = 0.0
    var i = 0
    while (i < arr.length) { acc += arr(i); c(i) = acc; i += 1 }
    Array.tabulate(c.length - 1)(i => c(i + 1) / c(i))
  }
}
