package graft.stats

/**
 * Query-to-query TFD similarity — the KNN tool's Cartesian measure
 * (reference `knn/CartesianQueryTermSimilarity.java:15-260`): queries are
 * bags of per-term frequency histograms; similarity couples the two
 * queries' terms by GREEDY MINIMAL MATCHING on a per-term-pair divergence
 * matrix, aggregates the matched divergences, and (for unequal term
 * counts) enumerates the larger query's term subsets, combining the
 * subset scores with a "way" policy.
 *
 * Divergences come from [[Divergence]] (χ²/KL/JS — `knn/ChiSquare.java`
 * etc.); LOWER = more similar throughout (the KNN neighbor sort is
 * ascending).
 */
object QuerySimilarity {

  /** Matched-value aggregation (`CartesianQueryTermSimilarity.aggregate`,
   * lines 185-205). */
  sealed trait Agg
  case object Euclid extends Agg // √(Σv²)/n
  case object Ari extends Agg    // mean
  case object Geo extends Agg    // geometric mean, zeros mapped to 1

  /** Subset-score combination for unequal query sizes (`way`, lines
   * 124-152). */
  sealed trait Way
  case object WayS extends Way      // min + max
  case object WayM extends Way      // (min + max)/2
  case object WayDisMax extends Way // best + 0.01·Σrest (sorted desc)
  case object WayMean extends Way   // mean
  case object WayX extends Way      // max

  def aggregate(values: Array[Double], agg: Agg): Double = agg match {
    case Euclid => math.sqrt(values.map(v => v * v).sum) / values.length
    case Ari    => values.sum / values.length
    case Geo =>
      val vs = values.map(v => if (v == 0) 1.0 else v)
      math.exp(vs.map(math.log).sum / vs.length)
  }

  def way(similarities: Seq[Double], w: Way): Double = w match {
    case WayS      => similarities.min + similarities.max
    case WayM      => (similarities.min + similarities.max) / 2.0
    case WayDisMax =>
      val sorted = similarities.sorted(Ordering[Double].reverse)
      sorted.head + 0.01 * sorted.tail.sum
    case WayMean   => similarities.sum / similarities.size
    case WayX      => similarities.max
  }

  /**
   * Greedy minimal matching of equal-size term-histogram lists
   * (`couple`, lines 157-183): all |R|² pairs sorted ascending by
   * divergence (stable — ties keep (i, j) scan order), repeatedly take
   * the best pair and discard entries sharing its row or column.
   */
  def couple(r: Seq[Array[Double]], s: Seq[Array[Double]],
             div: (Array[Double], Array[Double]) => Double, agg: Agg): Double = {
    require(r.size == s.size, "couple requires equal sizes")
    var list = (for (i <- r.indices; j <- s.indices)
      yield (i, j, div(r(i), s(j)))).sortBy(_._3) // stable on ties
    val values = new Array[Double](r.size)
    var k = 0
    while (k < r.size) {
      val (i, j, d) = list.head
      values(k) = d
      list = list.filterNot { case (ii, jj, _) => ii == i || jj == j }
      k += 1
    }
    aggregate(values, agg)
  }

  /**
   * Full Cartesian similarity (`scoreX`, lines 93-113): equal sizes →
   * [[couple]]; otherwise couple the smaller list against every
   * same-size combination of the larger (term counts ≤ 8 → ≤ C(8,4)
   * subsets) and combine with the way policy.
   */
  def cartesian(r: Seq[Array[Double]], s: Seq[Array[Double]],
                div: (Array[Double], Array[Double]) => Double,
                agg: Agg = Euclid, w: Way = WayM): Double =
    if (r.size == s.size) couple(r, s, div, agg)
    else {
      val (small, large) = if (r.size < s.size) (r, s) else (s, r)
      val subs = large.combinations(small.size).map(sub => couple(small, sub, div, agg)).toSeq
      way(subs, w)
    }

  /**
   * Discount variant (`knn/DiscountCartesianSimilarity.java:12-49`):
   * terms shared by BOTH queries are removed from both sides before the
   * Cartesian coupling — shared vocabulary carries no discriminating
   * signal between two queries. Single-term queries and empty
   * intersections fall back to the plain [[cartesian]] score, exactly as
   * the reference's `score` does. (Two queries with IDENTICAL term sets
   * discount to two empty lists; the aggregate of zero values is NaN in
   * the reference's Euclid/Ari arithmetic and is reproduced as such.)
   */
  def discountCartesian(r: Seq[(String, Array[Double])], s: Seq[(String, Array[Double])],
                        div: (Array[Double], Array[Double]) => Double,
                        agg: Agg = Euclid, w: Way = WayM): Double = {
    def plain = cartesian(r.map(_._2), s.map(_._2), div, agg, w)
    if (r.size == 1 || s.size == 1) plain
    else {
      val inter = r.map(_._1).toSet.intersect(s.map(_._1).toSet)
      if (inter.isEmpty) plain
      else cartesian(r.collect { case (t, v) if !inter(t) => v },
        s.collect { case (t, v) if !inter(t) => v }, div, agg, w)
    }
  }

  /** The derived-vector similarity family (`knn/AverageDFQuerySimilarity`
   * "ADF", `DFAverageQuerySimilarity`, `DFGeoQuerySimilarity`, …): each
   * query's term histograms collapse into ONE vector via a
   * [[Divergence]] derivation (averageAndDf / dfAndAverage / geoAndDf /
   * dfAndGeo), then a single divergence compares the two vectors. */
  def derived(r: Seq[Array[Double]], s: Seq[Array[Double]],
              derive: Seq[Array[Double]] => Array[Double],
              div: (Array[Double], Array[Double]) => Double): Double =
    div(derive(r), derive(s))
}
