package graft.stats

/**
 * He & Ounis (2003/2004) query-clustering model selection — the
 * reference's `ModelSelection.java:1-403` assembled end-to-end:
 *
 *  1. Feature vector per query (`ModelSelection.java:77-99`):
 *     [0.2 · wordCount, γ1-aggregated IDF (= min/max over the query's
 *     term idfs, `qpp/Aggregate.java:68-80`), Scope].
 *  2. Leave-one-out jackknife (`ModelSelection.java:119-145`): for each
 *     test query, SINGLE-LINK agglomerative clustering of the remaining
 *     queries' vectors down to k clusters — repeatedly merge the pair of
 *     clusters whose closest members have the highest cosine similarity
 *     (`mergeClosestPairClusters` + `compare`, `ModelSelection.java:
 *     323-395`; scan-order tie-breaks preserved).
 *  3. Best model per cluster = highest MEAN evaluation score over the
 *     cluster's queries (ties → model name asc, `ModelScore` ordering);
 *     the test query adopts the best model of the cluster containing its
 *     single most-cosine-similar training vector
 *     (`clusterBelongsTo`, `ModelSelection.java:269-296`).
 *
 * Driver-side pure Scala by design: the clustering is inherently
 * iterative over ≤ a few hundred query vectors (the distributed work —
 * idf/scope features and the per-(model, query) evaluation matrix — is
 * produced by the gated Qpp / ParamTrain / Metrics paths). Not
 * DuckDB-gated for that reason; pinned by hand-value tests instead
 * (`ModelSelectionSpec`).
 */
object ModelSelectionHO {

  final case class Prediction(qid: Int, model: String, score: Double)

  def cosine(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length, "two vectors must have the same length")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** [0.2·wordCount, γ1(idf) = min/max, scope] (`ModelSelection.java:84-96`). */
  def featureVector(wordCount: Int, idfs: Seq[Double], scope: Double): Array[Double] = {
    require(idfs.nonEmpty, "need at least one term idf")
    Array(0.2 * wordCount, idfs.min / idfs.max, scope)
  }

  /** Single-link agglomerative clustering to k clusters; faithful to the
   * reference's scan order (first-found max pair merges; the absorbing
   * cluster keeps the lower index). */
  def cluster(items: Seq[Int], vectors: Map[Int, Array[Double]], k: Int): Vector[Set[Int]] = {
    require(items.nonEmpty && k >= 1 && k <= items.size, s"bad k=$k for ${items.size} items")
    val clusters = scala.collection.mutable.ArrayBuffer[Set[Int]](items.map(Set(_)): _*)
    def linkSim(c1: Set[Int], c2: Set[Int]): Double = {
      var mx = Double.NegativeInfinity
      for (a <- c1; b <- c2) { val s = cosine(vectors(a), vectors(b)); if (s > mx) mx = s }
      mx
    }
    while (clusters.size > k) {
      var best = Double.NegativeInfinity; var p1 = -1; var p2 = -1
      var i = 0
      while (i < clusters.size) {
        var j = 0
        while (j < clusters.size) {
          if (i != j) {
            val s = linkSim(clusters(i), clusters(j))
            if (s > best) { best = s; p1 = i; p2 = j }
          }
          j += 1
        }
        i += 1
      }
      clusters(p1) = clusters(p1) ++ clusters(p2)
      clusters.remove(p2)
    }
    clusters.toVector
  }

  /** Cluster id of the single most-similar training vector
   * (`clusterBelongsTo`, first-found wins on ties). */
  def nearestCluster(clusters: Vector[Set[Int]], vectors: Map[Int, Array[Double]],
                     test: Array[Double]): Int = {
    var closest = Double.NegativeInfinity; var id = -1
    var i = 0
    while (i < clusters.size) {
      clusters(i).foreach { q =>
        val s = cosine(vectors(q), test)
        if (s > closest) { closest = s; id = i }
      }
      i += 1
    }
    id
  }

  /** Best model of a cluster: highest mean score, ties → name asc. */
  def bestModel(cluster: Set[Int], perQ: Map[(String, Int), Double],
                models: Seq[String]): String =
    models.map(m => (m, cluster.toSeq.map(q => perQ.getOrElse((m, q), 0.0)).sum / cluster.size))
      .sortBy { case (m, s) => (-s, m) }.head._1

  /** Leave-one-out evaluation over all queries (`ModelSelection.evaluate`,
   * `process`): one Prediction per query. */
  def jackknife(qids: Seq[Int], vectors: Map[Int, Array[Double]],
                perQ: Map[(String, Int), Double], models: Seq[String],
                k: Int): Seq[Prediction] =
    qids.map { test =>
      val train = qids.filterNot(_ == test)
      val cs = cluster(train, vectors, math.min(k, train.size))
      val best = cs.map(c => bestModel(c, perQ, models))
      val cid = nearestCluster(cs, vectors, vectors(test))
      val model = best(cid)
      Prediction(test, model, perQ.getOrElse((model, test), 0.0))
    }
}
