package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.ModelSelectionHO
import graft.stats.ModelSelectionHO._

/** He & Ounis clustering model selection vs hand-computed values
 * (`ModelSelection.java:1-403`). */
class ModelSelectionSpec extends AnyFunSuite {

  test("featureVector: 0.2·wc, γ1 = min/max idf, scope") {
    val v = featureVector(3, Seq(2.0, 4.0, 8.0), 0.5)
    assert(math.abs(v(0) - 0.6) < 1e-12 && v(1) == 0.25 && v(2) == 0.5)
  }

  test("cosine hand-check") {
    assert(math.abs(cosine(Array(1.0, 0.0), Array(0.0, 1.0))) < 1e-12)
    assert(math.abs(cosine(Array(1.0, 2.0), Array(2.0, 4.0)) - 1.0) < 1e-12)
  }

  test("single-link clustering merges the closest pair first") {
    // q1 ∥ q2 (cosine 1), q3 orthogonal-ish: k=2 must give {1,2} | {3}
    val vecs = Map(
      1 -> Array(1.0, 0.0, 0.1),
      2 -> Array(2.0, 0.0, 0.2),
      3 -> Array(0.0, 1.0, 0.0))
    val cs = cluster(Seq(1, 2, 3), vecs, 2)
    assert(cs.map(_.toSeq.sorted).toSet == Set(Seq(1, 2), Seq(3)))
  }

  test("single-link: one bridge vector chains two groups (k=1 vs k=2)") {
    val vecs = Map(
      1 -> Array(1.0, 0.0),
      2 -> Array(0.9, 0.1),   // bridge: close to both
      3 -> Array(0.0, 1.0))
    assert(cluster(Seq(1, 2, 3), vecs, 1).head == Set(1, 2, 3))
    val two = cluster(Seq(1, 2, 3), vecs, 2)
    assert(two.map(_.toSeq.sorted).toSet == Set(Seq(1, 2), Seq(3)))
  }

  test("jackknife predicts the nearest cluster's best mean model") {
    // two clear clusters: {1,2} prefer mA, {3,4} prefer mB; test query 5
    // sits in cluster 1 territory → predicted mA, score = its own mA value
    val vecs = Map(
      1 -> Array(1.0, 0.0), 2 -> Array(0.95, 0.05),
      3 -> Array(0.0, 1.0), 4 -> Array(0.05, 0.95),
      5 -> Array(0.9, 0.1))
    val perQ = Map(
      ("mA", 1) -> 0.8, ("mA", 2) -> 0.7, ("mA", 3) -> 0.1, ("mA", 4) -> 0.1, ("mA", 5) -> 0.6,
      ("mB", 1) -> 0.2, ("mB", 2) -> 0.1, ("mB", 3) -> 0.9, ("mB", 4) -> 0.8, ("mB", 5) -> 0.3)
    val preds = jackknife(Seq(1, 2, 3, 4, 5), vecs, perQ, Seq("mA", "mB"), k = 2)
      .map(p => p.qid -> p).toMap
    assert(preds(5).model == "mA" && preds(5).score == 0.6)
    assert(preds(3).model == "mB" && preds(3).score == 0.9)
    assert(preds(1).model == "mA")
  }

  test("bestModel ties break by model name ascending (ModelScore ordering)") {
    val perQ = Map(("mB", 1) -> 0.5, ("mA", 1) -> 0.5)
    assert(bestModel(Set(1), perQ, Seq("mB", "mA")) == "mA")
  }
}
