package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Topic
import graft.stats.{Divergence, Selection}

/** Selective stemming / KNN model selection kernels
 * (`SelectionMethods.java:79-200`, `knn/KNNTool.java:31-98`). */
class SelectionSpec extends AnyFunSuite {

  test("kendall tau: perfect agreement, inversion, independence") {
    assert(Selection.kendallTau(Seq(1, 2, 3, 4), Seq(10, 20, 30, 40)) == 1.0)
    assert(Selection.kendallTau(Seq(1, 2, 3, 4), Seq(40, 30, 20, 10)) == -1.0)
    val t = Selection.kendallTau(Seq(1, 2, 3, 4), Seq(2, 1, 4, 3))
    assert(t > 0 && t < 1)
  }

  test("df/cf order agreement gates stemming") {
    assert(Selection.agreeOnOrder(Seq(10L, 20L, 30L), Seq(100L, 220L, 390L)))
    assert(!Selection.agreeOnOrder(Seq(10L, 20L, 30L), Seq(300L, 220L, 90L)))
    assert(Selection.agreeOnOrder(Seq(10L), Seq(99L))) // single term: trivially agrees
  }

  test("majority and mean voters") {
    assert(Selection.majorityVote(Seq("BM25", "DPH", "BM25")) == "BM25")
    assert(Selection.majorityVote(Seq("A", "B")) == "A") // tie → lexicographic
    assert(Selection.meanVote(Seq(("A", 0.5), ("A", 0.7), ("B", 0.4), ("B", 0.9))) == "A")
  }

  test("knn selection votes nearest neighbors' best models") {
    val topics = Seq(Topic(1, "a"), Topic(2, "b"), Topic(3, "c"), Topic(4, "d"))
    val tfds = Map(
      1 -> Array(1.0, 0.0), 2 -> Array(0.9, 0.1), // 1 and 2 are close
      3 -> Array(0.0, 1.0), 4 -> Array(0.1, 0.9)) // 3 and 4 are close
    val best = Map(1 -> "BM25", 2 -> "BM25", 3 -> "DPH", 4 -> "DPH")
    val sel = Selection.knnSelect(topics, tfds, best, k = 1,
      (a, b) => Divergence.chiPdf(a.map(_ + 0.01), b.map(_ + 0.01), divide = false))
    assert(sel(1) == "BM25" && sel(2) == "BM25")
    assert(sel(3) == "DPH" && sel(4) == "DPH")
  }
}
