package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.train.LearnToSelect

/** LearningToSelect kernels vs hand-computed values
 * (`LearningToSelect.java:125-330`). */
class LearnToSelectSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("klFeatures: Lee normalization + KL hand-check") {
    import spark.implicits._
    // base and cand share docs a,b,c for qid 1
    val runs = Seq(
      ("base", 1, "a", 1, 3.0), ("base", 1, "b", 2, 2.0), ("base", 1, "c", 3, 1.0),
      ("cand", 1, "a", 1, 1.0), ("cand", 1, "b", 2, 3.0), ("cand", 1, "c", 3, 2.0))
      .toDF("model", "qid", "docId", "rank", "score")
    val f = LearnToSelect.klFeatures(runs, "base", n = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    // rb over {3,2,1} → {1.01, 0.51, 0.01}; rc over {1,3,2} → {0.01, 1.01, 0.51}
    val rb = Seq(1.01, 0.51, 0.01)
    val rc = Seq(0.01, 1.01, 0.51)
    val want = (rb, rc).zipped.map((b, c) => b * log2(b / c)).sum / 3
    assert(f.size == 1 && f.head._1 == "cand" && f.head._2 == 1)
    assert(math.abs(f.head._3 - want) < 1e-6)
  }

  test("klFeatures: single shared doc → rb = rc = 1+c → KL 0; empty intersection → sentinel") {
    import spark.implicits._
    val runs = Seq(
      ("base", 1, "a", 1, 5.0), ("base", 1, "b", 2, 4.0),
      ("m1", 1, "a", 1, 9.0), ("m1", 1, "z", 2, 8.0),   // one shared doc
      ("m2", 1, "x", 1, 9.0), ("m2", 1, "y", 2, 8.0))   // disjoint
      .toDF("model", "qid", "docId", "rank", "score")
    val f = LearnToSelect.klFeatures(runs, "base", n = 10)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(f("m1") == 0.0)
    assert(f("m2") == LearnToSelect.EmptyIntersectionKl)
  }

  test("select: chosen model = best mean-of-neighbors metric, ties → name asc") {
    import spark.implicits._
    // features: under mA, qid 1's nearest neighbors (k=2) are 2,3; under mB
    // the same — neighbor APs decide: mA neighbors avg 0.5, mB avg 0.6 → mB
    val feats = Seq(
      ("mA", 1, 0.10), ("mA", 2, 0.11), ("mA", 3, 0.12), ("mA", 4, 0.90),
      ("mB", 1, 0.20), ("mB", 2, 0.21), ("mB", 3, 0.22), ("mB", 4, 0.90))
      .toDF("model", "qid", "kl")
    val perQ = Seq(
      ("mA", 1, 0.30), ("mA", 2, 0.40), ("mA", 3, 0.60), ("mA", 4, 0.10),
      ("mB", 1, 0.35), ("mB", 2, 0.50), ("mB", 3, 0.70), ("mB", 4, 0.10))
      .toDF("model", "qid", "ap")
    val got = LearnToSelect.select(feats, perQ, "ap", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val q1 = got.find(_._1 == 1).get
    assert(q1._2 == "mB", s"expected mB chosen for qid 1, got $q1")
    assert(math.abs(q1._3 - 0.6) < 1e-9)   // mean of mB APs on qids 2,3
    assert(math.abs(q1._4 - 0.35) < 1e-9)  // actual AP of qid 1 under mB
  }
}
