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

  import Selection.{TermStat, predictTag}
  private val NS = "NoStem"; private val SB = "Snowball"

  test("predictTag: MST methods compare the minimum-stat term's position") {
    // df order: NoStem min = term0; Snowball min = term1 → differ → NoStem
    val s1 = Seq(TermStat(10, 100), TermStat(50, 500))
    val s2 = Seq(TermStat(60, 600), TermStat(20, 200))
    assert(predictTag("MSTDF", s1, s2, NS, SB) == NS)
    assert(predictTag("MSTTF", s1, s2, NS, SB) == NS)
    // same argmin under both tags → Stem
    val s3 = Seq(TermStat(5, 50), TermStat(70, 700))
    assert(predictTag("MSTDF", s1, s3, NS, SB) == SB)
  }

  test("predictTag: order methods choose Stem when the full order changed") {
    val a = Seq(TermStat(1, 10), TermStat(2, 20), TermStat(3, 30))
    val sameOrder = Seq(TermStat(10, 100), TermStat(20, 200), TermStat(30, 300))
    val flipped = Seq(TermStat(30, 300), TermStat(20, 200), TermStat(10, 100))
    assert(predictTag("DFOrder", a, sameOrder, NS, SB) == NS)
    assert(predictTag("DFOrder", a, flipped, NS, SB) == SB)
    assert(predictTag("TFOrder", a, flipped, NS, SB) == SB)
  }

  test("predictTag: KendallTau methods gate on tau ≥ threshold; 1-term → tag1") {
    val a = Seq(TermStat(1, 10), TermStat(2, 20), TermStat(3, 30))
    val agree = Seq(TermStat(5, 50), TermStat(6, 60), TermStat(7, 70))
    val flipped = Seq(TermStat(30, 300), TermStat(20, 200), TermStat(10, 100))
    assert(predictTag("KendallTauDFOrder", a, agree, NS, SB) == NS)
    assert(predictTag("KendallTauDFOrder", a, flipped, NS, SB) == SB)
    assert(predictTag("KendallTauTFOrder", Seq(TermStat(1, 1)), Seq(TermStat(9, 9)), NS, SB) == NS)
    // relaxed threshold: a partial agreement (tau ≈ 0.33) passes at 0.3
    val partial = Seq(TermStat(2, 20), TermStat(1, 10), TermStat(3, 30))
    assert(predictTag("KendallTauDFOrder", a, partial, NS, SB, tauThreshold = 0.3) == NS)
  }

  test("predictTag: binning variants coarsen before comparing") {
    // dfs 100 vs 900 fall in different fine orders but the same coarse bin
    // when maxDf/bins is large
    val a = Seq(TermStat(100, 0), TermStat(900, 0))
    val b = Seq(TermStat(900, 0), TermStat(100, 0))
    // bin size = 10000/10 = 1000 → both values bin 0 → stable sort keeps
    // query order under BOTH tags → orders equal → NoStem
    assert(predictTag("DFOrderBinning", a, b, NS, SB, bins = 10, maxDf = 10000L) == NS)
    // fine-grained (unbinned) order differs → Stem
    assert(predictTag("DFOrder", a, b, NS, SB) == SB)
  }

  test("predictTag end-to-end: real df/cf under NoStem vs Snowball") {
    // tiny corpus where stemming collapses run/running/runs
    val docs = Seq("running fast", "runs faster", "run fastest", "walk slow")
    def stats(tag: graft.analysis.Analyzer.Tag, terms: Seq[String]): Seq[TermStat] = {
      val tokensPerDoc = docs.map(d => graft.analysis.Analyzer.analyze(d, tag))
      terms.map { t0 =>
        val t = if (tag == graft.analysis.Analyzer.Tag.Snowball)
          graft.analysis.Porter2.stem(t0) else t0
        val df = tokensPerDoc.count(_.contains(t))
        val cf = tokensPerDoc.map(_.count(_ == t)).sum
        TermStat(df, cf)
      }
    }
    val qTerms = Seq("running", "walk")
    val ns = stats(graft.analysis.Analyzer.Tag.NoStem, qTerms)
    val sb = stats(graft.analysis.Analyzer.Tag.Snowball, qTerms)
    // NoStem: df(running)=1 = df(walk)=1 (tie keeps order); Snowball:
    // df(run)=3 > df(walk)=1 → min term flips from position 0 to 1 → the
    // order changed → DFOrder picks the stemmed tag
    assert(ns == Seq(TermStat(1, 1), TermStat(1, 1)))
    assert(sb == Seq(TermStat(3, 3), TermStat(1, 1)))
    assert(predictTag("DFOrder", ns, sb, NS, SB) == SB)
    assert(predictTag("KendallTauDFOrder", ns, sb, NS, SB) == SB)
  }

  test("KNN model selection end-to-end: TFD vectors → χ² ADF distance → majority vote") {
    import graft.model.Topic
    import graft.stats.Divergence
    // per-query term histograms → one ADF vector per query
    // (knn/KNNTool.java:42-98 composed with TFDAwareNeed.averageAndDF)
    val tfds: Map[Int, Array[Double]] = Map(
      1 -> Divergence.averageAndDf(Seq(Array(10.0, 1.0, 0.0), Array(8.0, 2.0, 0.0))),
      2 -> Divergence.averageAndDf(Seq(Array(9.0, 2.0, 0.0))),
      3 -> Divergence.averageAndDf(Seq(Array(0.0, 1.0, 10.0), Array(0.0, 2.0, 9.0))),
      4 -> Divergence.averageAndDf(Seq(Array(1.0, 1.0, 9.0))),
      5 -> Divergence.averageAndDf(Seq(Array(10.0, 2.0, 0.0))))
    val bestOf = Map(1 -> "DPH", 2 -> "DPH", 3 -> "BM25", 4 -> "BM25", 5 -> "DPH")
    val topics = (1 to 5).map(q => Topic(q, s"q$q"))
    val chi = (a: Array[Double], b: Array[Double]) => Divergence.chiPdf(a, b, divide = true)
    val picked = Selection.knnSelect(topics, tfds, bestOf, k = 2, chi)
    // query 5's shape is head-heavy like 1/2 → neighbors {1,2} → DPH;
    // query 3's neighbors are {4, ...} with tail-heavy majority → BM25
    assert(picked(5) == "DPH")
    assert(picked(3) == "BM25")
    assert(picked(1) == "DPH")
  }

  test("rule-based model selection (RBEvaluator.scoreRuleBased:40-57)") {
    import Selection.ruleBasedModel
    // 1-word query
    assert(ruleBasedModel(1, Seq(5L), Seq(5L), 100.0, 0.5) == "RawTF")
    // hot term: cf/N = 80/100 > 0.5
    assert(ruleBasedModel(3, Seq(80L, 2L), Seq(10L, 2L), 100.0, 0.5) == "DFIC")
    // 2-word, df ratio 3/2 < 2
    assert(ruleBasedModel(2, Seq(3L, 2L), Seq(3L, 2L), 100.0, 0.5) == "LogTFNv0L0")
    // 2-word, df ratio 8/2 ≥ 2
    assert(ruleBasedModel(2, Seq(8L, 2L), Seq(8L, 2L), 100.0, 0.5) == "DPH")
    // ≥3-word fallback
    assert(ruleBasedModel(4, Seq(3L, 2L, 1L), Seq(3L, 2L, 1L), 100.0, 0.5) == "DFIC")
  }
}
