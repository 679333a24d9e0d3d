package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.Metrics

/** Native eval metrics vs hand-computed values (SURVEY.md §5 stats.golden). */
class MetricsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions.col

  // run: one query, 5 ranked docs; qrels: d1 judge 2, d3 judge 1, d9 judge 3 (unretrieved)
  private lazy val runs = {
    import spark.implicits._
    Seq((1, "d1", 1, 5.0), (1, "d2", 2, 4.0), (1, "d3", 3, 3.0), (1, "d4", 4, 2.0), (1, "d5", 5, 1.0))
      .toDF("qid", "docId", "rank", "score")
  }
  private lazy val qrels = {
    import spark.implicits._
    Seq((1, "d1", 2), (1, "d3", 1), (1, "d9", 3), (1, "d2", 0)).toDF("qid", "docId", "judge")
  }

  test("AP, P@k, Recall@k hand-check") {
    val m = Metrics.perQuery(runs, qrels, k = 5, gmax = 4).collect().head
    // rel docs in qrels: d1, d3, d9 → numRel = 3
    // AP = (P@1 + P@3)/3 = (1/1 + 2/3)/3
    assert(math.abs(m.getAs[Double]("ap") - (1.0 + 2.0 / 3) / 3) < 1e-12)
    assert(m.getAs[Double]("p5") == 2.0 / 5)
    assert(math.abs(m.getAs[Double]("recall5") - 2.0 / 3) < 1e-12)
  }

  test("NDCG@k hand-check (gdeval gain 2^j - 1)") {
    val m = Metrics.perQuery(runs, qrels, k = 5, gmax = 4).collect().head
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = (math.pow(2, 2) - 1) / log2(2) + (math.pow(2, 1) - 1) / log2(4)
    // ideal: judges sorted desc: 3 (d9), 2 (d1), 1 (d3)
    val idcg = (math.pow(2, 3) - 1) / log2(2) + (math.pow(2, 2) - 1) / log2(3) + (math.pow(2, 1) - 1) / log2(4)
    assert(math.abs(m.getAs[Double]("ndcg5") - dcg / idcg) < 1e-9)
  }

  test("ERR@k hand-check") {
    val m = Metrics.perQuery(runs, qrels, k = 5, gmax = 4).collect().head
    // R_i = (2^j - 1)/16: r1 → 3/16, r3 → 1/16, others 0
    val r1 = 3.0 / 16
    val r3 = 1.0 / 16
    val err = r1 / 1 + (1 - r1) * r3 / 3
    assert(math.abs(m.getAs[Double]("err5") - err) < 1e-9)
  }

  test("NCG@k hand-check (linear gain, trec_eval ncg_cut semantics)") {
    // retrieved gains in top-5: d1 → 2, d3 → 1 (d9 judge 3 unretrieved) → CG = 3
    // ideal top-5 gains: 3 + 2 + 1 = 6 → NCG@5 = 0.5
    val m = Metrics.ncgAtK(runs, qrels, k = 5).collect().head
    assert(math.abs(m.getAs[Double]("ncg5") - 0.5) < 1e-12)
    // cutoff 1: CG = 2 (d1); ideal@1 = 3 (d9) → 2/3
    val m1 = Metrics.ncgAtK(runs, qrels, k = 1).collect().head
    assert(math.abs(m1.getAs[Double]("ncg1") - 2.0 / 3) < 1e-12)
  }

  test("NCG@k is 0.0 for a query with no relevant docs") {
    import spark.implicits._
    val r2 = Seq((7, "d1", 1, 1.0)).toDF("qid", "docId", "rank", "score")
    val q2 = Seq((7, "d1", 0)).toDF("qid", "docId", "judge")
    assert(Metrics.ncgAtK(r2, q2, 5).collect().head.getAs[Double]("ncg5") == 0.0)
  }

  test("statAP hand-check (statAP_MQ_eval_v4.pl:229-333 estimator)") {
    import spark.implicits._
    // sampled: d1 (judge 2, iprob 0.5), d3 (judge 1, iprob 0.25), d9 (judge 3,
    // iprob 0.5, unretrieved), d2 sampled non-rel (iprob 1.0)
    val prels = Seq((1, "d1", 2, 0.5), (1, "d3", 1, 0.25), (1, "d9", 3, 0.5), (1, "d2", 0, 1.0))
      .toDF("qid", "docId", "judge", "iprob")
    // R̂ = 1/0.5 + 1/0.25 + 1/0.5 = 8
    // rank 1 (d1): prec = (1+0)/1 = 1, contrib = 1/0.5 = 2; sum_prec = 2
    // rank 3 (d3): prec = (1+2)/3 = 1, contrib = 1/0.25 = 4
    // statAP = (2+4)/8 = 0.75
    val m = Metrics.statAP(runs, prels).collect().head
    assert(math.abs(m.getAs[Double]("statap") - 0.75) < 1e-12)
  }

  test("statAP is 0.0 when no sampled relevant docs exist") {
    import spark.implicits._
    val prels = Seq((1, "d2", 0, 1.0)).toDF("qid", "docId", "judge", "iprob")
    assert(Metrics.statAP(runs, prels).collect().head.getAs[Double]("statap") == 0.0)
  }

  test("spam re-rank drops low percentiles and re-ranks (score desc, docId desc)") {
    import spark.implicits._
    val spam = Seq(("d1", 90), ("d2", 10), ("d3", 55), ("d4", 55), ("d5", 70))
      .toDF("docId", "percentile")
    val rr = Metrics.spamRerank(runs, spam, threshold = 50, k = 10)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getInt(2)))
    assert(rr.toSeq == Seq(("d1", 1), ("d3", 2), ("d4", 3), ("d5", 4))) // d2 dropped
  }

  test("tie in spam re-rank broken by docId DESC (SubmissionFile.java:58-65)") {
    import spark.implicits._
    val runsTie = Seq((1, "a", 1, 2.0), (1, "b", 2, 2.0)).toDF("qid", "docId", "rank", "score")
    val spam = Seq(("a", 99), ("b", 99)).toDF("docId", "percentile")
    val rr = Metrics.spamRerank(runsTie, spam, 50, 10).orderBy("rank")
      .collect().map(_.getString(1))
    assert(rr.toSeq == Seq("b", "a"))
  }

  test("judgeHistogram radix counts per model (JudgeTool.java:120-152)") {
    import spark.implicits._
    // m1 top-3: d1 graded 2, d2 spam (−2), d3 unjudged; d4 (graded 1) is
    // rank 4 → cut by k. m2 top-3: d1 graded 2, d5 graded 4, d6 unjudged.
    val runs = Seq(
      ("m1", 1, "d1", 1), ("m1", 1, "d2", 2), ("m1", 1, "d3", 3), ("m1", 1, "d4", 4),
      ("m2", 1, "d1", 1), ("m2", 1, "d5", 2), ("m2", 1, "d6", 3))
      .toDF("model", "qid", "docId", "rank")
    // d1 appears TWICE in qrels (duplicate line, grades 0 and 2): the
    // reference's map lookup counts the doc once — max wins, never both
    val qrels = Seq((1, "d1", 2), (1, "d1", 0), (1, "d2", -2), (1, "d4", 1), (1, "d5", 4))
      .toDF("qid", "docId", "judge")
    // columns: model, unjudged, spam, g0, g1, g2, g3, g4
    val got = Metrics.judgeHistogram(runs, qrels, k = 3)
      .collect().map(r => r.getString(0) -> (1 to 7).map(r.getLong)).toMap
    assert(got("m1") == Seq(1L, 1L, 0L, 0L, 1L, 0L, 0L)) // d3 unjudged, d2 spam, d1 g2
    assert(got("m2") == Seq(1L, 0L, 0L, 0L, 1L, 0L, 1L)) // d6 unjudged, d1 g2, d5 g4
  }
}
