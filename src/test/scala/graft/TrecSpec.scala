package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.data.Trec
import graft.model.{Qrel, Topic}

/** Topic/qrels format parsers vs the reference formats
 * (`tracks/Track.java:121-232`, `tracks/MQ09.java`). */
class TrecSpec extends AnyFunSuite {

  test("WT topic format") {
    val lines = Seq(
      """<topic number="51" type="faceted">""",
      "  <query>horse hooves</query>",
      "  <description>d</description>",
      """  <subtopic number="1" type="inf">x</subtopic>""",
      "</topic>",
      """<topic number="52" type="ambiguous">""",
      "  <query>avp</query>",
      "</topic>")
    assert(Trec.parseTopicsWT(lines) == Seq(Topic(51, "horse hooves"), Topic(52, "avp")))
  }

  test("TT topic format incl. title on next line") {
    val lines = Seq(
      "<top>", "<num> Number: 701", "<title>", "u.s. oil industry history",
      "<desc> Description:", "stuff", "</top>",
      "<top>", "<num> Number: 702", "<title>pearl farming", "</top>")
    assert(Trec.parseTopicsTT(lines) ==
      Seq(Topic(701, "u.s. oil industry history"), Topic(702, "pearl farming")))
  }

  test("MQ topic format with syntax escape") {
    val lines = Seq("20001:1:obama family tree", "20002:3:uss yorktown charleston sc?")
    assert(Trec.parseTopicsMQ(lines) ==
      Seq(Topic(20001, "obama family tree"), Topic(20002, "uss yorktown charleston sc")))
  }

  test("qrels 4-column parse (column 1 unused)") {
    val lines = Seq("51 0 clueweb09-en0000-00-00000 1", "51 0 clueweb09-en0000-00-00001 -2")
    assert(Trec.parseQrels(lines) == Seq(
      Qrel(51, "clueweb09-en0000-00-00000", 1), Qrel(51, "clueweb09-en0000-00-00001", -2)))
  }

  test("run writer emits TREC 6-column lines in rank order") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val ranked = Seq((2, "docB", 1, 1.5f), (1, "docA", 1, 2.5f), (1, "docC", 2, 2.0f))
      .toDF("qid", "docId", "rank", "score")
    val lines = Trec.formatRun(ranked, "BM25").collect().map(_.getString(0))
    assert(lines.head == "1\tQ0\tdocA\t1\t2.5\tBM25")
    assert(lines.toSeq == Seq(
      "1\tQ0\tdocA\t1\t2.5\tBM25", "1\tQ0\tdocC\t2\t2.0\tBM25", "2\tQ0\tdocB\t1\t1.5\tBM25"))
  }

  test("LTR SVMlight feature lines (FeatureSearcher format)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val scored = Seq((1, "d1", 2.5, 0.1), (1, "d2", 1.5, 0.9)).toDF("qid", "docId", "BM25", "DPH")
    val qrels = Seq((1, "d1", 2)).toDF("qid", "docId", "judge")
    val lines = Trec.formatLtr(scored, qrels, Seq("BM25", "DPH")).collect().map(_.getString(0))
    assert(lines(0) == "2 qid:1 1:2.5 2:0.1 # d1")
    assert(lines(1) == "0 qid:1 1:1.5 2:0.9 # d2")
  }
}
