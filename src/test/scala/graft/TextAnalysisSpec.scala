package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("language ID on natural-language samples") {
    assert(TextAnalysis.languageOf("the cat sat on the mat and looked at you") == "en")
    assert(TextAnalysis.languageOf("el perro corre en la casa de los niños y que más") == "es")
    assert(TextAnalysis.languageOf("der Hund und die Katze sind ein schönes Paar in der Wohnung") == "de")
    assert(TextAnalysis.languageOf("le chat est sur la table avec les amis qui mangent une pomme") == "fr")
    assert(TextAnalysis.languageOf("我是一个人，他不是在这里的") == "zh")
    assert(TextAnalysis.languageOf("") == "und")
    assert(TextAnalysis.languageOf("xyzzy plugh") == "und")
  }

  test("rolling fingerprint: stable, order-sensitive, normalization-invariant") {
    val a = TextAnalysis.rollingFingerprint("Hello, World!")
    assert(a == TextAnalysis.rollingFingerprint("hello world"))   // analyzer normalizes
    assert(a != TextAnalysis.rollingFingerprint("world hello"))   // order matters
    assert(a == TextAnalysis.rollingFingerprint("HELLO   world")) // whitespace-invariant
  }

  test("approx LLM tokens: runs cost ceil(len/4), punctuation costs 1") {
    assert(TextAnalysis.approxLlmTokens("abcd") == 1)
    assert(TextAnalysis.approxLlmTokens("abcde") == 2)
    assert(TextAnalysis.approxLlmTokens("ab cd") == 2)
    assert(TextAnalysis.approxLlmTokens("a,b") == 3) // a + comma + b
    assert(TextAnalysis.approxLlmTokens("") == 0)
    assert(TextAnalysis.approxLlmTokens(null) == 0)
  }

  test("textStats column math on a known row") {
    import spark.implicits._
    val df = Seq((1L, "the cat the dog")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 4)
    assert(r.getAs[Long]("n_uniq") == 3)
    assert(r.getAs[Double]("stop_ratio") == 0.5)  // two 'the' of four
    assert(r.getAs[Double]("uniq_ratio") == 0.75)
    assert(r.getAs[Double]("avg_word_len") == 3.0)
  }

  test("multimodal stub pipeline: deterministic, kind-typed, batch-shaped") {
    import spark.implicits._
    val df = Seq((0L, "image payload"), (1L, "audio payload"), (2L, "video payload"))
      .toDF("doc_id", "text")
    val feats = Multimodal.featuresOf(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(feats.map(_.getAs[String]("kind")).toSeq == Seq("image", "audio", "video"))
    assert(feats.forall(r => r.getAs[Int]("width") >= 1 && r.getAs[Int]("height") >= 1))
    assert(feats.head.getAs[Long]("duration_ms") == 0L) // images have no duration
    // determinism: run twice, identical output
    val again = Multimodal.featuresOf(df, "doc_id", "text").orderBy("id").collect()
    assert(feats.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("codec seam: decode streams per-partition without materializing") {
    import spark.implicits._
    val media = Multimodal.synthesize(
      (0L until 100L).map(i => (i, s"payload $i")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.decodeAll(media).collect()
    assert(out.length == 100)
    assert(out.map(_.id).toSet == (0L until 100L).toSet)
  }
}
