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

  test("repetition stats: hand-computed gram fractions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a b a b a"),   // unigrams a×3 b×2; bigrams: "a b"×2 "b a"×2
      (2L, "x y z"),       // all unique
      (3L, "w"),           // single token → bigram fracs 0
      (4L, "q q q q")      // fully repeated
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((0.6, 0.5, 1.0, 1.0)))        // top uni 3/5, top bi 2/4, all grams dup
    assert(got(2L) == ((round6(1.0 / 3), 0.5, 0.0, 0.0)))
    assert(got(3L) == ((1.0, 0.0, 0.0, 0.0)))
    assert(got(4L) == ((1.0, 1.0, 1.0, 1.0)))
  }
  private def round6(d: Double): Double = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("repetition stats: map-only form ≡ brute-force gram counting on random docs") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Array("a", "b", "c", "dd", "e")
    val docs = (0L until 60L).map { i =>
      val n = rng.nextInt(7) // includes 0- and 1-token docs
      (i, Seq.fill(math.max(n, if (i % 9 == 0) 0 else 1))(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    def brute(text: String): (Double, Double, Double, Double) = {
      val t = text.split(" ", -1).toSeq
      val bi = if (t.size >= 2) t.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      def stats(g: Seq[String]): (Double, Double) =
        if (g.isEmpty) (0.0, 0.0)
        else {
          val c = g.groupBy(identity).map(_._2.size)
          (round6(c.max.toDouble / g.size),
            round6(c.filter(_ > 1).sum.toDouble / g.size))
        }
      val (tu, du) = stats(t)
      val (tb, db) = stats(bi)
      (tu, tb, du, db)
    }
    val got = TextAnalysis.repetitionStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == brute(text), s"doc $id '$text'")
    }
  }

  test("stratified sample: deterministic, append-stable, per-stratum fractions honored") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (0L until 4000L).map(i => (i, s"src${i % 4}"))
    val df = rows.toDF("doc_id", "source")
    val fr = Map("src0" -> 0.5, "src1" -> 0.0, "src2" -> 1.0)
    def ids(d: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Curation.stratifiedSample(d, "doc_id", "source", fr, default = 0.25)
        .select("doc_id").as[Long].collect().toSet
    val s1 = ids(df)
    assert(s1 == ids(df.repartition(7)), "sample must not depend on partitioning")
    // append stability: adding rows never flips an existing decision
    val s2 = ids(rows.++((4000L until 5000L).map(i => (i, s"src${i % 4}"))).toDF("doc_id", "source"))
    assert(s1.subsetOf(s2))
    val bySrc = rows.groupBy(_._2).map { case (src, rs) =>
      src -> rs.count(r => s1.contains(r._1)).toDouble / rs.size }
    assert(bySrc("src1") == 0.0)
    assert(bySrc("src2") == 1.0)
    assert(math.abs(bySrc("src0") - 0.5) < 0.1, s"src0 ${bySrc("src0")}")
    assert(math.abs(bySrc("src3") - 0.25) < 0.1, s"src3 ${bySrc("src3")} (default fraction)")
  }

  test("plan shapes: x5 has no Window/UDF; c2 joins broadcast-only with no corpus shuffle") {
    import spark.implicits._
    val df = Seq((1L, "a b a", "src0")).toDF("doc_id", "text", "source")
    val p1 = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p1.toLowerCase.contains("window"), s"window in x5 plan:\n$p1")
    // round 6: the operator is MAP-ONLY — a per-doc JVM kernel (like the
    // sibling x2-x4 text operators); no Exchange at all (the r5 form ran 3
    // shuffles carrying every gram of every doc)
    assert(!p1.contains("Exchange"), s"shuffle in x5 plan:\n$p1")
    val p2 = graft.pipeline.Curation.stratifiedSample(
        df.select("doc_id", "source"), "doc_id", "source", Map("src0" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"), s"c2 must broadcast the thresholds:\n$p2")
    // the only exchange allowed is the broadcast of the tiny thresholds
    // frame — the corpus side must be map-only (filter over the scan)
    assert(p2.linesIterator.count(l => l.contains("Exchange") && !l.toLowerCase.contains("broadcast")) == 0,
      s"corpus-side shuffle in c2 plan:\n$p2")
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

  // ---- round-5: real header decode (PNG/GIF/JPEG magic bytes) ----

  test("parseImageHeader: crafted headers round-trip (incl. 16-bit edge dims)") {
    import Multimodal.{Headers, parseImageHeader}
    assert(parseImageHeader(Headers.png(1920, 1080)) == Some(("png", 1920, 1080)))
    assert(parseImageHeader(Headers.gif(1, 1)) == Some(("gif", 1, 1)))
    assert(parseImageHeader(Headers.gif(65535, 65535)) == Some(("gif", 65535, 65535)))
    assert(parseImageHeader(Headers.jpeg(640, 480)) == Some(("jpeg", 640, 480)))
    assert(parseImageHeader(Headers.jpeg(65535, 1)) == Some(("jpeg", 65535, 1)))
    // PNG dims are u32 big-endian — above the u16 range
    assert(parseImageHeader(Headers.png(100000, 2)) == Some(("png", 100000, 2)))
  }

  test("parseImageHeader: hand-built byte literals (spec offsets, not builder echoes)") {
    import Multimodal.parseImageHeader
    // PNG: sig + IHDR with width 2, height 3 at offsets 16/20
    val png = Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 2, 0, 0, 0, 3, 8, 6, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(parseImageHeader(png) == Some(("png", 2, 3)))
    // GIF87a: width 258 (0x0102 LE → bytes 02 01), height 772 (0x0304)
    val gif = Array[Int]('G', 'I', 'F', '8', '7', 'a',
      0x02, 0x01, 0x04, 0x03, 0, 0, 0).map(_.toByte)
    assert(parseImageHeader(gif) == Some(("gif", 258, 772)))
    // JPEG with fill bytes before SOF2 (progressive): height 5, width 7
    val jpg = Array[Int](0xFF, 0xD8,
      0xFF, 0xFF, 0xFF, 0xC2, 0x00, 0x0B, 8, 0, 5, 0, 7, 1, 1, 0x11, 0,
      0xFF, 0xD9).map(_.toByte)
    assert(parseImageHeader(jpg) == Some(("jpeg", 7, 5)))
  }

  test("parseImageHeader: rejects corrupt / truncated / non-image payloads") {
    import Multimodal.{Headers, parseImageHeader}
    assert(parseImageHeader("not an image at all......".getBytes) == None)
    assert(parseImageHeader(Headers.png(4, 4).take(20)) == None)    // truncated IHDR
    assert(parseImageHeader(Array[Byte](0xFF.toByte, 0xD8.toByte)) == None) // bare SOI
    // JPEG whose stream hits SOS before any SOF
    val noSof = Array[Int](0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x02).map(_.toByte)
    assert(parseImageHeader(noSof) == None)
    // marker desync (non-FF where a marker must start)
    val desync = Array[Int](0xFF, 0xD8, 0x00, 0xC0, 0, 0).map(_.toByte)
    assert(parseImageHeader(desync) == None)
    // DHT (C4) must NOT be taken for a frame header
    val dhtOnly = Array[Int](0xFF, 0xD8, 0xFF, 0xC4, 0x00, 0x04, 0, 0, 0xFF, 0xD9).map(_.toByte)
    assert(parseImageHeader(dhtOnly) == None)
  }

  test("HeaderCodec end-to-end: real dims through the Spark pipeline; unknown keeps kind") {
    import spark.implicits._
    val df = (0L until 30L).map(i => Tuple1(i)).toDF("doc_id")
    val got = Multimodal.imageHeaderFeatures(df, "doc_id").orderBy("id").collect()
    got.foreach { r =>
      val id = r.getAs[Long]("id")
      val wantKind = (id % 3) match { case 0 => "png"; case 1 => "gif"; case _ => "jpeg" }
      assert(r.getAs[String]("kind") == wantKind)
      assert(r.getAs[Int]("width") == (1 + id % 1920).toInt, s"id=$id")
      assert(r.getAs[Int]("height") == (1 + id % 1080).toInt, s"id=$id")
    }
    // an unparseable payload keeps the carried kind and 0×0 dims
    val junk = Multimodal.HeaderCodec.decode(
      Multimodal.MediaRow(9L, "audio", "RIFFnotparsed".getBytes))
    assert(junk.kind == "audio" && junk.width == 0 && junk.height == 0)
  }
}
