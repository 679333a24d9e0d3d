package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Transcripts
import graft.eval.Spam

/** OddsBinning intervals + spam-removing ingest filter
 * (`spam/OddsBinning.java`, `spam/SpamRemovingIndexer.java`). */
class SpamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("OddsBinning: interval table and bin lookups match the reference constants") {
    import Spam.OddsBinning._
    assert(intervals.head == -10.5 && intervals.last == 16.0 && intervals.length == 54)
    assert(bin(-10.42) == 0)          // [-10.5, -10)
    assert(bin(-0.1) == 20)           // [-0.5, 0)
    assert(bin(0.0) == 21)            // [0, 0.5)
    assert(bin(15.96) == 52)          // [15.5, 16)
    intercept[IllegalArgumentException](bin(-10.43))
    intercept[IllegalArgumentException](bin(15.97))
  }

  test("filterTurns drops docs below the spam threshold; threshold 0 is identity") {
    import spark.implicits._
    val turns = Transcripts.generate(spark, 6, 1, seed = 5L, partitions = 1)
    val ids = turns.collect().map(t => s"${t.conv_id}#${t.turn_idx}").sorted
    // first two docs spammy (percentile 10), third has no score (→ 0), rest clean
    val scores = Seq((ids(0), 10), (ids(1), 10), (ids(3), 90), (ids(4), 90), (ids(5), 90))
      .toDF("docId", "percentile")
    val kept = Spam.filterTurns(turns, scores, threshold = 50)
      .collect().map(t => s"${t.conv_id}#${t.turn_idx}").sorted
    assert(kept.toSeq == Seq(ids(3), ids(4), ids(5)))
    assert(Spam.filterTurns(turns, scores, threshold = 0).count() == 6)
  }

  test("rocPercentile: confusion matrix matches RocTool.classify hand values") {
    import spark.implicits._
    // histogram: spam at percentiles {10, 10, 60}, relevant at {20, 80},
    // non at {50}, one grade −1 row that must be IGNORED (RocTool counts
    // only −2 / >0 / 0)
    val labeled = Seq(
      (1, "dA", -2, 10), (1, "dB", -2, 10), (2, "dC", -2, 60),
      (1, "dD", 1, 20), (2, "dE", 2, 80),
      (1, "dF", 0, 50), (2, "dG", -1, 30))
      .toDF("qid", "docId", "grade", "percentile")
    val got = Spam.rocPercentile(labeled, thresholds = Seq(0, 50, 70, 100))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))).toMap
    // threshold 0: nothing labeled spam → tp=0 fp=0 tn=2 fn=3; guards → 0.0
    assert(got(0) == ((0L, 2L, 0L, 3L, 0.0, 0.0, 0.0, 0.0)))
    // threshold 50: spam{10,10} → tp=2, rel{20} → fp=1; tn=1 (rel 80), fn=1 (spam 60)
    val (tp, tn, fp, fn, p, r, fo, f1) = got(50)
    assert((tp, tn, fp, fn) == ((2L, 1L, 1L, 1L)))
    assert(p == 2.0 / 3 && r == 2.0 / 3 && fo == 0.5 && f1 == 2.0 / 3)
    // threshold 70: tp=3 fp=1 tn=1 fn=0
    assert(got(70)._1 == 3L && got(70)._4 == 0L)
    // threshold 100: everything spam-labeled → tn=0 fn=0, fallout=1
    val h = got(100)
    assert((h._1, h._2, h._3, h._4, h._5, h._6, h._7) == ((3L, 0L, 2L, 0L, 0.6, 1.0, 1.0)))
    assert(math.abs(h._8 - 0.75) < 1e-12) // 2·0.6·1/1.6 in floating point
  }

  test("rocOdds: bin column math ≡ OddsBinning.bin; classifyOdds direction (spam ABOVE threshold)") {
    import spark.implicits._
    // odds chosen to hit known bins: −10.42→0, 0.0→21, 2.6→26, 15.96→52
    val labeled = Seq(
      (1, "dA", -2, 15.96), (1, "dB", -2, 2.6), (2, "dC", -2, -10.42),
      (1, "dD", 1, 0.0), (2, "dE", 3, 2.6))
      .toDF("qid", "docId", "grade", "odds")
    // cross-check the column bin against the scalar reference implementation
    labeled.select(col("odds"),
        floor(lit(2.0) * col("odds") + lit(21.0)).cast("int").as("bin"))
      .collect().foreach { r =>
        assert(r.getInt(1) == Spam.OddsBinning.bin(r.getDouble(0)),
          s"column bin diverges for odds ${r.getDouble(0)}") }
    val got = Spam.rocOdds(labeled, thresholds = Seq(21, 24, 52))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // threshold 21 (bins ≤ 21 non-spam side): spam bins {52, 26, 0} → tp=2
    // (52, 26), fn=1 (0); rel bins {21, 26} → fp=1 (26), tn=1 (21)
    assert(got(21) == ((2L, 1L, 1L, 1L)))
    // threshold 24: same split (next spam bin is 26)
    assert(got(24) == ((2L, 1L, 1L, 1L)))
    // threshold 52: nothing above → tp=0, tn=2, fp=0, fn=3
    assert(got(52) == ((0L, 2L, 0L, 3L)))
  }

  test("rocOdds fails fast on odds outside the valid Fusion range (like OddsBinning.bin)") {
    import spark.implicits._
    val labeled = Seq((1, "dA", -2, 18.3)).toDF("qid", "docId", "grade", "odds")
    val e = intercept[Exception] {
      Spam.rocOdds(labeled, thresholds = Seq(21)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("odds ratio is invalid")),
      s"expected the invalid-odds error, got: $e")
  }

  test("rocPercentile uniq counts each docId once per class (RocTool -uniq)") {
    import spark.implicits._
    // dA judged spam by two queries — uniq counts it once; dD relevant
    // twice; dE judged spam at TWO DIFFERENT percentiles (30 and 70,
    // straddling the threshold) — uniq must place it in ONE bucket
    // (min percentile, the deterministic stand-in for the reference's
    // file-order seen-set), never as tp AND fn simultaneously
    val labeled = Seq(
      (1, "dA", -2, 10), (2, "dA", -2, 10), (1, "dB", -2, 60),
      (1, "dD", 1, 20), (2, "dD", 2, 20),
      (1, "dE", -2, 30), (2, "dE", -2, 70))
      .toDF("qid", "docId", "grade", "percentile")
    val dup = Spam.rocPercentile(labeled, thresholds = Seq(50))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).head
    val uq = Spam.rocPercentile(labeled, thresholds = Seq(50), uniq = true)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).head
    assert(dup == ((3L, 0L, 2L, 2L)))  // every row counted; dE is tp AND fn
    assert(uq == ((2L, 0L, 1L, 1L)))   // dA/dD collapse; dE once, at min=30 → tp only
  }
}
