package graft

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
}
