package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Turn

/**
 * Waterloo-spam utilities beyond the run re-rank
 * ([[Metrics.spamRerank]]):
 *
 *  - [[OddsBinning]] — the log-odds-ratio binning of the Fusion spam
 *    score set (`spam/OddsBinning.java:1-90`): fixed 0.5-wide intervals
 *    over [−10.5, 16), bin = interval index.
 *  - [[filterTurns]] — spam-removing ingest (`spam/SpamRemovingIndexer
 *    .java:17-40`): drop documents whose spam percentile is below the
 *    threshold BEFORE the index build (the reference overrides
 *    `skip(docId)` per document against a Solr lookup; here one broadcast
 *    left join against the side spam-score table — threshold 0 keeps
 *    everything, like the reference's early return).
 */
object Spam {

  object OddsBinning {
    /** Interval floors −10.5, −10, …, 16 (`OddsBinning.intervals`). */
    val intervals: Array[Double] = Array(-10.5) ++ (-20 to 32).map(_ / 2.0)

    val ValidMin = -10.42
    val ValidMax = 15.96

    /** Bin index of a log-odds ratio (`OddsBinning.bin:66-80`). */
    def bin(odds: Double): Int = {
      require(odds >= ValidMin && odds <= ValidMax, s"odds ratio is invalid $odds")
      var i = 0
      while (i < intervals.length - 1) {
        if (odds >= intervals(i) && odds < intervals(i + 1)) return i
        i += 1
      }
      throw new IllegalStateException(s"cannot find the bin for $odds")
    }
  }

  /** Spam-removing ingest filter: keep turns whose docId's percentile ≥
   * threshold (docs absent from the score table count as percentile 0,
   * like [[Metrics.spamRerank]]). Apply before
   * [[graft.index.IndexBuild.build]] for the reference's
   * `<threshold>_<tag>` index variant. */
  def filterTurns(turns: Dataset[Turn], spamScores: DataFrame, threshold: Int): Dataset[Turn] = {
    if (threshold == 0) return turns // reference early-return (`:24`)
    val spark = turns.sparkSession
    import spark.implicits._
    // one percentile per doc (max on duplicate rows — the reference's
    // keyed Solr lookup cannot multiply; a raw left join against a table
    // with duplicate docIds would)
    val perDoc = spamScores.groupBy(col("docId").as("__docId"))
      .agg(max("percentile").as("percentile"))
    turns.toDF()
      .withColumn("__docId", graft.data.Transcripts.docIdCol)
      .join(broadcast(perDoc), Seq("__docId"), "left")
      .filter(coalesce(col("percentile"), lit(0)) >= threshold)
      .drop("__docId", "percentile")
      .as[Turn]
  }
}
