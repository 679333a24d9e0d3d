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
 *  - [[rocPercentile]] / [[rocOdds]] — the spam-threshold intrinsic
 *    evaluation (`cmdline/RocTool.java:183-254,297-371`): per-class
 *    score-histogram → confusion matrix (tp/tn/fp/fn) + precision /
 *    recall / fallout / F1 per candidate threshold. Percentile direction:
 *    score < threshold ⇒ spam (`Struct.classify`); odds-bin direction:
 *    bin > threshold ⇒ spam (`Struct.classifyOdds` — high log-odds means
 *    spammy in the Fusion odds set).
 */
object Spam {

  /** Per-bucket (spam, relevant) class histogram.
   * Grade → class per `RocTool.distribution:344-362`: −2 spam, >0 relevant
   * (0 non-relevant and −1 "junk" rows fall through uncounted — the
   * confusion matrix reads only the spam/relevant histograms).
   *
   * uniq ≡ the reference's `-uniq` seen-set (`RocTool.increment:373-381`):
   * each docId counts ONCE PER CLASS — globally, not once per bucket; a
   * docId judged at two different scores must not land in two buckets
   * (double-count under one threshold, e.g. tp AND fn at once). The
   * reference keeps the file-order first occurrence; the deterministic
   * DataFrame equivalent is min(bucket) per (docId, class).
   *
   * DEVIATION vs the reference's duplicate handling: RocTool REJECTS input
   * holding a duplicate (queryID, docID) primary key outright (it loads
   * qrels into a keyed map and a second occurrence is an error), so
   * "first occurrence" and "min(bucket)" never actually diverge on input it
   * accepts. This engine does not reject such rows — on real judged input
   * where one doc is scored at two different percentiles, -uniq confusion
   * counts can differ from what the reference would produce (it would
   * refuse the file). Keyed on docId alone, matching the reference's
   * per-class seen-set semantics. */
  private def classHistogram(labeled: DataFrame, bucket: org.apache.spark.sql.Column,
                             uniq: Boolean): DataFrame = {
    val base = labeled.select(col("docId"), bucket,
      when(col("grade") === -2, "spam").when(col("grade") > 0, "relevant").as("cls"))
      .filter(col("cls").isNotNull)
    val rows =
      if (uniq) base.groupBy("docId", "cls").agg(min("bucket").as("bucket"))
      else base
    rows.groupBy("bucket").agg(
      sum(when(col("cls") === "spam", 1L).otherwise(0L)).as("spam"),
      sum(when(col("cls") === "relevant", 1L).otherwise(0L)).as("relevant"))
  }

  private def confusionMetrics(df: DataFrame): DataFrame = {
    val tpfp = col("tp") + col("fp")
    val prec = when(tpfp === 0, 0.0).otherwise(col("tp").cast("double") / tpfp)
    val rec = when(col("tp") + col("fn") === 0, 0.0)
      .otherwise(col("tp").cast("double") / (col("tp") + col("fn")))
    df.withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("fallout", when(col("tn") + col("fp") === 0, 0.0)
        .otherwise(col("fp").cast("double") / (col("tn") + col("fp"))))
      .withColumn("f1", when(col("precision") + col("recall") === 0, 0.0)
        .otherwise(lit(2.0) * col("precision") * col("recall")
          / (col("precision") + col("recall"))))
  }

  /**
   * Percentile-threshold ROC (`RocTool.Struct.classify:193-221`): label
   * docs with percentile < threshold as spam; tp/fp accumulate below the
   * threshold, tn/fn at or above it. One corpus-side aggregation to a
   * ≤100-row histogram, then a tiny histogram × thresholds cross join —
   * corpus scale never touches the threshold loop.
   *
   * @param labeled one row per judged (qid, docId): `grade` (qrels grade,
   *   −2 = spam) and `percentile` ∈ [0, 100)
   * @param uniq count each docId once per class (`RocTool.increment:373-381`
   *   with `-uniq`); default counts every judged (qid, docId) row
   */
  def rocPercentile(labeled: DataFrame, thresholds: Seq[Int] = 0 to 100,
                    uniq: Boolean = false): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val hist = classHistogram(labeled, col("percentile").as("bucket"), uniq)
      .withColumnRenamed("bucket", "percentile")
    val th = thresholds.toDF("threshold")
    val below = col("percentile") < col("threshold")
    confusionMetrics(
      hist.crossJoin(broadcast(th)).groupBy("threshold").agg(
        coalesce(sum(when(below, col("spam"))), lit(0L)).as("tp"),
        coalesce(sum(when(!below, col("relevant"))), lit(0L)).as("tn"),
        coalesce(sum(when(below, col("relevant"))), lit(0L)).as("fp"),
        coalesce(sum(when(!below, col("spam"))), lit(0L)).as("fn")))
  }

  /**
   * Odds-bin-threshold ROC (`RocTool.Struct.classifyOdds:223-254`): label
   * docs whose [[OddsBinning]] bin is ABOVE the threshold as spam (high
   * log-odds ⇒ spammy). `labeled` carries `grade` and `odds` (the Fusion
   * log-odds ratio); bins are the fixed 0.5-wide intervals, computed as
   * column math (`floor(2·odds + 21)` ≡ `OddsBinning.bin` on valid input).
   */
  def rocOdds(labeled: DataFrame,
              thresholds: Seq[Int] = 0 until OddsBinning.intervals.length - 1,
              uniq: Boolean = false): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    // fail fast on odds outside the valid Fusion range, like the scalar
    // OddsBinning.bin (a silent phantom bin would skew every threshold)
    val oddsD = col("odds").cast("double")
    val binCol =
      when(oddsD >= OddsBinning.ValidMin && oddsD <= OddsBinning.ValidMax,
          floor(lit(2.0) * oddsD + lit(21.0)).cast("int"))
        .otherwise(raise_error(concat(lit("odds ratio is invalid "), oddsD.cast("string"))))
    val hist = classHistogram(labeled, binCol.as("bucket"), uniq)
      .withColumnRenamed("bucket", "bin")
    val th = thresholds.toDF("threshold")
    val above = col("bin") > col("threshold")
    confusionMetrics(
      hist.crossJoin(broadcast(th)).groupBy("threshold").agg(
        coalesce(sum(when(above, col("spam"))), lit(0L)).as("tp"),
        coalesce(sum(when(!above, col("relevant"))), lit(0L)).as("tn"),
        coalesce(sum(when(above, col("relevant"))), lit(0L)).as("fp"),
        coalesce(sum(when(!above, col("spam"))), lit(0L)).as("fn")))
  }

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
