package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Qrel, Topic}

/**
 * TREC-format I/O (SURVEY.md §2.1 S6/S7, §2.2 K2/K5).
 *
 * Topic-file parsers re-implement the reference's three formats
 * semantics-for-semantics:
 *  - WT (Web Track XML-ish): `<topic number="..." type="...">` /
 *    `<query>...</query>` (`tracks/Track.java:121-169`)
 *  - TT (Terabyte): `<top>` blocks with `<num> Number: N` and `<title>`
 *    (`tracks/Track.java:178-232`)
 *  - MQ (Million Query): `qid:priority:text` colon format with
 *    query-syntax characters blanked (`tracks/MQ09.java`)
 *
 * Run files are `qid Q0 docID rank score runTag` (`Searcher.java:204-226`);
 * qrels are 4-column whitespace files, column 1 unused
 * (`tracks/Track.java:102-113`).
 */
object Trec {

  private def attr(line: String, tag: String): String = {
    // reference Track.extract:64-78: value between the first two quotes
    // after the attribute name
    val i = line.indexOf(tag)
    require(i >= 0, s"line does not contain the tag : $tag")
    val j = line.indexOf("\"", i + tag.length)
    require(j >= 0, s"line does not contain quotation: $line")
    val k = line.indexOf("\"", j + 1)
    line.substring(j + 1, k)
  }

  /** WT topics (`Track.populateInfoNeedsWT`). */
  def parseTopicsWT(lines: Seq[String]): Seq[Topic] = {
    val out = Seq.newBuilder[Topic]
    var number = ""
    var query = ""
    lines.map(_.trim).foreach { line =>
      if (line.startsWith("<topic")) number = attr(line, "number")
      if (line.startsWith("<query>") && line.endsWith("</query>"))
        query = line.substring(7, line.length - 8).trim
      if (line.startsWith("</topic>")) out += Topic(number.toInt, query)
    }
    out.result()
  }

  /** TT topics (`Track.populateInfoNeedsTT`): `<num> Number: N` + `<title>`. */
  def parseTopicsTT(lines: Seq[String]): Seq[Topic] = {
    val out = Seq.newBuilder[Topic]
    var number = ""
    var query = ""
    var inTop = false
    val it = lines.iterator.map(_.trim)
    while (it.hasNext) {
      val line = it.next()
      if (!inTop && line == "<top>") inTop = true
      else if (inTop && line.startsWith("<title>")) {
        query = line.substring(7).trim
        if (query.isEmpty && it.hasNext) query = it.next().trim
      } else if (inTop && line.startsWith("<num>")) {
        val i = line.lastIndexOf(" ")
        require(i >= 0, s"cannot find space in : $line")
        number = line.substring(i).trim
      } else if (inTop && line == "</top>") {
        out += Topic(number.toInt, query)
        inTop = false
      }
    }
    out.result()
  }

  /** MQ topics (`MQ09.populateInfoNeeds`): `qid:priority:text`, syntax
   * characters blanked via the MQ09 escape. */
  def parseTopicsMQ(lines: Seq[String]): Seq[Topic] =
    lines.filter(_.nonEmpty).map { line =>
      val parts = line.split(":", 3)
      require(parts.length == 3, s"topic does not contain colon : $line")
      Topic(parts(0).toInt, graft.analysis.Analyzer.escapeQuerySyntax(parts(2)))
    }

  /** Qrels: 4 whitespace columns `(qid, _, docId, judge)`
   * (`Track.processQRelLine:102-113`). */
  def parseQrels(lines: Seq[String]): Seq[Qrel] =
    lines.filter(_.trim.nonEmpty).map { line =>
      val parts = line.trim.split("\\s+")
      require(parts.length == 4, s"qrels file should contain four columns : $line")
      Qrel(parts(0).toInt, parts(2), parts(3).toInt)
    }

  /** Distributed qrels reader (S7): whitespace-tolerant, matching
   * [[parseQrels]] — real TREC qrels mix tabs and runs of spaces, which a
   * single-space CSV separator would misalign into null columns. */
  def readQrels(spark: SparkSession, path: String): DataFrame = {
    val cols = split(trim(col("value")), "\\s+")
    spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .select(cols.as("c"))
      .select(element_at(col("c"), 1).cast("int").as("qid"),
        element_at(col("c"), 3).as("docId"),
        element_at(col("c"), 4).cast("int").as("judge"))
  }

  /** K2 — TREC run writer: `qid Q0 docID rank score runTag`, sorted by
   * (qid, rank); the sentinel rows are already part of the ranked input. */
  def formatRun(ranked: DataFrame, runTag: String): DataFrame =
    ranked
      .select(concat_ws("\t",
        col("qid").cast("string"), lit("Q0"), col("docId"),
        col("rank").cast("string"), col("score").cast("string"), lit(runTag)).as("line"),
        col("qid"), col("rank"))
      .orderBy("qid", "rank")
      .select("line")

  def writeRun(ranked: DataFrame, runTag: String, path: String): Unit =
    formatRun(ranked, runTag).coalesce(1).write.mode("overwrite").text(path)

  /** K5 — LTR feature file in SVMlight format:
   * `judge qid:N 1:f1 2:f2 …` (`FeatureSearcher.java:51-140`); `features`
   * names the score columns in order. */
  def formatLtr(scored: DataFrame, qrels: DataFrame, features: Seq[String]): DataFrame = {
    val judged = scored.join(qrels, Seq("qid", "docId"), "left")
      .withColumn("judge", coalesce(col("judge"), lit(0)))
    val featCols = features.zipWithIndex.map { case (f, i) =>
      concat(lit(s"${i + 1}:"), col(f).cast("string"))
    }
    judged.select(concat_ws(" ",
      (col("judge").cast("string") +:
        concat(lit("qid:"), col("qid").cast("string")) +:
        featCols) :+ concat(lit("# "), col("docId")): _*).as("line"),
      col("qid"), col("docId"))
      .orderBy("qid", "docId")
      .select("line")
  }
}
