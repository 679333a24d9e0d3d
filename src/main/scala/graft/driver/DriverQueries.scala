package graft.driver

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.data.Transcripts
import graft.index.{Dictionary, IndexBuild, Tokenize}
import graft.model.Topic
import graft.query.{BlockMaxWand, Exact, Scoring}

/**
 * Driver-facing correctness queries (SparkEntry.queries) with DuckDB oracle
 * SQL over the same parquet tables (SURVEY.md §2 operator ids in names).
 *
 * The `documents` table plays the corpus role (adapter:
 * [[Transcripts.fromDocuments]], docId = 'doc-<id>#0'); its text is
 * single-space-separated lowercase words, so DuckDB's `string_split(text,' ')`
 * tokenizes identically to [[Analyzer.analyze]] — the oracle and the engine
 * share the analyzer contract (SURVEY.md §2.3).
 *
 * Cross-engine float discipline: score-like doubles are rounded (and ranked
 * on the rounded value) so last-ulp libm differences between JVM and DuckDB
 * cannot flip a hash compare; counts stay exact BIGINT.
 */
object DriverQueries {

  final case class Spec(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  // ---- fixed query set over the documents vocabulary ----
  val topics: Seq[Topic] = Seq(
    Topic(1, "spark merge"),
    Topic(2, "hash join order"),
    Topic(3, "the the the"),      // duplicate-term multiplicity (OR-sum)
    Topic(4, "zzzunseen"),        // zero-hit → sentinel row
    Topic(5, "dup"),              // rare term
    Topic(6, "vector window batch scan"))
  val SENTINEL = "doc-sentinel#0"
  val K = 20

  /** Terms used by per-term analytics queries. */
  val histTerms: Seq[String] = Seq("spark", "merge", "the", "a", "dup", "vector", "hash", "query")

  // ---- shared Spark-side corpus derivations ----
  def termDocs(spark: SparkSession, dir: String): DataFrame =
    Tokenize.termDocs(Transcripts.fromDocuments(spark, dir))

  def docs(spark: SparkSession, dir: String): DataFrame =
    Tokenize.docs(Transcripts.fromDocuments(spark, dir))

  /** Compressed block index over the documents corpus, built once per JVM
   * per sfDir (fresh — no reuse across runs, the format may evolve). */
  private val indexCache = scala.collection.mutable.Map.empty[String, IndexBuild.Index]
  def index(spark: SparkSession, dir: String): IndexBuild.Index = synchronized {
    indexCache.getOrElseUpdate(dir, {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-docidx").toString
      IndexBuild.build(Transcripts.fromDocuments(spark, dir), idxDir, docsPerShard = 256)
    })
  }

  // ---- shared DuckDB CTEs ----
  private val CTES =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      |st AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT count(*) FROM tok) AS c),
      |dict AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY term)""".stripMargin

  private def sqlTermList(ts: Seq[String]): String = ts.map(t => s"'$t'").mkString("(", ", ", ")")

  /** VALUES rows for the analyzed query terms — must stay in lockstep with
   * [[Exact.queryTerms]] over [[topics]]. */
  private def qValues: String =
    Exact.queryTerms(topics, Analyzer.Tag.NoStem)
      .map { case (qid, term, mult, _) => s"($qid, '$term', $mult)" }.mkString(", ")

  private def qidValues: String = topics.map(t => s"(${t.qid})").mkString(", ")

  /** BM25c(k1=0.9, b=0.4) per-(term,doc) score in SQL, operation-for-operation
   * the same expression tree as [[Scoring.BM25c.expr]] (so IEEE doubles agree
   * to the last ulp wherever libm does). */
  private val bm25Sql =
    "(tf.tf * (8.0 + 1.0) * 1.0 / (((8.0) + 1.0) * (0.9 * ((1.0 - 0.4) + 0.4 * dl.dl / (st.c * 1.0 / st.n)) + tf.tf))) " +
      "* (ln((st.n - dict.df + 0.5) / (dict.df + 0.5)) / ln(2.0))"

  private def bm25TopkSql(conjunctive: Boolean): String = {
    val having = if (conjunctive)
      "HAVING count(*) = max(q.nterms)" else ""
    s"""WITH $CTES,
       |qv(qid, term, mult) AS (SELECT * FROM (VALUES $qValues) AS v(qid, term, mult)),
       |qn AS (SELECT qid, count(*) AS nterms FROM qv GROUP BY qid),
       |q AS (SELECT qv.qid, qv.term, qv.mult, qn.nterms FROM qv JOIN qn ON qv.qid = qn.qid),
       |scored AS (
       |  SELECT q.qid AS qid, tf.doc_id AS doc_id,
       |         round(sum(q.mult * ($bm25Sql)), 4) AS score
       |  FROM q
       |  JOIN tf ON q.term = tf.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN dict ON q.term = dict.term
       |  CROSS JOIN st
       |  GROUP BY q.qid, tf.doc_id
       |  $having),
       |ranked AS (
       |  SELECT qid, 'doc-' || CAST(doc_id AS VARCHAR) || '#0' AS docid,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, ('doc-' || CAST(doc_id AS VARCHAR) || '#0') ASC) AS INT) AS rank,
       |         score
       |  FROM scored)
       |SELECT qid, docid, rank, score FROM ranked WHERE rank <= $K
       |UNION ALL
       |SELECT s.qid, '$SENTINEL' AS docid, 1 AS rank, 0.0 AS score
       |FROM (VALUES $qidValues) AS s(qid)
       |WHERE s.qid NOT IN (SELECT DISTINCT qid FROM scored)""".stripMargin
  }

  private def bm25TopkSpark(spark: SparkSession, dir: String, conjunctive: Boolean): DataFrame = {
    val td = termDocs(spark, dir)
    val dict = Dictionary.termStats(td)
    val stats = Tokenize.corpusStats(docs(spark, dir))
    Exact.search(td, dict, stats, topics, Scoring.BM25c(0.9, 0.4), K,
        conjunctive = conjunctive, sentinelDocId = Some(SENTINEL),
        roundedDouble = Some(4))
      .withColumnRenamed("docId", "docid")
  }

  val specs: Seq[Spec] = Seq(

    Spec("t1_tokenize",
      (s, d) => termDocs(s, d).select(col("docId").as("docid"), col("term"), col("tf")),
      Some(s"""WITH $CTES
        |SELECT 'doc-' || CAST(doc_id AS VARCHAR) || '#0' AS docid, term, tf FROM tf""".stripMargin)),

    Spec("t2_doclen",
      (s, d) => docs(s, d).select(col("docId").as("docid"), col("docLen").as("doclen")),
      Some(s"""SELECT 'doc-' || CAST(doc_id AS VARCHAR) || '#0' AS docid,
        |CAST(len(string_split(text, ' ')) AS BIGINT) AS doclen FROM documents""".stripMargin)),

    Spec("a1_corpus_stats",
      (s, d) => {
        val st = Tokenize.corpusStats(docs(s, d))
        s.createDataFrame(Seq((st.numDocs, st.numTokens)))
          .toDF("num_docs", "num_tokens")
          .withColumn("avgdl", round(col("num_tokens").cast("double") / col("num_docs").cast("double"), 6))
      },
      Some(s"""WITH $CTES
        |SELECT n AS num_docs, c AS num_tokens, round(c * 1.0 / n, 6) AS avgdl FROM st""".stripMargin)),

    Spec("a2_term_stats",
      (s, d) => Dictionary.termStats(termDocs(s, d)).select("term", "df", "cf"),
      Some(s"""WITH $CTES
        |SELECT term, df, CAST(cf AS BIGINT) AS cf FROM dict""".stripMargin)),

    // cti per CorpusStatistics.java:49-102: e_ij = cf*dl/C over the term's
    // postings + closed-form remainder for non-matching docs, / N.
    Spec("a2c_cti",
      (s, d) => {
        val td = termDocs(s, d).filter(col("term").isin(histTerms: _*))
        val dict = Dictionary.termStats(td)
        val st = Tokenize.corpusStats(docs(s, d))
        val e = (col("cf") * col("docLen")).cast("double") / lit(st.numTokens.toDouble)
        td.join(dict, "term")
          .withColumn("x", pow(col("tf").cast("double") - e, 2) / e)
          .groupBy("term")
          .agg(first("df").as("df"), first("cf").as("cf"), sum("x").as("sx"))
          .select(col("term"), round(
            (col("sx") + (lit(st.numDocs) - col("df")) * (col("cf").cast("double") / lit(st.numDocs.toDouble)))
              / lit(st.numDocs.toDouble), 6).as("cti"))
      },
      Some(s"""WITH $CTES
        |SELECT tf.term AS term,
        |  round((sum(pow(tf.tf * 1.0 - (dict.cf * dl.dl) * 1.0 / st.c, 2) / ((dict.cf * dl.dl) * 1.0 / st.c))
        |    + (st.n - dict.df) * (dict.cf * 1.0 / st.n)) / (st.n * 1.0), 6) AS cti
        |FROM tf JOIN dl ON tf.doc_id = dl.doc_id JOIN dict ON tf.term = dict.term CROSS JOIN st
        |WHERE tf.term IN ${sqlTermList(histTerms)}
        |GROUP BY tf.term, st.n, st.c, dict.df, dict.cf""".stripMargin)),

    Spec("a3_doclen_stats",
      (s, d) => termDocs(s, d).filter(col("term").isin(histTerms: _*))
        .groupBy("term")
        .agg(count(lit(1)).as("n_docs"), sum("docLen").as("sum_dl"),
          sum(col("docLen") * col("docLen")).as("sum_dl2")),
      Some(s"""WITH $CTES
        |SELECT tf.term AS term, count(*) AS n_docs,
        |  CAST(sum(dl.dl) AS BIGINT) AS sum_dl, CAST(sum(dl.dl * dl.dl) AS BIGINT) AS sum_dl2
        |FROM tf JOIN dl ON tf.doc_id = dl.doc_id
        |WHERE tf.term IN ${sqlTermList(histTerms)}
        |GROUP BY tf.term""".stripMargin)),

    // LengthNormalized(10) binning (freq/LengthNormalized.java:15-41):
    // v = trunc(pct*10); bin = v == 10 ? v : v+1.
    Spec("a4_tf_histogram",
      (s, d) => {
        val v = floor(col("tf").cast("double") / col("docLen").cast("double") * 10)
        termDocs(s, d).filter(col("term").isin(histTerms: _*))
          .withColumn("bin", when(v === 10, v).otherwise(v + 1).cast("int"))
          .groupBy("term", "bin").agg(count(lit(1)).as("cnt"))
      },
      Some(s"""WITH $CTES,
        |j AS (SELECT tf.term AS term, CAST(floor(tf.tf * 1.0 / dl.dl * 10) AS INT) AS v
        |      FROM tf JOIN dl ON tf.doc_id = dl.doc_id
        |      WHERE tf.term IN ${sqlTermList(histTerms)})
        |SELECT term, CASE WHEN v = 10 THEN v ELSE v + 1 END AS bin, count(*) AS cnt
        |FROM j GROUP BY 1, 2""".stripMargin)),

    Spec("r1_bm25_topk",
      (s, d) => bm25TopkSpark(s, d, conjunctive = false),
      Some(bm25TopkSql(conjunctive = false))),

    // Same oracle as r1 — the Block-Max WAND path over the compressed
    // sharded index must independently reproduce the DuckDB ranking.
    Spec("r1c_bmw_topk",
      (s, d) => BlockMaxWand.search(index(s, d), topics, Scoring.BM25c(0.9, 0.4), K,
          sentinelDocId = Some(SENTINEL), roundedDouble = Some(4))
        .withColumnRenamed("docId", "docid"),
      Some(bm25TopkSql(conjunctive = false))),

    Spec("r2_bm25_and_topk",
      (s, d) => bm25TopkSpark(s, d, conjunctive = true),
      Some(bm25TopkSql(conjunctive = true))),

    Spec("r4_count_or",
      (s, d) => Exact.countMatches(termDocs(s, d), topics)
        .select(col("qid"), col("numMatches").as("num_matches")),
      Some(s"""WITH $CTES,
        |q(qid, term, mult) AS (SELECT * FROM (VALUES $qValues) AS v(qid, term, mult))
        |SELECT qid, count(*) AS num_matches FROM (
        |  SELECT q.qid AS qid, tf.doc_id FROM q JOIN tf ON q.term = tf.term GROUP BY q.qid, tf.doc_id)
        |GROUP BY qid""".stripMargin)),

    // QPP predictors per analyzed query term: IDF (qpp/IDF.java:22-24),
    // ICTF (ICTF.java:19-21), SCQ (SCQ.java:19-24); natural log as reference.
    Spec("a10_qpp_terms",
      (s, d) => {
        import s.implicits._
        val q = Exact.queryTerms(topics, Analyzer.Tag.NoStem)
          .map { case (qid, term, _, _) => (qid, term) }.toDF("qid", "term")
        val dict = Dictionary.termStats(termDocs(s, d))
        val st = Tokenize.corpusStats(docs(s, d))
        dict.join(broadcast(q), Seq("term"))
          .select(col("qid"), col("term"),
            round(log(lit(st.numDocs.toDouble) / col("df")), 6).as("idf"),
            round(log(lit(st.numTokens.toDouble) / col("cf")), 6).as("ictf"),
            round((lit(1d) + log(col("cf"))) * log(lit(st.numDocs.toDouble) / col("df")), 6).as("scq"))
      },
      Some(s"""WITH $CTES,
        |q(qid, term, mult) AS (SELECT * FROM (VALUES $qValues) AS v(qid, term, mult))
        |SELECT q.qid AS qid, q.term AS term,
        |  round(ln(st.n * 1.0 / dict.df), 6) AS idf,
        |  round(ln(st.c * 1.0 / dict.cf), 6) AS ictf,
        |  round((1.0 + ln(dict.cf)) * ln(st.n * 1.0 / dict.df), 6) AS scq
        |FROM q JOIN dict ON q.term = dict.term CROSS JOIN st""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(s => s.name -> s.fn).toMap

  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.oracle.map(s.name -> _)).toMap
}
