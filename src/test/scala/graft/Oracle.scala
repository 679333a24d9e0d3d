package graft

import graft.analysis.Analyzer
import graft.model.{Topic, Turn}
import graft.query.Scoring

/**
 * In-memory reference-semantics oracle (SURVEY.md §5.2 item 3): replicates
 * the reference scoring pipeline exactly — same analyzer, per-term float
 * cast (`ModelBase.java:145`), OR-sum (`ModelBase.java:209-225`), zero-hit
 * sentinel (`Searcher.java:193-202`), total order (score float desc,
 * docId asc). Single-threaded plain Scala; independent of the engine's
 * Spark code paths.
 */
object Oracle {

  def topk(turns: Seq[Turn], topics: Seq[Topic], model: Scoring.Model, k: Int,
           sentinel: String, tag: Analyzer.Tag = Analyzer.Tag.NoStem,
           conjunctive: Boolean = false): Seq[(Int, String, Int, Float)] = {
    val docTokens: Seq[(String, Seq[String])] = turns.map { t =>
      (s"${t.conv_id}#${t.turn_idx}", Analyzer.analyze(t.text, tag))
    }
    val docTf: Map[String, Map[String, Long]] =
      docTokens.map { case (id, toks) =>
        id -> toks.groupBy(identity).map { case (w, o) => (w, o.size.toLong) }
      }.toMap
    val docLen: Map[String, Long] = docTokens.map { case (id, toks) => id -> toks.size.toLong }.toMap
    val n = docTokens.size.toDouble
    val c = docLen.values.sum.toDouble
    val avgdl = c / n
    val df: Map[String, Long] = docTf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => (w, o.size.toLong) }
    val cf: Map[String, Long] = docTf.values.flatten.groupBy(_._1)
      .map { case (w, o) => (w, o.map(_._2).sum) }

    topics.flatMap { topic =>
      val terms = Analyzer.analyzeQuery(topic.query, tag)
      val withMult = terms.groupBy(identity).map { case (w, o) => (w, o.size) }
      val matchable = withMult.filter { case (w, _) => df.contains(w) }
      val scoredDocs = docTf.toSeq.flatMap { case (docId, tfm) =>
        val matched = matchable.filter { case (w, _) => tfm.contains(w) }
        val ok = if (conjunctive) matched.size == withMult.size else matched.nonEmpty
        if (!ok) None
        else {
          var s = 0.0d
          matched.foreach { case (w, mult) =>
            val perTerm = model.score(tfm(w).toDouble, docLen(docId), avgdl, 1.0,
              df(w).toDouble, cf(w).toDouble, n, c).toFloat
            s += perTerm.toDouble * mult
          }
          Some((docId, s.toFloat))
        }
      }
      val ranked = scoredDocs
        .sortBy { case (docId, score) => (-score, docId) }
        .take(k)
        .zipWithIndex
        .map { case ((docId, score), i) => (topic.qid, docId, i + 1, score) }
      if (ranked.isEmpty) Seq((topic.qid, sentinel, 1, 0.0f)) else ranked
    }
  }
}
