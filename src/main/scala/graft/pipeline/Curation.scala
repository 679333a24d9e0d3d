package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end training-data curation: the composition a 100 TB LLM corpus
 * pipeline actually runs — exact dedup (first/smallest id per content hash
 * wins), language filter, quality band — as ONE operator with a clean plan:
 * a window over the content hash (one shuffle of (hash, id) keys), map-only
 * quality/language scoring, no joins against the corpus.
 */
object Curation {

  /**
   * Curate a (id, text) corpus:
   *  1. exact dedup — keep the smallest id per md5(text)
   *     ([[Dedup.dropExactDuplicates]] semantics);
   *  2. language filter — keep docs whose [[TextAnalysis.languageOf]]
   *     prediction is in `langs` (None = keep all);
   *  3. quality filter — keep docs with [[TextAnalysis.textStats]] quality
   *     ≥ `minQuality` (compared on the 6-dp rounded value, so any two
   *     engines agree at the boundary).
   *
   * Returns (id, lang_pred, quality) for the surviving docs.
   */
  def curate(df: DataFrame, idCol: String, textCol: String,
             langs: Option[Set[String]], minQuality: Double): DataFrame = {
    val deduped = Dedup.dropExactDuplicates(df, idCol, textCol)
    // one projection over the deduped frame — language and quality are both
    // per-row functions of the text, so deriving them as two frames joined
    // on id would run the dedup window twice and add a corpus-sized shuffle
    // join for nothing
    val langUdf = udf(TextAnalysis.languageOf _)
    val scored = deduped.select(
      col(idCol).as("id"),
      langUdf(col(textCol)).as("lang_pred"),
      TextAnalysis.qualityExpr(col(textCol)).as("quality"))
    val langFiltered = langs.fold(scored)(ls => scored.filter(col("lang_pred").isin(ls.toSeq: _*)))
    langFiltered
      .filter(col("quality") >= lit(minQuality)) // quality is already 6-dp rounded
      .select(col("id"), col("lang_pred"), col("quality"))
  }
}
