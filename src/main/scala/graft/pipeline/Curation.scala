package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** LCG-mixed uniform in [0, 2^31) from a numeric row id — BIGINT-exact
   * arithmetic any SQL engine reproduces bit-for-bit (ids ≤ ~8.4e9 stay
   * under 2^63 before the mod). */
  val SAMPLE_MOD: Long = 1L << 31
  def sampleKeyCol(idCol: Column, seed: Long): Column =
    pmod(idCol.cast("long") * lit(1103515245L) + lit(seed), lit(SAMPLE_MOD))

  /**
   * Deterministic stratified sampling / domain mixing — "re-weight the
   * corpus to target per-source fractions", the step every training-data
   * pipeline runs between curation and tokenization. Row `id` is mixed
   * through a fixed LCG into a uniform key and kept iff
   * `key < floor(2^31 · fraction(stratum))`: the sample is a pure FILTER —
   * reproducible across runs, engines and partitionings (the property
   * gates c2 against the SQL oracle), stable under corpus appends (a new
   * doc never flips an old doc's decision, unlike rand() or reservoir
   * sampling), and exact-threshold integer math (no float boundary).
   *
   * 100 TB shape: thresholds are a broadcast of |strata| rows joined onto
   * the scan, then a codegen'd filter — map-only, no shuffle, no UDF;
   * strata absent from `fractions` keep `default`. For CONTENT-keyed
   * sampling (dedup-stable across id reassignment) substitute
   * `xxhash64(text)` for the id mix — same plan, engine-specific hash, so
   * the driver gate uses the id form both engines can compute.
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double], default: Double = 0.0,
                       seed: Long = 12345L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require((fractions.values ++ Seq(default)).forall(f => f >= 0.0 && f <= 1.0),
      "sampling fractions must be in [0, 1]")
    // internal column named to dodge collisions with caller columns; drop
    // via the thresholds frame's own reference so a caller column of the
    // same (unlikely) name could never be silently removed
    val thrCol = "__graft_sample_threshold"
    val thresholds = fractions.toSeq
      .map { case (s, f) => (s, math.floor(SAMPLE_MOD * f).toLong) }
      .toDF(strataCol, thrCol)
    val defaultThreshold = math.floor(SAMPLE_MOD * default).toLong
    df.join(broadcast(thresholds), Seq(strataCol), "left")
      .filter(sampleKeyCol(col(idCol), seed) <
        coalesce(thresholds(thrCol), lit(defaultThreshold)))
      .drop(thresholds(thrCol))
  }
}
