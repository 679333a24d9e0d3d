package graft.index

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Dense, order-preserving id assignment WITHOUT a single-partition global
 * window (SURVEY.md §7.2 step 2).
 *
 * `row_number().over(Window.orderBy(...))` funnels all rows through one task
 * — fatal at 10^12 rows. Instead: range-repartition on the order key (so
 * partition p holds a contiguous sorted range) and `zipWithIndex`, which
 * runs its per-partition count job and its numbering pass over the SAME
 * memoized RDD — the range boundaries are fixed once in the shuffle's
 * partitioner, so both passes see identical partitioning. Fully parallel;
 * the only driver-side state is one offset per partition.
 *
 * (This is the one deliberate RDD use in the engine: global contiguous
 * numbering is per-partition imperative logic with no Catalyst equivalent
 * that scales.)
 */
object DenseIds {

  /** Append `idName: long` numbering rows 0..n-1 in ascending order of the
   * given columns.
   *
   * @param assumeSorted input partitions already hold contiguous, globally
   *   ordered ranges of the key (e.g. an Iceberg table cluster-sorted by the
   *   stable turn ordering) — skips the range shuffle entirely; rows are
   *   only locally sorted (a no-op pass on truly sorted data).
   */
  def assign(df: DataFrame, idName: String, order: Column*): DataFrame =
    assign(df, idName, assumeSorted = false, order: _*)

  def assign(df: DataFrame, idName: String, assumeSorted: Boolean, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val ranged0 =
      (if (assumeSorted) df else df.repartitionByRange(parts, order: _*))
        .sortWithinPartitions(order: _*)
    // Unsorted input: persist the post-shuffle frame so zipWithIndex's count
    // pass and every downstream consumer pay the range shuffle exactly once.
    // DISK_ONLY: cached rows stay out of the GC'd heap; re-reads hit the
    // OS page cache. Sorted input: recompute is a narrow re-read — cheaper
    // than caching.
    val ranged = if (assumeSorted) ranged0
      else ranged0.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

    val withId = ranged.rdd.zipWithIndex().map { case (row, id) =>
      Row.fromSeq(row.toSeq :+ id)
    }
    val outSchema = StructType(df.schema.fields :+ StructField(idName, LongType, nullable = false))
    spark.createDataFrame(withId, outSchema)
  }
}
