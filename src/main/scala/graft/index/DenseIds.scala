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
   * given columns. */
  def assign(df: DataFrame, idName: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)

    val withId = ranged.rdd.zipWithIndex().map { case (row, id) =>
      Row.fromSeq(row.toSeq :+ id)
    }
    val outSchema = StructType(df.schema.fields :+ StructField(idName, LongType, nullable = false))
    spark.createDataFrame(withId, outSchema)
  }
}
