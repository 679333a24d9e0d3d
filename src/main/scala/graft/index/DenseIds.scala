package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dense, order-preserving id assignment WITHOUT a single-partition global
 * window (SURVEY.md §7.2 step 2).
 *
 * `row_number().over(Window.orderBy(...))` funnels all rows through one task
 * — fatal at 10^12 rows. Instead: range-repartition on the order key (so
 * partition p holds a contiguous sorted range), count rows per partition
 * (one cheap columnar job), and number each row as
 * `offset(partition) + localRowIndex`, where the local index is the low 33
 * bits of `monotonically_increasing_id()` (its documented per-partition
 * sequential counter). Fully parallel; the only driver-side state is one
 * offset per partition.
 *
 * Everything stays inside Catalyst/Tungsten whole-stage codegen. The
 * previous implementation detoured through `df.rdd → zipWithIndex →
 * Row.fromSeq → createDataFrame`, which boxed every field of every row on
 * every downstream pass — measured at 8M turns it spent ~40% of the
 * numbering stage in GC and dragged the same per-row conversion tax into
 * the docs and postings passes reading the frame.
 */
object DenseIds {

  private val LocalIdxMask = (1L << 33) - 1

  /** Append `idName: long` numbering rows 0..n-1 in ascending order of the
   * given columns.
   *
   * @param assumeSorted input partitions already hold contiguous, DISJOINT
   *   sorted ranges of the key (e.g. a lake table cluster-sorted by the
   *   stable turn ordering) — skips the range shuffle entirely; rows are
   *   only locally sorted (a no-op pass on truly sorted data). Partition
   *   INDEX order need not follow key order: a file scan of a sorted lake
   *   table packs splits by size, presenting the ranges in arbitrary task
   *   order — offsets are assigned in min-key order, so numbering is
   *   correct as long as the ranges don't overlap.
   */
  def assign(df: DataFrame, idName: String, order: Column*): DataFrame =
    assign(df, idName, assumeSorted = false, order: _*)

  /** [[assign]], plus a cleanup handle that unpersists the internal
   * post-shuffle cache (unsorted input only; no-op otherwise). Long-running
   * callers that invoke the assignment repeatedly (e.g. one micro-batch at
   * a time) MUST call the handle after the last pass over the result, or
   * each call leaks one DISK_ONLY cached frame. */
  def assignManaged(df: DataFrame, idName: String, assumeSorted: Boolean,
                    order: Column*): (DataFrame, () => Unit) =
    { val (out, _, cleanup) = core(df, idName, assumeSorted, order); (out, cleanup) }

  /** [[assignManaged]], additionally returning the EXACT row count — it is
   * already known from the internal per-partition count pass, so callers
   * that need n (or the max id, = n − 1 by density) save a whole
   * aggregation job over the numbered frame. */
  def assignCounted(df: DataFrame, idName: String, assumeSorted: Boolean,
                    order: Column*): (DataFrame, Long, () => Unit) =
    core(df, idName, assumeSorted, order)

  def assign(df: DataFrame, idName: String, assumeSorted: Boolean, order: Column*): DataFrame =
    core(df, idName, assumeSorted, order)._1

  private def core(df: DataFrame, idName: String, assumeSorted: Boolean,
                   order: Seq[Column]): (DataFrame, Long, () => Unit) = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val ranged0 =
      (if (assumeSorted) df else df.repartitionByRange(parts, order: _*))
        .sortWithinPartitions(order: _*)
    // Unsorted input: persist the post-shuffle frame so the count job and
    // every downstream consumer pay the range shuffle exactly once AND see
    // the identical partitioning the offsets were computed for (range
    // boundary sampling is not re-run). DISK_ONLY: serialized columnar
    // batches stay out of the GC'd heap; re-reads hit the OS page cache.
    // Sorted input: recompute is a narrow re-read of a stable scan —
    // cheaper than caching, and deterministic for repeated passes.
    val ranged = if (assumeSorted) ranged0
      else ranged0.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

    // One columnar pass collects per-partition (count, min key). Offsets
    // accumulate in MIN-KEY order, not partition-index order: a sorted lake
    // table read back through a file scan presents its disjoint sorted
    // ranges in SPLIT-PACKING order (Spark orders splits by size), so the
    // partition index is a permutation of the key order. Range order ==
    // pid order after repartitionByRange, so the unsorted path is
    // unaffected; the tie-break on pid is unreachable there (equal keys
    // land in one range partition) and harmless on the sorted path (strict
    // in-partition sort + disjointness make first keys distinct).
    val counts = ranged
      .groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"), min(struct(order: _*)).as("firstKey"))
      .orderBy(col("firstKey"), col("pid")) // tiny: one row per partition
      .select("pid", "n")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    counts.foreach { case (pid, n) =>
      require(n <= LocalIdxMask,
        s"partition $pid has $n rows, exceeding monotonically_increasing_id's " +
          "per-partition counter; raise spark.sql.shuffle.partitions")
    }
    var acc = 0L
    val offsets: Map[Int, Long] = counts.map { case (pid, n) =>
      val entry = (pid, acc); acc += n; entry
    }.toMap

    // Fail fast on partitioning drift: on the assumeSorted path the count
    // job and the numbering job are two separate scans of an unpersisted
    // source — a non-stable source (changed file listing, nondeterministic
    // upstream) could present a partition id the offsets map has never
    // seen, and a silent NULL here would corrupt every downstream id.
    val offsetOrFail = coalesce(
      element_at(typedLit(offsets), spark_partition_id()),
      raise_error(concat(lit("DenseIds: partition "), spark_partition_id().cast("string"),
        lit(" absent from the count pass — source partitioning drifted between scans")))
        .cast("long"))
    val out = ranged.withColumn(idName,
      offsetOrFail +
        monotonically_increasing_id().bitwiseAND(lit(LocalIdxMask)))
    (out, acc, () => if (!assumeSorted) { ranged.unpersist(); () })
  }
}
