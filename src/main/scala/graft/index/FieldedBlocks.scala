package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.FieldedBlock

/**
 * Block-compressed posting lists over a prebuilt [[FieldedIndex]] — the
 * early-termination substrate for fielded DisMax retrieval (round-4 VERDICT
 * next-round #1). The flat fielded index answers a query by scoring EVERY
 * candidate posting of every query term through join+window
 * ([[graft.query.Fielded.searchIndexed]]); these per-(field, term) blocks
 * carry the same block-max metadata as the main index's [[graft.model.PostingBlock]]
 * (maxTf, minDocLen → a per-block score upper bound for ub-safe models), so
 * [[graft.query.FieldedBlockMax]] can run a WAND loop that skips blocks
 * undecoded and stops scoring docs that cannot reach the top-k θ or the
 * minimum-should-match count.
 *
 * Reference analog: one Lucene index per field with skip-list postings,
 * searched together at `Searcher.java:232-323`.
 *
 * On-disk layout under the SAME dir as the fielded index (two extra stages,
 * each resumable via the [[IndexBuild.stageDone]] marker convention):
 * {{{
 *   fdocs/    (docId, docIdNum) — dense ids in docId-STRING order, so
 *             docIdNum ascending ≡ docId ascending (the engine's canonical
 *             tie-break; heaps and windows order on the cheap numeric id)
 *   fblocks/  FieldedBlock rows, files sorted by (field, term, minDoc) —
 *             a query's `term IN (…)` predicate prunes row groups via
 *             parquet min/max stats, same mechanism as the main block table
 * }}}
 */
object FieldedBlocks {

  final case class FBIndex(blocks: Dataset[FieldedBlock], fdocs: DataFrame,
                           dict: DataFrame, stats: DataFrame)

  /**
   * Build (or resume) the block stage over an existing fielded index.
   * One corpus-sized join (postings ⋈ fdocs on docId) and one range shuffle
   * on (field, term, docIdNum) — both one-time build costs; query plans read
   * only term-pruned block scans afterwards.
   *
   * @param docsPerShard docs per shard (shard = docIdNum / docsPerShard);
   *   shards bound the WAND tasks' doc ranges — disjoint ranges make the
   *   shard-local exact top-k heaps merge to the global exact top-k
   */
  def build(idx: FieldedIndex.FIndex, dir: String,
            docsPerShard: Long = 1L << 20,
            blockSize: Int = Codec.BLOCK_SIZE): FBIndex = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)

    if (!IndexBuild.stageDone(spark, s"$dir/fdocs"))
      DenseIds.assign(idx.postings.select("docId").distinct(), "docIdNum", col("docId"))
        .write.mode("overwrite").parquet(s"$dir/fdocs")
    val fdocs = spark.read.parquet(s"$dir/fdocs")

    if (!IndexBuild.stageDone(spark, s"$dir/fblocks"))
      idx.postings
        .join(fdocs, "docId")
        .select(col("field"), col("term"), col("docIdNum"),
          col("tf").cast("long"), col("docLen").cast("long"))
        .repartitionByRange(parts, col("field"), col("term"), col("docIdNum"))
        .sortWithinPartitions("field", "term", "docIdNum")
        .as[(String, String, Long, Long, Long)]
        .mapPartitions(cutRuns(_, docsPerShard, blockSize))
        .write.mode("overwrite").parquet(s"$dir/fblocks")

    FBIndex(spark.read.parquet(s"$dir/fblocks").as[FieldedBlock], fdocs,
      idx.dict, idx.stats)
  }

  def exists(spark: SparkSession, dir: String): Boolean =
    IndexBuild.stageDone(spark, s"$dir/fblocks")

  def load(spark: SparkSession, dir: String): FBIndex = {
    import spark.implicits._
    val idx = FieldedIndex.load(spark, dir)
    FBIndex(spark.read.parquet(s"$dir/fblocks").as[FieldedBlock],
      spark.read.parquet(s"$dir/fdocs"), idx.dict, idx.stats)
  }

  /** Cut one partition's (field, term, docIdNum, tf, docLen) rows — sorted
   * by exactly that order — into compressed blocks. A block never crosses a
   * (field, term) run boundary NOR a shard boundary (shard-local WAND needs
   * every block inside one doc range). Runs straddling build partitions
   * restart blockNo; readers order by minDoc (same convention as
   * [[PostingsBuilder]]). Buffers are reused across cuts — steady-state task
   * memory is one block regardless of input size. */
  private[index] def cutRuns(it: Iterator[(String, String, Long, Long, Long)],
                             docsPerShard: Long,
                             blockSize: Int): Iterator[FieldedBlock] =
    new Iterator[FieldedBlock] {
      private val scratch = new Codec.Scratch()
      private val docs = new Array[Long](blockSize)
      private val tfs = new Array[Long](blockSize)
      private val dls = new Array[Long](blockSize)
      private var n = 0
      private var curField: String = null
      private var curTerm: String = null
      private var curShard = -1
      private var blockNo = 0
      private var pending: FieldedBlock = null

      private def cut(): FieldedBlock = {
        var maxTf = 0L; var sumTf = 0L; var minDl = Long.MaxValue
        var i = 0
        while (i < n) {
          if (tfs(i) > maxTf) maxTf = tfs(i)
          sumTf += tfs(i)
          if (dls(i) < minDl) minDl = dls(i)
          i += 1
        }
        val b = FieldedBlock(curShard, curField, curTerm, blockNo, n,
          docs(0), docs(n - 1), maxTf, sumTf, minDl,
          Codec.encodeDeltasInto(docs, 0, n, scratch),
          Codec.encodeMinus1Into(tfs, 0, n, scratch),
          Codec.encodeMinus1Into(dls, 0, n, scratch))
        n = 0
        blockNo += 1
        b
      }

      private def advance(): Unit = {
        while (pending == null && it.hasNext) {
          if (n == blockSize) { pending = cut(); return }
          val (field, term, doc, tf, dl) = it.next()
          val shard = (doc / docsPerShard).toInt
          if ((field != curField || term != curTerm || shard != curShard) && n > 0)
            pending = cut() // old run's block: cut BEFORE blockNo resets
          if (field != curField || term != curTerm) blockNo = 0
          curField = field; curTerm = term; curShard = shard
          docs(n) = doc; tfs(n) = tf; dls(n) = dl; n += 1
        }
        if (pending == null && !it.hasNext && n > 0) pending = cut()
      }

      def hasNext: Boolean = { if (pending == null) advance(); pending != null }
      def next(): FieldedBlock = {
        if (!hasNext) throw new NoSuchElementException
        val b = pending; pending = null; b
      }
    }
}
