package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PostingBlock

/**
 * Posting-list construction (SURVEY.md §7.2, north rule core).
 *
 * Layout decision — **document-sharded index**: postings are partitioned by
 * contiguous ranges of the dense numeric docId (`shard = docIdNum /
 * docsPerShard`) and, within a shard, stored as sorted (termId, docIdNum)
 * runs cut into ≤128-posting compressed blocks. This is the classic
 * distributed-IR sharding and kills the hot-term skew problem by
 * construction: a stopword's postings spread uniformly across shards, so no
 * single task ever owns a full stopword posting list (the explicit skew
 * handling the north rule demands — doc-range salting rather than random
 * salting, which would break ascending-docId block order).
 *
 * Reference analog: Lucene's per-segment postings + skip lists
 * (`Indexer.java:567-654` builds segments; a shard here = a segment there),
 * with block-max metadata made explicit per block for WAND
 * (maxTf, minDocLen → model-agnostic score upper bound).
 *
 * Build plan shape: ONE shuffle of the token stream (hash on shard), then a
 * partition-local sort and a streaming block cut — the same sorted-runs
 * merge-sort shape as Lucene's RAM-buffered segment build + merge
 * (`Indexer.java:577-583`), expressed as Spark's sort-shuffle.
 */
object PostingsBuilder {

  /**
   * termDocsNum: (docIdNum long, docLen long, termId long, tf long).
   * Emits compressed blocks per (shard, termId).
   */
  def buildBlocks(termDocsNum: DataFrame, docsPerShard: Long,
                  blockSize: Int = Codec.BLOCK_SIZE): Dataset[PostingBlock] = {
    val spark = termDocsNum.sparkSession
    import spark.implicits._

    val sharded = termDocsNum
      .withColumn("shard", (col("docIdNum") / docsPerShard).cast("int"))
      .select("shard", "termId", "docIdNum", "tf", "docLen")
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "termId", "docIdNum")
      .as[(Int, Long, Long, Long, Long)]

    sharded.mapPartitions { it =>
      new Iterator[PostingBlock] {
        private val buf = it.buffered
        private var pending: List[PostingBlock] = Nil

        private def cutRun(): Unit = {
          if (!buf.hasNext) return
          val (shard, termId, _, _, _) = buf.head
          val docs = Array.newBuilder[Long]
          val tfs = Array.newBuilder[Long]
          val dls = Array.newBuilder[Long]
          var n = 0
          val blocks = List.newBuilder[PostingBlock]
          var blockNo = 0
          def flush(): Unit = if (n > 0) {
            val d = docs.result(); val t = tfs.result(); val l = dls.result()
            blocks += PostingBlock(shard, termId, blockNo, n,
              d.head, d.last, t.max, l.min,
              Codec.encodeDeltas(d), Codec.encodeTfs(t), Codec.encodeTfs(l))
            blockNo += 1
            docs.clear(); tfs.clear(); dls.clear(); n = 0
          }
          while (buf.hasNext && buf.head._1 == shard && buf.head._2 == termId) {
            val (_, _, docIdNum, tf, docLen) = buf.next()
            docs += docIdNum; tfs += tf; dls += docLen
            n += 1
            if (n == blockSize) flush()
          }
          flush()
          pending = blocks.result()
        }

        def hasNext: Boolean = pending.nonEmpty || buf.hasNext
        def next(): PostingBlock = {
          if (pending.isEmpty) cutRun()
          val h = pending.head
          pending = pending.tail
          h
        }
      }
    }
  }

  /** Expand blocks back to (shard, termId, docIdNum, tf, docLen) rows —
   * the decode side of the codec, used by the exact-over-blocks path and by
   * round-trip tests. */
  def decodeBlocks(blocks: Dataset[PostingBlock]): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.flatMap { b =>
      val d = Codec.decodeDeltas(b.docBytes, b.n)
      val t = Codec.decodeTfs(b.tfBytes, b.n)
      val l = Codec.decodeTfs(b.dlBytes, b.n)
      Iterator.tabulate(b.n)(i => (b.shard, b.termId, d(i), t(i), l(i)))
    }.toDF("shard", "termId", "docIdNum", "tf", "docLen")
  }
}
