package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.model.{CorpusStats, PostingBlock, Turn}

/**
 * Resumable index build (SURVEY.md §7.2/§7.5, north rule: "resumable from
 * checkpoint with per-partition lineage + metrics").
 *
 * On-disk layout under `indexDir/`:
 * {{{
 *   docs/        docId, docIdNum, docLen        (+ _SUCCESS)
 *   dict/        term, termId, df, cf           (+ _SUCCESS)
 *   postings/    shard=K/ *.parquet  PostingBlock rows, partitioned by shard
 *   manifest/    per-shard lineage + metrics rows, appended per wave
 *   stats.json   {numDocs, numTokens}
 * }}}
 *
 * Stage gating: `docs` and `dict` are atomic stage checkpoints (skipped when
 * their `_SUCCESS` marker exists). The `postings` stage is checkpointed at
 * *shard* granularity: shards are written in waves; on restart, shards
 * already present on disk are skipped and only the remainder is planned —
 * the §5.5 kill-resume contract. Each completed shard appends a manifest
 * row `(shard, wave, nBlocks, nPostings, sumTf, nTerms, wallMs)`
 * (df/cf/doclen metrics + lineage per partition).
 *
 * Reference analog of the whole stage pipeline: `Indexer.indexWithThreads`
 * (`/root/reference/src/main/java/edu/anadolu/Indexer.java:567-654`) —
 * file-level tasks → RAM-buffered segment build → background merges; here
 * partition-level tasks → sort-shuffle → per-shard block files.
 */
object IndexBuild {

  final case class Index(docs: DataFrame, dict: DataFrame,
                         blocks: Dataset[PostingBlock], stats: CorpusStats) {
    /** Denormalized exact-path posting source (docId string key). */
    def termDocs: DataFrame = {
      val decoded = PostingsBuilder.decodeBlocks(blocks)
      decoded.join(docs.select("docIdNum", "docId"), "docIdNum")
        .join(dict.select("termId", "term"), "termId")
        .select("docId", "docLen", "term", "tf")
    }
  }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, p: String): Boolean =
    fs(spark, p).exists(new Path(p))

  def stageDone(spark: SparkSession, stageDir: String): Boolean =
    exists(spark, s"$stageDir/_SUCCESS")

  /** Shards already fully written (present on disk = committed by a
   * successful wave job; Spark commits partition dirs atomically per job). */
  def completedShards(spark: SparkSession, postingsDir: String): Set[Int] = {
    val f = fs(spark, postingsDir)
    val p = new Path(postingsDir)
    if (!f.exists(p)) Set.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("shard="))
      .map(_.stripPrefix("shard=").toInt)
      .toSet
  }

  /** Deliberate mid-build crash for the kill-resume test. */
  final class InjectedFailure(wave: Int) extends RuntimeException(s"injected failure after wave $wave")

  /**
   * Build (or resume) the full index.
   *
   * @param docsPerShard documents per posting shard (doc-range partitioning)
   * @param waves number of atomic write jobs the remaining shards are split
   *              into (1 = single job; >1 exercises finer checkpoints)
   * @param failAfterWave fault injection: throw after this wave commits
   */
  def build(turns: Dataset[Turn], indexDir: String,
            tag: Analyzer.Tag = Analyzer.Tag.NoStem,
            docsPerShard: Long = 1 << 20,
            waves: Int = 1,
            failAfterWave: Int = -1): Index = {
    val spark = turns.sparkSession
    val docsDir = s"$indexDir/docs"
    val dictDir = s"$indexDir/dict"
    val postingsDir = s"$indexDir/postings"
    val manifestDir = s"$indexDir/manifest"

    // -- stage 1: docs (docId, docIdNum, docLen); ids dense in docId order --
    if (!stageDone(spark, docsDir)) {
      val d = Tokenize.docs(turns, tag)
      DenseIds.assign(d, "docIdNum", col("docId"))
        .write.mode("overwrite").parquet(docsDir)
    }
    val docs = spark.read.parquet(docsDir)

    // -- stage 2: dict (term, termId, df, cf) --
    val termDocs = Tokenize.termDocs(turns, tag)
    if (!stageDone(spark, dictDir)) {
      Dictionary.withIds(Dictionary.termStats(termDocs))
        .write.mode("overwrite").parquet(dictDir)
    }
    val dict = spark.read.parquet(dictDir)

    // -- stage 3: postings, shard-granular resume --
    val statsRow = docs.agg(count(lit(1)), coalesce(sum("docLen"), lit(0L))).head()
    val stats = CorpusStats(statsRow.getLong(0), statsRow.getLong(1))
    val numShards = math.max(1, ((stats.numDocs + docsPerShard - 1) / docsPerShard).toInt)
    val done = completedShards(spark, postingsDir)
    val todo = (0 until numShards).filterNot(done)

    if (todo.nonEmpty) {
      // one shuffle join each to attach docIdNum and termId, then shard
      val termDocsNum = termDocs
        .join(docs.select("docId", "docIdNum"), "docId")
        .join(dict.select("term", "termId"), "term")
        .select("docIdNum", "docLen", "termId", "tf")

      val groups = {
        val per = math.max(1, math.ceil(todo.size.toDouble / math.max(1, waves)).toInt)
        todo.grouped(per).toSeq
      }
      groups.zipWithIndex.foreach { case (shardGroup, wave) =>
        val t0 = System.nanoTime()
        val blocks = PostingsBuilder.buildBlocks(
            termDocsNum.filter((col("docIdNum") / docsPerShard).cast("int").isin(shardGroup: _*)),
            docsPerShard)
        blocks.toDF()
          .write.mode("append").partitionBy("shard").parquet(postingsDir)
        // per-shard lineage + metrics from what was just written
        val wallMs = (System.nanoTime() - t0) / 1000000L
        spark.read.parquet(postingsDir)
          .filter(col("shard").isin(shardGroup: _*))
          .groupBy("shard")
          .agg(count(lit(1)).as("nBlocks"), sum("n").as("nPostings"),
            countDistinct("termId").as("nTerms"), sum("maxTf").as("sumMaxTf"))
          .withColumn("wave", lit(wave))
          .withColumn("wallMs", lit(wallMs))
          .write.mode("append").parquet(manifestDir)
        if (failAfterWave == wave) throw new InjectedFailure(wave)
      }
    }

    // commit marker for the postings stage as a whole
    val f = fs(spark, postingsDir)
    f.create(new Path(s"$postingsDir/_GRAFT_COMPLETE"), true).close()

    import spark.implicits._
    Index(docs, dict, spark.read.parquet(postingsDir).as[PostingBlock], stats)
  }

  def load(spark: SparkSession, indexDir: String): Index = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$indexDir/docs")
    val statsRow = docs.agg(count(lit(1)), coalesce(sum("docLen"), lit(0L))).head()
    Index(
      docs,
      spark.read.parquet(s"$indexDir/dict"),
      spark.read.parquet(s"$indexDir/postings").as[PostingBlock],
      CorpusStats(statsRow.getLong(0), statsRow.getLong(1)))
  }
}
