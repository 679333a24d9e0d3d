package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.analysis.Analyzer
import graft.index.{Dictionary, DenseIds, PostingsBuilder}
import graft.model.Turn

/**
 * Structured Streaming surface (SURVEY.md §1.4: the reference is strictly
 * batch — these are the Spark-native streaming counterparts of its
 * ingestion + analytics paths, for transcript streams that arrive
 * continuously at 100 TB scale).
 *
 *  - [[dedupByContent]]: streaming exact dedup — first-seen content hash
 *    wins across micro-batches (stateful `dropDuplicates`, optionally
 *    watermark-bounded state).
 *  - [[windowedTokenStats]]: event-time tumbling-window token/doc counts
 *    with optional watermark (append mode emits finalized windows only).
 *  - [[appendBatch]] / [[indexSink]]: incremental inverted-index ingestion
 *    — each micro-batch becomes a fresh disjoint set of posting shards
 *    (docIdNum ranges aligned to shard boundaries), the dictionary is
 *    re-derived from block METADATA only (never a corpus re-pass), and the
 *    result is a normal [[graft.index.IndexBuild.load]]-able index at
 *    every commit point.
 */
object Streams {

  /** First-seen exact dedup on a (possibly streaming) frame: one row per
   * distinct content hash, earliest arrival wins. With `watermarkOn` set,
   * [[org.apache.spark.sql.Dataset.dropDuplicatesWithinWatermark]] is used
   * so state for hashes older than the delay really is evicted — a plain
   * `dropDuplicates(hash)` never drops state unless the event-time column
   * is part of the key, and would grow without bound on an unbounded
   * stream. The trade: duplicates separated by more than the delay pass
   * through (the standard bounded near-real-time dedup semantic). */
  def dedupByContent(df: DataFrame, idCol: String, textCol: String,
                     watermarkOn: Option[(String, String)] = None): DataFrame = {
    val hashed = watermarkOn
      .fold(df) { case (tsCol, delay) => df.withWatermark(tsCol, delay) }
      .withColumn("text_hash", md5(col(textCol)))
    val deduped =
      if (watermarkOn.isDefined) hashed.dropDuplicatesWithinWatermark("text_hash")
      else hashed.dropDuplicates("text_hash")
    deduped.select(col(idCol).as("id"), col("text_hash"))
  }

  /** Event-time tumbling-window corpus stats: docs + analyzed-token count
   * per window. Watermark optional (append mode requires it; complete mode
   * replays every window). */
  def windowedTokenStats(df: DataFrame, tsCol: String, textCol: String,
                         windowDuration: String,
                         watermarkOn: Option[String] = None): DataFrame = {
    val countTokens = udf((t: String) => Analyzer.countTokens(t).toLong)
    val base = watermarkOn.fold(df)(delay => df.withWatermark(tsCol, delay))
    base
      .withColumn("n_tok", countTokens(col(textCol)))
      .groupBy(window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .select(col("window.start").cast("long").as("window_start"),
        col("n_docs"), col("n_tokens"))
  }

  private def maxDocIdNum(spark: org.apache.spark.sql.SparkSession, docsDir: String): Option[Long] = {
    val p = new Path(docsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(docsDir).agg(max("docIdNum")).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
  }

  /**
   * Append one micro-batch of turns to an (possibly empty) index directory.
   *
   * The batch gets docIdNums starting at the next shard boundary past the
   * current maximum, so its shards (`docIdNum / docsPerShard`) are disjoint
   * from every earlier batch — the fused segment build then runs unchanged
   * and the shard files land under new `shard=K` partition dirs. Within a
   * batch ids follow docId-string order (DenseIds); ACROSS batches order is
   * arrival order, so score ties across batches break by arrival — the
   * standard streaming-ingest semantic (a batch rebuild re-sorts globally).
   */
  private def markerPath(indexDir: String, name: String) = new Path(s"$indexDir/$name")

  private def markerExists(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, name: String): Boolean = {
    val p = markerPath(indexDir, name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def writeMarker(spark: org.apache.spark.sql.SparkSession,
                          indexDir: String, name: String, body: String = ""): Unit = {
    val p = markerPath(indexDir, name)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true)
    out.write(body.getBytes("UTF-8")); out.close()
  }

  private def readMarker(spark: org.apache.spark.sql.SparkSession,
                         indexDir: String, name: String): Option[String] = {
    val p = markerPath(indexDir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val b = new java.io.ByteArrayOutputStream()
      try { var c = in.read(); while (c >= 0) { b.write(c); c = in.read() } } finally in.close()
      Some(b.toString("UTF-8"))
    }
  }

  /** @param batchId Structured Streaming micro-batch id: with it set, replays
   *   of the same batch (foreachBatch is at-least-once) are IDEMPOTENT —
   *   (1) a `_batch_<id>_done` marker short-circuits fully-applied batches;
   *   (2) the id range `start` is persisted in a `_batch_<id>_start` sidecar
   *   BEFORE any write, so a retry renumbers identically; (3) the posting
   *   shards of a batch are deterministic from that start and written with
   *   dynamic partition overwrite, so a retry REPLACES rather than appends.
   *   The one non-idempotent step left is the docs append, guarded by its
   *   own `_batch_<id>_docs` marker written immediately after the job-atomic
   *   (committer v1) docs job — the exposure window is the marker write. */
  def appendBatch(turns: Dataset[Turn], indexDir: String,
                  tag: Analyzer.Tag = Analyzer.Tag.NoStem,
                  docsPerShard: Long = 1 << 20,
                  batchId: Option[Long] = None): Unit = {
    val spark = turns.sparkSession
    import spark.implicits._
    if (batchId.exists(id => markerExists(spark, indexDir, s"_batch_${id}_done"))) return
    if (turns.isEmpty) return
    val docsDir = s"$indexDir/docs"
    val postingsDir = s"$indexDir/postings"
    val dictDir = s"$indexDir/dict"
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)

    val start = batchId.flatMap(id =>
        readMarker(spark, indexDir, s"_batch_${id}_start").map(_.trim.toLong))
      .getOrElse {
        val v = maxDocIdNum(spark, docsDir) match {
          case None      => 0L
          case Some(mx)  => ((mx / docsPerShard) + 1) * docsPerShard // next shard boundary
        }
        batchId.foreach(id => writeMarker(spark, indexDir, s"_batch_${id}_start", v.toString))
        v
      }
    val (withId0, cleanup) = DenseIds.assignManaged(
      turns.toDF().select(
        concat(col("conv_id"), lit("#"), col("turn_idx").cast("string")).as("docId"),
        col("text")),
      "docIdNum0", assumeSorted = false, col("docId"))
    val withId = withId0
      .withColumn("docIdNum", col("docIdNum0") + lit(start))
      .drop("docIdNum0")

    try {
      val docsApplied = batchId.exists(id => markerExists(spark, indexDir, s"_batch_${id}_docs"))
      if (!docsApplied) {
        withId.select("docId", "docIdNum", "text").as[(String, Long, String)]
          .mapPartitions(_.map { case (docId, num, text) =>
            val dl =
              if (tag == Analyzer.Tag.NoStem) Analyzer.countTokens(text).toLong
              else Analyzer.analyze(text, tag).size.toLong
            graft.model.DocEntry(docId, num, dl)
          })
          .write.mode("append").parquet(docsDir)
        batchId.foreach(id => writeMarker(spark, indexDir, s"_batch_${id}_docs"))
      }

      // dynamic overwrite: a replay rewrites exactly this batch's shard
      // partitions (deterministic from `start`) instead of appending twice
      PostingsBuilder.buildSegments(withId, tag, docsPerShard)
        .toDF()
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard").parquet(postingsDir)

      // dict refresh from block metadata only (one small-row aggregation)
      Dictionary.withIds(
          spark.read.parquet(postingsDir)
            .groupBy("term").agg(sum("n").as("df"), sum("sumTf").as("cf")))
        .write.mode("overwrite").parquet(dictDir)
      batchId.foreach(id => writeMarker(spark, indexDir, s"_batch_${id}_done"))
    } finally cleanup()
  }

  /** readStream → incremental index: `stream.writeStream` wired to
   * [[appendBatch]] per micro-batch, idempotent under foreachBatch's
   * at-least-once replay via the batchId. Start + awaitTermination as
   * usual. */
  def indexSink(stream: Dataset[Turn], indexDir: String,
                tag: Analyzer.Tag = Analyzer.Tag.NoStem,
                docsPerShard: Long = 1 << 20): DataStreamWriter[Turn] =
    stream.writeStream.foreachBatch { (batch: Dataset[Turn], id: Long) =>
      appendBatch(batch, indexDir, tag, docsPerShard, batchId = Some(id))
    }
}
