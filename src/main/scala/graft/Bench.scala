package graft

import org.apache.spark.sql.SparkSession

import graft.data.Transcripts
import graft.driver.DriverQueries
import graft.index.IndexBuild
import graft.model.Topic
import graft.query.{BlockMaxWand, Exact, Scoring}

/**
 * Headline benchmark (BASELINE.md protocol). One JSON line:
 *  - per driver-query wall seconds (the correctness-gate workload),
 *  - index-build throughput in turns/sec over a synthetic transcript corpus
 *    (size via SPARK_GRAFT_BENCH_TURNS, default 200k),
 *  - BM25(0.9, 0.4) top-k latency p50/p95 over repeated topic-set runs,
 *    exact path and Block-Max WAND separately.
 */
object Bench {

  private def pct(sorted: Array[Double], p: Double): Double =
    if (sorted.isEmpty) 0 else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // 1. driver-query workload. The shared corpus derivations (termDocs /
    // docs / dict caches, the compressed block index) are warmed FIRST and
    // reported separately — otherwise the alphabetically-first gates absorb
    // the one-time cache builds and read as 5-10× their real cost.
    // failure-isolated like the per-gate loop: a broken sf dir records
    // warmup −1 and the gates record their own −1s, but the bench still
    // emits its JSON line (index-build + latency sections are independent)
    val warmupSec = try time {
      DriverQueries.termDocs(spark, sfDir)
      DriverQueries.docs(spark, sfDir)
      DriverQueries.dict(spark, sfDir)
      DriverQueries.corpusStats(spark, sfDir)
      DriverQueries.index(spark, sfDir)
      DriverQueries.fieldedIndex(spark, sfDir, "split")
      DriverQueries.fieldedIndex(spark, sfDir, "natural")
      DriverQueries.fieldedBlockIndex(spark, sfDir, "split") // r3c's one-time block stage
    } catch { case _: Throwable => -1.0 }
    // SPARK_GRAFT_SKIP: comma-separated gate names to exclude — used at
    // big synthetic scale points where a gate's TEST FIXTURE (e.g. the
    // driver-side MemoryStream feeding the streaming gates, which every
    // task deserializes wholesale) stops measuring the engine. Skipped
    // names are reported so the omission is visible.
    val skipRequested = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    // report only gates ACTUALLY excluded — a typo'd name must not be
    // claimed as skipped while the gate silently runs (or never existed)
    val skip = skipRequested.intersect(SparkEntry.queries.keySet)
    skipRequested.diff(skip).foreach(n =>
      System.err.println(s"[bench] SPARK_GRAFT_SKIP names unknown gate: $n"))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => skip(name) }
      .map { case (name, fn) =>
        val sec = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
        name -> sec
      }

    // 1b. streaming over a FILE source (round-3 VERDICT next-round #5):
    // the st1–st4 GATES drive a driver-side MemoryStream, whose fixture
    // cost swamps the engine at big SF (they are skipped there). This
    // section streams the same documents corpus through a parquet file
    // source — real executor-side reads — so streaming evidence exists at
    // every scale point. Untimed: materialize the stream input in 8 files
    // (2 files/trigger → 4 micro-batches).
    // every temp dir this run creates is removed at the end — a loop of
    // bench runs at sf10 otherwise fills the disk with corpus copies and
    // later legs die with ENOSPC hidden by piped output
    val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    def tmpDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      tmpDirs += d
      d
    }
    def rmAll(): Unit = tmpDirs.foreach { d =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => }
    }
    // everything past this point creates temp dirs — rmAll MUST run even
    // when a timed section throws (an sf10 failure mid-section otherwise
    // leaks corpus copies/checkpoints and a bench loop dies with ENOSPC)
    try {

    val streamingFile: Seq[(String, Double)] = try {
      val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      val nDocs = docsDf.count()
      val inDir = tmpDir("graft-bench-stream-in")
      docsDf.repartition(8).write.mode("overwrite").parquet(inDir)
      val sch = docsDf.schema
      def fileStream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 2).parquet(inDir)
      def runToEnd(w: org.apache.spark.sql.streaming.DataStreamWriter[_]): Double = {
        val ck = tmpDir("graft-bench-stream-ck")
        val q = w.option("checkpointLocation", ck).start()
        val t0 = System.nanoTime()
        try q.processAllAvailable() finally q.stop()
        (System.nanoTime() - t0) / 1e9
      }
      import org.apache.spark.sql.functions.{col, concat, lit, to_timestamp}
      val st1 = runToEnd(graft.streaming.Streams
        .dedupByContent(fileStream, "doc_id", "text")
        .writeStream.format("noop").outputMode("append"))
      val st2 = runToEnd(graft.streaming.Streams
        .windowedTokenStats(fileStream.withColumn("ts", col("doc_id").cast("timestamp")),
          "ts", "text", "60 seconds")
        .writeStream.format("noop").outputMode("update"))
      val st4 = runToEnd(graft.streaming.Streams
        .topicMatches(fileStream, "doc_id", "text", DriverQueries.topics,
          DriverQueries.dict(spark, sfDir), DriverQueries.corpusStats(spark, sfDir),
          Scoring.BM25c(0.9, 0.4), minScore = 0.0)
        .writeStream.format("noop").outputMode("append"))
      val st3 = {
        import spark.implicits._
        val idxDir = tmpDir("graft-bench-stream-idx")
        val turnStream = fileStream.select(
            concat(lit("doc-"), col("doc_id").cast("string")).as("conv_id"),
            lit(0).as("turn_idx"), lit("user").as("role"), col("text"),
            lit(null).cast("string").as("tool"),
            to_timestamp(lit("2026-01-01 00:00:00")).as("ts"))
          .as[graft.model.Turn]
        runToEnd(graft.streaming.Streams.indexSink(turnStream, idxDir,
          docsPerShard = math.max(nDocs / 32, 256), streamToken = "bench"))
      }
      Seq("st1_file_dedup" -> st1, "st2_file_window" -> st2,
        "st3_file_index" -> st3, "st4_file_match" -> st4, "docs" -> nDocs.toDouble)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming-file section failed: $e")
      Seq("failed" -> -1.0)
    }

    // 2. index-build throughput (turns/sec) over synthetic transcripts.
    // A/B for the round-3 driver-bench regression (VERDICT r03 #2): build
    // once with the gate-suite caches still RESIDENT (the r03 condition,
    // 'dirty'), then release every cache + GC and build again on a quiet
    // heap — the quiet number is the representative one (a production
    // build job does not share its heap with a warm query suite).
    val turns = Transcripts.generate(spark, benchTurns / 8, 8)
    val docsPerShard = math.max(benchTurns / (cpus.toInt * 4), 1000)
    // throwaway first build (untimed): codegen compilation for this exact
    // plan + page-cache warmup are one-time effects that would otherwise
    // accrue entirely to whichever A/B leg runs first, conflating cache
    // residency with first-run warmup
    IndexBuild.build(turns, tmpDir("graft-bench-idx-warm"), docsPerShard = docsPerShard, inputSorted = true)
    val dirtyDir = tmpDir("graft-bench-idx-dirty")
    val buildSecDirty = time(IndexBuild.build(turns, dirtyDir, docsPerShard = docsPerShard, inputSorted = true))
    DriverQueries.releaseCaches(spark)
    System.gc()
    val idxDir = tmpDir("graft-bench-idx")
    val buildSec = time(IndexBuild.build(turns, idxDir, docsPerShard = docsPerShard, inputSorted = true))
    val turnsPerSec = benchTurns / buildSec

    // 3. query latency p50/p95 on the built index. Round-4 VERDICT #6: the
    // 6-topic × sequential-block measurement swung ±0.6 s round-over-round
    // on host noise — now 24 topics per run and the exact/BMW legs
    // INTERLEAVED (drift hits both legs equally), with n and min/max
    // dispersion recorded so deltas can be judged against spread.
    val index = IndexBuild.load(spark, idxDir)
    val topics = Seq(
      Topic(1, "w0 w3"), Topic(2, "needle0 needle7"), Topic(3, "w1 w2 w5"),
      Topic(4, "w10 w100 w500 w1500"), Topic(5, "w0 needle3 w42"), Topic(6, "w7"),
      Topic(7, "w4 w9"), Topic(8, "needle11 w33"), Topic(9, "w20 w21 w22"),
      Topic(10, "w11 w111 w1111"), Topic(11, "needle21 needle22"), Topic(12, "w13"),
      Topic(13, "w2 w8 w64"), Topic(14, "w55 needle5"), Topic(15, "w6 w66 w666"),
      Topic(16, "w15 w150 w1500"), Topic(17, "needle31 w77"), Topic(18, "w17"),
      Topic(19, "w1 w19 w190"), Topic(20, "needle41 needle42 w44"), Topic(21, "w23 w234"),
      Topic(22, "w31 w310 w1310"), Topic(23, "needle13 w130"), Topic(24, "w3 w30 w300 w1300"))
    val model = Scoring.BM25c(0.9, 0.4)
    val termDocs = index.termDocs.cache()
    termDocs.count()
    val reps = 7
    val exactLat = new Array[Double](reps)
    val bmwLat = new Array[Double](reps)
    var r = 0
    while (r < reps) {
      exactLat(r) = time {
        Exact.search(termDocs, index.dict, index.stats, topics, model, 1000).count()
      }
      bmwLat(r) = time {
        BlockMaxWand.search(index, topics, model, 1000).count()
      }
      r += 1
    }
    termDocs.unpersist()
    java.util.Arrays.sort(exactLat)
    java.util.Arrays.sort(bmwLat)

    // 3b. fielded latency: flat join+window (searchIndexed) vs the
    // early-terminating block-max WAND (round-5) over the SAME topic set on
    // a fielded index of the same synthetic corpus (natural transcript
    // fields). One-time builds reported separately; legs interleaved.
    val fieldedLat: Seq[(String, Double)] = try {
      val fDir = tmpDir("graft-bench-fidx")
      val fBuildSec = time {
        graft.index.FieldedIndex.build(
          graft.index.FieldedIndex.fromTurns(turns), fDir, shards = cpus.toInt)
      }
      val fidx = graft.index.FieldedIndex.load(spark, fDir)
      val fbBuildSec = time {
        graft.index.FieldedBlocks.build(fidx, fDir, docsPerShard = docsPerShard)
      }
      val fb = graft.index.FieldedBlocks.load(spark, fDir)
      val boosts = Map("role" -> 0.9, "tool" -> 0.7, "contents" -> 0.3)
      val flatLat = new Array[Double](reps)
      val fbmwLat = new Array[Double](reps)
      var i = 0
      while (i < reps) {
        flatLat(i) = time {
          graft.query.Fielded.searchIndexed(fidx, topics, model, 1000, boosts = boosts).count()
        }
        fbmwLat(i) = time {
          graft.query.FieldedBlockMax.search(fb, topics, model, 1000, boosts = boosts).count()
        }
        i += 1
      }
      java.util.Arrays.sort(flatLat)
      java.util.Arrays.sort(fbmwLat)
      Seq("flat_p50" -> pct(flatLat, 0.5), "flat_p95" -> pct(flatLat, 0.95),
        "bmw_p50" -> pct(fbmwLat, 0.5), "bmw_p95" -> pct(fbmwLat, 0.95),
        "flat_min" -> flatLat.head, "flat_max" -> flatLat.last,
        "bmw_min" -> fbmwLat.head, "bmw_max" -> fbmwLat.last,
        "build_sec" -> fBuildSec, "blocks_sec" -> fbBuildSec)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] fielded latency section failed: $e")
      Seq("failed" -> -1.0)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum + math.max(warmupSec, 0.0)
    val streamJson = streamingFile.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fieldedJson = fieldedLat.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup_sec":$warmupSec,""" +
      s""""skipped":[${skip.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}],"sf":"$sfDir",""" +
      s""""streaming_file":$streamJson,""" +
      s""""index_build":{"turns":$benchTurns,"sec":$buildSec,"turns_per_sec":$turnsPerSec,"sec_dirty_heap":$buildSecDirty},""" +
      s""""bm25_topk_sec":{"exact_p50":${pct(exactLat, 0.5)},"exact_p95":${pct(exactLat, 0.95)},""" +
      s""""bmw_p50":${pct(bmwLat, 0.5)},"bmw_p95":${pct(bmwLat, 0.95)},""" +
      s""""exact_min":${exactLat.head},"exact_max":${exactLat.last},""" +
      s""""bmw_min":${bmwLat.head},"bmw_max":${bmwLat.last},""" +
      s""""k":1000,"topics":${topics.size},"reps":$reps,"interleaved":true},""" +
      s""""fielded_topk_sec":$fieldedJson,""" +
      s""""cpus":$cpus}"""
    // the driver parses this JSON: print it as a line AND persist it to a
    // file so sbt/log4j noise on stdout can never hide it
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH/bench_last.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
    println(json)

    } finally rmAll() // leak-proof: stream copies, checkpoints, A/B + fielded indexes
  }
}
