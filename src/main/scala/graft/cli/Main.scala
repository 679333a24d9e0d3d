package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.data.{Transcripts, Trec}
import graft.index.IndexBuild
import graft.model.{Topic, Turn}
import graft.query.{BlockMaxWand, Exact, Scoring}

/**
 * spark-submit entry point (north rule: "launched via spark-submit";
 * reference analog: `run.sh → edu.anadolu.cmdline.CLI`, `CLI.java:22-130`).
 *
 * {{{
 * spark-submit --class graft.cli.Main <jar> index  --input <turns.parquet> --out <indexDir> [--docs-per-shard N] [--waves N] [--sorted] [--tag NoStem]
 * spark-submit --class graft.cli.Main <jar> search --index <dir> --topics <file> [--format tsv|wt|tt|mq] [--model BM25k0.9b0.4] [--k 1000] [--path bmw|exact] [--out runFile] [--sentinel id]
 * spark-submit --class graft.cli.Main <jar> stats  --index <dir> [--terms a,b,c] --out <dir>
 * spark-submit --class graft.cli.Main <jar> generate --turns N --out <turns.parquet>
 * spark-submit --class graft.cli.Main <jar> curate --input <turns.parquet> --out <dir> [--langs en,de] [--min-quality 0.5]
 * }}}
 */
object Main {

  /** Bare flags are mapped to "true" under their stripped key FIRST, then the
   * remaining args pair up key/value — so a flag never swallows the next
   * option (`index --input X --sorted --out Y` keeps both sorted and out). */
  private val FLAGS = Set("--sorted", "--uniq", "--resume", "--blocks", "--blockmax")
  private def parseArgs(args: Array[String]): Map[String, String] = {
    val (flags, kvs) = args.partition(FLAGS.contains)
    require(kvs.length % 2 == 0, s"dangling option in: ${kvs.mkString(" ")}")
    val pairs = kvs.grouped(2).map {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case Array(k, v) => throw new IllegalArgumentException(s"expected --option, got '$k' before '$v'")
    }.toMap
    pairs ++ flags.map(_.stripPrefix("--") -> "true")
  }

  private def loadTopics(path: String, format: String): Seq[Topic] = {
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    format match {
      case "wt" => Trec.parseTopicsWT(lines)
      case "tt" => Trec.parseTopicsTT(lines)
      case "mq" => Trec.parseTopicsMQ(lines)
      case _ => lines.filter(_.trim.nonEmpty).map { l =>
        val Array(qid, q) = l.split("\t", 2)
        Topic(qid.trim.toInt, q.trim)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "subcommand required: index | search | stats | generate | " +
      "curate | index-fielded | search-fielded | spam-roc")
    val cmd = args.head
    val opt = parseArgs(args.tail)

    val builder = SparkSession.builder()
      .appName(s"graft-$cmd")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark =
      (if (sys.props.contains("spark.master")) builder
       else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")}]"))
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tag = Analyzer.Tag.of(opt.getOrElse("tag", "NoStem"))

    cmd match {
      case "generate" =>
        val turns = opt("turns").toLong
        Transcripts.generate(spark, turns / 8, 8)
          .write.mode("overwrite").parquet(opt("out"))
        println(s"""{"generated":$turns,"out":"${opt("out")}"}""")

      case "index" =>
        val turns = spark.read.parquet(opt("input")).as[Turn]
        val t0 = System.nanoTime()
        val idx = IndexBuild.build(turns, opt("out"), tag,
          docsPerShard = opt.getOrElse("docs-per-shard", "16384").toLong,
          waves = opt.getOrElse("waves", "1").toInt,
          inputSorted = opt.contains("sorted"))
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"indexed_docs":${idx.stats.numDocs},"tokens":${idx.stats.numTokens},"sec":$sec}""")

      case "search" =>
        val index = IndexBuild.load(spark, opt("index"))
        val topics = loadTopics(opt("topics"), opt.getOrElse("format", "tsv"))
        val model = Scoring.parse(opt.getOrElse("model", "BM25k0.9b0.4"))
        val k = opt.getOrElse("k", "1000").toInt
        val sentinel = opt.get("sentinel")
        val t0 = System.nanoTime()
        val path = opt.getOrElse("path", "bmw") match {
          case "exact" => "exact"
          case p if !model.ubSafe => // BMW unsound for non-monotone models
            System.err.println(s"[search] ${model.name} is not block-max-safe; using exact path instead of $p")
            "exact"
          case p => p
        }
        val ranked = path match {
          case "exact" =>
            Exact.search(index.termDocs, index.dict, index.stats, topics, model, k,
              tag, sentinelDocId = sentinel)
          case _ =>
            BlockMaxWand.search(index, topics, model, k, tag, sentinelDocId = sentinel)
        }
        opt.get("out") match {
          case Some(out) => Trec.writeRun(ranked, model.name, out)
          case None => ranked.orderBy("qid", "rank").show(50, truncate = false)
        }
        println(s"""{"topics":${topics.size},"k":$k,"model":"${model.name}","sec":${(System.nanoTime() - t0) / 1e9}}""")

      case "stats" =>
        val index = IndexBuild.load(spark, opt("index"))
        val out = opt("out")
        index.dict.write.mode("overwrite").option("header", "true").csv(s"$out/term_stats")
        spark.createDataFrame(Seq((index.stats.numDocs, index.stats.numTokens, index.stats.avgDocLen)))
          .toDF("docCount", "sumTotalTermFreq", "avgLength")
          .write.mode("overwrite").option("header", "true").csv(s"$out/field_stats")
        println(s"""{"docs":${index.stats.numDocs},"out":"$out"}""")

      case "curate" =>
        // training-data curation over a transcripts table: exact dedup →
        // language filter → quality band (pipeline/Curation.scala), writing
        // the surviving (docId, lang_pred, quality) plus the curated turns
        val turns = spark.read.parquet(opt("input")).as[Turn]
        val langs = opt.get("langs").map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
        val minQ = opt.getOrElse("min-quality", "0.5").toDouble
        val base = turns.toDF().withColumn("docId", Transcripts.docIdCol)
        val t0 = System.nanoTime()
        val kept = graft.pipeline.Curation.curate(base, "docId", "text", langs, minQ)
        kept.write.mode("overwrite").parquet(s"${opt("out")}/curated_ids")
        val curated = base.join(kept.select(col("id").as("docId")), Seq("docId"), "left_semi")
        curated.drop("docId").write.mode("overwrite").parquet(s"${opt("out")}/turns")
        val (in, outN) = (turns.count(), curated.count())
        println(s"""{"input_turns":$in,"curated_turns":$outN,"sec":${(System.nanoTime() - t0) / 1e9},"out":"${opt("out")}"}""")

      case "index-fielded" =>
        // per-field postings + dict + stats over the transcripts' natural
        // fields (contents / role / tool) — the reference's one-Lucene-
        // index-per-field mode as a prebuilt, term-pruned parquet layout.
        // Default = FRESH build (the out dir is cleared first): stage-resume
        // trusts committed stages, so reusing a dir across DIFFERENT
        // corpora would silently return the old index. Pass --resume to
        // crash-recover an interrupted build of the SAME input.
        val turns = spark.read.parquet(opt("input")).as[Turn]
        val outDir = opt("out")
        if (!opt.contains("resume")) {
          // Clear ONLY the known stage subdirs, never the whole --out path:
          // a mistyped or shared directory (--out ~/data) must not be wiped.
          // A non-empty dir that does not look like a (possibly partial)
          // fielded index is refused outright.
          val p = new org.apache.hadoop.fs.Path(outDir)
          val pfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val stages = Seq("postings", "dict", "stats", "fdocs", "fblocks")
          if (pfs.exists(p)) {
            val entries = pfs.listStatus(p).map(_.getPath.getName).toSet
            val foreign = entries -- stages
            require(foreign.isEmpty,
              s"--out $outDir holds non-index entries ${foreign.mkString(", ")} — " +
                "refusing to clear it; point --out at an empty or fielded-index directory")
            stages.foreach { s =>
              val sp = new org.apache.hadoop.fs.Path(p, s)
              if (pfs.exists(sp)) pfs.delete(sp, true)
            }
          }
        }
        val t0 = System.nanoTime()
        val fidxBuilt = graft.index.FieldedIndex.build(
          graft.index.FieldedIndex.fromTurns(turns, tag), outDir,
          shards = opt.getOrElse("shards", "0").toInt)
        // --blocks: additionally cut the per-(field, term) block-max stage
        // (fdocs + fblocks) so search-fielded --blockmax can early-terminate
        if (opt.contains("blocks"))
          graft.index.FieldedBlocks.build(fidxBuilt, outDir,
            docsPerShard = opt.getOrElse("docs-per-shard", (1L << 20).toString).toLong)
        println(s"""{"fielded_index":"$outDir","blocks":${opt.contains("blocks")},"sec":${(System.nanoTime() - t0) / 1e9}}""")

      case "search-fielded" =>
        // DisMax + minimum-should-match over a prebuilt fielded index;
        // boosts as field:weight pairs (default the natural-field trio)
        require(graft.index.FieldedIndex.exists(spark, opt("index")),
          s"no fielded index at ${opt("index")} — build one with index-fielded")
        val fidx = graft.index.FieldedIndex.load(spark, opt("index"))
        val topics = loadTopics(opt("topics"), opt.getOrElse("format", "tsv"))
        val model = Scoring.parse(opt.getOrElse("model", "BM25k0.9b0.4"))
        // defaults merged UNDER the user's pairs: a partial --boosts list
        // overrides only the named fields (an unlisted field would
        // otherwise score 0 — it still satisfies minimum-should-match but
        // contributes nothing, a silently degenerate ranking)
        val defaultBoosts = Map("role" -> 0.9, "tool" -> 0.7, "contents" -> 0.3)
        val boosts = defaultBoosts ++ opt.get("boosts")
          .map(_.split(',').map { kv =>
            kv.split(':') match {
              case Array(f, w) => f -> w.toDouble
              case _ => throw new IllegalArgumentException(
                s"malformed --boosts entry '$kv' (expected field:weight, e.g. role:0.9,contents:0.3)")
            }
          }.toMap)
          .getOrElse(Map.empty)
        val t0 = System.nanoTime()
        // --blockmax: early-terminating WAND over the prebuilt block stage
        // (requires index-fielded --blocks); same ranking as the flat path
        val ranked =
          if (opt.contains("blockmax")) {
            require(graft.index.FieldedBlocks.exists(spark, opt("index")),
              s"no fielded block stage at ${opt("index")} — build with index-fielded --blocks")
            graft.query.FieldedBlockMax.search(
              graft.index.FieldedBlocks.load(spark, opt("index")), topics, model,
              k = opt.getOrElse("k", "1000").toInt, boosts = boosts, tag = tag)
          } else
            graft.query.Fielded.searchIndexed(fidx, topics, model,
              k = opt.getOrElse("k", "1000").toInt, boosts = boosts, tag = tag)
        opt.get("out") match {
          case Some(out) => Trec.writeRun(ranked, model.name, out)
          case None      => ranked.orderBy("qid", "rank").show(50, truncate = false)
        }
        println(s"""{"topics":${topics.size},"model":"${model.name}","sec":${(System.nanoTime() - t0) / 1e9}}""")

      case "spam-roc" =>
        // spam intrinsic evaluation (RocTool): input = parquet of judged
        // (docId, grade, percentile[, odds]) rows; emits the per-threshold
        // confusion/ROC table as headered CSV
        val labeled = spark.read.parquet(opt("input"))
        val roc = opt.getOrElse("mode", "percentile") match {
          case "odds" => graft.eval.Spam.rocOdds(labeled, uniq = opt.contains("uniq"))
          case _      => graft.eval.Spam.rocPercentile(labeled, uniq = opt.contains("uniq"))
        }
        roc.orderBy("threshold").coalesce(1)
          .write.mode("overwrite").option("header", "true").csv(opt("out"))
        println(s"""{"roc":"${opt("out")}","mode":"${opt.getOrElse("mode", "percentile")}"}""")

      case other => throw new IllegalArgumentException(s"unknown subcommand: $other")
    }
    spark.stop()
  }
}
