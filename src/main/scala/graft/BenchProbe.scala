package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.driver.DriverQueries

/** Throwaway measurement probe for optimization round 6 (guide §1):
 *  1. p2-style warm-path timing (is the 3.4 s planning/stage overhead?)
 *  2. FieldedIndex/FieldedBlocks/IndexBuild per-stage breakdown.
 * Not part of the bench contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // -- warm the shared caches like the bench does
    time("warm termDocs")(DriverQueries.termDocs(spark, sfDir))
    time("warm docs+dict+stats") {
      DriverQueries.docs(spark, sfDir); DriverQueries.dict(spark, sfDir)
      DriverQueries.corpusStats(spark, sfDir)
    }

    // -- 1. p2 warm path: build sweep caches via ls1's inputs, then time p2 3×
    val queries = SparkEntry.queries
    time("ls1 (builds sweep caches)")(queries("ls1_learn_select")(spark, sfDir).count())
    (1 to 3).foreach { i =>
      time(s"p1 warm #$i")(queries("p1_param_sweep")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      time(s"p2 warm #$i")(queries("p2_param_best")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    // x5 for reference
    (1 to 2).foreach { i =>
      time(s"x5 warm #$i")(queries("x5_repetition_stats")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }

    // -- 2. fielded index build stage breakdown (replicates FieldedIndex.build)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val fdir = tmp("probe-fidx")
    val src = time("fielded split source plan (no exec)") {
      // same construction as DriverQueries.fieldedSplitSource via reflection-free copy
      val docs = graft.data.Transcripts.table(spark, sfDir, "documents")
        .select(concat(lit("doc-"), col("doc_id").cast("string"), lit("#0")).as("docId"),
          split(col("text"), " ").as("toks"))
      docs
        .select(col("docId"), lit("title").as("field"), slice(col("toks"), 1, 8).as("ftoks"))
        .unionByName(docs.select(col("docId"), lit("contents").as("field"),
          expr("slice(toks, 9, greatest(size(toks) - 8, 0))").as("ftoks")))
        .filter(size(col("ftoks")) > 0)
        .select(col("docId"), col("field"), size(col("ftoks")).cast("long").as("docLen"),
          explode(col("ftoks")).as("term"))
        .groupBy("docId", "field", "term", "docLen")
        .agg(count(lit(1)).as("tf"))
        .select("docId", "field", "term", "tf", "docLen")
    }
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    time("fielded postings range+write") {
      src.repartitionByRange(parts, col("term"), col("field"), col("docId"))
        .sortWithinPartitions("term", "field", "docId")
        .write.mode("overwrite").parquet(s"$fdir/postings")
    }
    val written = spark.read.parquet(s"$fdir/postings")
    time("fielded dict agg+range+write") {
      written.groupBy("field", "term")
        .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
        .repartitionByRange(math.max(1, parts / 4), col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(s"$fdir/dict")
    }
    time("fielded stats agg+write") {
      graft.index.FieldedIndex.fieldStatsOf(written)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$fdir/stats")
    }
    val fidx = graft.index.FieldedIndex.load(spark, fdir)
    time("fielded blocks: fdocs DenseIds+write") {
      graft.index.DenseIds.assign(fidx.postings.select("docId").distinct(), "docIdNum", col("docId"))
        .write.mode("overwrite").parquet(s"$fdir/fdocs")
    }
    time("fielded blocks: join+range+cut+write") {
      import spark.implicits._
      val fdocs = spark.read.parquet(s"$fdir/fdocs")
      val blocksDir = s"$fdir/fblocks"
      fidx.postings.join(fdocs, "docId")
        .select(col("field"), col("term"), col("docIdNum"),
          col("tf").cast("long"), col("docLen").cast("long"))
        .repartitionByRange(parts, col("field"), col("term"), col("docIdNum"))
        .sortWithinPartitions("field", "term", "docIdNum")
        .write.mode("overwrite").parquet(blocksDir)
    }

    // -- 3. IndexBuild breakdown on a fresh dir
    val idir = tmp("probe-idx")
    time("IndexBuild.build full")(
      graft.index.IndexBuild.build(
        graft.data.Transcripts.fromDocuments(spark, sfDir), idir, docsPerShard = 256))

    // cleanup
    Seq(fdir, idir).foreach { d =>
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
