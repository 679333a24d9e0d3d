package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.Transcripts

/**
 * Deterministic bigger-scale bench point (round-3 VERDICT #10): derive a
 * 10× "sf1" table set from the driver's sf0.1 parquet, so the gate suite
 * can be TIMED at a scale where fixed overheads stop dominating. No
 * external data — replica k of a document keeps its metadata but suffixes
 * every token with "r<k>" (disjoint vocabulary per replica: result sizes
 * stay comparable to sf0.1 while scan/shuffle volume grows 10×); replica k
 * of an embedding rotates the vector by k positions (norm-preserving,
 * deterministic). Replica 0 is the original data byte-for-byte.
 *
 * Usage: runMain graft.BenchData <srcSfDir> <outDir> [replicas]
 */
object BenchData {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    if (new java.io.File(s"$out/_DONE").exists()) { println(s"exists: $out"); return }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Transcripts.table(spark, src, "documents")
    val nDocs = docs.count()
    val reps = spark.range(0, replicas).select(col("id").cast("int").as("rep"))
    docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("rep").cast("long") * nDocs).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(
          // suffix every token: "a b" -> "ar3 br3" for replica 3
          concat(array_join(transform(split(col("text"), " "),
            t => concat(t, lit("r"), col("rep").cast("string"))), " "))).as("text"),
        col("lang"), col("source"),
        when(col("rep") === 0, col("n_chars"))
          .otherwise(length(concat(array_join(transform(split(col("text"), " "),
            t => concat(t, lit("r"), col("rep").cast("string"))), " ")))).as("n_chars"))
      .repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Transcripts.table(spark, src, "embeddings")
    val nEmb = emb.count()
    emb.crossJoin(reps)
      .select(
        (col("vec_id") + col("rep").cast("long") * nEmb).as("vec_id"),
        // rotate the vector by (rep mod dim) positions (deterministic,
        // norm-preserving; mod keeps the shift valid past dim replicas)
        expr("""concat(
            slice(embedding, pmod(rep, size(embedding)) + 1,
                  size(embedding) - pmod(rep, size(embedding))),
            slice(embedding, 1, pmod(rep, size(embedding))))""")
          .as("embedding"),
        col("label"))
      .repartition(4).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // remaining tables: pass through unchanged (gates don't scale on them)
    Seq("events", "lineitem", "orders", "customer", "nation", "region", "part", "supplier")
      .foreach { t =>
        if (new java.io.File(s"$src/$t.parquet").exists())
          Transcripts.table(spark, src, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    new java.io.File(s"$out/_DONE").createNewFile()
    println(s"""{"bench_data":"$out","replicas":$replicas,"docs":${nDocs * replicas},"embeddings":${nEmb * replicas}}""")
    spark.stop()
  }
}
