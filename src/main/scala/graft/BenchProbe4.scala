package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: d3 minhashLsh stage timing at sf0.1 (guide §1: measure before
 * touching the adaptive pre-filter machinery). */
object BenchProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe4] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val corpus = docs.unionByName(docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") >= 25 && col("doc_id") < 50)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" xnearx")).as("text")))
    corpus.count()
    (1 to 2).foreach { i =>
      // signed+banded+collided manually, mirroring Dedup.minhashLsh
      val numHashes = 32
      val signed = time(s"#$i signed map+cache+count") {
        val s2 = corpus.select(col("doc_id").cast("long").as("id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            (id, graft.pipeline.Dedup.minhashSignature(
              graft.pipeline.Dedup.shingles(graft.analysis.Analyzer.analyze(text), 3), numHashes, 42L))
          }
          .toDF("id", "sig").cache()
        s2.count(); s2
      }
      val banded = signed.select(col("id"),
        posexplode(org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(7)),
          b => hash(b, slice(col("sig"), b * 4 + 1, lit(4))))).as(Seq("band", "bandHash")))
      val collided = time(s"#$i band self-join+distinct+cache+count") {
        val c = banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bandHash") === col("b.bandHash") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("id1"), col("b.id").as("id2"))
          .distinct().cache()
        c.count(); c
      }
      time(s"#$i verify joins (noop)") {
        val candIds = collided.select(col("id1").as("id"))
          .unionByName(collided.select(col("id2").as("id"))).distinct()
        val candShingles = corpus
          .select(col("doc_id").cast("long").as("id"), col("text"))
          .join(candIds, Seq("id"), "left_semi")
          .as[(Long, String)]
          .map { case (id, text) =>
            (id, graft.pipeline.Dedup.shingles(graft.analysis.Analyzer.analyze(text), 3).toSeq) }
          .toDF("id", "shingles")
        collided
          .join(candShingles.select(col("id").as("id1"), col("shingles").as("sh1")), "id1")
          .join(candShingles.select(col("id").as("id2"), col("shingles").as("sh2")), "id2")
          .withColumn("jaccard",
            size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
              size(array_union(col("sh1"), col("sh2"))).cast("double"))
          .filter(col("jaccard") >= 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      signed.unpersist(); collided.unpersist()
    }
    spark.stop()
  }
}
