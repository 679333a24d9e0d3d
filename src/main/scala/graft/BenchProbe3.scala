package graft

import org.apache.spark.sql.SparkSession

/** Probe: isolated index-build throughput at the bench's exact shape
 * (200k synthetic turns, sorted path, quiet heap) — to separate host/JVM
 * noise from code effects in the bench's index_build section. */
object BenchProbe3 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val benchTurns = 200000L
    val turns = graft.data.Transcripts.generate(spark, benchTurns / 8, 8)
    val docsPerShard = math.max(benchTurns / (cpus.toInt * 4), 1000)
    (1 to 4).foreach { i =>
      val dir = java.nio.file.Files.createTempDirectory(s"probe3-idx$i").toString
      val t0 = System.nanoTime()
      graft.index.IndexBuild.build(turns, dir, docsPerShard = docsPerShard, inputSorted = true)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe3] build #$i ${sec}%6.2f s  ${benchTurns / sec / 1000}%6.1f k turns/s")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
