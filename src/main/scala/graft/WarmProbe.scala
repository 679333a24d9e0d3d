package graft
import org.apache.spark.sql.SparkSession
import graft.data.Transcripts
import graft.index.IndexBuild
import graft.model.Topic
import graft.query.{BlockMaxWand, Scoring}
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val turns = Transcripts.generate(spark, 25000, 8)
    (1 to 4).foreach { i =>
      val d = java.nio.file.Files.createTempDirectory(s"wp$i").toString
      println(f"build$i: ${time(IndexBuild.build(turns, d, docsPerShard = 1563, inputSorted = true))}%.2f")
      if (i == 1) {
        val idx = IndexBuild.load(spark, d)
        val topics = Seq(Topic(1, "w0 w3"), Topic(2, "needle0 needle7"), Topic(3, "w1 w2 w5"))
        (1 to 5).foreach { j =>
          println(f"bmw$j: ${time(BlockMaxWand.search(idx, topics, Scoring.BM25c(0.9, 0.4), 1000).count())}%.2f") }
      }
      new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
    }
    spark.stop()
  }
}
