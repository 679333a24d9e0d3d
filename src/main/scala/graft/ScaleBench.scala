package graft

import org.apache.spark.sql.SparkSession

import graft.data.Transcripts
import graft.index.IndexBuild

/**
 * Two-cluster-size scaling protocol (BASELINE.md): the same index build on
 * the same input at two local parallelism levels stands in for N vs 4N
 * executors. Run twice:
 *
 *   SPARK_GRAFT_CPUS=8  SPARK_GRAFT_SHUFFLE=32  runMain graft.ScaleBench <turns>
 *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=128 runMain graft.ScaleBench <turns>
 *
 * and report efficiency = throughput(32) / (4 × throughput(8)).
 * Prints one JSON line per run.
 */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val turnsTotal = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", (cpus * 4).toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val turns = Transcripts.generate(spark, turnsTotal / 8, 8, partitions = shuffle)
    val idxDir = java.nio.file.Files.createTempDirectory(s"graft-scale-$cpus").toString
    val t0 = System.nanoTime()
    IndexBuild.build(turns, idxDir, docsPerShard = math.max(turnsTotal / shuffle, 1000))
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"bench":"scale","cpus":$cpus,"shuffle_partitions":$shuffle,"turns":$turnsTotal,"sec":$sec,"turns_per_sec":${turnsTotal / sec}}""")
    spark.stop()
  }
}
