package graft

import org.apache.spark.sql.SparkSession

import graft.data.Transcripts
import graft.index.IndexBuild
import graft.model.Turn

/**
 * Two-cluster-size scaling protocol (BASELINE.md): the same index build on
 * the same input at two local parallelism levels stands in for N vs 4N
 * executors. The transcripts table is materialized to parquet first
 * (untimed — input always exists in the lake); the timed region is the full
 * index build reading that table, including the id-assignment range shuffle
 * (the general, unsorted-input path). Run:
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
    val shuffle = sys.env.get("SPARK_GRAFT_SHUFFLE")
    // honor a master provided by spark-submit (e.g. local-cluster[N,c,m] for
    // real multi-executor JVMs); fall back to local[cpus] under sbt
    val builder = SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val withMaster =
      if (sys.props.contains("spark.master")) builder
      else builder.master(s"local[$cpus]")
    val spark = shuffle.fold(withMaster)(s => withMaster.config("spark.sql.shuffle.partitions", s))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val master = spark.sparkContext.master
    val parallelism = spark.sparkContext.defaultParallelism

    if (sys.env.contains("SPARK_GRAFT_STAGELOG")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
          val m = i.taskMetrics
          System.err.println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d wall=${ms / 1000.0}%8.2fs " +
            f"cpu=${m.executorCpuTime / 1e9}%8.1fs run=${m.executorRunTime / 1e3}%8.1fs " +
            f"gc=${m.jvmGCTime / 1e3}%6.1fs ${i.name.take(60)}")
        }
      })
    }

    // SPARK_GRAFT_SORTED=1: time the flagship sorted-lake path instead —
    // input already cluster-sorted by the stable turn ordering (the 10^12
    // production shape per the north rule), so the build runs with ZERO
    // full-data shuffles. The generator's rows are produced inside the timed
    // region (a parquet read cannot reconstruct cross-partition order —
    // Spark packs splits by size; an ordered lake table / Iceberg sort-order
    // scan would); generation is seeded column math that scales linearly,
    // disclosed in BENCH/BASELINE.md.
    val sorted = sys.env.contains("SPARK_GRAFT_SORTED")
    val idxDir = java.nio.file.Files.createTempDirectory(s"graft-scale-$cpus").toString

    val (turns, inputSorted) =
      if (sorted) {
        // untimed: materialize the sorted "lake table" as a serialized
        // columnar cache — stable partitioning + in-partition order (what an
        // ordered lake table scan provides; a plain parquet round-trip would
        // scramble cross-partition order by size-packed splits)
        // partitions from the shuffle-partitions setting, NOT defaultParallelism:
        // under local-cluster the latter reads 2 before executors register,
        // which starves a 16-core cluster with 8 input partitions
        val t = Transcripts.generate(spark, turnsTotal / 8, 8,
          partitions = 2 * spark.sessionState.conf.numShufflePartitions)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        t.foreach(_ => ())
        (t, true)
      } else {
        // untimed: materialize the input table (fixed seed, fixed row count)
        val inputDir = s"/tmp/graft-scale-input-$turnsTotal"
        if (!new java.io.File(s"$inputDir/_SUCCESS").exists()) {
          Transcripts.generate(spark, turnsTotal / 8, 8, partitions = 128)
            .write.mode("overwrite").parquet(inputDir)
        }
        (spark.read.parquet(inputDir).as[Turn], false)
      }

    val t0 = System.nanoTime()
    try {
      IndexBuild.build(turns, idxDir, docsPerShard = 16384, inputSorted = inputSorted)
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"bench":"scale","path":"${if (sorted) "sorted" else "general"}","master":"$master","parallelism":$parallelism,"shuffle_partitions":${spark.sessionState.conf.numShufflePartitions},"turns":$turnsTotal,"sec":$sec,"turns_per_sec":${turnsTotal / sec}}""")
    } finally {
      // the measured index is throwaway — 3.2 GB per leg at 16M turns, and
      // leftovers degrade later legs (round-4's ENOSPC; round-5 measured a
      // monotone in-session decline with 41 GB of dead dirs accumulated)
      import scala.reflect.io.Directory
      new Directory(new java.io.File(idxDir)).deleteRecursively()
    }
    spark.stop()
  }
}
