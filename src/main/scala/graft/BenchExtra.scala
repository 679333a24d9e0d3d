package graft

import org.apache.spark.sql.SparkSession

import graft.driver.DriverQueries

/**
 * Optimization-round instrumentation (guide §1: measure first). NOT the
 * driver bench — [[Bench]] stays frozen. This main
 *
 *  1. times each WARMUP component of the gate suite individually (the
 *     frozen bench reports them as one `warmup_sec` blob, which at sf0.1 is
 *     ~45% of the headline metric),
 *  2. times every declared gate query via the noop sink (guide §1.4) so
 *     the computation is measured, not the count()'s column pruning,
 *  3. optionally dumps `.explain("formatted")` for every gate to
 *     `$SPARK_GRAFT_PLANS_DIR` (one file per gate) for plan-diff evidence.
 *
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench),
 * SPARK_GRAFT_PLANS_DIR (optional), SPARK_GRAFT_ONLY (optional
 * comma-separated gate subset), SPARK_GRAFT_REPS (per-gate reps, default 1).
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
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

    // 1. warmup components, individually (same order as Bench)
    val warm = Seq[(String, () => Any)](
      "w_termDocs" -> (() => DriverQueries.termDocs(spark, sfDir)),
      "w_docs" -> (() => DriverQueries.docs(spark, sfDir)),
      "w_dict" -> (() => DriverQueries.dict(spark, sfDir)),
      "w_corpusStats" -> (() => DriverQueries.corpusStats(spark, sfDir)),
      "w_index" -> (() => DriverQueries.index(spark, sfDir)),
      "w_fielded_split" -> (() => DriverQueries.fieldedIndex(spark, sfDir, "split")),
      "w_fielded_natural" -> (() => DriverQueries.fieldedIndex(spark, sfDir, "natural")),
      "w_fielded_blocks" -> (() => DriverQueries.fieldedBlockIndex(spark, sfDir, "split"))
    ).map { case (name, f) =>
      spark.sparkContext.setJobDescription(name)
      val s = time(f())
      name -> s
    }

    // 2. gates via noop sink
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_(name)) }
      .map { case (name, fn) =>
        spark.sparkContext.setJobDescription(name)
        val secs = (0 until reps).map { _ =>
          try time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
          catch { case _: Throwable => -1.0 }
        }
        plansDir.foreach { d =>
          try {
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val p = java.nio.file.Paths.get(d)
            java.nio.file.Files.createDirectories(p)
            java.nio.file.Files.writeString(p.resolve(s"$name.txt"), plan)
          } catch { case e: Throwable => System.err.println(s"[benchx] plan $name: $e") }
        }
        name -> secs.min
      }
    spark.sparkContext.setJobDescription(null)

    val wj = warm.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qj = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json = s"""{"benchx":true,"sf":"$sfDir","cpus":$cpus,"reps":$reps,""" +
      s""""warmup_total":${warm.map(_._2).sum},"warmup":$wj,""" +
      s""""queries_total":${results.map(_._2).filter(_ > 0).sum},"queries":$qj}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCHX_OUT", "BENCH/benchx_last.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json + "\n")
    } catch { case e: Throwable => System.err.println(s"[benchx] file write failed: $e") }
    println(json)
    spark.stop()
  }
}
