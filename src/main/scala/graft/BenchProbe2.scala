package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: are higher-order-function lambdas (aggregate/zip_with) the cost
 * driver in the ANN cell/bucket/cosine paths? Times the existing column
 * math vs an FP-order-identical JVM kernel on the sf0.1 embeddings. */
object BenchProbe2 {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe2] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    emb.cache().count()

    val centroids = graft.pipeline.Similarity.trainCentroids(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), cells = 16, dim = 64)

    // round-5 form: per-centroid literal arrays (the pre-typedLit shape)
    def oldIvfCellCol(vec: org.apache.spark.sql.Column,
                      cts: Array[Array[Double]]): org.apache.spark.sql.Column = {
      val norm = greatest(graft.pipeline.Similarity.normCol(vec), lit(1e-12))
      val entries = cts.zipWithIndex.map { case (ct, idx) =>
        val row = array(ct.map(lit): _*)
        val dot = aggregate(
          zip_with(vec, row, (x, y) => coalesce(x.cast("double") * y, lit(0.0d))),
          lit(0.0d), (acc, v) => acc + v)
        val cn2 = ct.map(x => x * x).sum
        struct((lit(-2.0d) * (dot / norm) + lit(cn2)).as("dist"), lit(idx).as("idx"))
      }
      array_min(array(entries: _*)).getField("idx")
    }
    (1 to 3).foreach { i =>
      time(s"ivfCellCol OLD literal form #$i") {
        emb.withColumn("cell", oldIvfCellCol(col("v"), centroids))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // column-math form (current)
    (1 to 3).foreach { i =>
      time(s"ivfCellCol column math #$i") {
        emb.withColumn("cell", graft.pipeline.Similarity.ivfCellCol(col("v"), centroids))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // parity: current vs old assignments
    val diffOld = emb.withColumn("c1", graft.pipeline.Similarity.ivfCellCol(col("v"), centroids))
      .withColumn("c2", oldIvfCellCol(col("v"), centroids))
      .filter(col("c1") =!= col("c2")).count()
    println(s"[probe2] typedlit-vs-old diff rows: $diffOld")
    // JVM kernel with identical FP order
    val cellUdf = udf((v: Seq[Float]) => graft.pipeline.Similarity.ivfCell(v, centroids))
    (1 to 3).foreach { i =>
      time(s"ivfCell JVM kernel #$i") {
        emb.withColumn("cell", cellUdf(col("v")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // sanity: bit-identical assignments
    val diff = emb.withColumn("c1", graft.pipeline.Similarity.ivfCellCol(col("v"), centroids))
      .withColumn("c2", cellUdf(col("v")))
      .filter(col("c1") =!= col("c2")).count()
    println(s"[probe2] cell assignment diff rows: $diff")

    // cosineCol on a bounded pair join (d5 shape)
    val a = emb.filter(col("id") < 200).select(col("id").as("id1"), col("v").as("v1"))
    val b = emb.filter(col("id") < 200).select(col("id").as("id2"), col("v").as("v2"))
    (1 to 2).foreach { i =>
      time(s"cosineCol pair join #$i") {
        a.join(b, col("id1") < col("id2"))
          .withColumn("cos", graft.pipeline.Similarity.cosineCol(col("v1"), col("v2")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    val cosUdf = udf { (x: Seq[Float], y: Seq[Float]) =>
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) { dot += x(i).toDouble * y(i).toDouble; i += 1 }
      i = 0
      while (i < x.length) { nx += x(i).toDouble * x(i).toDouble; i += 1 }
      i = 0
      while (i < y.length) { ny += y(i).toDouble * y(i).toDouble; i += 1 }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    (1 to 2).foreach { i =>
      time(s"cosine JVM kernel pair join #$i") {
        a.join(b, col("id1") < col("id2"))
          .withColumn("cos", cosUdf(col("v1"), col("v2")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
