package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** ANN: brute-force correctness vs a naive Scala loop; LSH recall sanity. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val rng = new scala.util.Random(42)
  private val DIM = 16
  private val N = 120

  private lazy val vecs: Seq[(Long, Array[Float])] =
    (0L until N).map(i => (i, Array.fill(DIM)(rng.nextFloat() * 2 - 1)))

  private lazy val df = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until DIM).foreach { i =>
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("brute-force top-k matches a naive scala loop") {
    import org.apache.spark.sql.functions.col
    val got = Similarity.bruteForceTopK(df, df.filter(col("vec_id") < 3), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    (0L until 3L).foreach { q =>
      val qv = vecs(q.toInt)._2
      val want = vecs.filter(_._1 != q)
        .map { case (id, v) =>
          (id, BigDecimal(cosine(qv, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got(q) == want, s"query $q")
    }
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    import org.apache.spark.sql.functions.col
    val queries = df.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(df, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(df, queries, k = 5, planes = 8, dim = DIM, probeBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    // uniform random vectors are the worst case for sign-LSH; with 2-bit
    // multi-probe over 8 planes ~14% of buckets are probed — recall must
    // clearly beat that random-sampling baseline
    assert(recall >= 0.3, s"recall $recall")
  }

  test("lshBucketCol (codegen'd column math) ≡ lshBucketUdf bit-for-bit; no UDF on the corpus scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(11)
    val vecs = (0L until 100L).map(i => (i, Array.fill(DIM)(rng.nextFloat() * 2 - 1))) :+
      (100L, Array.fill(DIM / 2)(0.25f)) // shorter than dim: missing dims contribute 0
    val df = vecs.toDF("vec_id", "embedding")
    val both = df.select(col("vec_id"),
        Similarity.lshBucketCol(col("embedding"), planes = 12, dim = DIM, seed = 42L).as("c"),
        Similarity.lshBucketUdf(12, DIM, 42L)(col("embedding")).as("u"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"bucket diverged for vec ${r.getLong(0)}: col=${r.getLong(1)} udf=${r.getLong(2)}"))
    // and the corpus-side plan of lshTopK carries no scala UDF (the only
    // UDF left is the tiny multi-probe expansion on the broadcast side)
    val plan = df.select(
      Similarity.lshBucketCol(col("embedding"), 12, DIM, 42L).as("bucket"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), s"UDF in the bucket scan:\n$plan")
  }

  test("cosine of identical vectors is 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val two = Seq((0L, Array.fill(DIM)(0.5f)), (1L, Array.fill(DIM)(0.5f))).toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(two, two.filter(col("vec_id") === 0), k = 1).collect().head
    assert(r.getDouble(3) == 1.0)
  }

  // ---------------------------------------------------------------- IVF

  test("trainCentroids is deterministic and returns `cells` centroids") {
    val a = Similarity.trainCentroids(df, cells = 8, dim = DIM, sampleN = 64)
    val b = Similarity.trainCentroids(df, cells = 8, dim = DIM, sampleN = 64)
    assert(a.length == 8 && a.forall(_.length == DIM))
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("ivfCellCol (codegen'd column math) ≡ ivfCell bit-for-bit; no UDF on the corpus scan") {
    import org.apache.spark.sql.functions.col
    val centroids = Similarity.trainCentroids(df, cells = 8, dim = DIM, sampleN = 64)
    val got = df.select(col("vec_id"),
        Similarity.ivfCellCol(col("embedding"), centroids).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == Similarity.ivfCell(v.toSeq, centroids), s"cell diverged for vec $id")
    }
    val plan = df.select(Similarity.ivfCellCol(col("embedding"), centroids).as("cell"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), s"UDF in the cell scan:\n$plan")
  }

  test("probeCells: nearest probe is the vector's own cell; nprobe=cells covers all cells") {
    val centroids = Similarity.trainCentroids(df, cells = 8, dim = DIM, sampleN = 64)
    vecs.take(20).foreach { case (_, v) =>
      assert(Similarity.probeCells(v.toSeq, centroids, 1).head == Similarity.ivfCell(v.toSeq, centroids))
    }
    assert(Similarity.probeCells(vecs.head._2.toSeq, centroids, 8).sorted == (0 until 8))
  }

  test("IVF with exhaustive probing reproduces brute force exactly") {
    import org.apache.spark.sql.functions.col
    val queries = df.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(df, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).sorted.toSeq
    val ivf = Similarity.ivfTopK(df, queries, k = 5, cells = 8, nprobe = 8, dim = DIM, sampleN = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).sorted.toSeq
    assert(ivf == brute)
  }

  test("IVF planted copy comes back at cosine 1.0 with nprobe=1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val queries = df.filter(col("vec_id") < 10)
    val copies = vecs.take(10).map { case (id, v) => (id + 500000L, v) }
    val corpus = df.unionByName(copies.toDF("vec_id", "embedding"))
    val got = Similarity.ivfTopK(corpus, queries, k = 5, cells = 8, nprobe = 1, dim = DIM, sampleN = 64)
      .filter(col("id") === col("qid") + 500000L)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    (0L until 10L).foreach { q => assert(got.get(q).contains(1.0), s"planted copy lost for query $q") }
  }

  test("IVF partial probing beats the probed-cell-fraction recall baseline") {
    import org.apache.spark.sql.functions.col
    val queries = df.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(df, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(df, queries, k = 5, cells = 8, nprobe = 2, dim = DIM, sampleN = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    // probing 2 of 8 cells at random would give ~25%; the quantizer must beat it
    assert(recall >= 0.4, s"recall $recall")
  }
}
