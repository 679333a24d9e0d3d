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
}
