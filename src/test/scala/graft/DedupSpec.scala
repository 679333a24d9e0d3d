package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup
import graft.pipeline.Dedup._

/** MinHash/SimHash/Jaccard kernel properties + distributed dedup paths. */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val rng = new scala.util.Random(42)

  private def randomTokens(n: Int): Seq[String] =
    Seq.fill(n)("w" + rng.nextInt(500))

  test("minhash signature agreement estimates jaccard (property)") {
    (1 to 30).foreach { _ =>
      val base = randomTokens(200).toSet
      val removeN = rng.nextInt(100)
      val b = base.drop(removeN) ++ Set.fill(rng.nextInt(50))("x" + rng.nextInt(1000))
      val j = jaccard(base, b)
      val est = signatureSimilarity(
        minhashSignature(base, 256), minhashSignature(b, 256))
      assert(math.abs(j - est) < 0.15, s"jaccard=$j est=$est")
    }
  }

  test("identical sets → identical signatures; disjoint → near-zero agreement") {
    val a = randomTokens(100).toSet
    assert(signatureSimilarity(minhashSignature(a, 64), minhashSignature(a, 64)) == 1.0)
    val b = (1 to 100).map("zzz" + _).toSet
    assert(signatureSimilarity(minhashSignature(a, 64), minhashSignature(b, 64)) < 0.15)
  }

  test("simhash: small edits → small hamming distance; unrelated → large") {
    val doc = randomTokens(300)
    val edited = doc.updated(5, "changed").updated(100, "words")
    val unrelated = (1 to 300).map("u" + _)
    val d1 = hamming(simhash64(doc), simhash64(edited))
    val d2 = hamming(simhash64(doc), simhash64(unrelated))
    assert(d1 < 12, s"edit distance $d1")
    assert(d2 > 20, s"unrelated distance $d2")
  }

  test("hash64 is deterministic and spreads") {
    assert(hash64("abc") == hash64("abc"))
    assert(hash64("abc") != hash64("abd"))
    assert(hash64("abc", 1) != hash64("abc", 2))
  }

  test("exactGroups finds planted duplicates, dropExactDuplicates removes them") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "d e f"), (3L, "a b c"), (4L, "g h"), (5L, "a b c"))
      .toDF("doc_id", "text")
    val groups = exactGroups(df, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_dups") == 3)
    assert(groups.head.getAs[Long]("canonical_id") == 1L)
    assert(dropExactDuplicates(df, "doc_id", "text").count() == 3)
  }

  test("minhashLsh surfaces exact duplicates with jaccard 1.0 and no self-pairs") {
    import spark.implicits._
    val texts = (0 until 40).map(i => (i.toLong, randomTokens(60).mkString(" ")))
    val withDups = texts ++ Seq((100L, texts(3)._2), (101L, texts(7)._2))
    val df = withDups.toDF("doc_id", "text")
    val pairs = minhashLsh(df, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 3L && b == 100L && j == 1.0 })
    assert(pairs.exists { case (a, b, j) => a == 7L && b == 101L && j == 1.0 })
    assert(pairs.forall { case (a, b, _) => a < b })
  }

  test("simhashPairs finds near-identical docs via chunk buckets") {
    import spark.implicits._
    val base = randomTokens(200)
    val near = base.updated(0, "tweak")
    val df = (Seq((1L, base.mkString(" ")), (2L, near.mkString(" "))) ++
      (10 until 30).map(i => (i.toLong, randomTokens(200).mkString(" "))))
      .toDF("doc_id", "text")
    val pairs = simhashPairs(df, "doc_id", "text", maxDist = 6).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }
}
