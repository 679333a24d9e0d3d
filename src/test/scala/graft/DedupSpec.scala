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

  test("minhashLsh signature pre-filter: output unchanged vs disabled, no UDF in the filter") {
    import spark.implicits._
    // corpus with planted near-dups at several similarity levels plus
    // unrelated docs that still band-collide occasionally
    val base = (0 until 60).map(i => (i.toLong, randomTokens(80)))
    val variants = Seq(
      (200L, base(2)._2),                                  // J = 1
      (201L, base(5)._2.drop(8) ++ randomTokens(8)),       // high J
      (202L, base(9)._2.take(40) ++ randomTokens(40)))     // mid J
    val df = (base.map { case (i, t) => (i, t.mkString(" ")) } ++
      variants.map { case (i, t) => (i, t.mkString(" ")) }).toDF("doc_id", "text")
    def run(margin: Double) =
      minhashLsh(df, "doc_id", "text", threshold = 0.5, preFilterMargin = margin,
          preFilterMinPairs = 0L) // force the adaptive switch ON for the pin
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = run(0.25)
    val disabled = run(0.5) // cutoff 0 — pre-filter off
    assert(filtered == disabled,
      s"pre-filter changed the verified output:\n  missing=${disabled -- filtered}\n  extra=${filtered -- disabled}")
    // the agreement filter must be column math, not a UDF
    val plan = minhashLsh(df, "doc_id", "text", threshold = 0.5, preFilterMinPairs = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF("),
      s"signature pre-filter must stay codegen'd:\n$plan")
  }

  test("minhashLsh caches only (id, sig) — shingle sets are never pinned") {
    import spark.implicits._
    val texts = (0 until 20).map(i => (i.toLong, randomTokens(40).mkString(" ")))
    val df = (texts ++ Seq((50L, texts(1)._2))).toDF("doc_id", "text")
    val out = minhashLsh(df, "doc_id", "text", threshold = 0.9)
    out.collect()
    val cachedCols = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.output.map(_.name)
    }.flatten
    assert(cachedCols.nonEmpty, "expected a cached signature frame in the plan")
    assert(!cachedCols.contains("shingles"),
      s"full-corpus shingle arrays must not be cached (pinned: ${cachedCols.mkString(",")})")
  }

  test("simhashPairs: identical-fingerprint mass collapses before the bucket join") {
    import spark.implicits._
    // 120 byte-identical docs (one degenerate fingerprint) + one near-dup +
    // background docs: output must contain all C(120,2) intra pairs at dist 0
    // and the cross pair, with the chunk join running over DISTINCT
    // fingerprints (plan carries the groupBy(simhash) aggregate)
    val base = randomTokens(150)
    val same = (0 until 120).map(i => (i.toLong, base.mkString(" ")))
    val near = Seq((500L, base.updated(0, "tweak").mkString(" ")))
    val bg = (600 until 610).map(i => (i.toLong, randomTokens(150).mkString(" ")))
    val df = (same ++ near ++ bg).toDF("doc_id", "text")
    val pairs = simhashPairs(df, "doc_id", "text", maxDist = 6)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val intra = rows.filter { case (a, b, _) => a < 120 && b < 120 }
    assert(intra.length == 120 * 119 / 2, s"expected all intra pairs, got ${intra.length}")
    assert(intra.forall(_._3 == 0))
    assert(rows.count { case (a, b, _) => b == 500L && a < 120 } == 120,
      "every member of the identical group must pair with the near-dup")
    assert(rows.distinct.length == rows.length, "no duplicate pairs")
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
