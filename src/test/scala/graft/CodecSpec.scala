package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.Codec

/** Codec round-trip property tests (FIXTURES.md §5), randomized with a fixed
 * seed in the reference's own style (`LengthNormalizedTest.java:14-124`). */
class CodecSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  test("delta+varint docId round-trip (1000 random sorted lists)") {
    (1 to 1000).foreach { _ =>
      val n = rng.nextInt(400)
      val arr = Array.fill(n)(rng.nextLong(1L << 40)).distinct.sorted
      assert(Codec.decodeDeltas(Codec.encodeDeltas(arr), arr.length).toSeq == arr.toSeq)
    }
  }

  test("tf varint round-trip (1000 random lists)") {
    (1 to 1000).foreach { _ =>
      val n = rng.nextInt(400)
      val arr = Array.fill(n)(1L + rng.nextLong(1L << 30))
      assert(Codec.decodeTfs(Codec.encodeTfs(arr), arr.length).toSeq == arr.toSeq)
    }
  }

  test("extreme values round-trip") {
    val arr = Array(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue - 1, Long.MaxValue)
    assert(Codec.decodeDeltas(Codec.encodeDeltas(arr), arr.length).toSeq == arr.toSeq)
  }

  test("encoding is compact for dense ids") {
    val arr = Array.tabulate(128)(i => 1000L + i)
    assert(Codec.encodeDeltas(arr).length <= 2 + 127) // gap-1 deltas → 1 byte each
  }

  test("unsorted input rejected") {
    intercept[IllegalArgumentException](Codec.encodeDeltas(Array(5L, 3L)))
    intercept[IllegalArgumentException](Codec.encodeTfs(Array(0L)))
  }
}
