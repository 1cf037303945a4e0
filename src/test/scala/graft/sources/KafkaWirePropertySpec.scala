package graft.sources

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Randomized codec pins for the hand-rolled Kafka v0 wire: arbitrary
  * binary keys/values (nulls, empties, high bytes) must survive a
  * message-set roundtrip byte-for-byte, and EVERY truncation point of an
  * encoded set must decode to exactly the whole-message prefix — the
  * invariant fetch responses rely on when max_bytes cuts mid-message.
  */
class KafkaWirePropertySpec extends AnyFunSuite {

  private val bytesGen: Gen[Array[Byte]] = Gen.frequency(
    1 -> Gen.const(null: Array[Byte]),
    1 -> Gen.const(Array.empty[Byte]),
    4 -> Gen.choose(1, 512).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))

  private val recordsGen: Gen[List[(Array[Byte], Array[Byte])]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.zip(bytesGen, bytesGen)))

  private def sample(n: Int): Seq[List[(Array[Byte], Array[Byte])]] =
    LazyList.from(0)
      .map(i => recordsGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
      .flatten.take(n).toList

  private def eq(a: Array[Byte], b: Array[Byte]): Boolean =
    (a == null && b == null) || (a != null && b != null && java.util.Arrays.equals(a, b))

  test("message-set roundtrip is byte-exact for arbitrary binary keys/values") {
    sample(60).foreach { recs =>
      val decoded = KafkaWire.decodeMessageSet(KafkaWire.encodeMessageSet(recs))
      assert(decoded.size == recs.size)
      decoded.zip(recs).zipWithIndex.foreach { case ((got, (k, v)), i) =>
        assert(got.offset == i.toLong)
        assert(eq(got.key, k), s"key mismatch at $i")
        assert(eq(got.value, v), s"value mismatch at $i")
      }
    }
  }

  test("every truncation point decodes exactly the whole-message prefix") {
    sample(15).filter(_.nonEmpty).foreach { recs =>
      val whole = KafkaWire.encodeMessageSet(recs)
      // entry boundaries: cumulative encoded sizes
      val bounds = recs.scanLeft(0) { case (acc, (k, v)) =>
        acc + KafkaWire.encodeMessageSet(Seq((k, v))).length
      }
      for (cut <- 0 to whole.length) {
        val got = KafkaWire.decodeMessageSet(java.util.Arrays.copyOfRange(whole, 0, cut))
        val expect = bounds.count(_ <= cut) - 1 // complete entries within the cut
        assert(got.size == expect,
          s"cut=$cut decoded ${got.size}, expected $expect (bounds=$bounds)")
      }
    }
  }
}
