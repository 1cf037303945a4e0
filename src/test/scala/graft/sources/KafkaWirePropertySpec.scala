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

  test("v2 record-batch roundtrip is byte-exact for arbitrary binary keys/values") {
    sample(60).filter(_.nonEmpty).foreach { recs =>
      val base = recs.length.toLong * 31 // arbitrary nonzero base offset
      val decoded = KafkaWire.decodeRecordBatches(
        KafkaWire.encodeRecordBatch(recs, baseOffset = base))
      assert(decoded.size == recs.size)
      decoded.zip(recs).zipWithIndex.foreach { case ((got, (k, v)), i) =>
        assert(got.offset == base + i)
        assert(eq(got.key, k), s"key mismatch at $i")
        assert(eq(got.value, v), s"value mismatch at $i")
      }
    }
  }

  test("v2 multi-batch stream decodes every batch; truncation stops at a batch boundary") {
    sample(10).filter(_.size >= 2).foreach { recs =>
      val (a, b) = recs.splitAt(recs.size / 2)
      val batchA = KafkaWire.encodeRecordBatch(a, baseOffset = 0L)
      val batchB = KafkaWire.encodeRecordBatch(b, baseOffset = a.size.toLong)
      val whole = batchA ++ batchB
      val all = KafkaWire.decodeRecordBatches(whole)
      assert(all.size == recs.size)
      assert(all.map(_.offset) == recs.indices.map(_.toLong))
      // every cut inside batch B must decode exactly batch A (v2 decodes
      // whole batches only — a partial batch is the truncated tail)
      for (cut <- batchA.length until whole.length) {
        val got = KafkaWire.decodeRecordBatches(java.util.Arrays.copyOfRange(whole, 0, cut))
        assert(got.size == a.size, s"cut=$cut decoded ${got.size}, expected ${a.size}")
      }
    }
  }

  test("v2 batch CRC32C catches a flipped payload byte") {
    val batch = KafkaWire.encodeRecordBatch(
      Seq((null, "payload-under-test".getBytes("UTF-8"))))
    val bad = batch.clone()
    bad(batch.length - 1) = (bad(batch.length - 1) ^ 0x1).toByte
    intercept[java.io.IOException](KafkaWire.decodeRecordBatches(bad))
  }
}
