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

  test("v2 compressed batches roundtrip byte-exact for every codec") {
    val codecs = Seq(KafkaWire.CodecGzip, KafkaWire.CodecSnappy,
      KafkaWire.CodecLz4, KafkaWire.CodecZstd)
    sample(30).filter(_.nonEmpty).foreach { recs =>
      val plain = KafkaWire.decodeRecordBatches(
        KafkaWire.encodeRecordBatch(recs, baseOffset = 5L))
      codecs.foreach { codec =>
        val zipped = KafkaWire.decodeRecordBatches(
          KafkaWire.encodeRecordBatch(recs, baseOffset = 5L, codec = codec))
        assert(zipped.size == plain.size, s"codec $codec")
        zipped.zip(plain).foreach { case (z, p) =>
          assert(z.offset == p.offset)
          assert(eq(z.key, p.key) && eq(z.value, p.value))
        }
      }
    }
  }

  test("v0 gzip wrapper decodes the inner set with broker-remapped absolute offsets") {
    val inner = Seq[(Array[Byte], Array[Byte])](
      (null, "a".getBytes), ("k".getBytes, "b".getBytes), (null, "c".getBytes))
    val innerSet = KafkaWire.encodeMessageSet(inner)
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.GZIPOutputStream(bos)
      out.write(innerSet); out.close(); bos.toByteArray
    }
    // wrapper exactly as a magic-0 broker ships it: offset = LAST inner
    // message's absolute offset (here 12, so the set spans 10..12),
    // attributes codec bits = 1 (gzip), value = gzip(inner set)
    val w = new KafkaWire.Writer()
    val body = new KafkaWire.Writer()
    body.int8(0: Byte).int8(1: Byte).bytes(null).bytes(gz)
    val bodyBytes = body.toBytes
    val crc = new java.util.zip.CRC32
    crc.update(bodyBytes)
    w.int64(12L).int32(4 + bodyBytes.length).int32(crc.getValue.toInt).raw(bodyBytes)
    val got = KafkaWire.decodeMessageSet(w.toBytes)
    assert(got.map(_.offset) == Seq(10L, 11L, 12L))
    assert(got.map(r => new String(r.value, "UTF-8")) == Seq("a", "b", "c"))
    assert(new String(got(1).key, "UTF-8") == "k")
  }

  test("reserved codec ids fail with a named error instead of mis-parsing") {
    // v2: flip the attribute bits to reserved id 5 and re-CRC so only the
    // codec is wrong
    val batch = KafkaWire.encodeRecordBatch(Seq((null, "x".getBytes)))
    batch(22) = 5 // attributes low byte (21 = crc end, attributes int16 at 21..22)
    val crc = new java.util.zip.CRC32C
    crc.update(batch, 21, batch.length - 21)
    java.nio.ByteBuffer.wrap(batch, 17, 4).putInt(crc.getValue.toInt)
    val e2 = intercept[java.io.IOException](KafkaWire.decodeRecordBatches(batch))
    assert(e2.getMessage.contains("unsupported compression"))

    // v0: message with reserved codec bits = 5
    val body = new KafkaWire.Writer()
    body.int8(0: Byte).int8(5: Byte).bytes(null).bytes("y".getBytes)
    val bodyBytes = body.toBytes
    val mcrc = new java.util.zip.CRC32
    mcrc.update(bodyBytes)
    val w = new KafkaWire.Writer()
    w.int64(0L).int32(4 + bodyBytes.length).int32(mcrc.getValue.toInt).raw(bodyBytes)
    val e0 = intercept[java.io.IOException](KafkaWire.decodeMessageSet(w.toBytes))
    assert(e0.getMessage.contains("unsupported compression"))
  }

  test("v0 lz4 wrapper (legacy broken-HC frame) decodes the inner set") {
    val inner = Seq[(Array[Byte], Array[Byte])](
      (null, "a".getBytes), (null, "b".getBytes))
    val innerSet = KafkaWire.encodeMessageSet(inner)
    // frame with the LEGACY header checksum old v0/v1 producers wrote:
    // hash over magic+FLG+BD instead of FLG+BD
    val correct = Lz4Frame.compress(innerSet)
    val legacy = correct.clone()
    val xx = net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
    legacy(6) = ((xx.hash(legacy, 0, 6, 0) >> 8) & 0xff).toByte
    val body = new KafkaWire.Writer()
    body.int8(0: Byte).int8(3: Byte).bytes(null).bytes(legacy)
    val bodyBytes = body.toBytes
    val mcrc = new java.util.zip.CRC32
    mcrc.update(bodyBytes)
    val w = new KafkaWire.Writer()
    w.int64(1L).int32(4 + bodyBytes.length).int32(mcrc.getValue.toInt).raw(bodyBytes)
    val got = KafkaWire.decodeMessageSet(w.toBytes)
    assert(got.map(_.offset) == Seq(0L, 1L))
    assert(got.map(r => new String(r.value, "UTF-8")) == Seq("a", "b"))
  }

  test("corrupt positive batch_length below the v2 minimum throws (no busy-loop)") {
    // 12-byte head claiming batch_length 5, followed by plenty of bytes —
    // NOT a truncated tail, must throw named instead of returning empty
    val w = new KafkaWire.Writer()
    w.int64(7L).int32(5).raw(new Array[Byte](64))
    val e = intercept[java.io.IOException](KafkaWire.decodeRecordBatches(w.toBytes))
    assert(e.getMessage.contains("batch_length"))
    // a genuinely truncated tail (plausible length, missing bytes) still
    // returns cleanly
    val t = new KafkaWire.Writer()
    t.int64(7L).int32(200).raw(new Array[Byte](20))
    assert(KafkaWire.decodeRecordBatches(t.toBytes).isEmpty)
  }

  test("decompression bomb: a gzip batch expanding past the fence throws named") {
    // ~70 MiB of zeros gzips to ~70 KiB — fits any fetch response, but
    // expands past the 64 MiB MaxDecompressedBytes fence on decode
    val big = new Array[Byte](70 * 1024 * 1024)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos, 64 * 1024)
    gz.write(big); gz.close()
    val e = intercept[java.io.IOException](
      KafkaWire.decompress(KafkaWire.CodecGzip, bos.toByteArray, "test"))
    assert(e.getMessage.contains("bomb"))
  }

  test("sasl plain token carries NUL-framed credentials for arbitrary strings") {
    val strGen = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const('€'), Gen.const(' ')))
        .map(_.mkString))
    val creds = LazyList.from(0)
      .map(i => Gen.zip(strGen, strGen)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
      .flatten.take(50).toList
    creds.foreach { case (u, p) =>
      val tok = new String(KafkaWire.saslPlainToken(u, p),
        java.nio.charset.StandardCharsets.UTF_8).split("\u0000", -1)
      assert(tok.length == 3 && tok(0) == "" && tok(1) == u && tok(2) == p)
    }
  }

  test("sasl handshake/authenticate decoders: ok, named rejection, named failure") {
    // handshake ok → mechanism list out
    val hs = new KafkaWire.Writer()
    hs.int16(0)
    hs.array(Seq("PLAIN", "SCRAM-SHA-256"))(m => hs.string(m))
    assert(KafkaWire.decodeSaslHandshakeResponse(hs.toBytes) ==
      Seq("PLAIN", "SCRAM-SHA-256"))
    // handshake rejection names the broker's mechanisms
    val bad = new KafkaWire.Writer()
    bad.int16(33)
    bad.array(Seq("GSSAPI"))(m => bad.string(m))
    val e1 = intercept[java.io.IOException](
      KafkaWire.decodeSaslHandshakeResponse(bad.toBytes))
    assert(e1.getMessage.contains("GSSAPI"))
    // authenticate ok → silent; failure carries the broker message
    val ok = new KafkaWire.Writer()
    ok.int16(0).nullableString(null).bytes(Array.emptyByteArray)
    KafkaWire.decodeSaslAuthenticateResponse(ok.toBytes)
    val fail = new KafkaWire.Writer()
    fail.int16(58).nullableString("bad password for 'svc'")
      .bytes(Array.emptyByteArray)
    val e2 = intercept[java.io.IOException](
      KafkaWire.decodeSaslAuthenticateResponse(fail.toBytes))
    assert(e2.getMessage.contains("bad password for 'svc'"))
    // a null error message must not NPE the failure path
    val failNull = new KafkaWire.Writer()
    failNull.int16(58).nullableString(null).bytes(Array.emptyByteArray)
    val e3 = intercept[java.io.IOException](
      KafkaWire.decodeSaslAuthenticateResponse(failNull.toBytes))
    assert(e3.getMessage.contains("sasl authentication failed"))
  }
}
