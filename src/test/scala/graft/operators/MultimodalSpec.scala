package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq((0L, "abcdefgh" * 16), (1L, "short"), (2L, ""))
    .toDF("doc_id", "text")

  test("media table schema contract") {
    val media = Multimodal.asMediaTable(docs)
    assert(media.columns.toSeq == Seq("media_id", "payload", "meta"))
    val m = media.where($"media_id" === 0).select("meta.n_bytes").as[Long].collect().head
    assert(m == 128L)
  }

  test("feature extraction: fixed dim, deterministic, null-safe") {
    val media = Multimodal.asMediaTable(docs)
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1.values.forall(_.length == 8))
    assert(f1(2L).forall(_ == 0f)) // empty payload → zero vector
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2) // deterministic stub
    // features are chunk byte-sums mod 1009 → integer-valued in [0, 1009)
    assert(f1(0L).forall(v => v >= 0f && v < 1009f && v == math.floor(v)))
    // "abcdefgh"*16: chunk 0 = bytes of "abcdefgh"*2 → sum 1588 → mod 1009
    assert(f1(0L).head == (("abcdefgh" * 2).map(_.toInt).sum % 1009).toFloat)
  }

  test("frame sampling emits one row per frame window") {
    val media = Multimodal.asMediaTable(docs)
    val frames = Multimodal.frameSample(media, frameBytes = 16, stride = 2)
    val counts = frames.groupBy("media_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts(0L) == 4L) // 128 bytes / (16*2)
    assert(counts(1L) == 1L) // short payload → 1 frame min
  }

  /** Encode a BufferedImage as PNG bytes (the fixture generator — real
    * encoded images with zero external deps).
    */
  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: features are true luma pixel statistics") {
    // 4×1 RGB strip: white, black, pure red, pure green → known lumas
    val img = new java.awt.image.BufferedImage(4, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFFFFFF); img.setRGB(1, 0, 0x000000)
    img.setRGB(2, 0, 0xFF0000); img.setRGB(3, 0, 0x00FF00)
    val payload = png(img)
    assert(Multimodal.looksLikeImage(payload))
    // dim = pixel count → chunk size 1, each feature = that pixel's luma
    // (integer 601 weights: 255, 0, 299·255/1000=76, 587·255/1000=149)
    val media = Seq((7L, payload, ("png", 4, 1, payload.length.toLong)))
      .toDF("media_id", "payload", "meta")
    val feats = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(7L) == Seq(255f, 0f, 76f, 149f))
    // corrupt payload with a PNG magic prefix degrades to the byte
    // fallback instead of killing the task
    val corrupt = payload.take(8) ++ Array.fill[Byte](16)(3)
    val bad = Seq((8L, corrupt, ("png", 4, 1, 24L))).toDF("media_id", "payload", "meta")
    val fb = Multimodal.extractFeatures(bad, dim = 4).collect()
      .map(r => r.getSeq[Float](1)).head
    assert(fb == Multimodal.decodeStub(corrupt, 4).toSeq)
  }

  test("real image resize: true pixel nearest-neighbor, PNG round-trip") {
    // 4×4 image, pixel (x,y) colored 0x10101·(y*4+x) — every pixel distinct
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x10101 * (y * 4 + x))
    val payload = png(img)
    val media = Seq((9L, payload, ("png", 4, 4, payload.length.toLong)))
      .toDF("media_id", "payload", "meta")
    val out = Multimodal.resize(media, dstW = 2, dstH = 2).collect().head
    val outMeta = out.getStruct(2)
    assert(outMeta.getString(0) == "png")
    assert((outMeta.getInt(1), outMeta.getInt(2)) == ((2, 2)))
    // decode the emitted PNG: dims are 2×2 and pixels are the exact
    // nearest-neighbor picks (0,0) (2,0) (0,2) (2,2) → indices 0 2 8 10
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](1)))
    assert((dec.getWidth, dec.getHeight) == ((2, 2)))
    val picks = Seq((0, 0, 0), (1, 0, 2), (0, 1, 8), (1, 1, 10))
    picks.foreach { case (x, y, idx) =>
      assert((dec.getRGB(x, y) & 0xFFFFFF) == 0x10101 * idx)
    }
  }

  test("resize: nearest-neighbor byte-grid downsample with clamping") {
    // 4×4 grid of known bytes resized to 2×2: picks (0,0),(0,2),(2,0),(2,2)
    val grid = Array.tabulate(16)(i => i.toByte)
    val out = Multimodal.resizeStub(grid, srcW = 4, srcH = 4, dstW = 2, dstH = 2)
    assert(out.toSeq == Seq(0.toByte, 2.toByte, 8.toByte, 10.toByte))
    // payload shorter than the declared grid: indices clamp to last byte
    val short = Array[Byte](1, 2, 3)
    val out2 = Multimodal.resizeStub(short, srcW = 4, srcH = 4, dstW = 2, dstH = 2)
    assert(out2.toSeq == Seq(1.toByte, 3.toByte, 3.toByte, 3.toByte))
    assert(Multimodal.resizeStub(Array.emptyByteArray, 4, 4, 2, 2).isEmpty)
    // DataFrame path: meta updated, payload length = dstW*dstH
    val media = Multimodal.asMediaTable(docs)
    val metas = Multimodal.resize(media, dstW = 8, dstH = 8)
      .select("media_id", "meta.width", "meta.height", "meta.n_bytes")
      .as[(Long, Int, Int, Long)].collect()
    metas.foreach { case (id, w, h, nb) =>
      assert(w == 8 && h == 8)
      assert(nb == (if (id == 2L) 0 else 64)) // empty payload stays empty
    }
    val byId = Multimodal.resize(media, 8, 8).collect()
      .map(row => row.getLong(0) -> row.getAs[Array[Byte]](1)).toMap
    assert(byId(0L).length == 64)
  }

  /** Hand-built PCM WAV (the fixture generator — real RIFF bytes, not a
    * library): 16-bit little-endian or 8-bit unsigned, interleaved.
    */
  private def wav(samplesByChannel: Array[Array[Int]], bits: Int): Array[Byte] = {
    val channels = samplesByChannel.length
    val frames = samplesByChannel.head.length
    val bps = bits / 8
    val dataLen = frames * channels * bps
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(8000).putInt(8000 * channels * bps)
      .putShort((channels * bps).toShort).putShort(bits.toShort)
    bb.put("data".getBytes).putInt(dataLen)
    for (f <- 0 until frames; c <- 0 until channels) {
      if (bits == 16) bb.putShort(samplesByChannel(c)(f).toShort)
      else bb.put(samplesByChannel(c)(f).toByte)
    }
    bb.array()
  }

  test("real WAV decode: features are true PCM sample statistics") {
    // 16-bit mono, 6 samples; dim = 6 → chunk of 1 → each feature is
    // (sample + 32768) % 1009 exactly
    val mono = Array(Array(-32768, -1, 0, 1, 1000, 32767))
    val fMono = Multimodal.decodeFeatures(wav(mono, 16), dim = 6)
    assert(fMono.toSeq == mono(0).toSeq.map(s => ((s + 32768) % 1009).toFloat))

    // stereo mono-mix: integer mean of the two channels per frame
    val left = Array(0, 1000, -1000, 32767)
    val right = Array(100, -1000, 3000, 32767)
    val expectedMix = left.zip(right).map { case (l, r) =>
      (((l + 32768).toLong + (r + 32768).toLong) / 2).toInt }
    val fStereo = Multimodal.decodeFeatures(wav(Array(left, right), 16), dim = 4)
    assert(fStereo.toSeq == expectedMix.toSeq.map(s => (s % 1009).toFloat))

    // 8-bit unsigned scales to the same [0, 65535] basis (<< 8)
    val eight = Array(Array(0, 1, 128, 255))
    val fEight = Multimodal.decodeFeatures(wav(eight, 8), dim = 4)
    assert(fEight.toSeq == eight(0).toSeq.map(s => ((s << 8) % 1009).toFloat))
  }

  test("WAV decode falls back cleanly on malformed/truncated/non-PCM payloads") {
    val good = wav(Array(Array(1, 2, 3, 4)), 16)
    // truncated mid-data: the chunk walk sees an over-long size → fallback
    val truncated = java.util.Arrays.copyOfRange(good, 0, good.length - 3)
    assert(Multimodal.tryDecodeWav(truncated).isEmpty)
    assert(Multimodal.decodeFeatures(truncated, 4).toSeq ==
      Multimodal.decodeStub(truncated, 4).toSeq)
    // RIFF-looking text junk: gate passes, parse fails, fallback
    val junk = ("RIFF1234WAVEthis is not really audio at all" * 2).getBytes
    assert(Multimodal.tryDecodeWav(junk).isEmpty)
    // IEEE-float format id (3) is out of scope → fallback, not garbage
    val floatFmt = good.clone()
    floatFmt(20) = 3 // fmt chunk's audio_format low byte
    assert(Multimodal.tryDecodeWav(floatFmt).isEmpty)
    // and the real thing still decodes after all that
    assert(Multimodal.tryDecodeWav(good).exists(_.toSeq ==
      Seq(1 + 32768, 2 + 32768, 3 + 32768, 4 + 32768)))
  }

  test("WAV with hundreds of junk chunks before data still decodes via the real PCM path") {
    // 200 junk chunks ahead of fmt/data: the walk must not cap out and
    // silently fall back to the byte featurizer (the old 64-chunk guard)
    val junkChunk = {
      val b = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("JUNK".getBytes).putInt(4).putInt(0xdeadbeef)
      b.array()
    }
    val tail = {
      val samples = Array(Array(7, -7, 700, -700))
      val whole = wav(samples, 16)
      java.util.Arrays.copyOfRange(whole, 12, whole.length) // fmt+data chunks
    }
    val bb = java.nio.ByteBuffer.allocate(12 + 200 * junkChunk.length + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(bb.capacity() - 8).put("WAVE".getBytes)
    (1 to 200).foreach(_ => bb.put(junkChunk))
    bb.put(tail)
    assert(Multimodal.tryDecodeWav(bb.array()).exists(_.toSeq ==
      Seq(7 + 32768, -7 + 32768, 700 + 32768, -700 + 32768)))
  }

  test("crafted chunk size near Int.MaxValue cannot overflow the bound check") {
    val good = wav(Array(Array(1, 2)), 16)
    val evil = good.clone()
    // fmt chunk size field at offset 16: claim 0x7ffffff0 — the Int sum
    // pos + 8 + size wraps negative; the Long check must reject it
    java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 0x7ffffff0)
    assert(Multimodal.tryDecodeWav(evil).isEmpty) // fallback, not OOM/garbage
    // same for a hostile data chunk length
    val evil2 = good.clone()
    java.nio.ByteBuffer.wrap(evil2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 0x7ffffff0)
    assert(Multimodal.tryDecodeWav(evil2).isEmpty)
  }

  test("perceptual hash: real images — re-encode ≡, noise near, different far") {
    val rnd = new scala.util.Random(3)
    val base = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      base.setRGB(x, y, if ((x / 8 + y / 8) % 2 == 0) 0xFFFFFF else 0x101010)
    // tiny noise: flip a few pixels' low bits — structure unchanged
    val noisy = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      noisy.setRGB(x, y, base.getRGB(x, y) ^ (if (rnd.nextInt(10) == 0) 0x030303 else 0))
    // inverted checkerboard: structurally different
    val other = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      other.setRGB(x, y, if ((x / 8 + y / 8) % 2 == 1) 0xFFFFFF else 0x101010)
    def h(img: java.awt.image.BufferedImage) = Multimodal.aHash(png(img), 32, 32)
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(base) == h(base)) // deterministic
    assert(dist(h(base), h(noisy)) <= 4, s"noise moved ${dist(h(base), h(noisy))} bits")
    assert(dist(h(base), h(other)) >= 20, s"inversion only ${dist(h(base), h(other))} bits")
  }

  test("phashNearDups finds planted image pairs end-to-end (banding recall)") {
    val imgs = (0 until 6).map { k =>
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, if ((x * (k + 2) + y) % 7 < 3) 0xEEEEEE else 0x111111)
      png(img)
    }
    // planted pair: id 100 is a re-encode of img 0 (identical pixels)
    val rows = imgs.zipWithIndex.map { case (p, i) =>
      (i.toLong, p, ("png", 16, 16, p.length.toLong))
    } :+ ((100L, imgs(0), ("png", 16, 16, imgs(0).length.toLong)))
    val media = rows.toDF("media_id", "payload", "meta")
    val pairs = Multimodal.phashNearDups(media, maxDist = 2)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 100L && p._3 == 0))
    // fallback path: identical byte payloads hash identically too
    val stub = Multimodal.asMediaTable(Seq(
      (1L, "same text"), (2L, "same text"), (3L, "something else entirely"))
      .toDF("doc_id", "text"))
    val sp = Multimodal.phashNearDups(stub, maxDist = 0)
      .as[(Long, Long, Int)].collect()
    assert(sp.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("aHash256: real-image discrimination at 256-bit scale") {
    val rnd = new scala.util.Random(3)
    def img(f: (Int, Int) => Int) = {
      val im = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) im.setRGB(x, y, f(x, y))
      im
    }
    val base = img((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0xFFFFFF else 0x101010)
    val noisy = img((x, y) =>
      base.getRGB(x, y) ^ (if (rnd.nextInt(10) == 0) 0x030303 else 0))
    val other = img((x, y) => if ((x / 8 + y / 8) % 2 == 1) 0xFFFFFF else 0x101010)
    def h(im: java.awt.image.BufferedImage) = Multimodal.aHash256(png(im), 32, 32)
    def dist(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(h(base).toSeq == h(base).toSeq)
    // thresholds scale 4x vs the 64-bit pins (≤4 / ≥20 there)
    assert(dist(h(base), h(noisy)) <= 16, s"noise moved ${dist(h(base), h(noisy))} bits")
    assert(dist(h(base), h(other)) >= 80, s"inversion only ${dist(h(base), h(other))} bits")
  }

  test("phashNearDups banding ≡ brute-force popcount (recall 1.0, straddling bands)") {
    val rnd = new scala.util.Random(11)
    // 40 random 64-byte payloads + planted near-dups (a few flipped bytes)
    val bases = (0 until 40).map { i =>
      val p = new Array[Byte](64); rnd.nextBytes(p); (i.toLong, p)
    }
    // ±1 on one byte: ≤4 direct cell flips, negligible mean shift — the
    // planted pairs stay within the banding tolerance
    val dups = bases.take(8).map { case (id, p) =>
      val q = p.clone(); val at = rnd.nextInt(64)
      q(at) = (((q(at) & 0xff) ^ 1) & 0xff).toByte
      (id + 1000L, q)
    }
    val rows = (bases ++ dups).map { case (id, p) =>
      (id, p, ("bin", 8, 8, p.length.toLong))
    }
    val media = rows.toDF("media_id", "payload", "meta")
    val fps = Multimodal.perceptualHash256(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dist(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    // maxDist 5 → 6 bands of 42 bits (every band straddles a long
    // boundary somewhere); maxDist 6 → 7×36 (the default design point)
    for (maxDist <- Seq(5, 6)) {
      val expected = (for {
        (a, fa) <- fps; (b, fb) <- fps if a < b
        d = dist(fa, fb) if d <= maxDist
      } yield (a, b, d)).toSet
      val got = Multimodal.phashNearDups(media, maxDist)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected, s"maxDist=$maxDist")
      assert(expected.nonEmpty) // planted dups actually exercise the path
    }
  }

  test("phashNearDups rejects tolerances whose band keys would saturate") {
    val media = Multimodal.asMediaTable(docs)
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(media, maxDist = 16) // 256/17 < 16-bit keys
    }
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(media, maxDist = 64, grid = 32) // 1024/65 < 16
    }
  }

  test("32×32 grid carries large tolerances: banding ≡ brute force at maxDist 20") {
    val rnd = new scala.util.Random(23)
    val bases = (0 until 30).map { i =>
      val p = new Array[Byte](1024); rnd.nextBytes(p); (i.toLong, p)
    }
    // ±1 on three bytes — well inside 20 of 1024 bits
    val dups = bases.take(6).map { case (id, p) =>
      val q = p.clone()
      (0 until 3).foreach { _ =>
        val at = rnd.nextInt(1024); q(at) = (((q(at) & 0xff) ^ 1) & 0xff).toByte
      }
      (id + 1000L, q)
    }
    val media = (bases ++ dups).map { case (id, p) =>
      (id, p, ("bin", 32, 32, p.length.toLong))
    }.toDF("media_id", "payload", "meta")
    val fps = Multimodal.perceptualHashGrid(media, 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(fps.values.head.length == 16) // 1024 bits = 16 longs
    def dist(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      d = dist(fa, fb) if d <= 20
    } yield (a, b, d)).toSet
    val got = Multimodal.phashNearDups(media, maxDist = 20, grid = 32)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }
}
