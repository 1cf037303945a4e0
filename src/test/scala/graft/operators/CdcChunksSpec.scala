package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Dedup.cdcChunks]] / [[Dedup.cdcChunksNormalized]] against a
  * plain-Scala Gear-hash reference, plus the two properties that justify
  * the operator: chunks reassemble the text exactly, and boundaries
  * re-synchronize after a prefix edit (shift invariance — what the
  * aligned-span family can't do).
  */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 6
  private val Mask = (1L << M) - 1

  /** Windowed Gear hash at 1-based position p of s (already-normalized
    * ASCII — the generators below emit lowercase + single spaces so the
    * reference needs no normalize pass).
    */
  private def hAt(gear: IndexedSeq[Long], p: Int): Long =
    (0 until M).map(j => if (p - 1 >= j) gear(p - 1 - j) << j else 0L)
      .sum & Mask

  private def gearOf(s: String): IndexedSeq[Long] =
    s.map(c => c.toInt.toLong * Dedup.CdcGearMult)

  /** Pure content-defined cuts: after 1-based p when H(p)=mask, never
    * after the last char.
    */
  private def refCuts(s: String): Seq[Int] = {
    val g = gearOf(s)
    (1 until s.length).filter(p => hAt(g, p) == Mask)
  }

  /** FastCDC-normalized cuts: accepted ≥ minLen past the previous cut,
    * forced at maxLen.
    */
  private def refCutsNorm(s: String, minLen: Int, maxLen: Int): Seq[Int] = {
    val g = gearOf(s)
    var anchor = 0
    val out = Seq.newBuilder[Int]
    var p = 1
    while (p < s.length) {
      val gap = p - anchor
      if (gap >= maxLen || (gap >= minLen && hAt(g, p) == Mask)) {
        out += p; anchor = p
      }
      p += 1
    }
    out.result()
  }

  private def refChunks(s: String, cuts: Seq[Int]): Seq[(Int, Int, String)] = {
    val starts = 1 +: cuts.map(_ + 1)
    val ends = cuts :+ s.length
    starts.zip(ends).map { case (st, en) => (st, en - st + 1, s.substring(st - 1, en)) }
  }

  private def randTexts(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      (0 until (3 + rnd.nextInt(20))).map { _ =>
        (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(9)).toChar).mkString
      }.mkString(" ")
    }
  }

  test("cdcChunks ≡ plain-Scala Gear reference on a randomized corpus") {
    val texts = randTexts(11, 50) :+ "x" :+ "ab" // 1- and 2-char edges
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunks(docs, maskBits = M)
      .select("doc_id", "chunk_idx", "start", "len", "chunk_md5")
      .as[(Long, Int, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = refChunks(t, refCuts(t))
      val g = got(i.toLong)
      assert(g.length == want.length, s"doc $i chunk count: $g vs $want")
      g.zip(want).foreach { case ((_, _, st, len, md5hex), (wst, wlen, wtxt)) =>
        assert(st == wst && len == wlen, s"doc $i bounds")
        val wantMd5 = java.security.MessageDigest.getInstance("MD5")
          .digest(wtxt.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(md5hex == wantMd5, s"doc $i chunk content")
      }
      // reassembly: chunk (start, len) spans tile [1, n] exactly
      assert(want.map(_._3).mkString("") == t)
    }
  }

  test("shift invariance: boundaries re-sync maskBits chars past a prefix edit") {
    val s = randTexts(23, 1).head
    val prefix = "zz qq "
    val p = prefix.length
    val base = refCuts(s)
    val shifted = refCuts(prefix + s)
    // every cut of s strictly past the M-char resync window re-appears
    // at +p in the edited doc, and vice versa
    assert(shifted.filter(_ > p + M).map(_ - p) == base.filter(_ > M))
    // and the shared-chunk consequence the d23 entry relies on: all
    // chunks after the first post-edit cut are byte-identical
    val dupDocs = Seq((0L, s), (1L, prefix + s)).toDF("doc_id", "text")
    val shared = Dedup.cdcChunks(dupDocs, maskBits = M)
      .groupBy("chunk_md5").count().where(org.apache.spark.sql.functions.col("count") >= 2)
      .count()
    assert(shared >= (base.count(_ > M) - 1).max(0),
      "edited copy must share its post-resync chunks with the original")
  }

  test("cdcChunksNormalized ≡ reference; degenerate params ≡ pure cdcChunks") {
    val texts = randTexts(37, 30)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunksNormalized(docs, maskBits = M, minLen = 8, maxLen = 24)
      .select("doc_id", "chunk_idx", "start", "len")
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = refChunks(t, refCutsNorm(t, 8, 24))
      val g = got.getOrElse(i.toLong, Array.empty)
      assert(g.map(c => (c._3, c._4)).toSeq == want.map(c => (c._1, c._2)),
        s"doc $i normalized bounds")
      // the max-length contract actually holds
      assert(want.forall(_._2 <= 24))
    }
    // minLen=1, maxLen=∞ degenerates to the pure windowed form
    val pure = Dedup.cdcChunks(docs, maskBits = M)
      .select("doc_id", "chunk_idx", "chunk_md5")
      .as[(Long, Int, String)].collect().sortBy(c => (c._1, c._2)).toSeq
    val degen = Dedup.cdcChunksNormalized(docs, maskBits = M,
      minLen = 1, maxLen = Int.MaxValue)
      .select("doc_id", "chunk_idx", "chunk_md5")
      .as[(Long, Int, String)].collect().sortBy(c => (c._1, c._2)).toSeq
    assert(pure == degen)
  }
}
