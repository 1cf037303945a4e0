package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized reference-equivalence for the integer scoring operators:
  * [[TextAnalysis.rarityScore]] and [[Sampling.dsirWeights]] must agree
  * EXACTLY (they are all-integer by design) with a plain-Scala
  * re-implementation of their contracts on arbitrary corpora. Tiny
  * vocabularies make count collisions, OOV charging, and hash-bucket
  * collisions dense — exactly where an off-by-one in the smoothing or
  * truncating division would bite.
  */
class ScoringPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docGen: Gen[String] = for {
    n <- Gen.choose(1, 20)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
  } yield toks.mkString(" ")

  private def corpus(n: Int, seedBase: Int): Seq[(Long, String)] =
    LazyList.from(0)
      .map(i => docGen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed((seedBase + i).toLong)))
      .flatten.take(n).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toList

  // ---- rarityScore reference ---------------------------------------------

  private def rarityRef(docs: Seq[(Long, String)], minCount: Long)
      : Map[Long, (Long, Long, Long)] = {
    val all = docs.flatMap(_._2.split(" ", -1))
    val cnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.size.toLong
    val oov = (10000L * n) / minCount
    docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val rs = toks.map { t =>
        val c = cnt(t)
        if (c >= minCount) (10000L * n) / c else oov
      }
      id -> (toks.length.toLong, rs.sum, rs.sum / toks.length)
    }.toMap
  }

  test("rarityScore ≡ plain-Scala reference on random corpora") {
    for (seed <- Seq(100, 900, 4400); mc <- Seq(1L, 3L, 8L)) {
      val docs = corpus(30, seed)
      val got = TextAnalysis.rarityScore(docs.toDF("doc_id", "text"), mc)
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == rarityRef(docs, mc), s"seed=$seed minCount=$mc")
    }
  }

  // ---- bigramSurprisal reference -----------------------------------------

  private def bigramRef(docs: Seq[(Long, String)], minCount: Long)
      : Map[Long, (Long, Long, Long)] = {
    val all = docs.flatMap(_._2.split(" ", -1))
    val c1 = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.size.toLong
    val allBg = docs.flatMap(_._2.split(" ", -1).sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))).toSeq)
    val c2 = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val oov = 10L * ((10000L * n) / minCount)
    docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val bgs = toks.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
      if (bgs.isEmpty) id -> (0L, 0L, 0L)
      else {
        val rs = bgs.map { case (w1, w2) =>
          val cb = c2.getOrElse((w1, w2), 0L)
          if (cb >= minCount) (10000L * c1(w1)) / cb
          else if (c1(w2) >= minCount) 10L * ((10000L * n) / c1(w2))
          else oov
        }
        id -> (bgs.size.toLong, rs.sum, rs.sum / bgs.size)
      }
    }.toMap
  }

  test("bigramSurprisal ≡ plain-Scala reference on random corpora") {
    for (seed <- Seq(55, 1200, 7700); mc <- Seq(1L, 2L, 6L)) {
      val docs = corpus(30, seed)
      val got = TextAnalysis.bigramSurprisal(docs.toDF("doc_id", "text"), mc)
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == bigramRef(docs, mc), s"seed=$seed minCount=$mc")
    }
  }

  test("bigram OOV floor survives a vocabulary that prunes empty") {
    // minCount above EVERY unigram count: both model tables prune empty,
    // yet the floor must stay the documented 10·((10000·N) div minCount)
    // — not collapse to 0 (the defect of reading it off the uni table)
    val docs = corpus(10, seedBase = 99)
    val mc = 1000000L
    val m = TextAnalysis.bigramModel(docs.toDF("doc_id", "text"), mc)
    assert(m.uni.isEmpty && m.model.isEmpty, "expected fully pruned tables")
    val n = docs.flatMap(_._2.split(" ", -1)).size.toLong
    assert(m.oovE4 == 10L * ((10000L * n) / mc))
    val got = TextAnalysis.bigramSurprisal(docs.toDF("doc_id", "text"), mc)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == bigramRef(docs, mc))
  }

  // ---- trigramSurprisal reference ----------------------------------------

  private def trigramRef(docs: Seq[(Long, String)], minCount: Long)
      : Map[Long, (Long, Long, Long)] = {
    val all = docs.flatMap(_._2.split(" ", -1))
    val c1 = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.size.toLong
    def gramsOf(text: String, k: Int): Seq[String] =
      text.split(" ", -1).sliding(k).filter(_.length == k).map(_.mkString(" ")).toSeq
    val c2 = docs.flatMap(d => gramsOf(d._2, 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c3 = docs.flatMap(d => gramsOf(d._2, 3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    docs.map { case (id, text) =>
      val tgs = gramsOf(text, 3)
      if (tgs.isEmpty) id -> (0L, 0L, 0L)
      else {
        val rs = tgs.map { t =>
          val ws = t.split(" ", -1)
          val prefix = ws(0) + " " + ws(1)
          val suffix = ws(1) + " " + ws(2)
          val ct = c3.getOrElse(t, 0L)
          if (ct >= minCount) (10000L * c2(prefix)) / ct
          else if (c2.getOrElse(suffix, 0L) >= minCount)
            10L * ((10000L * c1(ws(1))) / c2(suffix))
          else if (c1.getOrElse(ws(2), 0L) >= minCount)
            100L * ((10000L * n) / c1(ws(2)))
          else 100L * ((10000L * n) / minCount)
        }
        id -> (tgs.size.toLong, rs.sum, rs.sum / tgs.size)
      }
    }.toMap
  }

  test("trigramSurprisal ≡ plain-Scala reference on random corpora") {
    for (seed <- Seq(31, 880, 5100); mc <- Seq(1L, 2L, 5L)) {
      val docs = corpus(30, seed)
      val got = TextAnalysis.trigramSurprisal(docs.toDF("doc_id", "text"), mc)
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == trigramRef(docs, mc), s"seed=$seed minCount=$mc")
    }
  }

  // ---- dsirWeights reference ---------------------------------------------

  /** First 15 md5 hex chars as a long — Sampling.idHash exactly. */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Bigrams with occurrences kept; whole text when shorter — the
    * Dedup.shinglesFromToks contract.
    */
  private def grams(text: String, n: Int): Seq[String] = {
    val toks = text.split(" ", -1)
    if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
    else Seq(toks.mkString(" "))
  }

  private def dsirRef(source: Seq[(Long, String)], target: Seq[(Long, String)],
      n: Int, buckets: Int): Map[Long, (Long, Long, Long)] = {
    def bucketsOf(docs: Seq[(Long, String)]): Seq[(Long, Long)] =
      docs.flatMap { case (id, t) =>
        grams(t, n).map(g => id -> (((md5Long(g) % buckets) + buckets) % buckets))
      }
    def model(bs: Seq[(Long, Long)]): Map[Long, Long] = {
      val cnt = bs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val tot = bs.size.toLong
      cnt.map { case (b, c) => b -> (1000000000L * (c + 1)) / (tot + 1) }
    }
    val ps = model(bucketsOf(source))
    val pt = model(bucketsOf(target))
    val src = bucketsOf(source)
    src.groupBy(_._1).map { case (id, bs) =>
      val rs = bs.map { case (_, b) =>
        val p = ps(b) // every source bucket is in the source model
        (10000L * pt.getOrElse(b, 0L)) / (if (p > 0) p else 1L)
      }
      id -> (bs.size.toLong, rs.sum, rs.sum / bs.size)
    }
  }

  test("dsirWeights ≡ plain-Scala reference on random corpora") {
    for (seed <- Seq(7, 210); b <- Seq(4, 64)) {
      val docs = corpus(24, seed)
      val targetIds = docs.map(_._1).filter(_ % 5 == 2).toSet
      val target = docs.filter(d => targetIds(d._1))
      val got = Sampling.dsirWeights(
        docs.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), n = 2, buckets = b)
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == dsirRef(docs, target, 2, b), s"seed=$seed buckets=$b")
    }
  }

  test("dsirWeights wide (DECIMAL) ≡ narrow (BIGINT) in the shared range") {
    // same corpora as above: totals are far below the 9.2e9-gram BIGINT
    // fence, so the DECIMAL(38,0) quantization must land on the exact
    // same e9 integers — pins that `wide = true` changes the overflow
    // headroom, never the math
    for (seed <- Seq(7, 210); b <- Seq(4, 64)) {
      val docs = corpus(24, seed)
      val target = docs.filter(_._1 % 5 == 2)
      def run(wide: Boolean) = Sampling.dsirWeights(
        docs.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
        n = 2, buckets = b, wide = wide)
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(run(wide = true) == run(wide = false), s"seed=$seed buckets=$b")
    }
  }
}
