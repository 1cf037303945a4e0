package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala reference trainer: same greedy loop, same tie-break
    * (count desc, then (p1, p2) lexicographic), same left-to-right
    * non-overlapping merge application.
    */
  private def refTrain(texts: Seq[String], numMerges: Int,
      minPairCount: Long): Vector[(String, String)] = {
    val wordCounts = texts
      .flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var syms: Map[Vector[String], Long] =
      wordCounts.map { case (w, n) => w.map(String.valueOf(_)).toVector -> n }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    def applyMerge(v: Vector[String], p1: String, p2: String): Vector[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      v.foreach { s =>
        if (buf.nonEmpty && buf.last == p1 && s == p2)
          buf(buf.length - 1) = p1 + p2
        else buf += s
      }
      buf.toVector
    }
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (v, n) =>
        v.zip(v.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.isEmpty) done = true
      else {
        val (bp, bc) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (bc < minPairCount) done = true
        else {
          merges += bp
          syms = syms.groupBy { case (v, _) => applyMerge(v, bp._1, bp._2) }
            .map { case (v, m) => v -> m.values.sum }
        }
      }
      round += 1
    }
    merges.result()
  }

  private def refEncode(text: String, merges: Vector[(String, String)]): Vector[String] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toVector.flatMap { w =>
      var syms = w.map(String.valueOf(_)).toVector
      merges.foreach { case (p1, p2) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (buf.nonEmpty && buf.last == p1 && s == p2)
            buf(buf.length - 1) = p1 + p2
          else buf += s
        }
        syms = buf.toVector
      }
      syms
    }

  test("train: hand-checked merge order on a tiny corpus") {
    // words: ab×2, abc×1 → pair (a,b) count 3 wins round 1; round 2 has
    // (ab,c) count 1 — below minPairCount=2 → early stop
    val docs = Seq((0L, "ab ab"), (1L, "abc")).toDF("doc_id", "text")
    val m = Bpe.train(docs, numMerges = 5, minPairCount = 2)
    assert(m.merges == Vector(("a", "b")))
    // with minPairCount=1 the singleton pair merges too
    val m1 = Bpe.train(docs, numMerges = 5, minPairCount = 1)
    assert(m1.merges == Vector(("a", "b"), ("ab", "c")))
  }

  test("encode: applies merges in order; roundtrip holds; OOV chars survive") {
    val docs = Seq((0L, "ab ab"), (1L, "abc")).toDF("doc_id", "text")
    val model = Bpe.train(docs, numMerges = 5, minPairCount = 2)
    val enc = Bpe.encode(Seq((9L, "ab abc xa")).toDF("doc_id", "text"), model)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().head
    assert(enc._2 == Seq("ab", "ab", "c", "x", "a"))
  }

  test("train+encode ≡ plain-Scala reference on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val texts = (0 until 60).map { _ =>
      (0 until (2 + rnd.nextInt(6))).map { _ =>
        (0 until (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }.mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = Bpe.train(docs, numMerges = 12, minPairCount = 2)
    val expected = refTrain(texts, numMerges = 12, minPairCount = 2)
    assert(model.merges == expected,
      s"merge lists diverge:\n spark=${model.merges}\n ref=$expected")
    val got = Bpe.encode(docs, model)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect()
      .sortBy(_._1).map(_._2.toVector)
    val want = texts.map(refEncode(_, expected))
    assert(got.zip(want).forall { case (a, b) => a == b })
    // roundtrip: concatenated tokens re-spell the normalized text
    got.zip(texts).foreach { case (toks, t) =>
      assert(toks.mkString("") == t.replace(" ", ""))
    }
    // determinism across invocations
    assert(Bpe.train(docs, numMerges = 12, minPairCount = 2).merges == expected)
  }

  test("local and distributed merge loops are the same algorithm") {
    // localVocabThreshold = 0 forces the per-round distributed loop; the
    // default runs the driver-local one — both must emit the identical
    // merge list (the adaptive cutoff is an execution choice only)
    val rnd = new scala.util.Random(7)
    val texts = (0 until 40).map { _ =>
      (0 until (2 + rnd.nextInt(5))).map { _ =>
        (0 until (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val local = Bpe.train(docs, numMerges = 10, minPairCount = 2)
    val dist = Bpe.train(docs, numMerges = 10, minPairCount = 2,
      localVocabThreshold = 0)
    assert(local.merges == dist.merges,
      s"cutoff paths diverge:\n local=${local.merges}\n dist=${dist.merges}")
    assert(local.merges == refTrain(texts, numMerges = 10, minPairCount = 2))
  }
}
