package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized completeness/correctness for the set-similarity joins: the
  * prefix-filtered + PPJoin-pruned candidate path must return EXACTLY the
  * brute-force Jaccard pairs on arbitrary corpora (the prunes may only
  * discard pairs the threshold already excludes), and MinHash+LSH's
  * verified output must be a subset of the exact pairs that always
  * contains the certain (J = 1) pairs. Tiny vocabularies make near-dup
  * pairs dense, which is exactly where pruning bugs would bite.
  */
class DedupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docGen: Gen[String] = for {
    n <- Gen.choose(1, 25)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
  } yield toks.mkString(" ")

  private def corpus(n: Int, seedBase: Int): Seq[(Long, String)] =
    LazyList.from(0)
      .map(i => docGen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed((seedBase + i).toLong)))
      .flatten.take(n).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toList

  /** Shingle string sets exactly as Dedup.shingles(n=3): trigrams, or the
    * whole text when shorter (normalize is a no-op for these fixtures).
    */
  private def shingleSet(text: String): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
    else Set(toks.mkString(" "))
  }

  private def bruteForcePairs(docs: Seq[(Long, String)], t: Double,
      sameBlock: (Long, Long) => Boolean): Set[(Long, Long)] =
    (for {
      (ia, ta) <- docs
      (ib, tb) <- docs
      if ia < ib && sameBlock(ia, ib)
      sa = shingleSet(ta)
      sb = shingleSet(tb)
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (ia, ib)).toSet

  test("ngramJaccardPairs == brute force at low and high thresholds") {
    Seq(0.3, 0.7).foreach { t =>
      val docs = corpus(50, seedBase = if (t < 0.5) 1000 else 9000)
      val df = docs.toDF("doc_id", "text")
        .withColumn("blk", org.apache.spark.sql.functions.lit(0))
      val got = Dedup.ngramJaccardPairs(df, blockCol = "blk",
        shingleSize = 3, threshold = t)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val want = bruteForcePairs(docs, t, (_, _) => true)
      assert(got == want,
        s"t=$t missing=${want -- got} extra=${got -- want}")
    }
  }

  test("minhashNearDups ⊆ brute force, and certain (J=1) pairs always surface") {
    val docs = corpus(50, seedBase = 4242)
    val df = docs.toDF("doc_id", "text")
    val t = 0.6
    val got = Dedup.minhashNearDups(df, shingleSize = 3,
      numHashes = 64, rowsPerBand = 4, threshold = t)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val exact = bruteForcePairs(docs, t, (_, _) => true)
    assert(got.subsetOf(exact), s"false positives: ${got -- exact}")
    val certain = bruteForcePairs(docs, 1.0, (_, _) => true)
    assert(certain.subsetOf(got), // identical sets → identical signatures → same buckets
      s"missed certain pairs: ${certain -- got}")
  }
}
