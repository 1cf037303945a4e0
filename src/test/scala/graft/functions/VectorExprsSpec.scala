package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

/** The custom kernels must be bit-identical to the higher-order-function
  * compositions they replace.
  */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b a b a b a b",          // duplicate shingles → dedupe
    "tiny doc",                  // < n tokens → whole-text shingle
    "",                          // empty
    "unicode héllo wörld ünïcode tokens here",
    "x").toDF("text")

  test("ShingleHashes kernel == array_distinct(transform(shingles, xxhash64))") {
    val hof = docs.select(
      array_distinct(transform(Dedup.shingles(col("text"), 3), s => xxhash64(s))).as("h"))
      .as[Seq[Long]].collect()
    val kernel = docs.select(Dedup.shingleHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].collect()
    assert(hof.toSeq == kernel.toSeq)
  }

  test("MinHashSignature kernel == array_min(transform(hashes, xxhash64(h, j)))") {
    val feats = docs.select(Dedup.shingleHashes(col("text"), 3).as("feat"))
    val hof = feats.select(Dedup.minhashSignatureFromHashes(col("feat"), 16).as("sig"))
      .as[Seq[Long]].collect()
    val kernel = feats.select(VectorExprs.minhashSignature(col("feat"), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(hof.toSeq == kernel.toSeq)
  }

  test("SortedShingleHashes kernel == array_sort(ShingleHashes)") {
    val viaSort = docs.select(
      array_sort(Dedup.shingleHashes(col("text"), 3)).as("h"))
      .as[Seq[Long]].collect()
    val kernel = docs.select(Dedup.sortedShingleHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].collect()
    assert(viaSort.toSeq == kernel.toSeq)
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    val pairs = docs.as("l").crossJoin(docs.as("r"))
      .select(Dedup.sortedShingleHashes(col("l.text"), 3).as("fa"),
        Dedup.sortedShingleHashes(col("r.text"), 3).as("fb"))
    val viaIntersect = pairs.select(
      size(array_intersect(col("fa"), col("fb"))).as("c")).as[Int].collect()
    val kernel = pairs.select(
      VectorExprs.sortedIntersectCount(col("fa"), col("fb")).as("c")).as[Int].collect()
    assert(viaIntersect.toSeq == kernel.toSeq)
    // and at least one pair intersects non-trivially (the self pairs)
    assert(kernel.exists(_ > 1))
  }

  test("DotProduct kernel == aggregate(zip_with(...)) fold, same order") {
    val vecs = Seq(
      (Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 2.0)),
      (Array(0.1, 0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val hof = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d")).as[Double].collect()
    val kernel = vecs.select(VectorExprs.dot(col("a"), col("b")).as("d"))
      .as[Double].collect()
    assert(hof.toSeq == kernel.toSeq)
  }

  test("Simhash60 kernel == exploded 60-aggregate composition (incl. md5 hashing)") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "THE  QUICK   brown fox jumps over the lazy dog"), // normalize-equal to 0
      (2L, "one token repeated repeated repeated repeated"),
      (3L, "x"),
      (4L, ""),                                              // empty → one empty token
      (5L, "unicode héllo wörld 中文 tokens here"))
      .toDF("doc_id", "text")
    val kernel = graft.operators.Dedup.simhashTable(docs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val composed = graft.operators.Dedup.simhashTableComposed(docs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(kernel == composed)
    assert(kernel(0)._2 == kernel(1)._2) // normalization collapses 0 and 1
  }
}
