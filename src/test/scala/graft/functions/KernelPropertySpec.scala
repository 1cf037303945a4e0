package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Randomized equivalence for the per-row kernels: each kernel must agree
  * with its composed (explode/HOF/regex) reference implementation on
  * arbitrary token streams, not just the curated fixtures — including
  * pathological repetition, single-token docs, and high-duplication
  * vocabularies (tiny alphabets force hash-collision-adjacent paths and
  * heavy gram repeats).
  */
class KernelPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // documents over a TINY vocabulary → dense repetition of tokens/grams
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "x", "spam"))
  } yield toks.mkString(" ")

  private def sample(n: Int, g: Gen[String]): Seq[String] =
    LazyList.from(0)
      .map(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
      .flatten.take(n).toList

  test("repetitionSignals kernel == composed form on random repetitive docs") {
    val docs = sample(60, docGen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = TextAnalysis.repetitionSignals(docs).orderBy("doc_id").collect().toSeq
    val composed = TextAnalysis.repetitionSignalsComposed(docs).orderBy("doc_id").collect().toSeq
    kernel.zip(composed).foreach { case (k, c) =>
      assert(k == c, s"\nkernel:   $k\ncomposed: $c")
    }
  }

  test("simhashTable kernel == composed form on random repetitive docs") {
    val docs = sample(60, docGen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = Dedup.simhashTable(docs).orderBy("id").collect().toSeq
    val composed = Dedup.simhashTableComposed(docs).orderBy("id").collect().toSeq
    assert(kernel == composed)
  }

  test("spanHashes kernel == composed xxhash64-over-span-strings on random docs") {
    val k = 5
    val docs = sample(60, docGen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.normalize(col("text")).as("norm"))
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("n", size(col("toks")))
    val composed = docs.select(col("doc_id"),
      when(col("n") >= k,
        transform(sequence(lit(1), col("n") - (k - 1)),
          i => xxhash64(array_join(slice(col("toks"), i, lit(k)), " "))))
        .otherwise(array(xxhash64(col("norm")))).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val kernel = docs.select(col("doc_id"),
      graft.functions.VectorExprs.spanHashes(col("norm"), k).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(kernel == composed)
  }

  test("chunkStride: full coverage, bounded overlap, reconstruction") {
    val docs = sample(40, docGen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val win = 5
    val stride = 3
    val chunks = Sampling.chunkStride(docs, win, stride)
      .select("doc_id", "chunk_idx", "start", "n_toks", "chunk")
      .as[(Long, Int, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val norm = docs.select(col("doc_id"),
      Dedup.normalize(col("text")).as("t")).as[(Long, String)].collect().toMap
    chunks.foreach { case (id, cs) =>
      val toks = norm(id).split(" ", -1)
      // aligned starts advance by exactly `stride`; the final start is the
      // end-aligned max(n - win + 1, 1)
      val maxStart = math.max(toks.length - win + 1, 1)
      cs.init.zipWithIndex.foreach { case (c, i) => assert(c._3 == 1 + i * stride) }
      assert(cs.last._3 == maxStart)
      // every token position is covered by at least one chunk
      val covered = cs.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert((1 to toks.length).forall(covered.contains))
      // each chunk reconstructs the token slice it claims
      cs.foreach { c =>
        assert(c._5 == toks.slice(c._3 - 1, c._3 - 1 + win).mkString(" "))
      }
    }
  }
}
