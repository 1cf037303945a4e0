package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de", s"doc $i"))
    .toDF("doc_id", "lang", "text")

  test("hashSplit: deterministic, exhaustive, stable under corpus growth") {
    val s1 = Sampling.hashSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val s2 = Sampling.hashSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1 == s2) // deterministic
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    // growth stability: the split of an id doesn't depend on the rest
    val grown = docs.unionByName(
      Seq((10000L, "en", "new doc")).toDF("doc_id", "lang", "text"))
    val s3 = Sampling.hashSplit(grown).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1.forall { case (id, sp) => s3(id) == sp })
    // roughly 80/10/10 (hash balance; loose bounds on 200 ids)
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 120 && counts("train") < 190)
    // a different salt reshuffles at least one assignment
    val salted = Sampling.hashSplit(docs, salt = "exp2").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(salted != s1)
  }

  test("sequentialPack: running offsets chunk the concatenated stream") {
    val d = Seq(
      (1L, "g", 100L), (2L, "g", 300L), (3L, "g", 200L), (4L, "g", 50L),
      (5L, "h", 600L))
      .toDF("doc_id", "grp", "toks")
    val packed = Sampling.sequentialPack(d, "grp", "doc_id", col("toks"), budget = 512)
      .select("doc_id", "offset", "bin", "bin_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // stream g: offsets 0, 100, 400, 600 → bins 0,0,0,1; h restarts at 0
    assert(packed.toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 100L, 0L, 100L), (3L, 400L, 0L, 400L),
      (4L, 600L, 1L, 88L), (5L, 0L, 0L, 0L)))
  }
}
