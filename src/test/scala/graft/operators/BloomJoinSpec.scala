package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("params: power-of-two words, sane hash count") {
    val p = BloomJoin.params(32768, 0.01)
    assert(Integer.bitCount(p.numWords) == 1)
    assert(p.numHashes >= 4 && p.numHashes <= 16, p.toString)
    val tiny = BloomJoin.params(1, 0.5)
    assert(tiny.numWords >= 1 && tiny.numHashes >= 1)
  }

  test("no false negatives: every inserted key passes, any partitioning") {
    import spark.implicits._
    val keys = (0L until 5000L).map(_ * 7 + 3)
    val p = BloomJoin.params(5000, 0.01)
    for (parts <- Seq(1, 13)) {
      val words = BloomJoin.build(
        keys.toDF("k").repartition(parts), "k", p)
      val hits = keys.toDF("k").crossJoin(broadcast(words))
        .where(BloomJoin.mightContain(col("bloom_words"), col("k"), p))
        .count()
      assert(hits == keys.size, s"parts=$parts: $hits of ${keys.size}")
    }
  }

  test("measured fpp on non-members stays near the sized target") {
    import spark.implicits._
    val members = (0L until 5000L).map(_ * 2) // evens
    val p = BloomJoin.params(5000, 0.01)
    val words = BloomJoin.build(members.toDF("k"), "k", p)
    val probes = (0L until 20000L).map(_ * 2 + 1) // odds — disjoint
    val fp = probes.toDF("k").crossJoin(broadcast(words))
      .where(BloomJoin.mightContain(col("bloom_words"), col("k"), p))
      .count()
    val rate = fp.toDouble / probes.size
    assert(rate <= 0.03, s"fpp $rate vs sized 0.01")
  }

  test("prefilterJoin ≡ plain join, incl. duplicate keys both sides") {
    import spark.implicits._
    val fact = (0 until 4000).map(i => ((i % 400).toLong, i.toLong))
      .toDF("fk", "payload")
    val dim = (0 until 120).map(i => ((i % 60).toLong * 3, s"d$i"))
      .toDF("dk", "tag") // keys 0,3,...,177, each twice
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("fk", "payload", "tag").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val bloomed = BloomJoin.prefilterJoin(fact, dim, "fk", "dk",
      expectedItems = 64, fpp = 0.01)
      .select("fk", "payload", "tag").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(bloomed == plain)
    // grossly undersized capacity: still exactly the plain join
    val tiny = BloomJoin.prefilterJoin(fact, dim, "fk", "dk",
      expectedItems = 2, fpp = 0.5)
      .select("fk", "payload", "tag").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(tiny == plain)
  }

  test("the gate actually cuts the fact side before the join exchange") {
    import spark.implicits._
    val fact = (0L until 10000L).toDF("fk") // keys 0..9999
    val dim = (0L until 100L).map(_ * 100).toDF("dk") // 1% selectivity
    val p = BloomJoin.params(100, 0.01)
    val words = BloomJoin.build(dim, "dk", p)
    val gated = fact.crossJoin(broadcast(words))
      .where(BloomJoin.mightContain(col("bloom_words"), col("fk"), p))
      .count()
    // 100 members + fp on 9900 non-members; at 1% sizing the gate must
    // pass well under 5% of the fact side
    assert(gated >= 100 && gated <= 500, s"gated=$gated")
  }
}
