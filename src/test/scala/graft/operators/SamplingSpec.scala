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

  test("mixtureSample: fractional epochs realize floor/ceil copies at target rates") {
    val src = docs.withColumn("source",
      when($"doc_id" < 100, "a").otherwise("b"))
    val out = Sampling.mixtureSample(src, Map("a" -> 25000, "b" -> 5000))
      .select("doc_id", "copy").as[(Long, Int)].collect()
    val copiesPerDoc = out.groupBy(_._1).view.mapValues(_.length).toMap
    // source a (2.5 epochs): every doc 2 or 3 copies; ~half get the extra
    val aCounts = copiesPerDoc.filter(_._1 < 100).values
    assert(aCounts.forall(c => c == 2 || c == 3))
    assert(aCounts.count(_ == 3) > 25 && aCounts.count(_ == 3) < 75)
    // source b (0.5 epoch): docs appear once or not at all
    val bIds = (100L until 200L).toSet
    val bCounts = bIds.map(id => copiesPerDoc.getOrElse(id, 0))
    assert(bCounts.forall(c => c == 0 || c == 1))
    val bKept = bIds.count(id => copiesPerDoc.contains(id))
    assert(bKept > 25 && bKept < 75)
    // copy numbers are 1..n, deterministic across runs
    assert(out.filter(_._1 < 100).groupBy(_._1).values
      .forall(g => g.map(_._2).sorted.sameElements(1 to g.length)))
    val again = Sampling.mixtureSample(src, Map("a" -> 25000, "b" -> 5000))
      .select("doc_id", "copy").as[(Long, Int)].collect()
    assert(out.sorted.sameElements(again.sorted))
  }

  test("stratifiedTake: exactly n per stratum, deterministic, salt-sensitive") {
    val s1 = Sampling.stratifiedTake(docs, "lang", "doc_id", n = 7)
      .select("doc_id", "lang", "rn").as[(Long, String, Int)].collect()
    assert(s1.length == 14) // 7 per language
    assert(s1.groupBy(_._2).values.forall(g => g.map(_._3).sorted.sameElements(1 to 7)))
    val s2 = Sampling.stratifiedTake(docs, "lang", "doc_id", n = 7)
      .select("doc_id", "lang", "rn").as[(Long, String, Int)].collect()
    assert(s1.sortBy(_._1).sameElements(s2.sortBy(_._1)))
    val salted = Sampling.stratifiedTake(docs, "lang", "doc_id", n = 7, salt = "x")
      .select("doc_id").as[Long].collect()
    assert(salted.sorted.toSeq != s1.map(_._1).sorted.toSeq)
    // a stratum smaller than n yields all its rows
    val tiny = Sampling.stratifiedTake(
      docs.where($"doc_id" < 3), "lang", "doc_id", n = 7)
    assert(tiny.count() == 3)
  }

  test("epochShuffle: exhaustive shard+pos permutation; salt changes the order") {
    val e1 = Sampling.epochShuffle(docs, numShards = 4, salt = "e1")
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(e1.length == 200)
    // within each shard, pos is a contiguous 1..n ranking
    e1.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.sameElements(1 to g.length))
    }
    // a different epoch salt yields a different permutation
    val e2 = Sampling.epochShuffle(docs, numShards = 4, salt = "e2")
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(e1.sortBy(_._1).map(x => (x._2, x._3)).toSeq !=
      e2.sortBy(_._1).map(x => (x._2, x._3)).toSeq)
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

  test("rankedTake: best-n per stratum by score desc, ties to smaller id") {
    val rows = Seq(
      (1L, "a", 50L), (2L, "a", 90L), (3L, "a", 70L), (4L, "a", 90L),
      (5L, "b", 10L), (6L, "b", 20L)).toDF("doc_id", "stratum", "score")
    val out = Sampling.rankedTake(rows, "stratum", "doc_id", col("score"), n = 2)
      .select("doc_id", "stratum", "rn").as[(Long, String, Int)].collect()
      .sortBy(r => (r._2, r._3))
    // a: 90@2 beats 90@4 on id, then 90@4; 70/50 dropped. b: all kept.
    assert(out.map(r => (r._1, r._2, r._3)).sameElements(
      Array((2L, "a", 1), (4L, "a", 2), (6L, "b", 1), (5L, "b", 2))))
  }

  test("weightedTake: deterministic, weight-biased, excludes non-positive weights") {
    val rows = (0L until 100L).map(i =>
      (i, "s", if (i < 50) 100.0 else 1.0)).toDF("doc_id", "stratum", "w")
      .unionByName(Seq((200L, "s", 0.0), (201L, "s", -1.0)).toDF("doc_id", "stratum", "w"))
    val take1 = Sampling.weightedTake(rows, "stratum", "doc_id", col("w"), n = 10)
      .select("doc_id").as[Long].collect().sorted
    val take2 = Sampling.weightedTake(rows, "stratum", "doc_id", col("w"), n = 10)
      .select("doc_id").as[Long].collect().sorted
    assert(take1.sameElements(take2)) // no RNG state: bit-reproducible
    assert(take1.length == 10)
    assert(!take1.contains(200L) && !take1.contains(201L))
    // 100:1 weight ratio → the heavy half should dominate the pick
    assert(take1.count(_ < 50) >= 8, take1.mkString(","))
    // a different salt draws a different (still deterministic) sample
    val salted = Sampling.weightedTake(rows, "stratum", "doc_id", col("w"),
      n = 10, salt = "other").select("doc_id").as[Long].collect().sorted
    assert(!salted.sameElements(take1))
  }

  test("chunkStride: overlapping windows, tail clamping, short-doc fallback") {
    // 10 tokens, win=4, stride=3 → starts 1,4,7 (last start ≤ n-win+1=7)
    val d = Seq((1L, "a b c d e f g h i j"), (2L, "x y")).toDF("doc_id", "text")
    val chunks = Sampling.chunkStride(d, win = 4, stride = 3)
      .select("doc_id", "chunk_idx", "start", "n_toks", "chunk")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(c => (c._1, c._2))
    assert(chunks.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, 1, 4, "a b c d"), (1L, 1, 4, 4, "d e f g"), (1L, 2, 7, 4, "g h i j")))
    // overlap: chunk i shares win-stride=1 token with chunk i+1 ("d", "g")
    // short doc: one clamped chunk
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0, 1, 2, "x y")))
    // unaligned tail: 5 tokens win=4 stride=3 → aligned start 1, then the
    // end-aligned tail window at n-win+1=2 so token 5 is covered
    val e = Seq((3L, "p q r s t")).toDF("doc_id", "text")
    val ch2 = Sampling.chunkStride(e, win = 4, stride = 3)
      .select("chunk_idx", "start", "n_toks", "chunk")
      .as[(Int, Int, Int, String)].collect().toSeq.sorted
    assert(ch2 == Seq((0, 1, 4, "p q r s"), (1, 2, 4, "q r s t")))
  }

  test("sentenceChunks: greedy packing never cuts inside a sentence") {
    // sentences: "aaaa bb." (8) / "cc dd!" (6) / "eee?" (4) / "ff gg" (5)
    // maxChars=16: chunk0 = s1+s2 (8+1+6=15 ≤ 16; +s3 would be 20),
    // chunk1 = s3+s4 (4+1+5=10)
    val d = Seq((1L, "aaaa bb. cc dd! eee? ff gg")).toDF("doc_id", "text")
    val got = Sampling.sentenceChunks(d, maxChars = 16)
      .select("doc_id", "chunk_idx", "chunk_text", "n_sents", "n_chars")
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, 0L, "aaaa bb. cc dd!", 2L, 15L),
      (1L, 1L, "eee? ff gg", 2L, 10L)))
  }

  test("sentenceChunks: oversized sentence gets its own chunk, never split") {
    val d = Seq((1L, "tiny. " + ("w" * 40) + ". end.")).toDF("doc_id", "text")
    val got = Sampling.sentenceChunks(d, maxChars = 10)
      .select("chunk_idx", "chunk_text").as[(Long, String)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, "tiny."), (1L, "w" * 40 + "."), (2L, "end.")))
  }

  test("sentenceChunks: punctuation-free doc is one sentence, one chunk") {
    val d = Seq((7L, "no boundaries here at all")).toDF("doc_id", "text")
    val got = Sampling.sentenceChunks(d, maxChars = 8)
      .select("chunk_idx", "chunk_text", "n_sents")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((0L, "no boundaries here at all", 1L)))
  }

  test("sentenceChunks is map-only (zero exchanges)") {
    val d = Seq((1L, "a. b. c.")).toDF("doc_id", "text")
    val plan = Sampling.sentenceChunks(d, maxChars = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("dsirWeights: hand-checked integer ratio model") {
    // source bigrams: doc1 -> "a a","a b"; doc2 -> "c c","c c"
    // source model: cnt("a a")=1, cnt("a b")=1, cnt("c c")=2, tot=4
    //   ps = (1e9·(cnt+1)) div 5 → 400000000 / 400000000 / 600000000
    // target = doc1: cnt("a a")=1, cnt("a b")=1, tot=2
    //   pt = (1e9·2) div 3 = 666666666
    // r("a a") = r("a b") = (10000·666666666) div 400000000 = 16666
    // r("c c") = (10000·0) div 600000000 = 0
    // (assumes the three bigrams land in distinct md5 buckets of 1024 —
    // deterministic, so this either always holds or never does)
    val docs = Seq((1L, "a a b"), (2L, "c c c")).toDF("doc_id", "text")
    val out = Sampling.dsirWeights(docs, docs.where($"doc_id" === 1L),
      n = 2, buckets = 1024)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (2L, 33332L, 16666L))
    assert(out(2L) == (2L, 0L, 0L))
  }

  test("dsirWeights: target-like docs outscore off-target docs") {
    val docs = Seq(
      (1L, "spark join window agg"), (2L, "spark join window agg"),
      (3L, "llama bison yak emu"), (4L, "spark join llama bison"))
      .toDF("doc_id", "text")
    val out = Sampling.dsirWeights(docs, docs.where($"doc_id" === 1L), n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // doc2 duplicates the target text: max weight; doc3 shares nothing: 0
    assert(out(2L) == out(1L) && out(1L) > out(4L) && out(4L) > out(3L))
    assert(out(3L) == 0L)
  }

  test("temperature weights: exact √-rule basis points; Long-overflow regime") {
    // √-scores 300000 / 100000 → shares 3/4, 1/4 of a 1000-doc target:
    // head 0.8333 copies/doc, tail 2.5 copies/doc — hand-checked integers
    val w = Sampling.temperatureWeightsBp(Map("a" -> 900L, "b" -> 100L), 1000L)
    assert(w == Map("a" -> 8333, "b" -> 25000))
    // 100 TB regime: n ~ 10^10 would overflow the Long numerator; BigInt
    // path must still produce the exact uniform answer (equal domains →
    // exactly one epoch each)
    val big = Sampling.temperatureWeightsBp(
      Map("x" -> 10000000000L, "y" -> 10000000000L), 20000000000L)
    assert(big == Map("x" -> 10000, "y" -> 10000))
  }

  test("excess-surprisal weights: hard domains up, floor keeps the easiest, budget conserved") {
    // means: a = 5000/10 = 500 (easiest → excess 1), b = 14000/20 = 700
    // (excess 201); esum 202, T = 30:
    //   a: 10000·30·1/(202·10)  = 148 bp (0.0148 copies/doc)
    //   b: 10000·30·201/(202·20) = 14925 bp (1.49 copies/doc)
    val w = Sampling.excessWeightsBp(
      Map("a" -> (10L, 5000L), "b" -> (20L, 14000L)), targetTotal = 30L)
    assert(w == Map("a" -> 148, "b" -> 14925))
    // budget conservation to rounding: Σ n_d · bp_d / 10⁴ ≈ T
    val spent = w.map { case (d, bp) =>
      Map("a" -> 10L, "b" -> 20L)(d) * bp / 10000.0 }.sum
    assert(math.abs(spent - 30.0) < 0.2, s"budget drifted: $spent")
    // equal-surprisal domains degrade to uniform (every excess = 1)
    val eq = Sampling.excessWeightsBp(
      Map("x" -> (100L, 700000L), "y" -> (300L, 2100000L)), targetTotal = 400L)
    assert(eq == Map("x" -> 20000, "y" -> 6666))
    // 100 TB regime: Long numerator would wrap; BigInt path stays exact
    val big = Sampling.excessWeightsBp(
      Map("x" -> (10000000000L, 5000000000000000L),
          "y" -> (10000000000L, 5000000000000000L)),
      targetTotal = 20000000000L)
    assert(big == Map("x" -> 10000, "y" -> 10000))
  }

  test("excessSurprisalMixture: hard domain oversampled end-to-end") {
    val docs = ((0L until 300L).map(i => (i, "easy", 500L)) ++
      (300L until 400L).map(i => (i, "hard", 900L)))
      .toDF("doc_id", "domain", "surp_mean_e4")
    val out = Sampling.excessSurprisalMixture(docs, srcCol = "domain")
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    // easy: excess 1 of esum 402 → ~1 copy total; hard: 401/402 of the
    // 400-doc budget → ~4 copies/doc
    assert(out.getOrElse("hard", 0L) > 350L, s"hard undersampled: $out")
    assert(out.getOrElse("easy", 0L) < 20L, s"easy oversampled: $out")
  }

  test("percentileRank: endpoints, ties, singleton stratum") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 20L),
      (5L, "b", 999L)).toDF("doc_id", "src", "score")
    val out = Sampling.percentileRank(df, "src", "score")
      .select("doc_id", "pct_bp").as[(Long, Int)].collect().toMap
    // stratum a, order (score, id): 1(10) 2(20) 4(20) 3(30) → bp 0, 3333, 6666, 10000
    assert(out == Map(1L -> 0, 2L -> 3333, 4L -> 6666, 3L -> 10000, 5L -> 0))
  }

  test("temperatureMixture: head downsampled, tail upsampled, size ~preserved") {
    val skewed = ((0L until 900L).map(i => (i, "head")) ++
      (900L until 1000L).map(i => (i, "tail"))).toDF("doc_id", "domain")
    val out = Sampling.temperatureMixture(skewed, targetTotal = Some(1000L),
      srcCol = "domain")
    val byDom = out.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    // expectations: head 900·0.8333 = 750, tail 100·2.5 = 250; the
    // hash-fraction draw concentrates tightly (±5% at these sizes)
    assert(math.abs(byDom("head") - 750L) <= 40, s"head=${byDom("head")}")
    assert(math.abs(byDom("tail") - 250L) <= 20, s"tail=${byDom("tail")}")
    val total = byDom.values.sum
    assert(math.abs(total - 1000L) <= 50, s"total=$total")
  }
}
