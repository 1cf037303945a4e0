package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge-case pins for the r5 curation operators: quality-ranked dedup
  * survivors (d19), division-form BM25 keyword retrieval (t11), and the
  * rare-token `<unk>` rewrite (t12). The catalog's DuckDB oracles check
  * full-corpus behavior; these pin the tie-break / boundary semantics a
  * hash compare can't isolate.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- bestQualitySurvivors --------------------------------------------

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def pairsDf(rows: (Long, Long)*) = rows.toDF("a", "b")
  private def scoresDf(rows: (Long, Int)*) = rows.toDF("doc_id", "quality_score")

  test("bestQualitySurvivors keeps the max-score member, min id on ties") {
    val docs = docsDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 9L -> "solo")
    // cluster {1,2,3} (transitive via 1-2, 2-3), cluster {4} none
    val pairs = pairsDf(1L -> 2L, 2L -> 3L)
    // 3 has the best score -> only 3 survives the cluster
    val out = Dedup.bestQualitySurvivors(docs, pairs,
      scoresDf(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 5, 9L -> 1))
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(3L, 4L, 9L)) // 4 and 9 untouched singletons

    // tie on the max score -> the smaller id of the tied pair wins
    val tied = Dedup.bestQualitySurvivors(docs, pairs,
      scoresDf(1L -> 10, 2L -> 30, 3L -> 30, 4L -> 5, 9L -> 1))
      .select("doc_id").as[Long].collect().sorted
    assert(tied.toSeq == Seq(2L, 4L, 9L))
  }

  test("bestQualitySurvivors keeps full rows and every out-of-cluster doc") {
    val docs = docsDf(1L -> "keep me", 2L -> "drop me", 7L -> "bystander")
    val out = Dedup.bestQualitySurvivors(docs, pairsDf(1L -> 2L),
      scoresDf(1L -> 2, 2L -> 1, 7L -> 0)).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 7L))
    // survivor rows are the original docs rows (text intact)
    assert(out.find(_.getLong(0) == 1L).get.getString(1) == "keep me")
  }

  test("bestQualitySurvivors: unscored members still count as cluster members") {
    val docs = docsDf(1L -> "a", 2L -> "b", 3L -> "c", 8L -> "d", 9L -> "e")
    // doc 2 is clustered with 1 but missing from the score table: it must
    // lose to the scored rep, not silently survive beside it
    val out = Dedup.bestQualitySurvivors(docs, pairsDf(1L -> 2L),
      scoresDf(1L -> 5, 3L -> 1, 8L -> 1, 9L -> 1))
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L, 8L, 9L))
    // a cluster with NO scored member keeps exactly one doc (min id)
    val none = Dedup.bestQualitySurvivors(docs, pairsDf(8L -> 9L),
      scoresDf(1L -> 5, 2L -> 5, 3L -> 1))
      .select("doc_id").as[Long].collect().sorted
    assert(none.toSeq == Seq(1L, 2L, 3L, 8L))
  }

  test("bestQualitySurvivors matches a brute-force reference on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { _ =>
      val n = 2 + rnd.nextInt(18)
      val ids = (0 until n).map(_.toLong)
      val pairs = (0 until rnd.nextInt(2 * n)).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong; (a, b)
      }.filter(p => p._1 != p._2).map(p => (p._1 min p._2, p._1 max p._2)).distinct
      val scores = ids.map(i => i -> rnd.nextInt(4)) // narrow range forces ties

      // reference: union-find components, keep argmax(score, -id) per comp
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      val comps = ids.filter(i => pairs.exists(p => p._1 == i || p._2 == i))
        .groupBy(find)
      val expectLosers = comps.values.flatMap { members =>
        val sc = scores.toMap
        val rep = members.minBy(m => (-sc(m), m))
        members.filter(_ != rep)
      }.toSet
      val expect = ids.filterNot(expectLosers).sorted

      val got = Dedup.bestQualitySurvivors(
        docsDf(ids.map(i => i -> s"doc$i"): _*),
        pairsDf(pairs: _*),
        scoresDf(scores: _*))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == expect, s"n=$n pairs=$pairs scores=$scores")
    }
  }

  // ---- keywordSearch ----------------------------------------------------

  test("keywordSearch ranks the rare term above common ones (idf dominance)") {
    // 'rare' in 1 of 4 docs; 'common' in all. BM25-shaped idf must rank
    // the rare-term doc first even when its tf is lower.
    val docs = Seq(
      (1L, "rare common common common"),
      (2L, "common common common common common common"),
      (3L, "common common"),
      (4L, "common")).toDF("doc_id", "text")
    val out = TextAnalysis.keywordSearch(docs, Seq("rare", "common"), topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.head._1 == 1L, s"rare-term doc should rank first, got ${out.toSeq}")
    // every doc matches 'common' so all 4 score > 0
    assert(out.length == 4)
    // scores strictly ordered desc with doc_id tiebreak
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
  }

  test("keywordSearch drops no-match docs and honors topK") {
    val docs = Seq(
      (1L, "x y z"), (2L, "needle x"), (3L, "needle needle x"), (4L, "w"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.keywordSearch(docs, Seq("needle"), topK = 1)
      .collect().map(_.getLong(0))
    // only docs 2 and 3 match; higher tf ranks doc 3 first; topK=1 keeps it
    assert(out.toSeq == Seq(3L))
  }

  test("keywordSearch on an empty corpus returns an empty typed result") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text").where(lit(false))
    val out = TextAnalysis.keywordSearch(docs, Seq("term"))
    assert(out.columns.toSeq == Seq("doc_id", "score"))
    assert(out.count() == 0)
  }

  // ---- scrubIntraDocSpans ----------------------------------------------

  test("intra-doc scrub cuts later repeats, keeps the first, leaves unique docs") {
    val docs = Seq(
      (1L, "a b c x a b c"),      // 3-gram "a b c" repeats at pos 5..7
      (2L, "a b c d e f"),        // unique — untouched
      (3L, "q q q q q"),          // overlapping self-repeats collapse to the seed
      (4L, "x y")                 // shorter than k: single whole-doc span, kept
    ).toDF("doc_id", "text")
    val out = Dedup.scrubIntraDocSpans(docs, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a b c x", 3L)))
    assert(out(2L) == (("a b c d e f", 0L)))
    // spans at pos 2 and 3 ("q q q") repeat pos 1: cut covers 2..5
    assert(out(3L) == (("q", 4L)))
    assert(out(4L) == (("x y", 0L)))
  }

  // ---- unkRewrite -------------------------------------------------------

  test("unkRewrite replaces below-threshold tokens only (boundary: >= keeps)") {
    // counts: a=3, b=2, c=1 -> minCount=2 keeps a,b and rewrites c
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val out = TextAnalysis.unkRewrite(docs, minCount = 2L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a b <unk>", 1L))
    assert(out(2L) == ("a b", 0L))
    assert(out(3L) == ("a", 0L))
  }

  test("unkRewrite with an impossible threshold rewrites everything") {
    val docs = Seq((1L, "p q"), (2L, "q r")).toDF("doc_id", "text")
    val out = TextAnalysis.unkRewrite(docs, minCount = 100L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("<unk> <unk>", 2L))
    assert(out(2L) == ("<unk> <unk>", 2L))
  }

  // ---- rarityScore (t13) ------------------------------------------------

  test("rarityScore: integer inverse-probability weights, hand-checked") {
    // counts: a=3, b=2, c=1; N=6. minCount=2 keeps a,b; c is OOV.
    // r(a) = 60000/3 = 20000, r(b) = 60000/2 = 30000,
    // r(OOV) = 60000 div 2 = 30000 (charged at the vocabulary floor)
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val out = TextAnalysis.rarityScore(docs, minCount = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (3L, 20000L + 30000L + 30000L, 80000L / 3L))
    assert(out(2L) == (2L, 50000L, 25000L))
    assert(out(3L) == (1L, 20000L, 20000L))
  }

  test("rarityScore: rarer tokens score strictly higher; div truncates") {
    // counts: x=6, y=1; N=7; minCount=1 keeps both.
    // r(x) = 70000 div 6 = 11666 (truncated), r(y) = 70000 div 1 = 70000
    val docs = Seq((1L, "x x x x"), (2L, "y x x")).toDF("doc_id", "text")
    val out = TextAnalysis.rarityScore(docs, minCount = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (4L * 11666L, 11666L))
    // sum = 70000 + 11666 + 11666 = 93332; 93332 div 3 = 31110
    assert(out(2L) == (93332L, 31110L))
  }

  // ---- hybridSearch (t14) -----------------------------------------------

  test("hybridSearch: RRF fuses both legs; single-leg docs score 1/(k+rank)") {
    // 4 docs: 10 lexical-only ('dup'), 11+12 both legs, 13 semantic-only.
    val docs = Seq(
      (10L, "dup dup dup"), (11L, "dup other"), (12L, "dup word"),
      (13L, "nothing here")).toDF("doc_id", "text")
    // embeddings: query 0 plus neighbors; 11 closest, then 12, then 13
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (11L, Array(0.99f, 0.1f)),
      (12L, Array(0.9f, 0.3f)), (13L, Array(0.5f, 0.8f)))
      .toDF("vec_id", "embedding")
    val out = TextAnalysis.hybridSearch(docs, emb, Seq("dup"), queryId = 0L,
      k = 3, topK = 10, rrfK = 60)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    // lexical ranks: 10 (tf=3, but short doc...) — just assert structure:
    // every returned doc has at least one rank and rrf = sum of its terms
    out.foreach { case (_, (rl, rs, rrf)) =>
      val expect = rl.map(r => 1.0 / (60 + r.asInstanceOf[Int])).getOrElse(0.0) +
        rs.map(r => 1.0 / (60 + r.asInstanceOf[Int])).getOrElse(0.0)
      assert(rrf == expect)
      assert(rl.isDefined || rs.isDefined)
    }
    // doc 13 is semantic-only (no 'dup'): present with rank_sem, no rank_lex
    assert(out(13L)._1.isEmpty && out(13L)._2.isDefined)
    // docs on both legs outrank single-leg docs with comparable positions:
    // 11 has sem rank 1 and a lex rank -> strictly more than any single leg
    assert(out(11L)._1.isDefined && out(11L)._2.isDefined)
    val best = out.toSeq.maxBy(_._2._3)
    assert(best._1 == 11L)
  }

  test("hybridSearch: query vector excluded from the semantic leg") {
    val docs = Seq((0L, "dup"), (1L, "dup")).toDF("doc_id", "text")
    val emb = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val out = TextAnalysis.hybridSearch(docs, emb, Seq("dup"), queryId = 0L,
      k = 5, topK = 10)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(0L).isEmpty)   // doc 0 = the query: lexical leg only
    assert(out(1L).isDefined) // its neighbor ranks semantically
  }

  test("hybridSearch: ivf semantic leg honors the same output contract") {
    // centroid = vec 0 (id % 37 == 0) — every vector lands in its cell,
    // so the single-cell probe sees the whole corpus and the fused result
    // must EQUAL the brute-force leg's (the general recall tradeoff is
    // s03's measured territory; here the contract equality is the pin)
    val docs = Seq(
      (10L, "dup dup"), (11L, "dup other"), (13L, "nothing")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (11L, Array(0.99f, 0.1f)),
      (13L, Array(0.5f, 0.8f))).toDF("vec_id", "embedding")
    def run(leg: String) = TextAnalysis.hybridSearch(docs, emb, Seq("dup"),
      queryId = 0L, k = 3, topK = 10, semLeg = leg)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toSeq
    assert(run("ivf") == run("brute"))
    intercept[IllegalArgumentException](
      TextAnalysis.hybridSearch(docs, emb, Seq("dup"), 0L, semLeg = "nope"))
  }
}
