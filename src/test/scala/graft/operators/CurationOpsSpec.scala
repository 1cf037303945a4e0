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
}
