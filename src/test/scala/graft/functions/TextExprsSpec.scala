package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** The one-pass TextQualityStats kernel must be bit-identical to the
  * composed regex/HOF form it replaces — including the Java-split edge
  * cases (empty input, whitespace-only input, leading tab) and non-ASCII
  * text.
  */
class TextExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "The quick brown fox, and THE lazy dog! 42 times."),
    (1L, ""),                                   // split("") → one empty token
    (2L, "   "),                                // all spaces → trim → ""
    (3L, "\tleading tab then words"),           // phantom leading empty field
    (4L, "unicode héllo wörld 中文 ünïcode 42"),
    (5L, "a b\tc\nde\ff\rg"),             // every \s class as separator
    (6L, "IT is THAT it IS for TO a THE"),      // case-folded stopword hits
    (7L, "punct!!! ###$$$ %%%^^^ &&&*** 123"),
    (8L, "trailing spaces and tab\t "),
    (9L, "словарь кириллица текст the и of"))   // multibyte + embedded stopwords
    .toDF("doc_id", "text")

  test("TextQualityStats kernel == composed regex/HOF quality score") {
    val kernel = TextAnalysis.qualityScore(docs).orderBy("doc_id").collect().toSeq
    val composed = TextAnalysis.qualityScoreComposed(docs).orderBy("doc_id").collect().toSeq
    kernel.zip(composed).foreach { case (k, c) =>
      assert(k == c, s"\nkernel:   $k\ncomposed: $c")
    }
  }

  test("kernel struct counters on a known document") {
    val r = docs.where($"doc_id" === 0)
      .select(TextExprs.textQualityStats(col("text"), TextAnalysis.EnStopwords).as("s"))
      .select("s.*").collect().head
    assert(r.getAs[Int]("n_chars") == 48)
    assert(r.getAs[Int]("n_toks") == 10)
    assert(r.getAs[Int]("stop_hits") == 3) // the, and, the
    assert(r.getAs[Int]("n_digit") == 2)
    assert(r.getAs[Int]("n_space") == 9)
  }

  test("RepetitionStats kernel == exploded gram-count composition") {
    val reps = Seq(
      (10L, "spam spam spam spam egg"),              // top1=4; "spam spam"×3
      (11L, "a b a b a b a"),                        // alternating bigram repeats
      (12L, "one two three four five six"),          // no repetition
      (13L, "x"),                                    // single token: n<2, n<3 fallback
      (14L, ""),                                     // empty → one empty token
      (15L, "p q r p q r p q r"))                    // trigram "p q r"×3
      .toDF("doc_id", "text")
    val all = docs.select("doc_id", "text").unionByName(reps)
    val kernel = TextAnalysis.repetitionSignals(all).orderBy("doc_id").collect().toSeq
    val composed = TextAnalysis.repetitionSignalsComposed(all).orderBy("doc_id").collect().toSeq
    kernel.zip(composed).foreach { case (k, c) =>
      assert(k == c, s"\nkernel:   $k\ncomposed: $c")
    }
    val m = TextAnalysis.repetitionSignals(reps).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap // doc_id -> top1_bp
    assert(m(10L) == 8000) // 4 of 5 tokens are "spam"
  }
}
