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
}
