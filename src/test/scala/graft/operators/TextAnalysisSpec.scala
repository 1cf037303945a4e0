package graft.operators

import org.apache.spark.sql.functions.{col, regexp_replace}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox, and the lazy dog! 42 times."),
    (1L, "el perro y el gato de la casa que es una maravilla"),
    (2L, "le chat et le chien du quartier dans les rues est une merveille"),
    (3L, "der hund und die katze ist von dem haus mit den blumen"),
    (4L, "xyzzy plugh qwerty")) // no stopword hits → und
    .toDF("doc_id", "text")

  test("token stats: ws/bpe/distinct counts") {
    val r = TextAnalysis.tokenStats(docs).where($"doc_id" === 0).collect().head
    assert(r.getAs[Int]("n_chars") == 48)
    assert(r.getAs[Int]("n_ws_tokens") == 10)
    // bpe: the quick brown fox , and the lazy dog ! 42 times . = 13
    assert(r.getAs[Int]("n_bpe_tokens") == 13)
    // distinct of [the quick brown fox, and the lazy dog! 42 times.]:
    // 'the' repeats → 9
    assert(r.getAs[Int]("n_distinct_tokens") == 9)
  }

  test("quality: basis-point ratios are exact integers") {
    val r = TextAnalysis.qualityScore(docs).where($"doc_id" === 4).collect().head
    assert(r.getAs[Int]("n_chars") == 18)
    assert(r.getAs[Int]("digit_bp") == 0)
    assert(r.getAs[Int]("stopword_bp") == 0)
    // alpha: 16 of 18 chars → floor(10000*16/18) = 8888
    assert(r.getAs[Int]("alpha_bp") == 8888)
  }

  test("langid: stopword voting with deterministic tie-break") {
    val preds = TextAnalysis.langId(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(preds(0L) == "en")
    assert(preds(1L) == "es")
    assert(preds(2L) == "fr")
    assert(preds(3L) == "de")
    assert(preds(4L) == "und")
  }

  test("fingerprint: stable under punctuation/whitespace/case edits") {
    val pair = Seq(
      (0L, "Hello, World!  This is   GREAT."),
      (1L, "hello world this is great"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(pair).select("fingerprint")
      .as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("repetition signals: degenerate repetition maxes the top-n-gram fractions") {
    val d = Seq(
      (0L, "spam spam spam spam spam spam spam spam"),   // 8× one token
      (1L, "one two three four five six seven eight"))   // all distinct
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Int]("n_toks") == 8)
    assert(r(0L).getAs[Int]("top1_bp") == 10000)    // every token is the top token
    assert(r(0L).getAs[Int]("top2_bp") == 10000)    // every 2-gram is "spam spam"
    assert(r(0L).getAs[Int]("distinct_bp") == 1250) // 1/8
    assert(r(1L).getAs[Int]("top1_bp") == 1250)     // 1/8
    assert(r(1L).getAs[Int]("top2_bp") == 1428)     // 1/7
    assert(r(1L).getAs[Int]("distinct_bp") == 10000)
  }

  test("pii redact: counts on original text, typed placeholders in output") {
    val d = Seq(
      (0L, "mail a.user+tag@sub.example.com or b@x.org tel 21-340-2467 from 10.0.12.7 done"),
      (1L, "no pii here at all"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.piiRedact(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Int]("n_emails") == 2)
    assert(r(0L).getAs[Int]("n_phones") == 1)
    assert(r(0L).getAs[Int]("n_ips") == 1)
    assert(r(0L).getAs[String]("redacted") ==
      "mail <EMAIL> or <EMAIL> tel <PHONE> from <IP> done")
    assert(r(1L).getAs[Int]("n_emails") == 0)
    assert(r(1L).getAs[String]("redacted") == "no pii here at all")
  }

  test("vocabulary: tf sums occurrences, df counts documents, top-k ordered") {
    val d = Seq(
      (0L, "apple apple banana"),
      (1L, "apple cherry cherry cherry"),
      (2L, "banana"))
      .toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(d, topK = 2)
      .as[(String, Long, Long)].collect()
    // apple tf=3 df=2; cherry tf=3 df=1; banana tf=2 df=2 — tie on tf
    // breaks by term asc, so top-2 is apple then cherry
    assert(v.toSeq == Seq(("apple", 3L, 2L), ("cherry", 3L, 1L)))
  }

  test("winnowing: shared token run of >= w+k-1 tokens shares a fingerprint") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "PREFIX words here alpha beta gamma delta epsilon zeta other tail"),
      (2L, "completely unrelated content with nothing in common at all"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowing(d, k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // docs 0 and 1 share the 6-token run "alpha beta gamma delta epsilon
    // zeta" (>= w+k-1 = 6) -> guaranteed shared fingerprint
    assert((fp(0L) & fp(1L)).nonEmpty)
    assert((fp(0L) & fp(2L)).isEmpty)
    // deterministic across invocations
    val fp2 = TextAnalysis.winnowing(d, k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(fp2 == TextAnalysis.winnowing(d, k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet)
  }

  test("topTerms: ubiquitous terms drop at the df cutoff; rank by tf then term") {
    val d = Seq(
      (0L, "the spark spark spark engine engine the the"),
      (1L, "the flink engine runs the stream the pipeline"),
      (2L, "the batch system the batch planner"),
      (3L, "the unrelated words appear once each here"),
      (4L, "the last document mentions planner once"))
      .toDF("doc_id", "text")
    // df cutoff 1/5 of 5 docs = df ≤ 1: only terms unique to one doc rank
    val top = TextAnalysis.topTerms(d, k = 2, dfNum = 1, dfDen = 5)
      .select("doc_id", "term", "tf", "rn")
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toList).toMap
    assert(top(0L) == List(("spark", 3L))) // "the"(df5), "engine"(df2) cut; spark tf3
    assert(top(2L).head == ("batch", 2L))  // tf wins over alphabetical
    assert(!top.values.flatten.exists(_._1 == "the")) // df cutoff enforced
  }

  test("c4Filters: each rule fires on its designed offender") {
    val d = Seq(
      (0L, "the quick brown fox jumps over a lazy dog and that is it for the story of it all"),
      (1L, "too short"),                                              // r_short
      (2L, "the " + "pneumonoultramicroscopic " * 20 + "and that is for it"), // r_word_len (long words)
      (3L, "zzz qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss ddd fff ggg hhh"), // r_no_stopwords
      (4L, "the standard filler lorem ipsum dolor sit amet and that is for it padding words here"), // r_lorem
      (5L, "function f() { return the a and of to it } plus words to reach the minimum token count")) // r_brace
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4Filters(d, minToks = 15)
      .select("doc_id", "r_short", "r_word_len", "r_no_stopwords", "r_lorem", "r_brace", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(0L)._7)            // clean doc kept
    assert(out(1L)._2 && !out(1L)._7)
    assert(out(2L)._3 && !out(2L)._7)
    assert(out(3L)._4 && !out(3L)._7)
    assert(out(4L)._5 && !out(4L)._7)
    assert(out(5L)._6 && !out(5L)._7)
  }

  test("nbClassify: learns label vocabularies, scores held-out docs") {
    val labeled = Seq(
      (0L, "spark shuffle executor partition stage", "eng"),
      (1L, "executor stage shuffle spark codegen", "eng"),
      (2L, "perro gato casa calle ciudad", "spa"),
      (3L, "gato ciudad casa perro cielo", "spa")).toDF("doc_id", "text", "label")
    val corpus = Seq(
      (10L, "spark executor shuffle"),       // all-eng vocabulary
      (11L, "perro casa gato"),              // all-spa vocabulary
      (12L, "spark perro executor stage")).toDF("doc_id", "text") // majority eng
    val out = TextAnalysis.nbClassify(corpus, labeled)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out.map(_._1).sameElements(Array(10L, 11L, 12L)))
    assert(out(0)._2 == "eng" && out(1)._2 == "spa" && out(2)._2 == "eng")
    // scores are exact integers; the winning score is the argmin
    assert(out.forall(_._3 > 0))
  }

  test("nbClassify: deterministic tie-break to the smaller label") {
    // perfectly symmetric labels: any doc of shared-count vocabulary ties
    val labeled = Seq(
      (0L, "alpha beta", "l1"),
      (1L, "gamma delta", "l2")).toDF("doc_id", "text", "label")
    val corpus = Seq((9L, "omega")).toDF("doc_id", "text") // OOV everywhere
    val out = TextAnalysis.nbClassify(corpus, labeled)
      .as[(Long, String, Long)].collect().head
    assert(out._2 == "l1") // equal scores → lexicographically smaller label
  }

  test("logTemplates: whole digit-bearing tokens mask to <*>, digitless " +
      "lines are their own template, example is the lexicographic min") {
    val lines = Seq(
      "1001 GET /p/42 200 17",
      "1002 GET /p/9000 200 3",
      "worker started",
      "worker started",
      "[error] upstream timed out, client 7",
      "conn from 10.0.0.1:8080 closed").toDF("value")
    val out = TextAnalysis.logTemplates(lines)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // the MASK consumes the whole token: '/p/42' → '<*>', not '/p/<*>'
    assert(out("<*> GET <*> <*> <*>") == ((2L, "1001 GET /p/42 200 17")))
    assert(out("worker started") == ((2L, "worker started")))
    assert(out("[error] upstream timed out, client <*>")._1 == 1L)
    assert(out("conn from <*> closed")._1 == 1L)
    assert(out.size == 4)
  }

  test("logTemplates streams: live template counts across micro-batches " +
      "≡ batch (the log-pattern monitor over the ingest feed)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq("10 GET /p/1 200", "worker started", "11 GET /p/2 200"),
      Seq("12 GET /p/9 404", "worker started"),
      Seq("13 GET /p/3 200", "[gc] pause 12ms"))
    val stream = MemoryStream[String]
    // the same mask expression, applied streaming-side; counts in
    // complete mode — templates are low-cardinality state by design
    val agg = stream.toDF().toDF("value")
      .select(regexp_replace(col("value"), "\\S*\\d\\S*", "<*>")
        .as("template"))
      .groupBy("template").count()
    val q = agg.writeStream.format("memory")
      .queryName("tmpl_stream_test").outputMode("complete").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("tmpl_stream_test")
      .as[(String, Long)].collect().toMap
    val want = TextAnalysis.logTemplates(batches.flatten.toDF("value"))
      .select("template", "n").as[(String, Long)].collect().toMap
    assert(got == want)
    // all four GET lines (batches 1-3, any status) share one template
    assert(got("<*> GET <*> <*>") == 4L && got("worker started") == 2L)
  }

  test("canonicalizeUrl: hand-checked normalization cases") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // case + fragment + tracking + param order + default port
      ("HTTP://Shop.Example.COM:80/p/1/?b=2&utm_source=x&a=1#frag",
        "http://shop.example.com/p/1?a=1&b=2"),
      // bare host → "/", https default port, click ids and bare ref drop
      ("https://Host.com:443?fbclid=zz&gclid=q&ref=tw",
        "https://host.com/"),
      // repeated trailing slashes collapse; empty pairs drop; kept
      // params sort; non-default port SURVIVES
      ("https://h.io:8080/a/b///?z=9&&m=1", "https://h.io:8080/a/b?m=1&z=9"),
      // already canonical is a fixpoint
      ("https://h.io/a?m=1&z=9", "https://h.io/a?m=1&z=9"),
      // utm params drop wherever they sit; query gone → no '?'
      ("http://h.io/x?utm_campaign=c&utm_medium=m", "http://h.io/x"))
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"$in → $g, want $want")
    }
    // idempotence: canonicalize(canonicalize(u)) == canonicalize(u)
    val twice = cases.map(_._2).toDF("url")
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(twice == cases.map(_._2))
  }

  test("fimSplit: conservation, passthrough gates, PSM reassembly round-trips") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),  // even, 6 toks → FIM
      (1L, "one two three four five"),              // odd → passthrough
      (2L, "a b c"),                                // even but < minToks
      (4L, "W X  Y Z"),                             // whitespace collapses, 4 toks
      (6L, "lone pair trio quad quint")             // even, 5 toks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.fimSplit(docs).orderBy("doc_id").collect()

    out.foreach { r =>
      val (n, c1, c2) = (r.getAs[Long]("n_toks"),
        r.getAs[Long]("cut1"), r.getAs[Long]("cut2"))
      // span conservation + cut ordering, every row
      assert(r.getAs[Long]("len_pre") + r.getAs[Long]("len_mid") +
        r.getAs[Long]("len_suf") == n)
      assert(0L <= c1 && c1 <= c2 && c2 <= n)
    }
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // gates: odd id and short doc pass through verbatim (normalized)
    assert(!byId(1L).getAs[Boolean]("fim") &&
      byId(1L).getAs[String]("out_text") == "one two three four five")
    assert(!byId(2L).getAs[Boolean]("fim") &&
      byId(2L).getAs[String]("out_text") == "a b c")
    // FIM'd rows: rebuild the expected PSM string from the row's own cuts
    // and the independently-normalized source (concat_ws keeps empties =
    // plain mkString(" ") over the same parts)
    val src = Map(0L -> "alpha beta gamma delta epsilon zeta",
      4L -> "W X  Y Z", 6L -> "lone pair trio quad quint")
    Seq(0L, 4L, 6L).foreach { id =>
      val r = byId(id)
      assert(r.getAs[Boolean]("fim"), s"doc $id should be FIM'd")
      val toks = src(id).toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ").toSeq
      val (c1, c2) = (r.getAs[Long]("cut1").toInt, r.getAs[Long]("cut2").toInt)
      val expected = Seq("<PRE>", toks.take(c1).mkString(" "),
        "<SUF>", toks.drop(c2).mkString(" "),
        "<MID>", toks.slice(c1, c2).mkString(" ")).mkString(" ")
      assert(r.getAs[String]("out_text") == expected, s"doc $id")
      // cuts match the documented modular arithmetic
      val n = toks.size.toLong
      val (h1, h2) = (id * 2654435761L % (n + 1), id * 2246822519L % (n + 1))
      assert(c1 == math.min(h1, h2) && c2 == math.max(h1, h2))
    }
    // determinism: same input, same cuts on a re-run
    val again = TextAnalysis.fimSplit(docs).orderBy("doc_id").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
