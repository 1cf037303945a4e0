package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** Template-compiler cases mirroring `/root/reference/pkg/nginx/template_test.go`
  * and the edge corpus in /root/repo/FIXTURES.md §5.
  */
class LogTemplateSpec extends AnyFunSuite {

  val sampleFormat: String =
    "$remote_addr - $remote_user [$time_local] \"$request\" $status $bytes_sent " +
      "$request_time \"$request_method\" \"$http_referer\" \"$http_user_agent\" " +
      "$https $custom_field <$custom_time_field> $field_uint8 $field_uint16 " +
      "$field_uint32 $field_uint64 | $field_int8 $field_int16 $field_int32 " +
      "$field_int64 | $field_f32 $field_f64 | $field_fixed_string | $field_date"

  val goldenLine: String =
    "114.119.133.192 - - [21/Jul/2022:00:30:43 +0300] \"GET /sito/wp-includes/wlwmanifest.xml HTTP/1.1\" " +
      "444 9 100000.14 \"GET\" \"-\" \"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/78.0.3904.108 Safari/537.36\" ON 10 <2022-07-21T00:30:43> " +
      "8 16 32 64 | 11 22 33 44 | 1000 2000 | 1234567890_abcdefg | 2022-07-21"

  test("golden 24-field line parses to expected raw fields (template_test.go:15-54)") {
    val tpl = LogTemplate.compile(sampleFormat)
    val got = tpl.parse(goldenLine).getOrElse(fail("golden line did not match"))
    assert(got("remote_addr") == "114.119.133.192")
    assert(got("remote_user") == "-")
    assert(got("time_local") == "21/Jul/2022:00:30:43 +0300")
    assert(got("request") == "GET /sito/wp-includes/wlwmanifest.xml HTTP/1.1")
    assert(got("status") == "444")
    assert(got("bytes_sent") == "9")
    assert(got("request_time") == "100000.14")
    assert(got("request_method") == "GET")
    assert(got("http_referer") == "-")
    assert(got("http_user_agent").startsWith("Mozilla/5.0"))
    assert(got("https") == "ON")
    assert(got("custom_field") == "10")
    assert(got("custom_time_field") == "2022-07-21T00:30:43")
    assert(got("field_uint8") == "8" && got("field_uint16") == "16")
    assert(got("field_uint32") == "32" && got("field_uint64") == "64")
    assert(got("field_int8") == "11" && got("field_int16") == "22")
    assert(got("field_int32") == "33" && got("field_int64") == "44")
    assert(got("field_f32") == "1000" && got("field_f64") == "2000")
    assert(got("field_fixed_string") == "1234567890_abcdefg")
    assert(got("field_date") == "2022-07-21")
  }

  test("garbage line is rejected (template.go:25-28)") {
    val tpl = LogTemplate.compile(sampleFormat)
    assert(tpl.parse("complete garbage with no structure").isEmpty)
  }

  test("adjacent vars share the downstream delimiter (template.go:44-51)") {
    val tpl = LogTemplate.compile("$a$b x")
    assert(tpl.fields == Vector("a", "b"))
    // Reference semantics: both groups are [^ ]*; first is greedy.
    val got = tpl.parse("hello x").get
    assert(got("a") == "hello" && got("b") == "")
  }

  test("template-final variable uses space delimiter (template.go:52)") {
    val tpl = LogTemplate.compile("$a - $b")
    val got = tpl.parse("x - y").get
    assert(got("a") == "x" && got("b") == "y")
  }

  test("quoted and bracketed literals are matched verbatim") {
    val tpl = LogTemplate.compile("\"$m\" [$t] $s")
    val got = tpl.parse("\"GET\" [now] 200").get
    assert(got("m") == "GET" && got("t") == "now" && got("s") == "200")
  }

  test("go time layout translates to JDK pattern") {
    assert(GoTimeLayout.toJava("02/Jan/2006:15:04:05 -0700") == "dd/MMM/yyyy:HH:mm:ss Z")
    assert(GoTimeLayout.toJava("2006-01-02T15:04:05") == "yyyy-MM-dd'T'HH:mm:ss")
    assert(GoTimeLayout.toJava("2006-01-02") == "yyyy-MM-dd")
    assert(GoTimeLayout.toJava("2006-01-02T15:04:05Z07:00") == "yyyy-MM-dd'T'HH:mm:ssXXX")
  }

  test("property: random well-formed lines round-trip render -> parse -> fields") {
    import org.scalacheck.Gen
    val fieldVal = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val quotedVal = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '/', '.', ':'))).map(_.mkString.trim)
      .suchThat(s => s.nonEmpty && !s.contains("\""))
    val fmt = "$a - $b [$t] \"$q\" $s $bytes"
    val tpl = LogTemplate.compile(fmt)
    val gen = for {
      a <- fieldVal; b <- fieldVal; t <- quotedVal.suchThat(!_.contains("]"))
      q <- quotedVal; s <- fieldVal; by <- fieldVal
    } yield (a, b, t, q, s, by)
    val seed = org.scalacheck.rng.Seed(42L)
    val cases = Iterator.iterate(seed)(_.next).take(300)
      .flatMap(sd => gen.apply(Gen.Parameters.default, sd)).toList
    assert(cases.size >= 250) // generator health
    cases.foreach { case (a, b, t, q, s, by) =>
      val line = s"$a - $b [$t] \"$q\" $s $by"
      val parsed = tpl.parse(line)
        .getOrElse(fail(s"did not match: $line"))
      assert(parsed("a") == a, line)
      assert(parsed("b") == b, line)
      assert(parsed("t") == t, line)
      assert(parsed("q") == q, line)
      assert(parsed("s") == s, line)
      assert(parsed("bytes") == by, line)
    }
  }

  test("property: random garbage never matches the anchored format") {
    import org.scalacheck.Gen
    val tpl = LogTemplate.compile("$a - $b [$t] \"$q\" $s $bytes")
    val garbage = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val seed = org.scalacheck.rng.Seed(7L)
    Iterator.iterate(seed)(_.next).take(200)
      .flatMap(sd => garbage.apply(Gen.Parameters.default, sd))
      .foreach(s => assert(tpl.parse(s).isEmpty, s))
  }
}
