package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ClickHouse URL function family (q97): hand-pinned accessor cases over
  * every branch the synthesized q97 corpus exercises, plus the map-only
  * plan pin.
  */
class UrlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(url: String): Map[String, String] = {
    import UrlFunctions._
    val r = Seq(url).toDF("u").select(
      netloc(col("u")).as("nl"), domain(col("u")).as("dom"),
      topLevelDomain(col("u")).as("tld"),
      firstSignificantSubdomain(col("u")).as("fsd"),
      path(col("u")).as("p"), queryString(col("u")).as("qs"),
      fragment(col("u")).as("frag"),
      extractURLParameter(col("u"), "q").as("qv"),
      cutQueryStringAndFragment(col("u")).as("cut")).collect().head
    r.schema.fieldNames.map(f => f -> r.getAs[String](f)).toMap
  }

  test("full URL: userinfo and port stripped from domain, kept in netloc") {
    val m = one("https://user:pw@shop3.example.co.uk:8080/item/7?q=5&ref=x#sec2")
    assert(m("nl") == "user:pw@shop3.example.co.uk:8080")
    assert(m("dom") == "shop3.example.co.uk")
    assert(m("tld") == "uk")
    assert(m("fsd") == "example") // multi-part suffix: co.uk
    assert(m("p") == "/item/7")
    assert(m("qs") == "q=5&ref=x")
    assert(m("frag") == "sec2")
    assert(m("qv") == "5")
    assert(m("cut") == "https://user:pw@shop3.example.co.uk:8080/item/7")
  }

  test("plain .com host: fsd is the second-level label") {
    val m = one("http://news4.example.com/item/1")
    assert(m("dom") == "news4.example.com" && m("tld") == "com" &&
      m("fsd") == "example" && m("qs") == "" && m("frag") == "" &&
      m("qv") == "" && m("cut") == "http://news4.example.com/item/1")
  }

  test("IPv4 host: tld and fsd are empty (the ClickHouse convention)") {
    val m = one("http://10.0.0.42:8080/item/3?q=1&ref=x")
    assert(m("dom") == "10.0.0.42" && m("tld") == "" && m("fsd") == "")
    assert(m("qv") == "1")
  }

  test("bare authority: path is '/', cut is a no-op without query/fragment") {
    val m = one("https://news1.example.com")
    assert(m("p") == "/" && m("cut") == "https://news1.example.com")
    // single-label host falls back to itself for fsd
    val s = one("http://localhost/x")
    assert(s("tld") == "" && s("fsd") == "localhost")
  }

  test("extractURLParameter takes the FIRST occurrence and needs word names") {
    val m = one("http://h.example.com/p?q=first&a=1&q=second")
    assert(m("qv") == "first")
    // name embedded in another key must not match: ?xq=9 is not q
    val n = one("http://h.example.com/p?xq=9&q=7")
    assert(n("qv") == "7")
    val e = intercept[IllegalArgumentException](
      UrlFunctions.extractURLParameter(col("u"), "a&b"))
    assert(e.getMessage.contains("[A-Za-z0-9_]+"))
  }

  test("fragment before query-less end; query stops at fragment") {
    val m = one("http://h.example.com/p#only-frag")
    assert(m("frag") == "only-frag" && m("qs") == "")
    val n = one("http://h.example.com/p?q=2#frag")
    assert(n("qs") == "q=2" && n("frag") == "frag")
  }

  private def hier(url: String): (String, Seq[String], Seq[String]) = {
    import UrlFunctions._
    val r = Seq(url).toDF("u").select(
      cutToFirstSignificantSubdomain(col("u")).as("cf"),
      urlPathHierarchy(col("u")).as("ph"),
      urlHierarchy(col("u")).as("uh")).collect().head
    (r.getAs[String]("cf"), r.getSeq[String](1).toList, r.getSeq[String](2).toList)
  }

  test("hierarchy: root, per-segment levels, query level last, fragment excluded") {
    val (cf, ph, uh) = hier("https://news2.example.com:8080/cat/3/item/41?q=7&ref=x#sec2")
    assert(cf == "example.com")
    assert(ph == Seq("/cat/", "/cat/3/", "/cat/3/item/", "/cat/3/item/41"))
    assert(uh == Seq(
      "https://news2.example.com:8080/",
      "https://news2.example.com:8080/cat/",
      "https://news2.example.com:8080/cat/3/",
      "https://news2.example.com:8080/cat/3/item/",
      "https://news2.example.com:8080/cat/3/item/41",
      "https://news2.example.com:8080/cat/3/item/41?q=7&ref=x"))
  }

  test("hierarchy: trailing slash kept on the final level, segments collapse") {
    val (_, ph, _) = hier("http://h.example.com/a//b/")
    assert(ph == Seq("/a/", "/a/b/")) // '//' counts as one separator
  }

  test("hierarchy: bare authority yields the root level only; path levels empty") {
    val (cf, ph, uh) = hier("http://shop1.example.co.uk")
    assert(cf == "example.co.uk") // multi-part suffix keeps the cc pair
    assert(ph.isEmpty)
    assert(uh == Seq("http://shop1.example.co.uk/"))
  }

  test("domainWithoutWWW / cutWWW strip exactly one leading www label") {
    import UrlFunctions._
    val r = Seq("https://user:pw@www.example.co.uk:8080/p?q=1#f",
        "http://www.www.example.com/x", "http://sub.www.example.com/x")
      .toDF("u")
      .select(domainWithoutWWW(col("u")).as("d"), cutWWW(col("u")).as("c"))
      .collect()
    assert(r(0).getString(0) == "example.co.uk")
    assert(r(0).getString(1) == "https://user:pw@example.co.uk:8080/p?q=1#f")
    // only the FIRST label strips; inner www subdomains survive
    assert(r(1).getString(0) == "www.example.com")
    assert(r(2).getString(0) == "sub.www.example.com" &&
      r(2).getString(1) == "http://sub.www.example.com/x")
  }

  test("withUrlHierarchies (staged corpus form) ≡ the Column accessors row-for-row") {
    import UrlFunctions._
    val urls = Seq(
      "https://news2.example.com:8080/cat/3/item/41?q=7&ref=x#sec2",
      "http://h.example.com/a//b/",
      "http://shop1.example.co.uk",
      "https://user:pw@x.example.org/p?only=1",
      "http://10.0.0.9/x/y#f")
    val df = urls.toDF("u")
    val staged = withUrlHierarchies(df, "u")
      .select(col("u"), col("ph"), col("uh")).collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toList, r.getSeq[String](2).toList))
    val direct = df.select(col("u"), urlPathHierarchy(col("u")).as("ph"),
        urlHierarchy(col("u")).as("uh")).collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toList, r.getSeq[String](2).toList))
    assert(staged.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq)
  }

  test("cutToFirstSignificantSubdomain: '' for IPv4 and dot-less hosts") {
    assert(hier("http://10.0.0.9/x")._1 == "")
    assert(hier("http://localhost/x")._1 == "")
  }

  test("scheme-less URLs are accepted ClickHouse-style (r15 ADVICE: the " +
    "old scheme-required deviation is retired)") {
    import UrlFunctions._
    val df = Seq("www.example.com/a/b?q=1").toDF("u")
    val r = df.select(cutWWW(col("u")).as("cw"),
      urlHierarchy(col("u")).as("uh"),
      domain(col("u")).as("dom"),
      firstSignificantSubdomain(col("u")).as("fsd"),
      path(col("u")).as("p"),
      netloc(col("u")).as("nl"),
      cutWWW(concat(lit("https://"), col("u"))).as("cw2")).collect().head
    assert(r.getString(0) == "example.com/a/b?q=1") // www. stripped in place
    // hierarchy roots at the bare authority, query level last
    assert(r.getSeq[String](1).toList == List(
      "www.example.com/", "www.example.com/a/", "www.example.com/a/b",
      "www.example.com/a/b?q=1"))
    assert(r.getString(2) == "www.example.com")
    assert(r.getString(3) == "example")
    assert(r.getString(4) == "/a/b")
    assert(r.getString(5) == "www.example.com")
    assert(r.getString(6) == "https://example.com/a/b?q=1")
    // host-less relative path: empty host, path accessors still apply
    val rel = Seq("/a/b?q=2").toDF("u")
      .select(domain(col("u")), path(col("u")),
        urlHierarchy(col("u"))).collect().head
    assert(rel.getString(0) == "" && rel.getString(1) == "/a/b")
    assert(rel.getSeq[String](2).headOption.contains("/")) // bare root
  }

  test("the accessor projection is map-only (zero exchanges)") {
    import UrlFunctions._
    val df = (1 to 8).map(i => s"http://h$i.example.com/p$i").toDF("u")
      .select(domain(col("u")), topLevelDomain(col("u")),
        firstSignificantSubdomain(col("u")), path(col("u")),
        queryString(col("u")), fragment(col("u")),
        extractURLParameter(col("u"), "q"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
