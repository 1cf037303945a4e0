package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.IpFunctions._

/** The IPv4 Column family (q73) against hand-pinned boundary addresses and
  * a randomized JVM-side reference: every builder is pure codegen
  * arithmetic, so the spec pins VALUES, and the boundary cases pin the
  * off-by-one edges (CIDR block ends, classful cutoffs) that a mask bug
  * would cross silently.
  */
class IpFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scalaIpToString(ip: Long): String =
    s"${(ip >> 24) & 255}.${(ip >> 16) & 255}.${(ip >> 8) & 255}.${ip & 255}"

  test("ipv4NumToString pins known addresses") {
    val pinned = Seq(
      0L -> "0.0.0.0",
      4294967295L -> "255.255.255.255",
      16909060L -> "1.2.3.4",          // 1*2^24 + 2*2^16 + 3*2^8 + 4
      3232235777L -> "192.168.1.1",
      167772161L -> "10.0.0.1")
    val got = pinned.map(_._1).toDF("ip")
      .select(col("ip"), ipv4NumToString(col("ip")).as("s"))
      .as[(Long, String)].collect().toMap
    pinned.foreach { case (ip, s) => assert(got(ip) == s, s"ip=$ip") }
  }

  test("string -> num is the exact inverse of num -> string on random UInt32s") {
    val rng = new scala.util.Random(73)
    val ips = Seq.fill(500)(rng.nextLong().abs % 4294967296L)
    val rows = ips.toDF("ip")
      .select(col("ip"),
        ipv4StringToNum(ipv4NumToString(col("ip"))).as("back"),
        ipv4NumToString(col("ip")).as("s"))
      .as[(Long, Long, String)].collect()
    rows.foreach { case (ip, back, s) =>
      assert(back == ip, s"round-trip $ip")
      assert(s == scalaIpToString(ip), s"render $ip")
    }
  }

  test("malformed dotted quads parse to NULL, not garbage") {
    val bad = Seq("1.2.3", "a.b.c.d", "", "1.2.3.x").toDF("s")
      .select(ipv4StringToNum(col("s")).as("n"))
      .collect()
    assert(bad.forall(_.isNullAt(0)))
    // NOTE (non-ANSI semantics): "1.2.3.4.5" parses its first four octets
    // (256-radix fold ignores the tail) and out-of-range octets like
    // "256.1.1.1" fold arithmetically rather than NULL — ClickHouse's
    // IPv4StringToNum throws there; rows that matter flow through the
    // round-trip check in q73, which only certifies canonical renders.
  }

  test("isIpv4InRange pins every RFC1918 block boundary") {
    def n(s: String): Long = {
      val p = s.split("\\.").map(_.toLong)
      (p(0) << 24) | (p(1) << 16) | (p(2) << 8) | p(3)
    }
    val cases = Seq(
      // (ip, cidr, expected)
      ("10.0.0.0", "10.0.0.0/8", true), ("9.255.255.255", "10.0.0.0/8", false),
      ("10.255.255.255", "10.0.0.0/8", true), ("11.0.0.0", "10.0.0.0/8", false),
      ("172.16.0.0", "172.16.0.0/12", true), ("172.15.255.255", "172.16.0.0/12", false),
      ("172.31.255.255", "172.16.0.0/12", true), ("172.32.0.0", "172.16.0.0/12", false),
      ("192.168.0.0", "192.168.0.0/16", true), ("192.167.255.255", "192.168.0.0/16", false),
      ("192.168.255.255", "192.168.0.0/16", true), ("192.169.0.0", "192.168.0.0/16", false),
      ("8.8.8.8", "0.0.0.0/0", true),                    // /0 is everything
      ("1.2.3.4", "1.2.3.4/32", true), ("1.2.3.5", "1.2.3.4/32", false))
    cases.foreach { case (ip, cidr, want) =>
      val got = Seq(n(ip)).toDF("ip")
        .select(isIpv4InRange(col("ip"), cidr)).as[Boolean].head()
      assert(got == want, s"$ip in $cidr")
      // and the RFC1918 union agrees on its own blocks
      if (cidr != "0.0.0.0/0" && !cidr.startsWith("1.2.3.4")) {
        val p = Seq(n(ip)).toDF("ip")
          .select(isPrivateIpv4(col("ip"))).as[Boolean].head()
        assert(p == want, s"$ip private")
      }
    }
  }

  test("ipv4Subnet masks to the network address") {
    val got = Seq(16909060L).toDF("ip") // 1.2.3.4
      .select(
        ipv4NumToString(ipv4Subnet(col("ip"), 16)).as("n16"),
        ipv4NumToString(ipv4Subnet(col("ip"), 24)).as("n24"),
        ipv4NumToString(ipv4Subnet(col("ip"), 8)).as("n8"),
        ipv4NumToString(ipv4Subnet(col("ip"), 32)).as("n32"),
        ipv4NumToString(ipv4Subnet(col("ip"), 0)).as("n0"))
      .as[(String, String, String, String, String)].head()
    assert(got == (("1.2.0.0", "1.2.3.0", "1.0.0.0", "1.2.3.4", "0.0.0.0")))
  }

  test("ipv4Class pins every classful cutoff") {
    val cases = Seq(
      "0.0.0.0" -> "A", "127.255.255.255" -> "A",
      "128.0.0.0" -> "B", "191.255.255.255" -> "B",
      "192.0.0.0" -> "C", "223.255.255.255" -> "C",
      "224.0.0.0" -> "D", "239.255.255.255" -> "D",
      "240.0.0.0" -> "E", "255.255.255.255" -> "E")
    val df = cases.map(_._1).toDF("s")
      .select(col("s"), ipv4Class(ipv4StringToNum(col("s"))).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (s, want) => assert(df(s) == want, s) }
  }

  test("parseCidr validates octets and prefix") {
    assert(parseCidr("10.0.0.0/8") == ((167772160L, 4278190080L)))
    assert(parseCidr("0.0.0.0/0") == ((0L, 0L)))
    assert(parseCidr("255.255.255.255/32") == ((4294967295L, 4294967295L)))
    intercept[IllegalArgumentException](parseCidr("256.0.0.0/8"))
    intercept[IllegalArgumentException](parseCidr("10.0.0.0/33"))
    intercept[MatchError](parseCidr("10.0.0.0"))
  }
}
