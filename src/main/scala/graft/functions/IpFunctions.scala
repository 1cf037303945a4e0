package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse IPv4 function family (`IPv4NumToString`, `IPv4StringToNum`,
  * `IPv4CIDRToRange` / `isIPAddressInRange`, `IPv4ToIPv6`-adjacent subnet
  * math) as pure Column builders — the access-log enrichment surface a
  * ClickHouse replacement needs next to the URL functions (q44).
  *
  * Everything here is integer/string arithmetic over a UInt32 address
  * carried in a LongType column, so every builder stays inside
  * whole-stage codegen (no UDFs) and is exactly reproducible in ANSI SQL
  * for the oracle. CIDR masks are parsed at PLAN time (Scala string
  * literal) and inlined as constants — at 100 TB the range test is one
  * AND+EQ per row and pushes down like any other predicate.
  */
object IpFunctions {

  /** Dotted-quad rendering of a UInt32 address (ClickHouse
    * `IPv4NumToString`). Pure shift/mask + concat — codegen'd.
    */
  def ipv4NumToString(ip: Column): Column =
    concat_ws(".",
      octet(ip, 3).cast("string"), octet(ip, 2).cast("string"),
      octet(ip, 1).cast("string"), octet(ip, 0).cast("string"))

  /** Parse a dotted quad back to UInt32 (ClickHouse `IPv4StringToNum`).
    * Malformed input yields NULL octet casts and therefore a NULL result
    * (ClickHouse throws; NULL is the Spark-idiomatic analogue).
    */
  def ipv4StringToNum(s: Column): Column = {
    val p = split(s, "\\.")
    element_at(p, 1).cast("long") * 16777216L +
      element_at(p, 2).cast("long") * 65536L +
      element_at(p, 3).cast("long") * 256L +
      element_at(p, 4).cast("long")
  }

  /** The k-th octet from the right (k = 0..3). */
  def octet(ip: Column, k: Int): Column =
    shiftright(ip, 8 * k).bitwiseAND(lit(255L))

  /** True iff `ip` falls inside the CIDR block (ClickHouse
    * `isIPAddressInRange(ip, 'a.b.c.d/n')`). The cidr string is a plan-time
    * constant: base and mask fold to two long literals.
    */
  def isIpv4InRange(ip: Column, cidr: String): Column = {
    val (base, mask) = parseCidr(cidr)
    ip.bitwiseAND(lit(mask)) === lit(base & mask)
  }

  /** The network address of `ip`'s /n subnet (ClickHouse
    * `IPv4CIDRToRange(ip, n).1`).
    */
  def ipv4Subnet(ip: Column, prefixBits: Int): Column =
    ip.bitwiseAND(lit(maskOf(prefixBits)))

  /** RFC 1918 private-space membership: 10/8 ∪ 172.16/12 ∪ 192.168/16. */
  def isPrivateIpv4(ip: Column): Column =
    isIpv4InRange(ip, "10.0.0.0/8") ||
      isIpv4InRange(ip, "172.16.0.0/12") ||
      isIpv4InRange(ip, "192.168.0.0/16")

  /** Classful letter of the address (first-octet ranges A–E). */
  def ipv4Class(ip: Column): Column = {
    val o1 = octet(ip, 3)
    when(o1 < 128, "A").when(o1 < 192, "B").when(o1 < 224, "C")
      .when(o1 < 240, "D").otherwise("E")
  }

  /** (base, mask) of a CIDR literal, both as UInt32-in-Long. */
  def parseCidr(cidr: String): (Long, Long) = {
    val Array(addr, bits) = cidr.split("/")
    val parts = addr.split("\\.").map(_.toLong)
    require(parts.length == 4 && parts.forall(p => p >= 0 && p <= 255),
      s"bad IPv4 in CIDR: $cidr")
    val base = parts.reduceLeft((a, b) => a * 256L + b)
    (base, maskOf(bits.toInt))
  }

  private def maskOf(prefixBits: Int): Long = {
    require(prefixBits >= 0 && prefixBits <= 32, s"bad prefix: $prefixBits")
    if (prefixBits == 0) 0L else (0xffffffffL << (32 - prefixBits)) & 0xffffffffL
  }
}
