package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.{EmptyTimePolicy, GraftConfig}

/** Port of every table-driven case in
  * `/root/reference/pkg/nginx/caster_test.go:9-208` plus the §1.2 edge
  * corpus (FIXTURES.md §5).
  */
class CastsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def castOne(field: String, value: String,
      cfg: GraftConfig = GraftConfig(logFormat = "x")): (Any, Boolean) = {
    val tc = Casts.castFor(field, col("v"), cfg)
    val row = Seq(value).toDF("v")
      .select(tc.col.as("out"), tc.valid.as("ok")).collect()(0)
    (row.get(0), row.getBoolean(1))
  }

  test("native String types pass through (caster_test.go:10-29)") {
    Seq("remote_addr" -> "114.119.133.192", "remote_user" -> "test",
      "request" -> "GET /sito/wp-includes/wlwmanifest.xml HTTP/1.1",
      "http_referer" -> "empty", "http_user_agent" -> "User Agent Here",
      "request_method" -> "GET").foreach { case (k, v) =>
      assert(castOne(k, v) == ((v, true)), k)
    }
  }

  test("native Int32 types (caster_test.go:30-58)") {
    Seq("connections_waiting" -> 190, "connections_active" -> 260,
      "connection" -> 310, "request_length" -> 450).foreach { case (k, v) =>
      assert(castOne(k, v.toString) == ((v, true)), k)
    }
  }

  test("native Float32 types (caster_test.go:59-90)") {
    Seq("request_time" -> 190.010f, "upstream_connect_time" -> 260.010f,
      "upstream_header_time" -> 310.010f, "upstream_response_time" -> 450.010f,
      "msec" -> 567.022f).foreach { case (k, v) =>
      assert(castOne(k, v.toString) == ((v, true)), k)
    }
  }

  test("native UInt32/UInt16 types (caster_test.go:91-140)") {
    assert(castOne("bytes_sent", "190111222") == ((190111222L, true)))
    assert(castOne("body_bytes_sent", "260111222") == ((260111222L, true)))
    assert(castOne("status", "444") == ((444, true)))
  }

  test("native datetime fields (caster_test.go:141-170)") {
    val cfg = GraftConfig(logFormat = "x",
      logTimeFormat = "02/Jan/2006:15:04:05 -0700")
    assert(castOne("time_local", "21/Jul/2022:00:30:43 +0300", cfg) ==
      ((Timestamp.valueOf("2022-07-20 21:30:43"), true)))
    assert(castOne("time_iso8601", "2022-07-21T00:30:43+03:00", cfg) ==
      ((Timestamp.valueOf("2022-07-20 21:30:43"), true)))
  }

  test("custom casts override natives (caster.go:76-113)") {
    // status is natively UInt16; custom-cast it to String
    val cfg = GraftConfig(logFormat = "x", customCasts = Map("status" -> "String"))
    assert(castOne("status", "444", cfg) == (("444", true)))
    // Integer and Datetime aliases (caster.go:26-29)
    val cfg2 = GraftConfig(logFormat = "x",
      customCasts = Map("custom_field" -> "Integer", "custom_ts" -> "Datetime"))
    assert(castOne("custom_field", "10", cfg2) == ((10, true)))
    assert(castOne("custom_ts", "2022-07-21T00:30:43", cfg2) ==
      ((Timestamp.valueOf("2022-07-21 00:30:43"), true)))
  }

  test("unsigned widths and ranges (caster.go:183-225)") {
    val cfg = GraftConfig(logFormat = "x", customCasts = Map(
      "u8" -> "UInt8", "u16" -> "UInt16", "u32" -> "UInt32", "u64" -> "UInt64"))
    assert(castOne("u8", "255", cfg) == ((255.toShort, true)))
    assert(castOne("u8", "256", cfg)._2 == false) // out of uint8 range
    assert(castOne("u8", "-1", cfg)._2 == false)  // ParseUint: no sign
    assert(castOne("u16", "65535", cfg) == ((65535, true)))
    assert(castOne("u32", "4294967295", cfg) == ((4294967295L, true)))
    val (v64, ok64) = castOne("u64", "18446744073709551615", cfg)
    assert(ok64 && v64 == new java.math.BigDecimal("18446744073709551615"))
    assert(castOne("u64", "18446744073709551616", cfg)._2 == false)
  }

  test("signed widths (caster.go:227-269)") {
    val cfg = GraftConfig(logFormat = "x", customCasts = Map(
      "i8" -> "Int8", "i16" -> "Int16", "i32" -> "Int32", "i64" -> "Int64"))
    assert(castOne("i8", "-128", cfg) == ((-128.toByte, true)))
    assert(castOne("i8", "128", cfg)._2 == false)
    assert(castOne("i16", "+22", cfg) == ((22.toShort, true))) // ParseInt allows '+'
    assert(castOne("i32", "1.5", cfg)._2 == false) // strconv strictness
    assert(castOne("i64", "44", cfg) == ((44L, true)))
  }

  test("hyphen → empty → zero/empty semantics (caster.go:72-75,184-186)") {
    val cfg = GraftConfig(logFormat = "x", customCasts = Map("n" -> "Int32"))
    assert(castOne("n", "-", cfg) == ((0, true)))
    assert(castOne("n", "", cfg) == ((0, true)))
    assert(castOne("remote_user", "-") == (("", true)))
    // removeHyphen honored when disabled (flag exists but is dead in the
    // reference — config.go:23; we honor it, SURVEY §1.2)
    val noHyphen = GraftConfig(logFormat = "x", removeHyphen = false)
    assert(castOne("remote_user", "-", noHyphen) == (("-", true)))
  }

  test("empty datetime policy: Null for oracle runs (caster.go:293-296)") {
    val cfg = GraftConfig(logFormat = "x",
      customCasts = Map("d" -> "Date", "ts" -> "DateTime"),
      emptyTimePolicy = EmptyTimePolicy.Null)
    assert(castOne("d", "", cfg) == ((null, true)))
    assert(castOne("ts", "-", cfg) == ((null, true)))
    assert(castOne("ts", "not-a-date", cfg)._2 == false)
  }

  test("FixedString truncation rules (caster.go:156-179)") {
    val cfg = GraftConfig(logFormat = "x", customCasts = Map("f" -> "FixedString(10)"))
    assert(castOne("f", "1234567890_abcdefg", cfg) == (("1234567890", true)))
    assert(castOne("f", "ab", cfg) == (("ab", true))) // shorter: unpadded
    assert(castOne("f", "", cfg) == (("", true)))     // empty bypasses
    // malformed spec: no parens → "" silently (caster.go:164-170)
    val cfg2 = GraftConfig(logFormat = "x", customCasts = Map("f" -> "FixedStringXX"))
    assert(castOne("f", "whatever", cfg2) == (("", true)))
    // unparseable size → plan-time error (port's static check, SURVEY §7)
    val cfg3 = GraftConfig(logFormat = "x", customCasts = Map("f" -> "FixedString(x)"))
    assertThrows[IllegalArgumentException](castOne("f", "v", cfg3))
  }

  test("declared Spark types match §1.2 mapping") {
    val cfg = GraftConfig(logFormat = "x", customCasts = Map(
      "a" -> "UInt8", "b" -> "UInt16", "c" -> "UInt32", "d" -> "UInt64",
      "e" -> "Float32", "f" -> "Float64", "g" -> "Date", "h" -> "DateTime"))
    assert(Casts.castFor("a", col("v"), cfg).dataType == ShortType)
    assert(Casts.castFor("b", col("v"), cfg).dataType == IntegerType)
    assert(Casts.castFor("c", col("v"), cfg).dataType == LongType)
    assert(Casts.castFor("d", col("v"), cfg).dataType == DecimalType(20, 0))
    assert(Casts.castFor("e", col("v"), cfg).dataType == FloatType)
    assert(Casts.castFor("f", col("v"), cfg).dataType == DoubleType)
    assert(Casts.castFor("g", col("v"), cfg).dataType == DateType)
    assert(Casts.castFor("h", col("v"), cfg).dataType == TimestampType)
  }
}
