package graft.pipeline

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.GraftConfig
import graft.format.LogTemplateSpec

/** End-to-end golden test: sample line → parse → project → cast, compared
  * to the reference's expected typed row
  * (`/root/reference/pkg/nginx/template_test.go:26-54`, FIXTURES.md §3).
  */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val fixtures = new LogTemplateSpec

  // sample_test.yaml:1-38 as a GraftConfig
  val cfg: GraftConfig = GraftConfig(
    logFormat = fixtures.sampleFormat,
    logTimeFormat = "02/Jan/2006:15:04:05 -0700",
    customCasts = Map(
      "custom_field" -> "Int32", "custom_time_field" -> "DateTime",
      "field_uint8" -> "UInt8", "field_uint16" -> "UInt16",
      "field_uint32" -> "UInt32", "field_uint64" -> "UInt64",
      "field_int8" -> "Int8", "field_int16" -> "Int16",
      "field_int32" -> "Int32", "field_int64" -> "Int64",
      "field_f32" -> "Float32", "field_f64" -> "Float64",
      "field_fixed_string" -> "FixedString(10)", "field_date" -> "Date"),
    columns = Seq("remote_addr", "remote_user", "time_local", "request",
      "status", "bytes_sent", "request_time", "request_method",
      "http_referer", "http_user_agent", "https", "custom_field",
      "custom_time_field", "field_uint8", "field_uint16", "field_uint32",
      "field_uint64", "field_int8", "field_int16", "field_int32",
      "field_int64", "field_f32", "field_f64", "field_fixed_string",
      "field_date").map(c => c -> c).toMap,
    logsTable = "access_log")

  test("golden line end-to-end typed row (template_test.go:56-107)") {
    val df = Seq(fixtures.goldenLine).toDF("value")
    val out = Ingest.parse(df, cfg)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows(0)
    def v(c: String): Any = r.get(out.columns.indexOf(c))
    assert(v("remote_addr") == "114.119.133.192")
    assert(v("remote_user") == "") // '-' → "" (caster.go:72-75)
    // 2022-07-21T00:30:43+03:00 == 2022-07-20T21:30:43Z
    assert(v("time_local") == Timestamp.valueOf("2022-07-20 21:30:43"))
    assert(v("request") == "GET /sito/wp-includes/wlwmanifest.xml HTTP/1.1")
    assert(v("status") == 444)
    assert(v("bytes_sent") == 9L)
    assert(v("request_time") == 100000.14f)
    assert(v("request_method") == "GET")
    assert(v("http_referer") == "")
    assert(v("https") == "ON")
    assert(v("custom_field") == 10)
    assert(v("custom_time_field") == Timestamp.valueOf("2022-07-21 00:30:43"))
    assert(v("field_uint8") == 8.toShort)
    assert(v("field_uint16") == 16)
    assert(v("field_uint32") == 32L)
    assert(v("field_uint64") == new java.math.BigDecimal(64))
    assert(v("field_int8") == 11.toByte)
    assert(v("field_int16") == 22.toShort)
    assert(v("field_int32") == 33)
    assert(v("field_int64") == 44L)
    assert(v("field_f32") == 1000f)
    assert(v("field_f64") == 2000d)
    assert(v("field_fixed_string") == "1234567890") // FixedString(10) truncation
    assert(v("field_date") == Date.valueOf("2022-07-21"))
  }

  test("malformed rows drop, valid rows survive, dead letter captures (T6)") {
    val lines = Seq(
      fixtures.goldenLine,
      "garbage that matches nothing",
      // matches format but status is non-numeric → cast failure → drop
      fixtures.goldenLine.replace(" 444 ", " abc "))
    val (good, bad) = Ingest.parseWithDeadLetter(lines.toDF("value"), cfg)
    assert(good.count() == 1)
    assert(bad.count() == 2)
  }

  test("empty numeric → zero; empty time → null under oracle policy (caster.go:184-186,293-296)") {
    val line = fixtures.goldenLine
      .replace(" 444 ", " - ")                 // status → hyphen → "" → 0
      .replace("<2022-07-21T00:30:43>", "<->") // custom_time_field → "" → null
    val out = Ingest.parse(Seq(line).toDF("value"), cfg)
    val r = out.collect()(0)
    assert(r.get(out.columns.indexOf("status")) == 0)
    assert(r.isNullAt(out.columns.indexOf("custom_time_field")))
  }

  test("insert_date derivation (migrations/sample_test.sql:13)") {
    val out = Ingest.withInsertDate(Ingest.parse(Seq(fixtures.goldenLine).toDF("value"), cfg))
    val r = out.select("insert_date").collect()(0)
    assert(r.get(0) == Date.valueOf("2022-07-20")) // UTC date of time_local
  }

  test("yaml config round-trip (config.go:39-59 + sample_test.yaml)") {
    val yaml =
      """nginx:
        |  log_custom_casts_enable: true
        |  log_custom_casts:
        |    custom_field: Int32
        |  log_time_format: '02/Jan/2006:15:04:05 -0700'
        |  log_format: '$remote_addr - $remote_user [$time_local] $custom_field'
        |scheme:
        |  logs_table: access_log
        |  columns:
        |    remote_addr: remote_addr
        |    custom_field: custom_field
        |""".stripMargin
    val cfg2 = GraftConfig.fromYaml(yaml).fold(e => fail(e), identity)
    assert(cfg2.logsTable == "access_log")
    assert(cfg2.customCasts == Map("custom_field" -> "Int32"))
    assert(cfg2.orderedColumns.map(_._1) == Seq("custom_field", "remote_addr"))
    assert(GraftConfig.fromYaml("nginx:\n  log_format: x\nscheme:\n  logs_table: t\n").isLeft)
  }
}
