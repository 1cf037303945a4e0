package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // quotes: key, qts, price
  val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 102.0),
    (2L, ts("2024-01-01 10:00:00"), 50.0))
    .toDF("qkey", "qts", "price")

  // trades: key, tts, qty
  val trades = Seq(
    (1L, ts("2024-01-01 10:04:59"), 10L), // → 10:00 quote
    (1L, ts("2024-01-01 10:05:00"), 20L), // tie → inclusive: 10:05 quote
    (1L, ts("2024-01-01 10:30:00"), 30L), // → latest (10:10) quote
    (2L, ts("2024-01-01 09:59:59"), 40L), // before any quote → no match
    (3L, ts("2024-01-01 10:00:00"), 50L)) // unknown key → no match
    .toDF("tkey", "tts", "qty")

  test("backward as-of: greatest right ts <= left ts, inclusive ties, inner") {
    val out = AsOfJoin.backward(trades, quotes, "tkey", "tts", "qkey", "qts")
      .select("qty", "price").as[(Long, Double)].collect().toMap
    assert(out == Map(10L -> 100.0, 20L -> 101.0, 30L -> 102.0))
  }

  test("backward outer keeps unmatched left rows with null payload") {
    val out = AsOfJoin.backwardOuter(trades, quotes, "tkey", "tts", "qkey", "qts")
    assert(out.count() == 5)
    val unmatched = out.where($"price".isNull).select("qty")
      .as[Long].collect().toSet
    assert(unmatched == Set(40L, 50L))
  }

  test("forward as-of: smallest right ts >= left ts, inclusive ties") {
    val out = AsOfJoin.forward(trades, quotes, "tkey", "tts", "qkey", "qts")
      .select("qty", "price").as[(Long, Double)].collect().toMap
    // 10:04:59 → 10:05 quote; 10:05:00 tie → 10:05 quote; 10:30 → none
    // key 2 at 09:59:59 → 10:00 quote
    assert(out == Map(10L -> 101.0, 20L -> 101.0, 40L -> 50.0))
  }

  test("plan has exactly one shuffle (key exchange), no cross product") {
    val plan = AsOfJoin.backward(trades, quotes, "tkey", "tts", "qkey", "qts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }
}
