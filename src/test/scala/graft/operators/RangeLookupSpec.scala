package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val ranges = Seq(
    (0L, 999L, "low"),
    (1000L, 4095L, "mid"), // spans bucket boundary at 4096 with bits=12? no: 4095 inside
    (4096L, 99999L, "high"))
    .toDF("lo", "hi", "label")

  val facts = Seq(0L, 999L, 1000L, 4095L, 4096L, 50000L, 99999L, 100000L)
    .toDF("p")

  test("bucketed lookup == broadcast lookup on boundaries, inner vs left") {
    val bucketed = RangeLookup.bucketedLookup(facts, "p", ranges, "lo", "hi", bucketBits = 8)
      .select("p", "label").as[(Long, String)].collect().toSet
    val bcast = RangeLookup.broadcastLookup(facts, "p", ranges, "lo", "hi")
      .where(col("label").isNotNull)
      .select("p", "label").as[(Long, String)].collect().toSet
    assert(bucketed == bcast)
    assert(bucketed == Set(
      0L -> "low", 999L -> "low", 1000L -> "mid", 4095L -> "mid",
      4096L -> "high", 50000L -> "high", 99999L -> "high"))
    // 100000 matches nothing: dropped by bucketed (inner), null in broadcast
    val unmatched = RangeLookup.broadcastLookup(facts, "p", ranges, "lo", "hi")
      .where(col("label").isNull).select("p").as[Long].collect().toSeq
    assert(unmatched == Seq(100000L))
  }

  test("bucketed plan is a broadcast hash join, not nested-loop") {
    val plan = RangeLookup.bucketedLookup(facts, "p", ranges, "lo", "hi", bucketBits = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("NestedLoop"))
  }
}
