package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervalJoin equals the naive theta join on the band predicate") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:05:00")),
      (2L, ts("2024-01-01 00:00:30")),
      (3L, ts("2024-01-01 01:00:00"))
    ).toDF("k", "lts")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00")),  // equal ts: excluded (lower exclusive)
      (1L, ts("2024-01-01 00:01:59")),  // in band of left@00:00
      (1L, ts("2024-01-01 00:02:00")),  // exactly +2min: included (upper inclusive)
      (1L, ts("2024-01-01 00:02:01")),  // out of band of left@00:00
      (1L, ts("2024-01-01 00:06:30")),  // in band of left@00:05
      (2L, ts("2024-01-01 00:01:00")),  // in band (cross-bucket boundary case)
      (9L, ts("2024-01-01 00:00:10"))   // no matching key
    ).toDF("k", "rts")

    val got = IntervalJoin.intervalJoin(left, right, Seq("k"), "lts", "rts",
      lowerMs = 0L, upperMs = 120000L)
      .select("k", "lts", "rts")

    val naive = left.join(right, "k")
      .where(unix_millis(col("rts")) > unix_millis(col("lts")) &&
        unix_millis(col("rts")) <= unix_millis(col("lts")) + 120000L)
      .select("k", "lts", "rts")

    val g = got.collect().map(_.toString).sorted
    val n = naive.collect().map(_.toString).sorted
    assert(g.sameElements(n))
    assert(g.length == 4)
    // no duplicate pairs from the two-bucket explode
    assert(g.distinct.length == g.length)
  }

  test("non-zero lower bound and negative bands work") {
    val left = Seq((1L, ts("2024-01-01 00:10:00"))).toDF("k", "lts")
    val right = (0 until 30).map(i => (1L, ts(f"2024-01-01 00:$i%02d:00")))
      .toDF("k", "rts")
    // band = [-5min, -1min) before the left ts, expressed as (lower, upper]
    val got = IntervalJoin.intervalJoin(left, right, Seq("k"), "lts", "rts",
      lowerMs = -5 * 60000L, upperMs = -60000L)
      .select(col("rts")).as[Timestamp].collect().map(_.toString).sorted
    assert(got.sameElements(Array(
      "2024-01-01 00:06:00.0", "2024-01-01 00:07:00.0",
      "2024-01-01 00:08:00.0", "2024-01-01 00:09:00.0")))
  }
}
