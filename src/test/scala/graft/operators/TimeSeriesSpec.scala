package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleFill: last-per-bucket wins, gaps forward-fill, spans are per key") {
    val events = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.0, 100L),
      (1L, ts("2024-01-01 00:50:00"), 2.0, 101L), // later in same hour wins
      (1L, ts("2024-01-01 02:30:00"), 3.0, 102L), // hour 01 is a gap
      (2L, ts("2024-01-05 10:00:00"), 9.0, 200L)) // separate key, own span
      .toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleFill(events, "user_id", "ts", "value", "event_id")
      .select("user_id", "h", "value")
      .as[(Long, Timestamp, Double)].collect().sortBy(r => (r._1, r._2.getTime))
    assert(out.toSeq == Seq(
      (1L, ts("2024-01-01 00:00:00"), 2.0),
      (1L, ts("2024-01-01 01:00:00"), 2.0), // forward-filled gap
      (1L, ts("2024-01-01 02:00:00"), 3.0),
      (2L, ts("2024-01-05 10:00:00"), 9.0)))
  }
}
