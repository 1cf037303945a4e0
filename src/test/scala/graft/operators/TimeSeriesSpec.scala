package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("deltaStats: positive deltas only, declared order, ratio from endpoints") {
    // user 1 in (ts, id) order: v = 10, 4, 9, 9, 20 → deltas −6, +5, 0, +11
    //   deltaSum = 16; first 10, last 20; span 40 s → ratio 10/40e6 per µs
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L, 10L),
      (1L, ts("2024-01-01 00:00:10"), 101L, 4L),
      (1L, ts("2024-01-01 00:00:20"), 102L, 9L),
      (1L, ts("2024-01-01 00:00:30"), 103L, 9L),
      (1L, ts("2024-01-01 00:00:40"), 104L, 20L),
      // user 2: single row → deltaSum 0, zero span → NULL ratio
      (2L, ts("2024-01-01 00:00:00"), 200L, 7L),
      // user 3: tie on ts broken by event_id: 5 (id 300) then 1 (id 301)
      (3L, ts("2024-01-01 00:00:00"), 300L, 5L),
      (3L, ts("2024-01-01 00:00:00"), 301L, 1L),
      (3L, ts("2024-01-01 00:01:00"), 302L, 2L))
      .toDF("user_id", "ts", "event_id", "v")
    val out = TimeSeries.deltaStats(events, "user_id", "ts", "event_id", "v")
      .select("user_id", "n", "delta_sum", "first_v", "last_v", "dt_us", "bounding_ratio")
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 5L, 16L, 10L, 20L, 40000000L, Some(10.0 / 40000000.0))))
    assert(out(1) == ((2L, 1L, 0L, 7L, 7L, 0L, None)))
    // user 3: deltas (ordered 5, 1, 2) = −4, +1 → deltaSum 1; last_v = 2
    assert(out(2) == ((3L, 3L, 1L, 5L, 2L, 60000000L, Some((2.0 - 5.0) / 60000000.0))))
  }

  test("intervalStats: union merges overlaps, touching stays half-open, sweep peak") {
    // user 1: [0,10) [5,20) [20,30) → one island [0,30) len 30;
    //   depths: +1@0 → 1, +1@5 → 2, −1@10 → 1, (−1@20 before +1@20) → 0→1, −1@30 → 0
    //   max overlap 2 first reached at pos 5
    // user 2: [0,5) [100,101) → two islands, union 6; max overlap 1 at 0
    // user 3: nested [0,100) [10,20) [30,40) → union 100; peak 2 at 10
    val iv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 20L, 30L),
      (2L, 4L, 0L, 5L), (2L, 5L, 100L, 101L),
      (3L, 6L, 0L, 100L), (3L, 7L, 10L, 20L), (3L, 8L, 30L, 40L))
      .toDF("user_id", "event_id", "s", "e")
    val out = TimeSeries.intervalStats(iv, "user_id", "s", "e", "event_id")
      .select("user_id", "n_intervals", "union_len", "max_overlap", "max_overlap_pos")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 30L, 2L, 5L),
      (2L, 2L, 6L, 1L, 0L),
      (3L, 3L, 100L, 2L, 10L)))
  }

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

  // ---- resampleInterpolate ---------------------------------------------------

  test("resampleInterpolate: linear between brackets, exact on hits, " +
      "constant past the edges, last-in-bucket wins") {
    val hour = 3600000000L
    val rows = Seq(
      // user 1: obs at hours 0 (v=100) and 3 (v=400) → linear 200, 300
      (1L, 1L, 0L * hour, 100L),
      (1L, 2L, 3L * hour, 400L),
      // user 2: single obs → grid is one point
      (2L, 1L, 5L * hour, 77L),
      // user 3: two obs in one bucket (later wins) then a gap to hour 2,
      // leading edge before the first obs cannot exist (grid starts at
      // min bucket) — instead pin the last-in-bucket rule
      (3L, 1L, 0L, 10L), (3L, 2L, 30L, 50L), (3L, 3L, 2L * hour, 80L))
      .toDF("user_id", "event_id", "t_us", "vq")
      .withColumn("ts", timestamp_micros(col("t_us")))
    val out = TimeSeries.resampleInterpolate(rows, "user_id", "ts", "vq",
        "event_id")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 0L)) == 100.0 && out((1L, 3L)) == 400.0) // exact hits
    assert(out((1L, 1L)) == 200.0 && out((1L, 2L)) == 300.0) // linear
    assert(out((2L, 5L)) == 77.0)
    assert(out((3L, 0L)) == 50.0)  // last-in-bucket (event_id 2 at t=30)
    assert(out((3L, 1L)) == 65.0)  // midpoint of 50 and 80
    assert(out((3L, 2L)) == 80.0)
    assert(out.size == 4 + 1 + 3)
  }

  // ---- ema -----------------------------------------------------------------

  private def emaRef(vals: Seq[Double], a: Double, b: Double): Double =
    vals.tail.foldLeft(vals.head)((s, v) => a * v + b * s)

  test("ema: BIT-equal to the scalar fold in declared order, any partitioning") {
    val rng = new scala.util.Random(80)
    val rows = (1 to 600).map { i =>
      ((i % 7).toLong, i.toLong, rng.nextInt(1000).toLong * 10L,
        rng.nextDouble() * 100 - 50)
    }
    val want = rows.groupBy(_._1).map { case (k, es) =>
      k -> emaRef(es.sortBy(e => (e._3, e._2)).map(_._4), 0.25, 0.75)
    }
    Seq(1, 9).foreach { parts =>
      val got = TimeSeries.ema(
          rows.toDF("user_id", "event_id", "t_us", "value")
            .withColumn("ts", timestamp_micros(col("t_us")))
            .repartition(parts),
          "user_id", "ts", "event_id", "value", alpha = 0.25, beta = 0.75)
        .select("user_id", "ema").as[(Long, Double)].collect().toMap
      // exact double equality: same fused ops in the same order
      assert(got == want, s"parts=$parts")
    }
  }

  test("ema: single observation is itself; alpha=1 tracks the last value; " +
      "same-ts ties break by id") {
    val rows = Seq(
      (1L, 1L, 100L, 42.0),
      (2L, 1L, 100L, 1.0), (2L, 2L, 200L, 2.0), (2L, 3L, 300L, 3.0),
      (3L, 2L, 100L, 5.0), (3L, 1L, 100L, 7.0)) // id 1 first at equal ts
      .toDF("user_id", "event_id", "t_us", "value")
      .withColumn("ts", timestamp_micros(col("t_us")))
    val track = TimeSeries.ema(rows, "user_id", "ts", "event_id", "value",
        alpha = 1.0, beta = 0.0)
      .select("user_id", "n", "ema").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(track(1L) == ((1L, 42.0)))
    assert(track(2L) == ((3L, 3.0)))
    assert(track(3L) == ((2L, 5.0))) // folds 7 then 5; alpha=1 keeps 5
    val smooth = TimeSeries.ema(rows, "user_id", "ts", "event_id", "value",
        alpha = 0.5, beta = 0.5)
      .select("user_id", "ema").as[(Long, Double)].collect().toMap
    assert(smooth(3L) == 0.5 * 5.0 + 0.5 * 7.0)
  }
}
