package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunnelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, event_id, ts_us, type) → DataFrame with a real timestamp col
  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("user_id", "event_id", "t_us", "event_type")
      .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")

  private def funnel(rows: Seq[(Long, Long, Long, String)], wUs: Long) =
    Funnels.windowFunnel(ev(rows),
      steps = Seq(col("event_type") === "A", col("event_type") === "B",
        col("event_type") === "C"),
      windowMicros = wUs)
      .as[(Long, Int)].collect().toMap

  test("windowFunnel: ordering, window anchor, and same-event exclusion") {
    val out = funnel(Seq(
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "C"), // full chain
      (2L, 1L, 100L, "B"), (2L, 2L, 200L, "A"),                      // B before A: level 1
      (3L, 1L, 100L, "A"), (3L, 2L, 5000L, "B"),                     // B outside window
      (4L, 1L, 100L, "X"),                                           // no step at all
      // window anchored at chain START: A@100, B@900, C@1500 — C is
      // within 1000 of B but NOT of A → level 2; the later A@800 chain
      // (max-start dominance) rescues C: 1500-800 <= 1000 → level 3
      (5L, 1L, 100L, "A"), (5L, 2L, 800L, "A"), (5L, 3L, 900L, "B"),
      (5L, 4L, 1500L, "C")), wUs = 1000L)
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 3))
    // tighter window: the A@800 chain's B is at 900 (ok) but C at 1500
    // exceeds 800+500 → level 2
    val tight = funnel(Seq(
      (5L, 1L, 100L, "A"), (5L, 2L, 800L, "A"), (5L, 3L, 900L, "B"),
      (5L, 4L, 1500L, "C")), wUs = 500L)
    assert(tight == Map(5L -> 2))
  }

  test("windowFunnel: one event never fills two chain positions") {
    // a lone event matching both A and B (steps can overlap) must not
    // self-chain; with separate events it must
    val df = ev(Seq((1L, 1L, 100L, "A")))
    val out = Funnels.windowFunnel(df,
      steps = Seq(col("event_type") === "A", col("event_type") === "A"),
      windowMicros = 1000L).as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1))
    val two = Funnels.windowFunnel(ev(Seq((1L, 1L, 100L, "A"), (1L, 2L, 100L, "A"))),
      steps = Seq(col("event_type") === "A", col("event_type") === "A"),
      windowMicros = 1000L).as[(Long, Int)].collect().toMap
    assert(two == Map(1L -> 2), "same-ts events chain in event_id order")
  }

  test("windowFunnel equals the exhaustive chain search on random event logs") {
    val rnd = new scala.util.Random(41)
    val types = Array("A", "B", "C", "X")
    val rows = for {
      u <- 0L until 25L
      i <- 0L until 12L
    } yield (u, i, rnd.nextInt(2000).toLong, types(rnd.nextInt(4)))
    val w = 600L
    val got = funnel(rows, w)
    // exhaustive reference: try every (ts,id)-increasing chain
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val sorted = es.map(e => (e._3, e._2, e._4)).sortBy(e => (e._1, e._2))
      def reach(level: Int): Boolean = {
        val want = Seq("A", "B", "C").take(level)
        def go(idx: Int, step: Int, first: Long): Boolean =
          if (step == level) true
          else if (idx >= sorted.length) false
          else {
            val (t, _, ty) = sorted(idx)
            (ty == want(step) && (step == 0 || t - first <= w) &&
              go(idx + 1, step + 1, if (step == 0) t else first)) ||
              go(idx + 1, step, first)
          }
        go(0, 0, 0L)
      }
      u -> (3 to 1 by -1).find(reach).getOrElse(0)
    }
    assert(got == expected)
  }

  test("funnelStream: streamed in event-time order ≡ batch windowFunnel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")
    val batches = Seq(
      Seq((1L, 1L, 100L, "A"), (2L, 1L, 100L, "A"), (3L, 1L, 150L, "X")),
      Seq((1L, 2L, 200L, "B"), (2L, 2L, 5000L, "B"), (3L, 2L, 300L, "A")),
      Seq((1L, 3L, 300L, "C"), (3L, 3L, 400L, "B"), (3L, 4L, 9999L, "C")))
    val stream = MemoryStream[(Long, Long, Long, String)]
    val levels = graft.streaming.StatefulOps.funnelStream(
      stream.toDS().toDF("user_id", "event_id", "t_us", "event_type")
        .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us"),
      steps, windowMicros = 1000L)
    val q = levels.writeStream.format("memory")
      .queryName("funnel_stream_test").outputMode("update").start()
    val mid = try {
      batches.take(1).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      val after1 = spark.table("funnel_stream_test")
        .groupBy("user_id").agg(max("level").as("level"))
        .as[(Long, Int)].collect().toMap
      batches.drop(1).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      after1
    } finally q.stop()
    assert(mid == Map(1L -> 1, 2L -> 1, 3L -> 0)) // live progression view
    // level is monotone per user, so max over the update stream = final
    val streamed = spark.table("funnel_stream_test")
      .groupBy("user_id").agg(max("level").as("level"))
      .as[(Long, Int)].collect().toMap
    val batch = Funnels.windowFunnel(
      ev(batches.flatten), steps, windowMicros = 1000L)
      .as[(Long, Int)].collect().toMap
    // user 3: C@9999 is outside the 1000 µs window of its chain start
    // (A@300) → stalls at level 2; user 2's B@5000 likewise outside
    assert(streamed == batch && batch == Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("funnelStream evictAfter: state drops once the watermark passes, levels ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")
    val early = Seq( // two users complete their journeys around t≈100-300 µs
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "C"),
      (2L, 1L, 150L, "A"), (2L, 2L, 250L, "X"))
    // far-future events: advance the watermark way past early-last + window
    val late1 = Seq((99L, 1L, 10_000_000_000L, "A"))
    val late2 = Seq((99L, 2L, 10_000_000_100L, "B"))
    val stream = MemoryStream[(Long, Long, Long, String)]
    val levels = graft.streaming.StatefulOps.funnelStream(
      stream.toDS().toDF("user_id", "event_id", "t_us", "event_type")
        .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us"),
      steps, windowMicros = 1000L, evictAfter = Some("0 seconds"))
    val q = levels.writeStream.format("memory")
      .queryName("funnel_evict_test").outputMode("update").start()
    val (rowsAfterEarly, rowsAfterLate) = try {
      stream.addData(early: _*); q.processAllAvailable()
      val a = q.lastProgress.stateOperators.head.numRowsTotal
      // watermark advances at the END of the batch that reads late1; the
      // expired timers then fire in the NEXT batch (late2)
      stream.addData(late1: _*); q.processAllAvailable()
      stream.addData(late2: _*); q.processAllAvailable()
      (a, q.lastProgress.stateOperators.head.numRowsTotal)
    } finally q.stop()
    assert(rowsAfterEarly == 2L) // users 1 and 2 tracked
    assert(rowsAfterLate == 1L, // users 1 and 2 evicted; only 99 remains
      s"expected early users evicted, state rows = $rowsAfterLate")
    // the update stream's max level per user still matches batch exactly
    // (eviction re-emits the frozen final level, never a lower one)
    val streamed = spark.table("funnel_evict_test")
      .groupBy("user_id").agg(max("level").as("level"))
      .as[(Long, Int)].collect().toMap
    val batch = Funnels.windowFunnel(
      ev(early ++ late1 ++ late2), steps, windowMicros = 1000L)
      .as[(Long, Int)].collect().toMap
    assert(streamed == batch && batch == Map(1L -> 3, 2L -> 1, 99L -> 2))
  }

  private def seqCount(rows: Seq[(Long, Long, Long, String)], wUs: Long) =
    Funnels.sequenceCount(ev(rows),
      steps = Seq(col("event_type") === "A", col("event_type") === "B",
        col("event_type") === "C"),
      windowMicros = wUs)
      .as[(Long, Int)].collect().toMap

  test("sequenceCount: disjoint chains, no event reuse, window cut") {
    val out = seqCount(Seq(
      // two back-to-back complete chains
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "C"),
      (1L, 4L, 4L, "A"), (1L, 5L, 5L, "B"), (1L, 6L, 6L, "C"),
      // a second C has no fresh A/B to chain from
      (2L, 1L, 1L, "A"), (2L, 2L, 2L, "B"), (2L, 3L, 3L, "C"), (2L, 4L, 4L, "C"),
      // two A's but one B/C: events are not reused -> one chain
      (3L, 1L, 1L, "A"), (3L, 2L, 2L, "A"), (3L, 3L, 3L, "B"), (3L, 4L, 4L, "C"),
      // no step-1 event at all
      (4L, 1L, 1L, "B"), (4L, 2L, 2L, "C"),
      // complete in order but C outside the window of the chain start
      (5L, 1L, 1L, "A"), (5L, 2L, 2L, "B"), (5L, 3L, 5000L, "C")), wUs = 1000L)
    assert(out == Map(1L -> 2, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 0))
  }

  test("sequenceCount equals the plain-Scala greedy reference on random logs") {
    val rnd = new scala.util.Random(43)
    val types = Array("A", "B", "C", "X")
    val rows = for {
      u <- 0L until 25L
      i <- 0L until 14L
    } yield (u, i, rnd.nextInt(2000).toLong, types(rnd.nextInt(4)))
    val w = 600L
    val got = seqCount(rows, w)
    val MIN = Long.MinValue
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val sorted = es.map(e => (e._3, e._2, e._4)).sortBy(e => (e._1, e._2))
      val best = Array.fill(3)(MIN); var cnt = 0
      val want = Seq("A", "B", "C")
      sorted.foreach { case (t, _, ty) =>
        val prev = best.clone()
        for (k <- 0 until 3) {
          if (ty == want(k) &&
            (k == 0 || (prev(k - 1) != MIN && t - prev(k - 1) <= w)))
            best(k) = math.max(best(k), if (k == 0) t else prev(k - 1))
        }
        if (best(2) != MIN) { cnt += 1; java.util.Arrays.fill(best, MIN) }
      }
      u -> cnt
    }
    assert(got == expected && expected.values.sum > 0)
  }

  test("retention: cohort flags gated on the first condition") {
    val rows = ev(Seq(
      (1L, 1L, 1L, "signup"), (1L, 2L, 2L, "click"),
      (2L, 1L, 1L, "click"), (2L, 2L, 2L, "purchase"), // never signed up
      (3L, 1L, 1L, "signup")))
    val out = Funnels.retention(rows,
      Seq(col("event_type") === "signup", col("event_type") === "click",
        col("event_type") === "purchase"))
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSet
    assert(out == Set((1L, true, true, false), (2L, false, false, false),
      (3L, true, false, false)))
  }
}
