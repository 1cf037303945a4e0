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

  // ---- strict modes ----

  private def strict(rows: Seq[(Long, Long, Long, String)], wUs: Long,
      dedup: Boolean = false, order: Boolean = false,
      increase: Boolean = false) =
    Funnels.windowFunnelStrict(ev(rows),
      steps = Seq(col("event_type") === "A", col("event_type") === "B",
        col("event_type") === "C"),
      windowMicros = wUs, strictDedup = dedup, strictOrder = order,
      strictIncrease = increase)
      .as[(Long, Int)].collect().toMap

  test("strict_order: a non-step event after the chain starts freezes the level") {
    val rows = Seq(
      // the ClickHouse doc example: A→B→D→C stops at D with level 2
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "X"),
      (1L, 4L, 400L, "C"),
      // non-step events BEFORE the first A are ignored
      (2L, 1L, 50L, "X"), (2L, 2L, 100L, "A"), (2L, 3L, 200L, "B"),
      (2L, 4L, 300L, "C"),
      // a step event whose previous level is unreached (A then C)
      // terminates with the first unreached level (= 1)
      (3L, 1L, 100L, "A"), (3L, 2L, 200L, "C"), (3L, 3L, 300L, "B"),
      (3L, 4L, 400L, "C"))
    assert(strict(rows, 1000L, order = true) ==
      Map(1L -> 2, 2L -> 3, 3L -> 1))
    // default mode reads the same logs permissively
    assert(funnel(rows, 1000L) == Map(1L -> 3, 2L -> 3, 3L -> 3))
  }

  test("strict_dedup: a repeat of an already-reached step interrupts at that level") {
    val rows = Seq(
      // full chain then a second B: the repeat comes AFTER completion —
      // but the scan has already terminated at level 3
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "C"),
      (1L, 4L, 400L, "B"),
      // A B B C: the second B repeats reached level 2 → terminate at 2
      (2L, 1L, 100L, "A"), (2L, 2L, 200L, "B"), (2L, 3L, 300L, "B"),
      (2L, 4L, 400L, "C"),
      // repeated A's never interrupt (step 1 restarts the chain)
      (3L, 1L, 100L, "A"), (3L, 2L, 200L, "A"), (3L, 3L, 300L, "B"),
      (3L, 4L, 400L, "C"))
    assert(strict(rows, 1000L, dedup = true) ==
      Map(1L -> 3, 2L -> 2, 3L -> 3))
    assert(funnel(rows, 1000L) == Map(1L -> 3, 2L -> 3, 3L -> 3))
  }

  test("strict_increase: same-timestamp events never chain; max-start stays exact") {
    val rows = Seq(
      // A and B at the same ts: ids order them for the default mode,
      // strict_increase refuses the tie
      (1L, 1L, 100L, "A"), (1L, 2L, 100L, "B"), (1L, 3L, 300L, "C"),
      // strictly increasing chain passes
      (2L, 1L, 100L, "A"), (2L, 2L, 200L, "B"), (2L, 3L, 300L, "C"),
      // equal-start chains with different last ts: A@100 B@150, A@100
      // (id 4) B@150 — then C@160 chains off ANY level-2 chain; the
      // greedy single-chain scan would be order-sensitive here, the
      // exact DP is not
      (3L, 1L, 100L, "A"), (3L, 2L, 150L, "B"), (3L, 3L, 150L, "B"),
      (3L, 4L, 160L, "C"))
    assert(strict(rows, 1000L, increase = true) ==
      Map(1L -> 1, 2L -> 3, 3L -> 3))
    assert(funnel(rows, 1000L) == Map(1L -> 3, 2L -> 3, 3L -> 3))
  }

  test("strict modes: a user whose events match NO step still reports level 0") {
    // the review-caught gap: dedup-only mode used to filter no-step
    // entries before the groupBy and silently dropped such users, while
    // the default mode, the other strict modes, and the oracles all
    // emit (user, 0)
    val rows = Seq((1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"),
      (2L, 1L, 100L, "X"), (2L, 2L, 200L, "Y"))
    for ((dd, oo, ii) <- Seq((true, false, false), (false, true, false),
      (false, false, true), (true, true, true)))
      assert(strict(rows, 1000L, dedup = dd, order = oo, increase = ii)
        .get(2L).contains(0), s"mode dedup=$dd order=$oo increase=$ii")
  }

  /** Plain-Scala port of the ClickHouse windowFunnel loop (entries =
    * (ts,id)-sorted events × matched steps in descending step order, plus
    * a no-step entry in strict_order mode) — the independent reference
    * the Column-expression fold must reproduce. `evs` = (id, t, flags).
    */
  private def refStrict(evs: Seq[(Long, Long, Seq[Boolean])], n: Int,
      w: Long, dedup: Boolean, order: Boolean, increase: Boolean): Int = {
    val MIN = Long.MinValue
    val entries = evs.sortBy(e => (e._2, e._1)).flatMap { case (_, t, cs) =>
      val m = (n - 1 to 0 by -1).filter(cs(_)).map(k => (t, k))
      if (m.isEmpty) Seq((t, -1)) else m
    }
    val first = Array.fill(n)(MIN)
    val lastT = Array.fill(n)(MIN)
    var fe = false
    var result = -1
    for ((t, k) <- entries if result < 0) {
      def deepest = (n to 1 by -1).find(j => first(j - 1) != MIN).getOrElse(0)
      if (k == -1) { if (order && fe) result = deepest }
      else if (k == 0) { first(0) = t; lastT(0) = t; fe = true }
      else if (dedup && first(k) != MIN) result = k + 1
      else if (order && fe && first(k - 1) == MIN)
        result = (0 until n).find(first(_) == MIN).getOrElse(n)
      else if (first(k - 1) != MIN && t - first(k - 1) <= w &&
        (!increase || lastT(k - 1) < t)) {
        first(k) = first(k - 1); lastT(k) = t
        if (k == n - 1) result = n
      }
    }
    if (result >= 0) result
    else (n to 1 by -1).find(j => first(j - 1) != MIN).getOrElse(0)
  }

  test("strict_dedup / strict_order / combined ≡ the ClickHouse-loop reference " +
    "on random logs with overlapping steps") {
    val rnd = new scala.util.Random(47)
    // boolean step columns that can OVERLAP (one event matching several
    // steps exercises the descending-entry order) plus no-step events
    val rows = for {
      u <- 0L until 30L
      i <- 0L until 14L
    } yield (u, i, rnd.nextInt(800).toLong,
      rnd.nextInt(5) == 0, rnd.nextInt(3) == 0, rnd.nextInt(3) == 0)
    val df = rows.toDF("user_id", "event_id", "t_us", "a", "b", "c")
      .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
    val steps = Seq(col("a"), col("b"), col("c"))
    val w = 300L
    for ((dd, oo, ii) <- Seq((true, false, false), (false, true, false),
      (true, true, false), (true, false, true), (false, true, true),
      (true, true, true))) {
      val got = Funnels.windowFunnelStrict(df, steps, w, strictDedup = dd,
        strictOrder = oo, strictIncrease = ii)
        .as[(Long, Int)].collect().toMap
      val expected = rows.groupBy(_._1).map { case (u, es) =>
        u -> refStrict(
          es.map(e => (e._2, e._3, Seq(e._4, e._5, e._6))), 3, w, dd, oo, ii)
      }
      assert(got == expected, s"mode dedup=$dd order=$oo increase=$ii")
      assert(expected.values.toSet.size > 1, "degenerate mode fixture")
    }
  }

  test("pure strict_increase ≡ exhaustive strictly-increasing chain search " +
    "on tie-heavy random logs") {
    val rnd = new scala.util.Random(53)
    val types = Array("A", "B", "C", "X")
    // ts drawn from a SMALL domain so same-ts collisions are common
    val rows = for {
      u <- 0L until 30L
      i <- 0L until 12L
    } yield (u, i, rnd.nextInt(40).toLong * 10L, types(rnd.nextInt(4)))
    val w = 150L
    val got = strict(rows, w, increase = true)
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val sorted = es.map(e => (e._3, e._4)).sortBy(_._1)
      def reach(level: Int): Boolean = {
        val want = Seq("A", "B", "C").take(level)
        def go(idx: Int, step: Int, firstT: Long, lastT: Long): Boolean =
          if (step == level) true
          else if (idx >= sorted.length) false
          else {
            val (t, ty) = sorted(idx)
            (ty == want(step) && (step == 0 || (t > lastT && t - firstT <= w)) &&
              go(idx + 1, step + 1, if (step == 0) t else firstT, t)) ||
              go(idx + 1, step, firstT, lastT)
          }
        go(0, 0, 0L, MinT)
      }
      u -> (3 to 1 by -1).find(reach).getOrElse(0)
    }
    assert(got == expected && expected.values.toSet.size > 1)
  }
  private val MinT = Long.MinValue

  // ---- sequenceMatch ----

  private def seqMatch(rows: Seq[(Long, Long, Long, String)], pattern: String,
      conds: Seq[String]) =
    Funnels.sequenceMatch(ev(rows), pattern,
      conds.map(c => col("event_type") === c))
      .as[(Long, Boolean)].collect().toMap

  test("sequenceMatch: the ClickHouse doc triple — unmatched events are not stored") {
    // the published example: log 1,3,2; pattern '(?1)(?2)'
    val log = Seq((1L, 1L, 100L, "e1"), (1L, 2L, 200L, "e3"), (1L, 3L, 300L, "e2"))
    // conds (1,2): 3 is never stored → 1 and 2 are adjacent → match
    assert(seqMatch(log, "(?1)(?2)", Seq("e1", "e2")) == Map(1L -> true))
    // conds (1,2,3): 3 sits between them in the stored list → no match
    assert(seqMatch(log, "(?1)(?2)", Seq("e1", "e2", "e3")) == Map(1L -> false))
    // conds (1,2,4): 4 never occurs → same as the first case
    assert(seqMatch(log, "(?1)(?2)", Seq("e1", "e2", "e4")) == Map(1L -> true))
    // .* restores the match even with 3 stored
    assert(seqMatch(log, "(?1).*(?2)", Seq("e1", "e2", "e3")) == Map(1L -> true))
  }

  test("sequenceMatch: time constraints, dot token, leading skip, absent users") {
    val log = Seq(
      // u1: view@100 click@200 (dt=100µs « 1s) — (?t<=1) passes, (?t>1) fails
      (1L, 1L, 100L, "view"), (1L, 2L, 200L, "click"),
      // u2: view then click 2 s later
      (2L, 1L, 100L, "view"), (2L, 2L, 2100000L, "click"),
      // u3: leading stored noise then the chain; '.' must consume exactly
      // one stored event
      (3L, 1L, 50L, "click"), (3L, 2L, 100L, "view"), (3L, 3L, 200L, "click"),
      // u4: only unmatched events → no stored entries → NO output row
      (4L, 1L, 100L, "x"))
    val conds = Seq("view", "click")
    assert(seqMatch(log, "(?1)(?t<=1)(?2)", conds) ==
      Map(1L -> true, 2L -> false, 3L -> true))
    assert(seqMatch(log, "(?1)(?t>1)(?2)", conds) ==
      Map(1L -> false, 2L -> true, 3L -> false))
    assert(seqMatch(log, ".(?1)", conds) == // some stored event, then a view
      Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("sequenceMatch: a (?t) after .* measures from the MATCHED event, " +
    "not the entry the candidate sits next to") {
    // view@0, other-stored@5.5h, click@5.98h: the view→click gap is
    // ~6 h, so '(?1).*(?t<=3600)(?2)' must NOT match even though the
    // click is only 29 min after its neighboring stored entry (the
    // review-caught bug computed dt against ts(j−1))
    val log = Seq(
      (1L, 1L, 0L, "view"), (1L, 2L, 19800000000L, "other"),
      (1L, 3L, 21540000000L, "click"))
    val conds = Seq("view", "click", "other")
    assert(seqMatch(log, "(?1).*(?t<=3600)(?2)", conds) == Map(1L -> false))
    // and with a within-window click it does match through the gap
    val log2 = Seq(
      (1L, 1L, 0L, "view"), (1L, 2L, 600000000L, "other"),
      (1L, 3L, 1800000000L, "click"))
    assert(seqMatch(log2, "(?1).*(?t<=3600)(?2)", conds) == Map(1L -> true))
  }

  test("sequenceMatch: invalid patterns are rejected named") {
    val df = ev(Seq((1L, 1L, 100L, "view")))
    val conds = Seq(col("event_type") === "view")
    val e1 = intercept[IllegalArgumentException](
      Funnels.sequenceMatch(df, "(?2)", conds))
    assert(e1.getMessage.contains("only 1 conditions"))
    val e2 = intercept[IllegalArgumentException](
      Funnels.sequenceMatch(df, "(?t<=5)(?1)", conds))
    assert(e2.getMessage.contains("preceding event token"))
    val e3 = intercept[IllegalArgumentException](
      Funnels.sequenceMatch(df, "(?1)%%", conds))
    assert(e3.getMessage.contains("cannot parse"))
  }

  test("sequenceMatch ≡ explicit-prevT DFS reference on random overlapping logs") {
    val rnd = new scala.util.Random(61)
    // boolean conds that can overlap; ~1/4 of events match nothing
    val rows = for {
      u <- 0L until 30L
      i <- 0L until 10L
    } yield (u, i, rnd.nextInt(500).toLong,
      rnd.nextInt(4) == 0, rnd.nextInt(3) == 0, rnd.nextInt(4) == 0)
    val df = rows.toDF("user_id", "event_id", "t_us", "a", "b", "c")
      .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
    val conds = Seq(col("a"), col("b"), col("c"))
    // spec-side token lists: (Left(k0) = (?k), Right(()) = '.', gapBefore,
    // time constraints in µs) — hand-built per pattern, independent of the
    // operator's parser
    type RefStep = (Either[Int, Unit], Boolean, Seq[(String, Long)])
    val cases: Seq[(String, Seq[RefStep])] = Seq(
      "(?1)(?2)" -> Seq((Left(0), true, Nil), (Left(1), false, Nil)),
      "(?1).*(?3)" -> Seq((Left(0), true, Nil), (Left(2), true, Nil)),
      "(?2)(?t<=1)(?1)" ->
        Seq((Left(1), true, Nil), (Left(0), false, Seq("<=" -> 1000000L))),
      "(?1).(?2)" ->
        Seq((Left(0), true, Nil), (Right(()), false, Nil), (Left(1), false, Nil)),
      "(?3).*(?t>0)(?3)" ->
        Seq((Left(2), true, Nil), (Left(2), true, Seq(">" -> 0L)))
    )
    def refMatch(entries: IndexedSeq[(Long, Int)], steps: Seq[RefStep]): Boolean = {
      def cmp(dt: Long, op: String, x: Long) = op match {
        case "<=" => dt <= x; case ">=" => dt >= x; case "<" => dt < x
        case ">" => dt > x; case "==" => dt == x; case "!=" => dt != x
      }
      def go(si: Int, ei: Int, prevT: Long): Boolean =
        if (si == steps.length) true
        else {
          val (tok, gap, tcs) = steps(si)
          val cand = if (gap) ei until entries.length
            else if (ei < entries.length) Seq(ei) else Seq.empty
          cand.exists { j =>
            val (t, m) = entries(j)
            val tokOk = tok match {
              case Left(k) => (m & (1 << k)) != 0
              case Right(_) => true
            }
            tokOk && tcs.forall { case (op, x) => cmp(t - prevT, op, x) } &&
              go(si + 1, j + 1, t)
          }
        }
      go(0, 0, Long.MinValue / 2)
    }
    for ((pattern, refSteps) <- cases) {
      val got = Funnels.sequenceMatch(df, pattern, conds)
        .as[(Long, Boolean)].collect().toMap
      val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
        val entries = es
          .map(e => (e._3, e._2,
            (if (e._4) 1 else 0) | (if (e._5) 2 else 0) | (if (e._6) 4 else 0)))
          .filter(_._3 != 0)
          .sortBy(e => (e._1, e._2))
          .map(e => (e._1, e._3)).toIndexedSeq
        if (entries.isEmpty) None
        else Some(u -> refMatch(entries, refSteps))
      }
      assert(got == expected, s"pattern $pattern")
      assert(expected.values.toSet.size == 2, s"degenerate fixture for $pattern")
    }
  }

  test("sequenceCountPattern: non-overlapping lazy counting") {
    val conds = Seq("view", "click")
    val log = Seq(
      // two disjoint adjacent pairs
      (1L, 1L, 100L, "view"), (1L, 2L, 200L, "click"),
      (1L, 3L, 300L, "view"), (1L, 4L, 400L, "click"),
      // view view click: only ONE chain (second view is adjacent)
      (2L, 1L, 100L, "view"), (2L, 2L, 200L, "view"), (2L, 3L, 300L, "click"),
      // clicks without views: stored but zero chains
      (3L, 1L, 100L, "click"), (3L, 2L, 200L, "click"))
    assert(Funnels.sequenceCountPattern(ev(log), "(?1)(?2)",
        conds.map(c => col("event_type") === c))
      .as[(Long, Long)].collect().toMap == Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
    // gap form: view .* click — lazy matching still yields 2 disjoint
    // chains for user 1 (first chain ends at the FIRST click)
    assert(Funnels.sequenceCountPattern(ev(log), "(?1).*(?2)",
        conds.map(c => col("event_type") === c))
      .as[(Long, Long)].collect().toMap == Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
    // time constraint: the second pair of user 1 is 100 µs apart too, so
    // (?t>1) kills both
    assert(Funnels.sequenceCountPattern(ev(log), "(?1)(?t>1)(?2)",
        conds.map(c => col("event_type") === c))
      .as[(Long, Long)].collect().toMap == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("sequenceCountPattern ≡ repeated-lazy-scan reference on random logs") {
    val rnd = new scala.util.Random(67)
    val rows = for {
      u <- 0L until 30L
      i <- 0L until 12L
    } yield (u, i, rnd.nextInt(500).toLong,
      rnd.nextInt(3) == 0, rnd.nextInt(3) == 0)
    val df = rows.toDF("user_id", "event_id", "t_us", "a", "b")
      .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
    val conds = Seq(col("a"), col("b"))
    type RefStep = (Either[Int, Unit], Boolean, Seq[(String, Long)])
    val cases: Seq[(String, Seq[RefStep])] = Seq(
      "(?1)(?2)" -> Seq((Left(0), true, Nil), (Left(1), false, Nil)),
      "(?1).*(?2)" -> Seq((Left(0), true, Nil), (Left(1), true, Nil)),
      "(?2)(?t<=1)(?1)" ->
        Seq((Left(1), true, Nil), (Left(0), false, Seq("<=" -> 1000000L))))
    def cmp(dt: Long, op: String, x: Long) = op match {
      case "<=" => dt <= x; case ">=" => dt >= x; case "<" => dt < x
      case ">" => dt > x; case "==" => dt == x; case "!=" => dt != x
    }
    // independent lazy scan: returns end index after the match or -1;
    // no memoization, explicit prevT
    def refEnd(entries: IndexedSeq[(Long, Int)], steps: Seq[RefStep],
        from: Int): Int = {
      def go(si: Int, ei: Int, prevT: Long): Int =
        if (si == steps.length) ei
        else {
          val (tok, gap, tcs) = steps(si)
          val cand = if (gap) ei until entries.length
            else if (ei < entries.length) Seq(ei) else Seq.empty
          cand.iterator.map { j =>
            val (t, m) = entries(j)
            val tokOk = tok match {
              case Left(k) => (m & (1 << k)) != 0
              case Right(_) => true
            }
            if (tokOk && tcs.forall { case (op, x) => cmp(t - prevT, op, x) })
              go(si + 1, j + 1, t)
            else -1
          }.find(_ >= 0).getOrElse(-1)
        }
      go(0, from, Long.MinValue / 2)
    }
    for ((pattern, refSteps) <- cases) {
      val got = Funnels.sequenceCountPattern(df, pattern, conds)
        .as[(Long, Long)].collect().toMap
      val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
        val entries = es
          .map(e => (e._3, e._2, (if (e._4) 1 else 0) | (if (e._5) 2 else 0)))
          .filter(_._3 != 0).sortBy(e => (e._1, e._2))
          .map(e => (e._1, e._3)).toIndexedSeq
        if (entries.isEmpty) None
        else {
          var pos = 0; var cnt = 0L
          while (pos >= 0 && pos < entries.length) {
            val e = refEnd(entries, refSteps, pos)
            if (e < 0) pos = -1 else { cnt += 1; pos = e }
          }
          Some(u -> cnt)
        }
      }
      assert(got == expected, s"pattern $pattern")
      assert(expected.values.max >= 2, s"degenerate fixture for $pattern")
    }
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

  // ---- strict streaming ----

  private def latestPerUser(table: String) = {
    import org.apache.spark.sql.functions.{col, max_by, monotonically_increasing_id}
    spark.table(table)
      .withColumn("ord", monotonically_increasing_id())
      .groupBy("user_id").agg(max_by(col("level"), col("ord")).as("level"))
      .as[(Long, Int)].collect().toMap
  }

  test("funnelStrictStream: streamed in event-time order ≡ batch for " +
    "dedup / order / dedup+increase") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(71)
    val types = Array("A", "B", "C", "X")
    val rows = (for {
      u <- 0L until 20L
      i <- 0L until 12L
    } yield (u, i, rnd.nextInt(1500).toLong, types(rnd.nextInt(4))))
      .sortBy(e => (e._3, e._2)) // stream arrives in event-time order
    val batches = rows.grouped(rows.size / 3 + 1).toSeq
    val steps = Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")
    val w = 400L
    for (((dd, oo, ii), tag) <- Seq((true, false, false), (false, true, false),
      (true, false, true)).zipWithIndex) {
      val stream = MemoryStream[(Long, Long, Long, String)]
      val levels = graft.streaming.StatefulOps.funnelStrictStream(
        stream.toDS().toDF("user_id", "event_id", "t_us", "event_type")
          .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us"),
        steps, windowMicros = w, strictDedup = dd, strictOrder = oo,
        strictIncrease = ii)
      val q = levels.writeStream.format("memory")
        .queryName(s"strict_stream_$tag").outputMode("update").start()
      try {
        batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val streamed = latestPerUser(s"strict_stream_$tag")
      val batch = Funnels.windowFunnelStrict(ev(rows), steps, w,
        strictDedup = dd, strictOrder = oo, strictIncrease = ii)
        .as[(Long, Int)].collect().toMap
      assert(streamed == batch, s"mode dedup=$dd order=$oo increase=$ii")
      assert(batch.values.toSet.size > 1, "degenerate fixture")
    }
  }

  test("funnelStrictStream pure increase: a same-ts group split across " +
    "micro-batches still reads the pre-group snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")
    // u1: A@100 then B@100 ARRIVING IN THE NEXT BATCH — same-ts, must
    // NOT chain; C@300 then chains off nothing past level 1
    // u2: clean strictly increasing chain split across batches
    val b1 = Seq((1L, 1L, 100L, "A"), (2L, 1L, 100L, "A"))
    val b2 = Seq((1L, 2L, 100L, "B"), (2L, 2L, 200L, "B"))
    val b3 = Seq((1L, 3L, 300L, "C"), (2L, 3L, 300L, "C"))
    val stream = MemoryStream[(Long, Long, Long, String)]
    val levels = graft.streaming.StatefulOps.funnelStrictStream(
      stream.toDS().toDF("user_id", "event_id", "t_us", "event_type")
        .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us"),
      steps, windowMicros = 1000L, strictIncrease = true)
    val q = levels.writeStream.format("memory")
      .queryName("strict_inc_stream").outputMode("update").start()
    try {
      Seq(b1, b2, b3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = latestPerUser("strict_inc_stream")
    val batch = Funnels.windowFunnelStrict(ev(b1 ++ b2 ++ b3), steps, 1000L,
      strictIncrease = true).as[(Long, Int)].collect().toMap
    assert(streamed == batch && batch == Map(1L -> 1, 2L -> 3))
  }

  test("funnelStrictStream dedup: a later duplicate DROPS the level — " +
    "latest update wins, not max") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")
    val b1 = Seq((1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "C"))
    val b2 = Seq((1L, 4L, 400L, "B"))
    val stream = MemoryStream[(Long, Long, Long, String)]
    val levels = graft.streaming.StatefulOps.funnelStrictStream(
      stream.toDS().toDF("user_id", "event_id", "t_us", "event_type")
        .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us"),
      steps, windowMicros = 1000L, strictDedup = true)
    val q = levels.writeStream.format("memory")
      .queryName("strict_dedup_stream").outputMode("update").start()
    val mid = try {
      stream.addData(b1: _*); q.processAllAvailable()
      val m = latestPerUser("strict_dedup_stream")
      stream.addData(b2: _*); q.processAllAvailable()
      m
    } finally q.stop()
    assert(mid == Map(1L -> 3), "complete chain reported before the repeat")
    // the repeat arrives AFTER completion — the scan is terminated at 3,
    // so the level stays (terminated results are frozen)...
    assert(latestPerUser("strict_dedup_stream") == Map(1L -> 3))
    // ...but a repeat BEFORE completion terminates lower: B B then C
    val stream2 = MemoryStream[(Long, Long, Long, String)]
    val levels2 = graft.streaming.StatefulOps.funnelStrictStream(
      stream2.toDS().toDF("user_id", "event_id", "t_us", "event_type")
        .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us"),
      steps, windowMicros = 1000L, strictDedup = true)
    val q2 = levels2.writeStream.format("memory")
      .queryName("strict_dedup_stream2").outputMode("update").start()
    val mid2 = try {
      stream2.addData(Seq((1L, 1L, 100L, "A"), (1L, 2L, 200L, "B")): _*)
      q2.processAllAvailable()
      val m = latestPerUser("strict_dedup_stream2")
      stream2.addData(Seq((1L, 3L, 300L, "B"), (1L, 4L, 400L, "C")): _*)
      q2.processAllAvailable()
      m
    } finally q2.stop()
    assert(mid2 == Map(1L -> 2))
    assert(latestPerUser("strict_dedup_stream2") == Map(1L -> 2),
      "repeat of level 2 terminates the scan at 2; the C never counts")
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

  // ---- sequenceNextNode ----------------------------------------------------

  private def nextNode(rows: Seq[(Long, Long, Long, String)],
      direction: String, base: String,
      steps: Seq[String] = Seq("A", "B")): Map[Long, Option[String]] =
    Funnels.sequenceNextNode(ev(rows), direction, base,
        steps = steps.map(col("event_type") === _))
      .as[(Long, Option[String])].collect().toMap

  test("sequenceNextNode forward/first_match: earliest consecutive chain, " +
      "NULL at stream end, all-events adjacency") {
    val out = nextNode(Seq(
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "C"),  // → C
      (2L, 1L, 100L, "X"), (2L, 2L, 200L, "A"), (2L, 3L, 300L, "B"),  // chain ends stream → NULL
      // A,B NOT consecutive (X between) → no match even though subsequence exists
      (3L, 1L, 100L, "A"), (3L, 2L, 200L, "X"), (3L, 3L, 300L, "B"),
      // two chains: first one (at 100) wins → next is A, not D
      (4L, 1L, 100L, "A"), (4L, 2L, 200L, "B"), (4L, 3L, 300L, "A"),
      (4L, 4L, 400L, "B"), (4L, 5L, 500L, "D"),
      (5L, 1L, 100L, "Z")),                                            // no step-1 at all
      "forward", "first_match")
    assert(out == Map(1L -> Some("C"), 2L -> None, 3L -> None,
      4L -> Some("A"), 5L -> None))
  }

  test("sequenceNextNode forward/head: the chain must start at the user's first event") {
    val out = nextNode(Seq(
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "C"),  // head chain → C
      (2L, 1L, 100L, "X"), (2L, 2L, 200L, "A"), (2L, 3L, 300L, "B"),
      (2L, 4L, 400L, "C")),                                            // match not at head → NULL
      "forward", "head")
    assert(out == Map(1L -> Some("C"), 2L -> None))
  }

  test("sequenceNextNode backward/tail and backward/last_match walk the " +
      "reversed stream") {
    // user 1 reversed: D,C,B,A — chain D,C anchored at the last event →
    // next (going backward) is B
    val rows = Seq(
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 300L, "C"),
      (1L, 4L, 400L, "D"),
      // user 2 reversed: B,A,B,A — last_match of chain B,A in scan order
      // is the anchor at rn=3 (the EARLIER B) → next after its chain is
      // nothing (stream end) → NULL; first candidate (rn=1) would give B
      (2L, 1L, 100L, "A"), (2L, 2L, 200L, "B"), (2L, 3L, 300L, "A"),
      (2L, 4L, 400L, "B"))
    val tail = nextNode(rows, "backward", "tail", Seq("D", "C"))
    assert(tail(1L) == Some("B") && tail(2L) == None)
    val lastM = nextNode(rows, "backward", "last_match", Seq("B", "A"))
    assert(lastM(2L) == None)
    val firstEquiv = nextNode(rows, "backward", "last_match", Seq("D", "C"))
    assert(firstEquiv(1L) == Some("B")) // single candidate: same as tail
  }

  test("sequenceNextNode: same-ts ties order by event_id; baseCond gates the anchor") {
    val rows = Seq(
      (1L, 1L, 100L, "A"), (1L, 2L, 100L, "B"), (1L, 3L, 100L, "C"))
    assert(nextNode(rows, "forward", "first_match") == Map(1L -> Some("C")))
    val gated = Funnels.sequenceNextNode(ev(rows), "forward", "first_match",
        steps = Seq(col("event_type") === "A", col("event_type") === "B"),
        baseCond = col("event_id") > 1L)
      .as[(Long, Option[String])].collect().toMap
    assert(gated == Map(1L -> None)) // the only A fails the anchor gate
  }

  test("sequenceNextNode ≡ scalar scan reference on random logs, any partitioning") {
    val rng = new scala.util.Random(77)
    val types = Vector("A", "B", "C", "D")
    val rows = (1 to 400).map { i =>
      ((i % 25).toLong, i.toLong, rng.nextInt(50).toLong * 10L,
        types(rng.nextInt(types.size)))
    }
    def ref(evs: Seq[(Long, Long, String)], steps: Seq[String]): Option[String] = {
      val s = evs.sortBy(e => (e._2, e._1)).map(_._3)
      s.indices.find(i => i + steps.size <= s.size &&
          steps.indices.forall(k => s(i + k) == steps(k)))
        .flatMap(i => s.drop(i + steps.size).headOption)
    }
    val byUser = rows.groupBy(_._1)
      .map { case (u, es) => u -> ref(es.map(e => (e._2, e._3, e._4)), Seq("A", "B")) }
    Seq(1, 8).foreach { parts =>
      val got = Funnels.sequenceNextNode(
          ev(rows).repartition(parts), "forward", "first_match",
          steps = Seq(col("event_type") === "A", col("event_type") === "B"))
        .as[(Long, Option[String])].collect().toMap
      assert(got == byUser, s"parts=$parts")
    }
  }
}
