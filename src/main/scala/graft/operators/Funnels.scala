package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics aggregates in the shape ClickHouse ships as
  * `windowFunnel` and `retention` — the reference's pipeline lands
  * access-log events in ClickHouse precisely so analysts can run these
  * (`/root/reference/README.md:21` positions the store for "analytics,
  * monitoring"); Spark-side they are explicit operators.
  *
  * Both are single-aggregation operators: one hash exchange on the user
  * key with map-side combine, no windows, no self-joins — at 100 TB the
  * funnel's per-user fold state is `levels` longs regardless of event
  * volume, and retention's is `conds` booleans.
  */
object Funnels {

  private val Unreached = Long.MinValue

  /** Funnel level per user — `windowFunnel`-shaped sequential matching
    * with DETERMINISTIC semantics (ClickHouse leaves same-timestamp
    * order unspecified; here the event order is strictly `(ts,
    * event_id)`): the level is the longest k such that events
    * e₁ ≺ e₂ ≺ … ≺ e_k exist (strict order-precedence — one event never
    * satisfies two chain positions) matching `steps(0..k-1)` in order,
    * with every chain event within `windowMicros` of the CHAIN'S FIRST
    * event. Users with no step-1 event report level 0.
    *
    * Single linear pass per user over the (ts, id)-sorted event list:
    * the fold keeps, per level, the maximal chain-start timestamp among
    * chains reaching that level so far — maximal start dominates (most
    * window slack), so reachability is exact, and the state is `levels`
    * longs however many events a user has. The sorted list itself is
    * per-user memory (the same envelope as ClickHouse's own
    * windowFunnel, which buffers and sorts per user); a pathological
    * single user (bot) is the caller's pre-filter, not a shuffle
    * problem.
    */
  def windowFunnel(events: DataFrame, steps: Seq[Column], windowMicros: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty && windowMicros >= 0)
    val n = steps.size
    val ev = struct(
      (unix_micros(col(tsCol)).as("t") +: col(idCol).as("i") +:
        steps.zipWithIndex.map { case (c, k) => c.cast("boolean").as(s"c$k") }): _*)
    val init = array((0 until n).map(_ => lit(Unreached)): _*)
    val folded = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(ev)).as("evs"))
      .withColumn("lv", aggregate(col("evs"), init, (acc, e) => array(
        (0 until n).map { k =>
          // all levels read the PRE-event acc: an event can extend a
          // chain ending strictly before it, never one through itself
          if (k == 0)
            greatest(element_at(acc, 1),
              when(e.getField("c0"), e.getField("t")).otherwise(lit(Unreached)))
          else
            greatest(element_at(acc, k + 1),
              when(e.getField(s"c$k") &&
                element_at(acc, k) =!= lit(Unreached) &&
                e.getField("t") - element_at(acc, k) <= lit(windowMicros),
                element_at(acc, k)).otherwise(lit(Unreached)))
        }: _*)))
    // build inside-out so the OUTERMOST when tests the deepest level
    val level = (1 to n).foldLeft(lit(0)) { (els, k) =>
      when(element_at(col("lv"), k) =!= lit(Unreached), lit(k)).otherwise(els)
    }
    folded.select(col(userCol), level.cast("int").as("level"))
  }

  /** ClickHouse `windowFunnel` STRICT modes (`strict_deduplication`,
    * `strict_order`, `strict_increase`) — the mode variants real funnel
    * users reach for, with the same deterministic (ts, event_id) event
    * order as [[windowFunnel]] (ClickHouse leaves ties unspecified).
    *
    * Semantics, by flag:
    *
    *   - `strictIncrease` alone: DECLARATIVE — the level is the longest
    *     chain with STRICTLY increasing timestamps (an event never
    *     chains off one at its own timestamp, whatever the event ids),
    *     window anchored at the chain's first event. Computed as the
    *     same exact per-level max-start DP over TIMESTAMP GROUPS:
    *     same-ts events are pre-collapsed per (user, ts) with OR'd step
    *     flags, so every fold element reads only strictly-earlier
    *     state — max-start dominance then makes reachability exact,
    *     like the default mode. (ClickHouse's own strict_increase is a
    *     greedy single-chain scan that can under-report when equal-start
    *     chains differ in their last timestamp; this variant is the
    *     exact fixpoint of the documented semantics.)
    *
    *   - `strictDedup` / `strictOrder` (optionally + `strictIncrease`):
    *     OPERATIONAL, matching the published ClickHouse algorithm
    *     (AggregateFunctionWindowFunnel: one pass over (ts, id)-ordered
    *     entries, an event matching several steps yielding one entry
    *     per matched step in DESCENDING step order). strict_dedup: an
    *     event matching step k (k ≥ 2) when level k is ALREADY reached
    *     terminates the scan with level k. strict_order: once a step-1
    *     event has been seen, an event matching NO step terminates with
    *     the level so far, and an event matching step k whose previous
    *     level is unreached terminates with the first unreached level.
    *     strict_increase combined here additionally requires the chain's
    *     previous event to sit at a strictly earlier timestamp.
    *
    * Scale shape is [[windowFunnel]]'s: one hash exchange on the user
    * key, per-user state of O(levels) longs (the strict_increase
    * pre-collapse adds one shrinking (user, ts) combine before it).
    * Oracles: strict_increase is EXISTS-chains with strict inequalities;
    * dedup/order replay the fold as recursive CTEs (q59-q61).
    */
  def windowFunnelStrict(events: DataFrame, steps: Seq[Column],
      windowMicros: Long, strictDedup: Boolean = false,
      strictOrder: Boolean = false, strictIncrease: Boolean = false,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty && windowMicros >= 0)
    val n = steps.size
    if (!strictDedup && !strictOrder && !strictIncrease)
      windowFunnel(events, steps, windowMicros, userCol, tsCol, idCol)
    else if (!strictDedup && !strictOrder) {
      // pure strict_increase: collapse same-ts events per user (OR the
      // step flags — none of them can chain with each other), then the
      // exact DP; each fold element now IS a strictly-later timestamp
      val flags = steps.zipWithIndex.map { case (c, k) =>
        max(c.cast("boolean")).as(s"__f$k")
      }
      val grouped = events.groupBy(col(userCol), col(tsCol))
        .agg(flags.head, flags.tail: _*)
        .withColumn("__gid", lit(0L))
      windowFunnel(grouped,
        (0 until n).map(k => coalesce(col(s"__f$k"), lit(false))),
        windowMicros, userCol, tsCol, "__gid")
    } else {
      // sequential early-termination fold (the ClickHouse algorithm),
      // flattened to one ENTRY per (event, matched step) BEFORE the
      // aggregate — k becomes a runtime field and the fold lambda is a
      // single depth-1 step. The first version composed one step per
      // static step index inside the lambda; higher-order-function
      // lambdas are evaluated INTERPRETED with no subexpression sharing,
      // so every reference to the composed intermediate accumulator
      // re-evaluated the whole inner expression — measured 17× slower
      // with one extra composition level (q60 13.3 s vs q59 0.78 s on
      // identical data). With per-entry processing the only repeated
      // reference is the bound lambda variable, which is free.
      //
      // Entry encoding: `nk` = −k so the lexicographic (t, id, nk)
      // sort yields same-event entries in DESCENDING step order (the
      // ClickHouse add() order); an event matching NO step emits one
      // k = −1 entry (consulted only in strict_order mode).
      //
      // acc layout (1-based element_at): 1..n chain-start ts per level,
      // n+1..2n last-event ts per level (strict_increase needs it),
      // 2n+1 first-event-seen flag, 2n+2 result (−1 = still scanning).
      val stepArr = array(steps.map(c => coalesce(c.cast("boolean"), lit(false))): _*)
      val ksMatched = filter(sequence(lit(0), lit(n - 1)),
        i => element_at(stepArr, i + 1))
      val ks = when(size(ksMatched) > 0, reverse(ksMatched))
        .otherwise(array(lit(-1)))
      // no-step entries (k = −1) are kept in EVERY mode, not just
      // strict_order where the fold consults them: filtering them would
      // also drop users whose events match no step at all, and those
      // users owe a level-0 row exactly like the default mode emits
      // (and like the q59 oracle derives). The raw id column keeps its
      // type so same-ts ties order identically to windowFunnel (a cast
      // to long would NULL out non-numeric ids and leave ties
      // undefined).
      val entries = events
        .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__t"),
          col(idCol).as("__i"), explode(ks).as("__k"))
        .select(col("__u"),
          struct(col("__t").as("t"), col("__i").as("i"),
            (-col("__k")).as("nk")).as("ev"))
      val init = array(
        ((0 until 2 * n).map(_ => lit(Unreached)) :+ lit(0L) :+ lit(-1L)): _*)
      def fe(a: Column) = element_at(a, 2 * n + 1)
      def res(a: Column) = element_at(a, 2 * n + 2)
      // levels fill as a contiguous prefix (slot k is only ever set when
      // slot k−1 is set), so ONE number is both the deepest-reached
      // level and the first-unreached index — the value every
      // termination branch reports
      def reached(a: Column): Column =
        size(filter(slice(a, 1, n), v => v =!= lit(Unreached))).cast("long")
      val seqAll = sequence(lit(1), lit(2 * n + 2))
      def withRes(a: Column, r: Column): Column =
        transform(seqAll, j => when(j === lit(2 * n + 2), r)
          .otherwise(element_at(a, j)))
      // one ClickHouse loop iteration; branch order matches the
      // reference algorithm — step-1 restart, then dedup termination,
      // then order termination, then the windowed (and optionally
      // strictly-increasing) advance
      def stepAny(acc: Column, e: Column): Column = {
        val t = e.getField("t")
        val k = -e.getField("nk") // matched step, or −1 for a no-step event
        val firstPrev = element_at(acc, k)      // first[k−1] (slot k)
        val firstCur = element_at(acc, k + 1)   // first[k]
        val lastPrev = element_at(acc, lit(n) + k) // last[k−1]
        val k0upd = transform(seqAll, j =>
          when(j === lit(1), t).when(j === lit(n + 1), t)
            .when(j === lit(2 * n + 1), lit(1L))
            .otherwise(element_at(acc, j)))
        val advanced = transform(seqAll, j =>
          when(j === k + 1, firstPrev)
            .when(j === lit(n) + k + 1, t)
            .when(j === lit(2 * n + 2) && k === lit(n - 1), lit(n.toLong))
            .otherwise(element_at(acc, j)))
        val advOk = firstPrev =!= lit(Unreached) &&
          t - firstPrev <= lit(windowMicros) &&
          (if (strictIncrease) lastPrev < t else lit(true))
        var c = when(res(acc) =!= lit(-1L), acc)
          .when(k === lit(-1),
            if (strictOrder)
              when(fe(acc) === lit(1L), withRes(acc, reached(acc)))
                .otherwise(acc)
            else acc)
          .when(k === lit(0), k0upd)
        if (strictDedup)
          c = c.when(firstCur =!= lit(Unreached),
            withRes(acc, (k + 1).cast("long")))
        if (strictOrder)
          c = c.when(fe(acc) === lit(1L) && firstPrev === lit(Unreached),
            withRes(acc, reached(acc)))
        c.when(advOk, advanced).otherwise(acc)
      }
      val folded = entries
        .groupBy(col("__u"))
        .agg(sort_array(collect_list(col("ev"))).as("evs"))
        .withColumn("st", aggregate(col("evs"), init, stepAny _))
      val lvl = when(res(col("st")) =!= lit(-1L), res(col("st")))
        .otherwise(reached(col("st")))
      folded.select(col("__u").as(userCol), lvl.cast("int").as("level"))
    }
  }

  /** Non-overlapping complete-chain count per user (`sequenceCount`-
    * shaped): how many DISJOINT step₁→…→stepₙ chains (each within
    * `windowMicros` of its own first event) the user's history contains —
    * "how many times did this user complete the funnel". Greedy
    * earliest-completion: the same per-level fold as [[windowFunnel]],
    * and the moment a chain completes the level state resets (events are
    * not reused across chains) and the counter increments. Deterministic
    * for the same reasons as the funnel ((ts, id) order, pre-event
    * snapshots); state is `levels + 1` longs per user.
    */
  def sequenceCount(events: DataFrame, steps: Seq[Column], windowMicros: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty && windowMicros >= 0)
    val n = steps.size
    val ev = struct(
      (unix_micros(col(tsCol)).as("t") +: col(idCol).as("i") +:
        steps.zipWithIndex.map { case (c, k) => c.cast("boolean").as(s"c$k") }): _*)
    // slots 1..n = per-level max chain start; slot n+1 = completed count
    val init = array((0 until n).map(_ => lit(Unreached)) :+ lit(0L): _*)
    val folded = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(ev)).as("evs"))
      .withColumn("st", aggregate(col("evs"), init, (acc, e) => {
        val upd = (0 until n).map { k =>
          if (k == 0)
            greatest(element_at(acc, 1),
              when(e.getField("c0"), e.getField("t")).otherwise(lit(Unreached)))
          else
            greatest(element_at(acc, k + 1),
              when(e.getField(s"c$k") &&
                element_at(acc, k) =!= lit(Unreached) &&
                e.getField("t") - element_at(acc, k) <= lit(windowMicros),
                element_at(acc, k)).otherwise(lit(Unreached)))
        }
        val completed = upd(n - 1) =!= lit(Unreached)
        array(upd.map(u => when(completed, lit(Unreached)).otherwise(u)) :+
          (element_at(acc, n + 1) +
            when(completed, lit(1L)).otherwise(lit(0L))): _*)
      }))
      .select(col(userCol),
        element_at(col("st"), n + 1).cast("int").as("n_chains"))
    folded
  }

  /** Pattern language of ClickHouse `sequenceMatch` / `sequenceCount`:
    * `(?N)` matches a stored event satisfying condition N (1-based);
    * `.` matches any single stored event; `.*` matches any number of
    * stored events; `(?t OP seconds)` constrains the time between the
    * two NEIGHBORING matched events (OP ∈ <=, >=, <, >, ==, !=).
    * "Stored" = events satisfying at least one condition — events
    * matching none are never buffered (the ClickHouse contract its doc
    * examples pin: with conds (1,2) the log 1,3,2 matches '(?1)(?2)',
    * with conds (1,2,3) it does not). An implicit `.*` surrounds the
    * pattern (contains-semantics).
    */
  private[operators] sealed trait PatTok
  private[operators] case class EvTok(k: Int) extends PatTok
  private[operators] case object AnyTok extends PatTok
  private[operators] case class Step(tok: PatTok, gapBefore: Boolean,
    timeCs: Seq[(String, Long)])

  private[operators] def parsePattern(pattern: String, nConds: Int): Seq[Step] = {
    val Ev = """^\(\?(\d+)\)""".r
    val Tc = """^\(\?t(<=|>=|==|!=|<|>)(\d+)\)""".r
    val steps = Seq.newBuilder[Step]
    var gap = true // implicit leading .*
    var timeCs = Seq.empty[(String, Long)]
    var emitted = 0
    var rest = pattern.trim
    while (rest.nonEmpty) {
      (Tc.findPrefixMatchOf(rest), Ev.findPrefixMatchOf(rest)) match {
        case (Some(m), _) =>
          val (op, secs) = (m.group(1), m.group(2))
          require(emitted > 0,
            s"sequenceMatch pattern: (?t$op$secs) needs a preceding event token")
          timeCs :+= (op -> secs.toLong * 1000000L) // seconds → micros
          rest = rest.drop(m.matched.length)
        case (_, Some(m)) =>
          val k = m.group(1).toInt
          require(k >= 1 && k <= nConds,
            s"sequenceMatch pattern references (?$k) but only $nConds conditions given")
          steps += Step(EvTok(k - 1), gap, timeCs)
          emitted += 1; gap = false; timeCs = Seq.empty
          rest = rest.drop(m.matched.length)
        case _ if rest.startsWith(".*") =>
          gap = true; rest = rest.drop(2)
        case _ if rest.startsWith(".") =>
          steps += Step(AnyTok, gap, timeCs)
          emitted += 1; gap = false; timeCs = Seq.empty
          rest = rest.drop(1)
        case _ =>
          throw new IllegalArgumentException(
            s"sequenceMatch pattern: cannot parse at '...$rest'")
      }
    }
    require(timeCs.isEmpty,
      "sequenceMatch pattern: trailing (?t...) has no event token to constrain")
    val out = steps.result()
    require(out.nonEmpty, "sequenceMatch pattern matches no events")
    out
  }

  /** Leftmost-lazy match starting at entry `from`: returns the index
    * AFTER the last consumed entry, or −1 if no match. Gap steps try
    * candidates in increasing order (the ClickHouse backtracking order),
    * so the found match is leftmost-lazy. A `(?t)` constraint is
    * measured against the previously MATCHED event — which in `go(si,
    * ei)` is always entry `ei − 1`, because every step (adjacency or
    * gap) passes consumed+1 as the next `ei`; a gap step's candidate j
    * therefore compares ts(j) against ts(ei−1), NOT ts(j−1) (the entry
    * it happens to sit next to). That same invariant makes the (step,
    * entry) memo sound and start-independent (one memo serves every
    * `from` of the non-overlapping count loop). O(steps × entries²)
    * worst case.
    */
  private[operators] def findEnd(ts: Array[Long], masks: Array[Int],
      steps: Seq[Step], from: Int,
      memo: java.util.HashMap[Long, Integer]): Int = {
    val nE = ts.length
    val nS = steps.size
    def okAt(st: Step, j: Int, prev: Int): Boolean = {
      val tokOk = st.tok match {
        case EvTok(k) => (masks(j) & (1 << k)) != 0
        case AnyTok => true
      }
      tokOk && st.timeCs.forall { case (op, micros) =>
        val dt = ts(j) - ts(prev) // parser guarantees a preceding event
        op match {
          case "<=" => dt <= micros
          case ">=" => dt >= micros
          case "<" => dt < micros
          case ">" => dt > micros
          case "==" => dt == micros
          case "!=" => dt != micros
        }
      }
    }
    def go(si: Int, ei: Int): Int = {
      if (si == nS) return ei
      if (ei >= nE) return -1
      val key = si.toLong * (nE + 1) + ei
      val cached = memo.get(key)
      if (cached != null) return cached.intValue()
      val st = steps(si)
      val r =
        if (st.gapBefore) {
          var j = ei
          var found = -1
          while (j < nE && found < 0) {
            if (okAt(st, j, ei - 1)) {
              val e = go(si + 1, j + 1)
              if (e >= 0) found = e
            }
            j += 1
          }
          found
        } else if (okAt(st, ei, ei - 1)) go(si + 1, ei + 1)
        else -1
      memo.put(key, r)
      r
    }
    go(0, from)
  }

  private[operators] def matchEntries(ts: Array[Long], masks: Array[Int],
      steps: Seq[Step]): Boolean =
    findEnd(ts, masks, steps, 0,
      new java.util.HashMap[Long, Integer]()) >= 0

  /** One ClickHouse strict-scan iteration over the SCALAR state array —
    * the same branch structure as the Column fold in
    * [[windowFunnelStrict]] (step-1 restart, dedup termination, order
    * termination, windowed advance), shared with the streaming leg so
    * batch and stream cannot drift. Layout: 0..n−1 chain-start ts,
    * n..2n−1 last-event ts, 2n first-event flag, 2n+1 result (−1 =
    * scanning). `k` = matched step, −1 for a no-step event.
    */
  private[graft] def strictScalarStep(st: Array[Long], n: Int, t: Long,
      k: Int, windowMicros: Long, dedup: Boolean, order: Boolean,
      increase: Boolean): Unit = {
    if (st(2 * n + 1) != -1L) return
    def reached: Long = {
      var c = 0
      while (c < n && st(c) != Unreached) c += 1
      c.toLong
    }
    if (k == -1) {
      if (order && st(2 * n) == 1L) st(2 * n + 1) = reached
    } else if (k == 0) {
      st(0) = t; st(n) = t; st(2 * n) = 1L
    } else if (dedup && st(k) != Unreached) {
      st(2 * n + 1) = k + 1L
    } else if (order && st(2 * n) == 1L && st(k - 1) == Unreached) {
      st(2 * n + 1) = reached
    } else if (st(k - 1) != Unreached && t - st(k - 1) <= windowMicros &&
      (!increase || st(n + k - 1) < t)) {
      st(k) = st(k - 1); st(n + k) = t
      if (k == n - 1) st(2 * n + 1) = n.toLong
    }
  }

  /** Feed one event into the scalar strict scan: matched steps in
    * descending order, else the no-step entry.
    */
  private[graft] def strictScalarEvent(st: Array[Long], n: Int, t: Long,
      conds: Seq[Boolean], windowMicros: Long, dedup: Boolean,
      order: Boolean, increase: Boolean): Unit = {
    var any = false
    var k = n - 1
    while (k >= 0) {
      if (conds(k)) {
        any = true
        strictScalarStep(st, n, t, k, windowMicros, dedup, order, increase)
      }
      k -= 1
    }
    if (!any) strictScalarStep(st, n, t, -1, windowMicros, dedup, order, increase)
  }

  /** Level read off the scalar strict state: the terminated result, else
    * the contiguous reached prefix.
    */
  private[graft] def strictScalarLevel(st: Array[Long], n: Int): Int =
    if (st(2 * n + 1) != -1L) st(2 * n + 1).toInt
    else {
      var c = 0
      while (c < n && st(c) != Unreached) c += 1
      c
    }

  private def storedEntries(events: DataFrame, steps: Seq[Column],
      userCol: String, tsCol: String, idCol: String): DataFrame = {
    val mask = steps.zipWithIndex.map { case (c, k) =>
      when(coalesce(c.cast("boolean"), lit(false)), lit(1 << k)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))
    // the raw id column rides into the sort struct so same-ts ties order
    // by the id's OWN type (numeric ids numerically, strings
    // lexicographically — the windowFunnel contract); it is stripped
    // after the sort so the matcher UDF's input type stays concrete
    events
      .select(col(userCol), unix_micros(col(tsCol)).as("__t"),
        col(idCol).as("__i"), mask.as("__m"))
      .where(col("__m") =!= 0)
      .groupBy(col(userCol))
      .agg(transform(
        sort_array(collect_list(struct(col("__t"), col("__i"),
          col("__m")))),
        e => struct(e.getField("__t").as("t"), lit(0L).as("i"),
          e.getField("__m").as("m"))).as("evs"))
  }

  /** ClickHouse `sequenceMatch(pattern)(ts, cond1, …)` per user: does the
    * user's stored-event sequence contain a chain matching the pattern?
    * Output `(userCol, matched)`; users with NO condition-matching events
    * produce no row (nothing is stored for them — the same filter
    * ClickHouse applies before buffering).
    *
    * Shape: events matching no condition are filtered BEFORE the
    * exchange, the per-user sorted entry list is the same envelope as
    * [[windowFunnel]]'s, and the matcher runs once per user over the
    * collected array (a scalar UDF — backtracking with memoization has
    * no Column-expression form; the per-row work the codegen path would
    * optimize is already reduced to one call per user).
    */
  def sequenceMatch(events: DataFrame, pattern: String, steps: Seq[Column],
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty && steps.size <= 30)
    val parsed = parsePattern(pattern, steps.size)
    val matcher = udf { (entries: Seq[(Long, Long, Int)]) =>
      val ts = entries.map(_._1).toArray
      val masks = entries.map(_._3).toArray
      matchEntries(ts, masks, parsed)
    }
    storedEntries(events, steps, userCol, tsCol, idCol)
      .select(col(userCol), matcher(col("evs")).as("matched"))
  }

  /** ClickHouse `sequenceCount(pattern)(ts, cond1, …)` per user: how many
    * NON-OVERLAPPING chains match the pattern. Matches are taken
    * leftmost-lazy (the ClickHouse backtracking order — each gap consumes
    * as few events as possible) and the next search resumes after the
    * previous match's last consumed entry; every match consumes ≥ 1
    * entry, so the scan is linear in matches. Same storage contract and
    * scale shape as [[sequenceMatch]]; one memo table is shared across
    * the count loop (lazy ends from a (step, entry) state are
    * start-independent).
    */
  def sequenceCountPattern(events: DataFrame, pattern: String,
      steps: Seq[Column], userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty && steps.size <= 30)
    val parsed = parsePattern(pattern, steps.size)
    val counter = udf { (entries: Seq[(Long, Long, Int)]) =>
      val ts = entries.map(_._1).toArray
      val masks = entries.map(_._3).toArray
      val memo = new java.util.HashMap[Long, Integer]()
      var pos = 0
      var cnt = 0L
      while (pos >= 0 && pos < ts.length) {
        val end = findEnd(ts, masks, parsed, pos, memo)
        if (end < 0) pos = -1
        else { cnt += 1L; pos = end }
      }
      cnt
    }
    storedEntries(events, steps, userCol, tsCol, idCol)
      .select(col(userCol), counter(col("evs")).as("n_matches"))
  }

  /** Shared (direction, base) validation for [[sequenceNextNode]] and
    * its SQL aggregate: returns (forward, anchorFirst); the pick side
    * (first vs last qualifying position) is `base == "last_match"`.
    */
  private[graft] def parseNextNodeMode(direction: String,
      base: String): (Boolean, Boolean) = {
    val forward = direction match {
      case "forward"  => true
      case "backward" => false
      case other => throw new IllegalArgumentException(s"direction: $other")
    }
    val anchorFirst = base match {
      case "head" =>
        require(forward, "head pairs with forward"); true
      case "tail" =>
        require(!forward, "tail pairs with backward"); true
      case "first_match" =>
        require(forward, "first_match pairs with forward"); false
      case "last_match" =>
        require(!forward, "last_match pairs with backward"); false
      case other => throw new IllegalArgumentException(s"base: $other")
    }
    (forward, anchorFirst)
  }

  /** ClickHouse `sequenceNextNode(direction, base)(ts, event, baseCond,
    * cond1, …)` per user: find the chain of CONSECUTIVE events (among ALL
    * the user's events — unlike [[sequenceMatch]], nothing is
    * pre-filtered, because the returned next node may be any value)
    * matching `steps` in the scan direction, anchored per `base`, and
    * return the value of the event immediately after the chain — the
    * path-analysis "what do users do next" aggregate.
    *
    * Supported pairings (the meaningful ClickHouse combinations):
    * `forward` with `head` (chain must start at the user's FIRST event)
    * or `first_match` (earliest step-1 event in scan order);
    * `backward` with `tail` / `last_match` (the same anchors against the
    * time-reversed scan). `baseCond` gates the anchor event. Ties order
    * by `(ts, id)` — the [[windowFunnel]] determinism contract. NULL out
    * when no chain matches or the chain ends the stream (ClickHouse
    * parity); every user with ≥ 1 event gets a row.
    *
    * Shape: three window passes over ONE user-keyed exchange (rank +
    * per-step mask leads + next-value lead reuse the same sort), then a
    * candidate filter and a 1-row-per-user pick — no self-joins, no
    * per-user arrays; state on the exchange is the event rows themselves,
    * and the window sort is the per-user envelope every ClickHouse
    * sequence aggregate already pays.
    */
  def sequenceNextNode(events: DataFrame, direction: String, base: String,
      steps: Seq[Column], baseCond: Column = lit(true),
      userCol: String = "user_id", tsCol: String = "ts",
      eventCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty && steps.size <= 30)
    val (forward, anchorFirst) = parseNextNodeMode(direction, base)
    val n = steps.size
    val mask = steps.zipWithIndex.map { case (c, k) =>
      when(coalesce(c.cast("boolean"), lit(false)), lit(1 << k)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))
    val ord =
      if (forward) Seq(col("__t").asc, col("__i").asc)
      else Seq(col("__t").desc, col("__i").desc)
    val w = Window.partitionBy(col(userCol)).orderBy(ord: _*)
    val seq0 = events
      .select(col(userCol), unix_micros(col(tsCol)).as("__t"),
        col(idCol).as("__i"), col(eventCol).as("__e"), mask.as("__m"),
        coalesce(baseCond.cast("boolean"), lit(false)).as("__b"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next", lead(col("__e"), n).over(w))
    val chainOk = (0 until n).map { k =>
      val mk = if (k == 0) col("__m") else lead(col("__m"), k).over(w)
      mk.bitwiseAND(lit(1 << k)) =!= 0
    }.reduce(_ && _)
    val anchorOk =
      if (anchorFirst) col("__rn") === 1 && col("__b") else col("__b")
    val pickOrd =
      if (base == "last_match") col("__rn").desc else col("__rn").asc
    val picked = seq0.withColumn("__ok", chainOk && anchorOk)
      .where(col("__ok"))
      .withColumn("__pick", row_number().over(
        Window.partitionBy(col(userCol)).orderBy(pickOrd)))
      .where(col("__pick") === 1)
      .select(col(userCol), col("__next").as("next_node"))
    events.select(col(userCol)).distinct()
      .join(picked, Seq(userCol), "left")
  }

  /** Retention cohort flags per user (`retention`-shaped): flag 1 is
    * "condition 1 ever held"; flag k>1 is "condition 1 AND condition k
    * both held" — the came-back-to-do-X cohort shape. Columns out are
    * `r1..rN` booleans; one max-combine aggregate, no ordering
    * involved.
    */
  def retention(events: DataFrame, conds: Seq[Column],
      userCol: String = "user_id"): DataFrame = {
    require(conds.nonEmpty)
    val aggs = conds.zipWithIndex.map { case (c, k) =>
      max(c.cast("boolean")).as(s"__m$k")
    }
    events.groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(userCol) +: conds.indices.map { k =>
        val m = coalesce(col(s"__m$k"), lit(false))
        val base = coalesce(col("__m0"), lit(false))
        (if (k == 0) m else m && base).as(s"r${k + 1}")
      }: _*)
  }

  /** [[windowFunnel]] as a typed Aggregator — the `graft_window_funnel`
    * SQL surface (registered in
    * [[graft.plans.GraftExtensions]]): input rows are
    * (t micros, tiebreak id, step bitmask), the buffer is the per-group
    * event list (EXACTLY ClickHouse's own AggregateFunctionWindowFunnel
    * state, which also buffers and sorts per group — state is the
    * user's event count, the documented funnel-family envelope), and
    * finish replays the identical (ts, id)-sorted per-level max-start
    * DP, so `graft_window_funnel(...) GROUP BY user` ≡ the Column
    * operator row-for-row (pinned in GraftExtensionsSpec). Rows with
    * the null-timestamp sentinel are skipped (SQL null semantics).
    */
  final class WindowFunnelAgg(windowMicros: Long, nSteps: Int)
      extends org.apache.spark.sql.expressions.Aggregator[(Long, Long, Long),
        scala.collection.mutable.ArrayBuffer[Array[Long]], Int] {
    require(nSteps >= 1 && nSteps <= 62 && windowMicros >= 0)
    type Buf = scala.collection.mutable.ArrayBuffer[Array[Long]]
    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(b: Buf, e: (Long, Long, Long)): Buf =
      if (e._1 == Long.MinValue) b else { b += Array(e._1, e._2, e._3); b }
    override def merge(a: Buf, b: Buf): Buf = { a ++= b; a }
    override def finish(b: Buf): Int = {
      val best = Array.fill(nSteps)(Unreached)
      b.sortBy(e => (e(0), e(1)))(Ordering.Tuple2[Long, Long]).foreach { e =>
        val t = e(0)
        val mask = e(2)
        // pre-event snapshot: an event extends a chain ending strictly
        // before it, never one through itself (the batch fold's rule)
        val prev = best.clone()
        var k = 0
        while (k < nSteps) {
          if (((mask >> k) & 1L) == 1L) {
            if (k == 0) best(0) = math.max(best(0), t)
            else if (prev(k - 1) != Unreached &&
              t - prev(k - 1) <= windowMicros)
              best(k) = math.max(best(k), prev(k - 1))
          }
          k += 1
        }
      }
      best.lastIndexWhere(_ != Unreached) + 1
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Int] =
      org.apache.spark.sql.Encoders.scalaInt
  }

  /** The STRICT-mode windowFunnel as a SQL aggregate
    * (`graft_window_funnel_strict`) — the ClickHouse
    * `windowFunnel(w, 'strict_order', …)` surface behind a GROUP BY.
    * Same buffered-event base as [[WindowFunnelAgg]], with one
    * difference it must keep: NO-STEP rows (mask 0) stay in the buffer —
    * strict_order consults them (an unrelated event between steps
    * terminates the scan), and dropping them would also drop the
    * level-0 rows the Column operator emits for users whose events
    * match nothing. Finish sorts by (ts, id) and replays
    * [[strictScalarEvent]] — the SAME scalar scan the Column fold
    * mirrors and the streaming leg advances, so all three surfaces
    * cannot drift. Pure strict_increase (no dedup/order) uses the batch
    * operator's exact construction instead: same-ts groups collapse
    * (OR'd masks — none of them can chain with each other), then the
    * plain max-start fold over now-strictly-increasing timestamps IS
    * the exact DP.
    */
  final class WindowFunnelStrictAgg(windowMicros: Long, nSteps: Int,
      dedup: Boolean, order: Boolean, increase: Boolean)
      extends org.apache.spark.sql.expressions.Aggregator[(Long, Long, Long),
        scala.collection.mutable.ArrayBuffer[Array[Long]], Int] {
    require(nSteps >= 1 && nSteps <= 62 && windowMicros >= 0)
    require(dedup || order || increase,
      "no strict mode selected — use graft_window_funnel")
    type Buf = scala.collection.mutable.ArrayBuffer[Array[Long]]
    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(b: Buf, e: (Long, Long, Long)): Buf =
      if (e._1 == Long.MinValue) b else { b += Array(e._1, e._2, e._3); b }
    override def merge(a: Buf, b: Buf): Buf = { a ++= b; a }
    override def finish(b: Buf): Int = {
      val sorted = b.sortBy(e => (e(0), e(1)))(Ordering.Tuple2[Long, Long])
      if (dedup || order) {
        val st = Array.fill(2 * nSteps + 2)(Unreached)
        st(2 * nSteps) = 0L
        st(2 * nSteps + 1) = -1L
        sorted.foreach { e =>
          val conds = (0 until nSteps).map(k => ((e(2) >> k) & 1L) == 1L)
          strictScalarEvent(st, nSteps, e(0), conds, windowMicros,
            dedup, order, increase)
        }
        strictScalarLevel(st, nSteps)
      } else {
        val best = Array.fill(nSteps)(Unreached)
        var i = 0
        while (i < sorted.length) {
          val t = sorted(i)(0)
          var mask = 0L
          while (i < sorted.length && sorted(i)(0) == t) {
            mask |= sorted(i)(2); i += 1
          }
          val prev = best.clone()
          var k = 0
          while (k < nSteps) {
            if (((mask >> k) & 1L) == 1L) {
              if (k == 0) best(0) = math.max(best(0), t)
              else if (prev(k - 1) != Unreached &&
                t - prev(k - 1) <= windowMicros)
                best(k) = math.max(best(k), prev(k - 1))
            }
            k += 1
          }
        }
        best.lastIndexWhere(_ != Unreached) + 1
      }
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Int] =
      org.apache.spark.sql.Encoders.scalaInt
  }

  /** [[sequenceNextNode]] as a SQL aggregate
    * (`graft_sequence_next_node`) — same buffered-event base as the
    * funnel aggregates, with the event VALUE string riding along.
    * Finish sorts by (ts, id) in the direction's order and runs the
    * scalar scan of the Column operator's window formulation: position
    * p qualifies when its n consecutive events match steps 1..n in
    * order and the anchor holds (head/tail: p is the stream's first
    * event AND baseCond; first_match/last_match: baseCond at p); the
    * picked chain (first qualifying p, or last for last_match) emits
    * the event value n positions further on, NULL at stream end or
    * when no chain qualifies. NULL-ts rows are skipped (the
    * graft_window_funnel convention). Randomized SQL ≡ Column pinned in
    * `GraftExtensionsSpec` across all four (direction, base) pairings.
    *
    * NULL-ts SCOPE of that equivalence: the Column form KEEPS null-ts
    * rows (they sort to one end of the per-user window and can shift
    * positions/anchors), this aggregate drops them — so SQL ≡ Column
    * holds on non-null timestamps, the funnel family's standing
    * contract (events' ts is non-null by schema; the spec pins the
    * divergence explicitly with a null-ts case).
    */
  final class SequenceNextNodeAgg(direction: String, base: String, nSteps: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Long, String),
        scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)],
        String] {
    require(nSteps >= 1 && nSteps <= 30)
    private val (forward, anchorFirst) = parseNextNodeMode(direction, base)
    private val pickLast = base == "last_match"
    type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)]
    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(b: Buf, e: (Long, Long, Long, String)): Buf =
      if (e._1 == Long.MinValue) b else { b += e; b }
    override def merge(a: Buf, b: Buf): Buf = { a ++= b; a }
    override def finish(b: Buf): String = {
      val sorted =
        if (forward) b.sortBy(e => (e._1, e._2))(Ordering.Tuple2[Long, Long])
        else b.sortBy(e => (e._1, e._2))(Ordering.Tuple2[Long, Long].reverse)
      def ok(p: Int): Boolean =
        p + nSteps <= sorted.length &&
          (0 until nSteps).forall(k => ((sorted(p + k)._3 >> k) & 1L) == 1L) && {
            val baseOk = ((sorted(p)._3 >> nSteps) & 1L) == 1L
            if (anchorFirst) p == 0 && baseOk else baseOk
          }
      val range = 0 until sorted.length
      val pick = if (pickLast) range.reverseIterator.find(ok) else range.find(ok)
      pick.collect {
        case p if p + nSteps < sorted.length => sorted(p + nSteps)._4
      }.orNull
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
  }

  /** Shared buffered-event base for the sequence-pattern SQL aggregates
    * (`graft_sequence_match` / `graft_sequence_count`): rows are
    * (t micros, tiebreak id, step bitmask); no-step rows (mask 0) and
    * null-ts sentinels are DROPPED AT REDUCE — the same pre-buffer
    * filter [[sequenceMatch]] applies before its exchange, so state is
    * condition-matching events only. Finish sorts by (ts, id) — the
    * windowFunnel determinism contract — and hands (ts, masks) to the
    * memoized matcher the Column operators use, so the SQL form is the
    * same algorithm behind a GROUP BY. One divergence by construction:
    * an aggregate emits a row for EVERY group, so users with no stored
    * events read false/0 instead of being absent (pinned in the spec).
    */
  sealed abstract class SequencePatternAgg[OUT](pattern: String, nSteps: Int)
      extends org.apache.spark.sql.expressions.Aggregator[(Long, Long, Long),
        scala.collection.mutable.ArrayBuffer[Array[Long]], OUT] {
    require(nSteps >= 1 && nSteps <= 30)
    @transient private[operators] lazy val parsed: Seq[Step] =
      parsePattern(pattern, nSteps)
    // fail fast on a bad pattern at PLAN time, not first reduce
    parsePattern(pattern, nSteps)
    type Buf = scala.collection.mutable.ArrayBuffer[Array[Long]]
    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(b: Buf, e: (Long, Long, Long)): Buf =
      if (e._1 == Long.MinValue || e._3 == 0L) b
      else { b += Array(e._1, e._2, e._3); b }
    override def merge(a: Buf, b: Buf): Buf = { a ++= b; a }
    protected def sorted(b: Buf): (Array[Long], Array[Int]) = {
      val s = b.sortBy(e => (e(0), e(1)))(Ordering.Tuple2[Long, Long])
      (s.map(_(0)).toArray, s.map(_(2).toInt).toArray)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
  }

  /** `graft_sequence_match(pattern, ts, id, cond1..)` ≡
    * [[sequenceMatch]] per group.
    */
  final class SequenceMatchAgg(pattern: String, nSteps: Int)
      extends SequencePatternAgg[Boolean](pattern, nSteps) {
    override def finish(b: Buf): Boolean = {
      val (ts, masks) = sorted(b)
      matchEntries(ts, masks, parsed)
    }
    override def outputEncoder: org.apache.spark.sql.Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
  }

  /** `graft_sequence_count(pattern, ts, id, cond1..)` ≡
    * [[sequenceCountPattern]] per group (leftmost-lazy non-overlapping
    * matches, shared memo).
    */
  final class SequenceCountAgg(pattern: String, nSteps: Int)
      extends SequencePatternAgg[Long](pattern, nSteps) {
    override def finish(b: Buf): Long = {
      val (ts, masks) = sorted(b)
      val memo = new java.util.HashMap[Long, Integer]()
      var pos = 0
      var cnt = 0L
      while (pos >= 0 && pos < ts.length) {
        val end = findEnd(ts, masks, parsed, pos, memo)
        if (end < 0) pos = -1
        else { cnt += 1L; pos = end }
      }
      cnt
    }
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }
}
