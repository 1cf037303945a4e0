package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular events onto a fixed
  * grid with forward fill — the gap-filling step feature pipelines need
  * before windowed aggregation or model input (sensor feeds, activity
  * metrics, spot prices).
  *
  * Plan shape (all stock operators, one key exchange):
  *   1. per (key, bucket) keep the LAST observation — one aggregate-like
  *      window with a unique (ts, tiebreak) order;
  *   2. per key generate the dense bucket grid with
  *      `explode(sequence(min, max, step))` — the grid never materializes
  *      on the driver and each key's span explodes independently
  *      map-side after a tiny (key, min, max) aggregate;
  *   3. left-join observations onto the grid (same key partitioning) and
  *      forward-fill with `last(value, ignoreNulls)` over the key window.
  *
  * At 100 TB the key cardinality carries the parallelism (each key's
  * grid+fill is independent); a single pathological key with a years-long
  * span × fine step is the thing to guard (cap the span or coarsen the
  * step per key class).
  */
object TimeSeries {

  /** Resample `df` onto a `unit` grid per `keyCol` (span = that key's
    * observed min..max, truncated to the unit) and forward-fill
    * `valueCol` from the last observation at or before each bucket.
    * `tieBreakCol` must make (tsCol, tieBreakCol) unique per key so the
    * "last observation in a bucket" is well-defined.
    */
  /** ClickHouse `deltaSum` + `boundingRatio` per key (the ClickHouse docs
    * define `deltaSum` as the sum of positive differences between
    * consecutive values and `boundingRatio` as the slope between the
    * leftmost and rightmost points; `deltaSumTimestamp` coincides with
    * `deltaSum` here because the fold order is DECLARED to be
    * `(tsCol, tieBreakCol)` rather than block-arrival order — the only
    * order that is well-defined on a distributed engine).
    *
    * `valueCol` must already be integer (callers pre-scale floats): every
    * aggregate below is then integer-exact; the single float division for
    * the ratio happens once per key on two exact integers.
    *
    * Plan shape: ONE exchange on the key — the lag window sorts within
    * the key partitions, and the groupBy reuses the same partitioning
    * (first/last via `min_by`/`max_by` on the (ts, tiebreak) struct, no
    * second window sort). At 100 TB the key cardinality carries the
    * parallelism; state per key is O(1).
    *
    * Output: key, n, delta_sum, first_v, last_v, dt_us,
    * bounding_ratio = (last_v-first_v)/dt_us (NULL when the key's span is
    * a single instant).
    */
  def deltaStats(df: DataFrame, keyCol: String, tsCol: String,
      tieBreakCol: String, valueCol: String): DataFrame = {
    val key = col(keyCol)
    val ord = struct(col(tsCol), col(tieBreakCol))
    val v = col(valueCol)
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tieBreakCol))
    df.withColumn("__dv", v - lag(v, 1).over(w))
      .groupBy(key)
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("__dv") > 0, col("__dv"))), lit(0L)).as("delta_sum"),
        min_by(v, ord).as("first_v"),
        max_by(v, ord).as("last_v"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).as("dt_us"))
      .withColumn("bounding_ratio",
        when(col("dt_us") > 0,
          (col("last_v") - col("first_v")).cast("double") /
            col("dt_us").cast("double")))
  }

  /** ClickHouse `exponentialMovingAverage`-family smoothing over the
    * DECLARED (ts, tiebreak) order per key: the classic series EMA
    * `s₁ = v₁; sᵢ = α·vᵢ + β·sᵢ₋₁` with β passed EXPLICITLY rather than
    * computed as 1−α (α = 0.3 gives 1−α = 0.7000000000000001 in FP — the
    * caller states both constants and the oracle embeds the identical
    * literals, keeping the fold bit-reproducible; exact-binary pairs like
    * 0.25/0.75 make the point moot). ClickHouse's time-decayed variants
    * weight by `exp(−Δt/τ)` — libm `exp` is not bit-pinned across
    * engines (the same reason the geo family omits great-circle trig), so
    * the Δt-weighted form is deliberately out of the oracle-exact
    * surface; callers who want it pre-scale per-row weights upstream.
    *
    * Output: key, n, ema (the final smoothed value). Shape: one key
    * exchange; the per-key sorted collect is the funnel-family envelope,
    * and the fold is one linear `aggregate` pass over the collected
    * values — at 100 TB key cardinality carries the parallelism and a
    * pathological single key is the caller's pre-filter.
    */
  def ema(df: DataFrame, keyCol: String, tsCol: String, tieBreakCol: String,
      valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta < 1,
      s"alpha=$alpha beta=$beta")
    val sorted = df
      .select(col(keyCol), unix_micros(col(tsCol)).as("__t"),
        col(tieBreakCol).as("__i"), col(valueCol).cast("double").as("__v"))
      .groupBy(col(keyCol))
      .agg(transform(
        array_sort(collect_list(struct(col("__t"), col("__i"), col("__v")))),
        e => e.getField("__v")).as("vals"))
    sorted.select(col(keyCol), size(col("vals")).cast("long").as("n"),
      aggregate(col("vals"), lit(null).cast("double"), (acc, x) =>
        when(acc.isNull, x).otherwise(lit(alpha) * x + lit(beta) * acc))
        .as("ema"))
  }

  /** ClickHouse `intervalLengthSum` + `maxIntersections` /
    * `maxIntersectionsPosition` per key over half-open integer intervals
    * `[startCol, endCol)` (positions in any integer unit, e.g. epoch
    * micros). Touching intervals merge for the union measure (same total
    * either way); at equal sweep positions interval ENDS are processed
    * before starts (half-open), so `[1,2)`+`[2,3)` never overlap.
    *
    * Construction (all stock window/agg operators, integer-exact):
    *   - union length: gaps-and-islands — a row opens a new island when
    *     its start exceeds the running max end of all earlier rows in
    *     (start, end, tiebreak) order; island length = max(end)−min(start);
    *   - max overlap: ±1 sweep — each interval contributes (+1 at start,
    *     −1 at end), the running sum ordered by (pos, delta) is the
    *     overlap depth, and the reported position is the EARLIEST position
    *     attaining the maximum (always some interval's start, since a
    *     maximum is only ever reached on a +1 step).
    *
    * Plan shape: one exchange on the key feeding both window passes (the
    * sweep explodes 2 points per interval — bounded 2× row inflation,
    * never payload inflation). Per-key work is O(n log n) in that key's
    * interval count; key cardinality carries the parallelism at 100 TB.
    */
  def intervalStats(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tieBreakCol: String): DataFrame = {
    val key = col(keyCol)
    val s = col(startCol)
    val e = col(endCol)
    val wOrd = Window.partitionBy(key).orderBy(s, e, col(tieBreakCol))
    val prevMaxEnd = max(e).over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val islands = df
      .withColumn("__new_island",
        when(s > coalesce(prevMaxEnd, lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new_island")).over(wOrd))
      .groupBy(key, col("__island"))
      .agg((max(e) - min(s)).as("__len"), count(lit(1)).as("__cnt"))
      .groupBy(key)
      .agg(sum(col("__cnt")).as("n_intervals"),
        sum(col("__len")).as("union_len"))
    val wp = Window.partitionBy(key).orderBy(col("pos"), col("delta"))
    val sweep = df
      .select(key, explode(array(
        struct(s.as("pos"), lit(1).as("delta")),
        struct(e.as("pos"), lit(-1).as("delta")))).as("p"))
      .select(key, col("p.pos").as("pos"), col("p.delta").as("delta"))
      .withColumn("__depth", sum(col("delta")).over(wp))
      .withColumn("__maxd", max(col("__depth")).over(Window.partitionBy(key)))
      .groupBy(key)
      .agg(max(col("__depth")).cast("long").as("max_overlap"),
        min(when(col("__depth") === col("__maxd"), col("pos")))
          .as("max_overlap_pos"))
    islands.join(sweep, Seq(keyCol))
  }

  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreakCol: String, unit: String = "hour"): DataFrame = {
    val key = col(keyCol)
    val bucket = date_trunc(unit, col(tsCol))
    val lastInBucket = Window.partitionBy(key, col("h"))
      .orderBy(col(tsCol).desc, col(tieBreakCol).desc)
    // one explicit key exchange feeds the whole plan — grid generation
    // parallelizes and the grid itself never shuffles; see the full
    // trap analysis in resampleInterpolate
    val par = df.sparkSession.sparkContext.defaultParallelism
    val src = df.select(key, col(tsCol), col(tieBreakCol), col(valueCol))
      .repartition(par, key)
    val obs = src
      .withColumn("h", bucket)
      .withColumn("__rn", row_number().over(lastInBucket))
      .where(col("__rn") === 1)
      .select(key, col("h"), col(valueCol))
    val span = src.groupBy(key).agg(
      date_trunc(unit, min(col(tsCol))).as("h0"),
      date_trunc(unit, max(col(tsCol))).as("h1"))
      .select(key, explode(sequence(col("h0"), col("h1"),
        expr(s"interval 1 $unit"))).as("h"))
    span.join(obs, Seq(keyCol, "h"), "left")
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true)
        .over(Window.partitionBy(key).orderBy(col("h"))))
  }

  /** ClickHouse `ORDER BY … WITH FILL INTERPOLATE` — [[resampleFill]]'s
    * grid with LINEAR interpolation between the neighbouring
    * observations instead of forward fill (constant extension past the
    * edges). `valueCol` must be integral (callers floor-quantize) so the
    * bracketing observations are exact; the per-row interpolation is
    * then ONE fixed expression over four exact integers — mirrored in
    * the oracle, the doubles hash-match. Grid positions are integer
    * bucket indices (epoch `unit`s).
    *
    * Shape: same as [[resampleFill]] — a tiny (key, min, max) aggregate
    * explodes each key's grid map-side, one key exchange feeds the
    * bracketing windows (running last / first over the grid). Output:
    * (key, h, v) with v DOUBLE on the dense grid.
    */
  def resampleInterpolate(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreakCol: String, unit: String = "hour"): DataFrame = {
    val key = col(keyCol)
    val unitMicros = unit match {
      case "hour"   => 3600000000L
      case "minute" => 60000000L
      case "day"    => 86400000000L
      case other => throw new IllegalArgumentException(s"unit: $other")
    }
    // TRUE integral division (`div` = Catalyst IntegralDivide on longs) —
    // Column `/` would be IEEE double division + cast, whose exactness
    // rests on a half-ulp margin for far-future micros. `div` truncates
    // toward zero while the oracle's `//` floors — identical for
    // epoch-positive timestamps; pre-1970 data would need pmod-floor
    // bucketing on both sides
    val bucket = expr(s"unix_micros(`$tsCol`) div ${unitMicros}L")
    val lastInBucket = Window.partitionBy(key, col("h"))
      .orderBy(col(tsCol).desc, col(tieBreakCol).desc)
    // ONE explicit key exchange of the raw events feeds the WHOLE plan.
    // Everything downstream satisfies its clustering from the subset
    // rule — the (key, h) dedup window, the span aggregate, the (key, h)
    // join, and both fill windows run with ZERO further exchanges, and
    // the dense grid (keys × span, the big relation here) never crosses
    // the wire. The explicit numPartitions matters twice, measured on
    // the 10× probe corpus (fresh-JVM isolated):
    //   1. AQE coalesces implicit (ENSURE_REQUIREMENTS) exchanges on
    //      PRE-explode stats: the tiny 1-row-per-key span table reads
    //      as one partition, and since explode has no re-split — and a
    //      runtime-broadcast obs side breaks no stage — the explode,
    //      join, both sorts and all four fill windows ran in a SINGLE
    //      TASK (14.4 s of the 15 s total). A plain repartition(key)
    //      doesn't help: it collapses into the aggregate's identical
    //      exchange and gets coalesced with it. User-specified
    //      repartition(N, key) is AQE-coalescing-exempt.
    //   2. Without key co-partitioning, once obs outgrows the broadcast
    //      threshold the (key, h) join exchanges the GRID and the fill
    //      window re-exchanges it on key — two shuffles of the largest
    //      relation (measured 6-7× at 10× data against ~2× after).
    // Cost: the span aggregate loses map-side combine (the exchange
    // carries raw (key, ts) pairs) — but those same rows had to cross
    // the wire for the dedup window anyway, so the plan's total traffic
    // went DOWN (one raw-event exchange instead of raw events + obs).
    val par = df.sparkSession.sparkContext.defaultParallelism
    val src = df.select(key, col(tsCol), col(tieBreakCol), col(valueCol))
      .repartition(par, key)
    val obs = src
      .withColumn("h", bucket)
      .withColumn("__rn", row_number().over(lastInBucket))
      .where(col("__rn") === 1)
      .select(key, col("h"), col(valueCol).as("__v"))
    val span = src.groupBy(key)
      .agg(min(bucket).as("h0"), max(bucket).as("h1"))
      .select(key, explode(sequence(col("h0"), col("h1"))).as("h"))
    val wPrev = Window.partitionBy(key).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward bracket as a RUNNING frame over the DESCENDING sort:
    // a [currentRow, unboundedFollowing] frame re-scans the partition
    // remainder per row (O(n²) — measured 18× q42's cost on the same
    // grid before this rewrite); last(ignoreNulls) over the reversed
    // running frame is the same value in O(n)
    val wNext = Window.partitionBy(key).orderBy(col("h").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // __hobs is PRE-projected so the pv/ph (and nv/nh) pairs share a
    // bare-column window spec: an inline when() gets extracted into a
    // Project BETWEEN the Window nodes, which blocks CollapseWindow —
    // measured as 4 WindowExec passes over the grid instead of 2
    val g = span.join(obs, Seq(keyCol, "h"), "left")
      .withColumn("__hobs", when(col("__v").isNotNull, col("h")))
      .withColumn("pv", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(col("__hobs"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", last(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("nh", last(col("__hobs"), ignoreNulls = true).over(wNext))
    g.select(key, col("h"),
      when(col("__v").isNotNull, col("__v").cast("double"))
        .when(col("pv").isNotNull && col("nv").isNotNull,
          col("pv").cast("double") + (col("nv") - col("pv")).cast("double") *
            ((col("h") - col("ph")).cast("double") /
              (col("nh") - col("ph")).cast("double")))
        .otherwise(coalesce(col("pv"), col("nv")).cast("double")).as("v"))
  }

  /** [[deltaStats]]' delta_sum leg as a typed Aggregator — the
    * `graft_delta_sum(ts, id, v)` SQL surface (ClickHouse
    * `deltaSumTimestamp`: sum of POSITIVE consecutive deltas in the
    * declared (ts, tiebreak) order — the only well-defined fold order on
    * a distributed engine, where CH's plain `deltaSum` folds in block
    * order). Buffers (t, id, v) rows; NULL-ts and NULL-v rows (flagged
    * by the explicit validity slot, no in-band sentinel — a genuine
    * Long.MinValue value participates like any other) are SKIPPED at
    * reduce — a skipped row joins its neighbors, where
    * the window form's lag-over-NULL voids both adjacent deltas; on the
    * family's non-null contract (callers pre-scale/clean, like every
    * deltaStats caller) the two surfaces agree, spec-pinned. Finish
    * sorts and folds. Integer values (pre-scale floats, the family
    * discipline).
    */
  /** [[ema]] as a typed Aggregator — the `graft_ema(ts, id, v, α, β)`
    * SQL surface. β is passed EXPLICITLY like the Column form (1−α is
    * not FP-safe to recompute; the caller states both constants). The
    * finish fold runs the IDENTICAL double operations as the Column
    * form's `aggregate` lambda (`α·x + β·acc`, same multiply/add order —
    * JVM strict doubles ≡ codegen, the emaStream precedent), so the two
    * surfaces are BIT-equal, spec-pinned. NULL-ts/NULL-v rows skip;
    * empty group → NULL.
    *
    * NULL rows travel as an EXPLICIT validity slot (the 4th tuple
    * field, the r15 stats-frontend pattern) — the value slot carries no
    * in-band sentinel, so a GENUINE NaN input survives and propagates
    * through the fold exactly as the Column form's `aggregate` lambda
    * propagates it (spec-pinned); the SQL ≡ Column claim is
    * unqualified. [[DeltaSumAgg]] carries the same slot for its Long
    * values.
    */
  final class EmaAgg(alpha: Double, beta: Double)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Double, Boolean),
        scala.collection.mutable.ArrayBuffer[(Long, Long, Double)],
        java.lang.Double] {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta < 1,
      s"need 0 < alpha <= 1 and 0 <= beta < 1, got ($alpha, $beta)")
    type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]
    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(b: Buf, e: (Long, Long, Double, Boolean)): Buf =
      if (!e._4) b else { b += ((e._1, e._2, e._3)); b }
    override def merge(a: Buf, b: Buf): Buf = { a ++= b; a }
    override def finish(b: Buf): java.lang.Double = {
      if (b.isEmpty) return null
      val sorted = b.sortBy(e => (e._1, e._2))(Ordering.Tuple2[Long, Long])
      var acc = sorted.head._3
      var i = 1
      while (i < sorted.length) {
        acc = alpha * sorted(i)._3 + beta * acc
        i += 1
      }
      acc
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[java.lang.Double] =
      org.apache.spark.sql.Encoders.DOUBLE
  }

  final class DeltaSumAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Long, Boolean),
        scala.collection.mutable.ArrayBuffer[(Long, Long, Long)], Long] {
    type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]
    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(b: Buf, e: (Long, Long, Long, Boolean)): Buf =
      if (!e._4) b else { b += ((e._1, e._2, e._3)); b }
    override def merge(a: Buf, b: Buf): Buf = { a ++= b; a }
    override def finish(b: Buf): Long = {
      val sorted = b.sortBy(e => (e._1, e._2))(Ordering.Tuple2[Long, Long])
      var sum = 0L
      var i = 1
      while (i < sorted.length) {
        val d = sorted(i)._3 - sorted(i - 1)._3
        if (d > 0) sum += d
        i += 1
      }
      sum
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** ClickHouse `seriesOutliersDetectTukey` as an IN-ROW kernel over an
    * `array<bigint>` series — q92's all-integer fence algebra carried
    * into one Column expression (zero FP: quartiles in exact integer
    * 4ths via the subtract-remainder division, fences in 8ths, k = 1.5
    * and the 0.25/0.75 quantiles fixed at ClickHouse's defaults).
    * DEVIATION (oracle discipline): scores are integer 8ths of the
    * value unit — `8·x − fence₈` outside the fences, 0 inside —
    * where ClickHouse emits float distances; same sign, same zero set,
    * engine-exact. Pre-scale float series.
    *
    * Plan shape: the fence pair is computed ONCE per row and passed
    * into the scoring lambda through a 1-element transform (the
    * let-binding idiom) — without it every element's lambda would
    * re-evaluate the `array_sort` subtree and the per-row cost would be
    * O(n²·log n), the q96/HOF-subtree failure mode. Map-only,
    * whole-stage codegen, no UDFs.
    */
  def tukeyScores8(arr: Column): Column = {
    val sorted = array_sort(arr)
    val n = size(arr).cast("long")
    // 4·quartile at φ over the sorted copy: numer = 4·(n−1)·φ; the
    // subtract-remainder division is exact (multiple of 4) — q92's tree
    def quart4(numer: Column): Column = {
      val rem = pmod(numer, lit(4L))
      val lo = ((numer - rem) / lit(4L)).cast("long")
      val aLo = element_at(sorted, (lo + 1L).cast("int"))
      val aHi = element_at(sorted, least(lo + 2L, n).cast("int"))
      lit(4L) * aLo + rem * (aHi - aLo)
    }
    val q14 = quart4(n - 1L)
    val q34 = quart4(lit(3L) * (n - 1L))
    val fences = array(struct(
      (lit(2L) * q14 - lit(3L) * (q34 - q14)).as("lo8"),
      (lit(2L) * q34 + lit(3L) * (q34 - q14)).as("hi8")))
    when(size(arr) < 1, arr).otherwise(
      element_at(transform(fences, f =>
        transform(arr, x =>
          when(lit(8L) * x < f.getField("lo8"),
            lit(8L) * x - f.getField("lo8"))
            .when(lit(8L) * x > f.getField("hi8"),
              lit(8L) * x - f.getField("hi8"))
            .otherwise(lit(0L)))), 1))
  }

  /** [[intervalStats]]'s per-key output — the `intervalLengthSum` /
    * `maxIntersections` / `maxIntersectionsPosition` SQL surface (all
    * three ClickHouse names return this one evidence struct, the
    * cramersV convention; read the field you asked for). Empty /
    * all-NULL groups degenerate to (0, 0, 0, NULL).
    */
  case class IntervalResult(n_intervals: Long, union_len: Long,
      max_overlap: Long, max_overlap_pos: Option[Long])

  /** Interval-DOMAIN state: (start, end) → multiplicity — bounded by the
    * group's distinct intervals (time-series intervals repeat heavily;
    * a group whose every interval is unique degenerates to buffering,
    * which is also what the Column form's per-key sort costs). Finish
    * replays [[intervalStats]]'s two constructions EXACTLY:
    *
    *   - union/islands: walk intervals in (start, end) order keeping the
    *     RUNNING max end over all earlier intervals (the Column form's
    *     `prevMaxEnd` — global, not per-island, so even malformed
    *     end < start rows replay identically); a row opens a new island
    *     when start exceeds it; island length = max(end) − min(start);
    *   - max overlap: the ±multiplicity sweep with interval ENDS
    *     processed before starts at equal positions (half-open), depth
    *     after each position group = the Column form's row-level depth
    *     at the group's last row. A position's intermediate (mid-group)
    *     depths never exceed the neighbouring after-group depths, so the
    *     row-level max and the group-level max coincide, and the max is
    *     only ever attained on a start step — the reported position is
    *     the EARLIEST position whose after-group depth equals the max,
    *     exactly the Column form's `min(pos) WHERE depth = maxd`.
    */
  final class IntervalAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Boolean),
        scala.collection.mutable.HashMap[(Long, Long), Long],
        IntervalResult] {
    type Buf = scala.collection.mutable.HashMap[(Long, Long), Long]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (Long, Long, Boolean)): Buf = {
      if (e._3) {
        val k = (e._1, e._2)
        b.update(k, b.getOrElse(k, 0L) + 1L)
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
      a
    }
    override def finish(ivals: Buf): IntervalResult = {
      if (ivals.isEmpty) return IntervalResult(0L, 0L, 0L, None)
      val sorted = ivals.toSeq.sortBy(_._1)
      // islands: running max end over ALL earlier rows breaks islands;
      // per-island max(end) − min(start) accumulates the union
      var nIntervals = 0L
      var unionLen = 0L
      var runMax = Long.MinValue
      var islandMin = 0L
      var islandMax = 0L
      var open = false
      sorted.foreach { case ((s, e), c) =>
        nIntervals += c
        if (!open || s > runMax) {
          if (open) unionLen += islandMax - islandMin
          islandMin = s; islandMax = e; open = true
        } else if (e > islandMax) islandMax = e
        if (e > runMax) runMax = e
      }
      unionLen += islandMax - islandMin
      // sweep: per position, ends retire before starts open (half-open)
      val starts = scala.collection.mutable.HashMap.empty[Long, Long]
      val ends = scala.collection.mutable.HashMap.empty[Long, Long]
      ivals.foreach { case ((s, e), c) =>
        starts.update(s, starts.getOrElse(s, 0L) + c)
        ends.update(e, ends.getOrElse(e, 0L) + c)
      }
      val positions = (starts.keySet ++ ends.keySet).toSeq.sorted
      var depth = 0L
      var maxD = Long.MinValue
      var maxPos = 0L
      positions.foreach { pos =>
        depth += starts.getOrElse(pos, 0L) - ends.getOrElse(pos, 0L)
        if (depth > maxD) { maxD = depth; maxPos = pos }
      }
      IntervalResult(nIntervals, unionLen, maxD, Some(maxPos))
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[IntervalResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[IntervalResult]()
  }

  /** The `sparkbar(x, y)` SQL surface — q89's composition as one
    * aggregate: (mx = the group's max level, bar = the ▁▂▃▄▅▆▇█ ramp in
    * ascending-x order).
    */
  case class SparkbarResult(mx: Long, bar: String)

  /** x-DOMAIN state: x → Σy (bounded by the group's distinct x
    * positions — days of a month, hours of a day). Finish replays the
    * q89 Column tree: level = floor((Σy·7) / max) via one exact-product
    * double division (engine-exact while Σy·7 ≤ 2^53 — the q89 bound),
    * glyph = the level'th ramp character, bar concatenated in ascending
    * x. CONTRACT: Σy per x must be in [0, 2^53/7] — q89's count inputs
    * by construction; a negative sum renders as an empty glyph (the
    * Column form's out-of-range substr), documented not defined.
    */
  final class SparkbarAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Boolean),
        scala.collection.mutable.HashMap[Long, Long], SparkbarResult] {
    private val Ramp = "▁▂▃▄▅▆▇█"
    type Buf = scala.collection.mutable.HashMap[Long, Long]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (Long, Long, Boolean)): Buf = {
      if (e._3) b.update(e._1, b.getOrElse(e._1, 0L) + e._2)
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (x, y) => a.update(x, a.getOrElse(x, 0L) + y) }
      a
    }
    override def finish(perX: Buf): SparkbarResult = {
      if (perX.isEmpty) return SparkbarResult(0L, "")
      val mx = perX.valuesIterator.max
      val bar = perX.toSeq.sortBy(_._1).map { case (_, v) =>
        val level = math.floor((v * 7L).toDouble / mx.toDouble).toInt
        if (level >= 0 && level < 8) Ramp.substring(level, level + 1) else ""
      }.mkString
      SparkbarResult(mx, bar)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[SparkbarResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[SparkbarResult]()
  }
}
