package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B experiment aggregates — ClickHouse `studentTTest` / `welchTTest` /
  * `mannWhitneyUTest` (all textbook statistics: Student 1908, Welch 1947,
  * Mann & Whitney 1947).
  *
  * Determinism contract: the DISTRIBUTED part aggregates only exact
  * integers — per-variant n, Σv, Σv² for the t-tests (callers pre-scale
  * values to integers), and the tie-aware doubled rank sum for
  * Mann-Whitney (`2·R₁` is always an integer even with average ranks on
  * ties, since ties contribute .5 steps in pairs). The float statistics
  * (means, variances, t, Welch df) are then ONE fixed expression tree
  * over those exact integers, written with identical parenthesization on
  * the Spark and DuckDB sides — IEEE doubles make them bit-equal, so the
  * whole output hash-matches.
  *
  * Scale shape: t-tests are a single 2-row hash aggregate (map-side
  * combine, 3 longs per variant per partition). Mann-Whitney collapses
  * to the DISTINCT VALUE domain first (groupBy value with map-side
  * combine), then one window pass over that domain for cumulative
  * counts — the WeightedQuantile pattern: the exchange that sees data
  * volume shrinks it to the value domain.
  */
object AbTests {

  /** Per-variant moments + Student/Welch t statistics. `variantCol` must
    * take exactly two values; `valueCol` integer.
    * Output: one row — variant labels, exact (n, s, q) evidence per
    * variant, then means/variances/t/df as doubles.
    */
  def tTests(df: DataFrame, variantCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val moments = df.groupBy(col(variantCol).cast("string").as("variant"))
      .agg(count(lit(1)).as("n"), sum(v).as("s"), sum(v * v).as("q"))
    val a = moments.orderBy(col("variant")).limit(1)
      .select(col("variant").as("variant_a"), col("n").as("n1"),
        col("s").as("s1"), col("q").as("q1"))
    val b = moments.orderBy(col("variant").desc).limit(1)
      .select(col("variant").as("variant_b"), col("n").as("n2"),
        col("s").as("s2"), col("q").as("q2"))
    val m1 = col("s1").cast("double") / col("n1").cast("double")
    val m2 = col("s2").cast("double") / col("n2").cast("double")
    val var1 = (col("q1").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") /
        col("n1").cast("double")) / (col("n1").cast("double") - 1.0)
    val var2 = (col("q2").cast("double") -
      col("s2").cast("double") * col("s2").cast("double") /
        col("n2").cast("double")) / (col("n2").cast("double") - 1.0)
    val sp2 = ((col("n1").cast("double") - 1.0) * col("var1") +
      (col("n2").cast("double") - 1.0) * col("var2")) /
      (col("n1").cast("double") + col("n2").cast("double") - 2.0)
    val se1 = col("var1") / col("n1").cast("double")
    val se2 = col("var2") / col("n2").cast("double")
    a.crossJoin(b)
      .withColumn("mean1", m1).withColumn("mean2", m2)
      .withColumn("var1", var1).withColumn("var2", var2)
      .withColumn("student_t", (col("mean1") - col("mean2")) /
        sqrt(sp2 * (lit(1.0) / col("n1").cast("double") +
          lit(1.0) / col("n2").cast("double"))))
      .withColumn("welch_t",
        (col("mean1") - col("mean2")) / sqrt(se1 + se2))
      .withColumn("welch_df", (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (col("n1").cast("double") - 1.0) +
          se2 * se2 / (col("n2").cast("double") - 1.0)))
  }

  /** ClickHouse `meanZTest(pop_var_x, pop_var_y, conf)` — the two-sample
    * mean z-test with KNOWN population variances (the CH signature takes
    * them as parameters, exactly as here):
    * z = (x̄₁ − x̄₂) / sqrt(σ₁²/n₁ + σ₂²/n₂). Same shape as [[tTests]]:
    * ONE 2-row map-side-combined hash aggregate of exact integer moments
    * (callers pre-quantize float values), the statistic one mirrored
    * sqrt-only expression tree over those integers — IEEE ⇒ bit-equal
    * doubles vs the oracle. The confidence-interval half-width needs the
    * normal quantile (libm erf⁻¹) — outside the oracle-exact surface,
    * the KS-p-value rationale; z is the decision-bearing number.
    *
    * Contract (same as [[tTests]]): `variantCol` must take exactly two
    * distinct values — the lexicographic min/max picks label the two
    * samples; with one value the output degenerates to variant_a ==
    * variant_b and z = 0, with three or more the middle variants are
    * silently excluded.
    */
  def meanZTest(df: DataFrame, variantCol: String, valueCol: String,
      popVar1: Double, popVar2: Double): DataFrame = {
    require(popVar1 > 0 && popVar2 > 0, "population variances must be positive")
    val v = col(valueCol)
    val moments = df.groupBy(col(variantCol).cast("string").as("variant"))
      .agg(count(lit(1)).as("n"), sum(v).as("s"))
    val a = moments.orderBy(col("variant")).limit(1)
      .select(col("variant").as("variant_a"), col("n").as("n1"),
        col("s").as("s1"))
    val b = moments.orderBy(col("variant").desc).limit(1)
      .select(col("variant").as("variant_b"), col("n").as("n2"),
        col("s").as("s2"))
    a.crossJoin(b)
      .withColumn("mean1", col("s1").cast("double") / col("n1").cast("double"))
      .withColumn("mean2", col("s2").cast("double") / col("n2").cast("double"))
      .withColumn("z", (col("mean1") - col("mean2")) /
        sqrt(lit(popVar1) / col("n1").cast("double") +
          lit(popVar2) / col("n2").cast("double")))
  }

  /** Tie-aware ROC-AUC (ClickHouse `arrayAUC`) — evaluation metric for
    * score-based classifiers (e.g. the t17 quality gate): AUC =
    * P(score₊ > score₋) + ½·P(score₊ = score₋) over all (positive,
    * negative) pairs, which is exactly U₊/(n₊·n₋) with average-rank ties
    * — so it reuses [[mannWhitney]]'s integer-exact doubled-U machinery
    * verbatim and the only float op is one final division. `labelCol`
    * must be 0/1 (1 = positive).
    */
  def auc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame =
    mannWhitney(df.select(
        when(col(labelCol) === 1, lit(0)).otherwise(lit(1)).as("__g"),
        col(scoreCol).as("__s")), "__g", "__s")
      .select(col("n1").as("n_pos"), col("n2").as("n_neg"), col("u1x2"),
        (col("u1x2").cast("double") /
          (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
          .as("auc"))

  /** ClickHouse `arrayAUC(scores, labels)` — the per-ROW array form of
    * [[auc]] (CH's actual signature; the typical call site is
    * `arrayAUC(groupArray(score), groupArray(label))` per group). One
    * in-row O(n log n) kernel: sort (score, label) pairs ascending, then
    * ONE sequential `aggregate` fold accumulating the tie-aware doubled
    * U — per tie group with p positives and g negatives above cumNeg
    * negatives strictly below, `2U += p·(2·cumNeg + g)` — exactly
    * [[mannWhitney]]'s integer machinery collapsed into a fold, so the
    * only float op is the final mirrored division. Pure built-in HOF
    * algebra (zip_with/array_sort/aggregate), whole-stage codegen.
    *
    * Contract: scores pre-quantized to BIGINT (tie detection must be
    * exact — the family discipline), labels 1 = positive / anything
    * else negative, arrays same length and null-free; all-one-class
    * arrays give NULL (the engine-family divide-by-zero semantics,
    * same as the Column form), NULL arrays give NULL.
    *
    * Scale shape: map-only — the kernel runs inside the row; array
    * sizes are the caller's per-group domain (the q54/q62 envelope).
    */
  def arrayAuc(scores: Column, labels: Column): Column = {
    val pairs = array_sort(zip_with(scores, labels,
      (s, l) => struct(s.as("s"), l.as("l"))))
    val zeroAcc = struct(lit(false).as("started"), lit(0L).as("prev"),
      lit(0L).as("p"), lit(0L).as("g"), lit(0L).as("cumneg"),
      lit(0L).as("u2"), lit(0L).as("tp"), lit(0L).as("tn"))
    aggregate(pairs, zeroAcc,
      (acc, e) => {
        val same = acc.getField("started") &&
          (e.getField("s") === acc.getField("prev"))
        val isPos = when(e.getField("l") === 1L, lit(1L)).otherwise(lit(0L))
        val isNeg = lit(1L) - isPos
        struct(
          lit(true).as("started"),
          e.getField("s").as("prev"),
          (when(same, acc.getField("p")).otherwise(lit(0L)) + isPos).as("p"),
          (when(same, acc.getField("g")).otherwise(lit(0L)) + isNeg).as("g"),
          when(same, acc.getField("cumneg"))
            .otherwise(acc.getField("cumneg") + acc.getField("g"))
            .as("cumneg"),
          when(same, acc.getField("u2"))
            .otherwise(acc.getField("u2") + acc.getField("p") *
              (lit(2L) * acc.getField("cumneg") + acc.getField("g")))
            .as("u2"),
          (acc.getField("tp") + isPos).as("tp"),
          (acc.getField("tn") + isNeg).as("tn"))
      },
      acc => {
        // flush the last tie group, then the one mirrored division
        val u2 = acc.getField("u2") + acc.getField("p") *
          (lit(2L) * acc.getField("cumneg") + acc.getField("g"))
        u2.cast("double") / (lit(2.0) * acc.getField("tp").cast("double") *
          acc.getField("tn").cast("double"))
      })
  }

  /** Mann-Whitney U via tie-aware DOUBLED rank sums (integer-exact):
    * for each distinct value v with c(v) total occurrences and m₁(v)
    * occurrences in variant 1, the average-rank convention gives
    * `2·R₁ = Σ_v m₁(v) · (2·below(v) + c(v) + 1)` where below(v) counts
    * pooled observations strictly less than v. Output: n1, n2, 2U₁, 2U₂
    * (the identity U₁+U₂ = n₁·n₂ makes the pair self-validating).
    */
  def mannWhitney(df: DataFrame, variantCol: String,
      valueCol: String): DataFrame = {
    val perV = df
      .groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"),
        sum(when(col(variantCol) === 0, 1L).otherwise(0L)).as("m1"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perV.withColumn("below",
      coalesce(sum(col("c")).over(w), lit(0L)))
    ranked.agg(
      sum(col("m1")).as("n1"),
      (sum(col("c")) - sum(col("m1"))).as("n2"),
      sum(col("m1") * (lit(2L) * col("below") + col("c") + 1L)).as("r1x2"))
      .select(col("n1"), col("n2"),
        (col("r1x2") - col("n1") * (col("n1") + 1L)).as("u1x2"),
        (lit(2L) * col("n1") * col("n2") -
          (col("r1x2") - col("n1") * (col("n1") + 1L))).as("u2x2"))
  }

  // ===== SQL aggregate frontends (ClickHouse names) ========================
  // A ClickHouse migrant writes `SELECT welchTTest(v, variant) FROM t` —
  // these Aggregators put the family behind GROUP BY under the reference
  // names, each finish replaying the Column operator's EXACT double
  // arithmetic (same ops, same parenthesization — IEEE ⇒ bit-equal, so
  // the SQL entries hash-match the q71/q72/q99 oracles verbatim).
  //
  // NULL handling: every input tuple carries an EXPLICIT `valid` slot the
  // registry builder computes as `value IS NOT NULL AND variant IS NOT
  // NULL` — no in-band NaN/Long.MinValue sentinel, so a genuine NaN or
  // Long.MinValue VALUE survives (the r14 aggregate family conflates
  // them; documented there). Invalid rows skip at reduce — the Column
  // forms likewise never see them (their aggregates skip NULLs).
  //
  // All-invalid group: the struct outputs can't be top-level NULL (the
  // product serializer asserts non-null), so finish degenerates to a
  // zero-count row (labels NULL, counts 0, statistics NaN) — the SQL
  // convention of "a row per group", the counts carrying the evidence.

  /** Shared full-evidence result of [[tTests]] — `studentTTest` and
    * `welchTTest` both return it (a deliberate superset of ClickHouse's
    * (t, p) tuples: p-values are libm territory, documented-out; the
    * exact integer evidence is what the oracle discipline pins).
    */
  case class TTestResult(variant_a: String, n1: Long, s1: Long, q1: Long,
      variant_b: String, n2: Long, s2: Long, q2: Long,
      mean1: Double, mean2: Double, var1: Double, var2: Double,
      student_t: Double, welch_t: Double, welch_df: Double)

  /** Moment-state aggregator behind the `studentTTest(v, variant)` /
    * `welchTTest(v, variant)` SQL functions. State: variant label →
    * exact (n, Σv, Σv²) — 3 longs per label, mergeable under any tree
    * (the [[tTests]] scale shape carried into aggregate state). The two
    * samples are the lexicographic min/max labels, exactly like the
    * Column form's orderBy-limit-1 pick (>2 variants: middle labels are
    * aggregated but unreported, the documented [[meanZTest]] contract;
    * 1 variant: variant_a == variant_b).
    */
  final class TTestAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long, Boolean),
        scala.collection.mutable.HashMap[String, (Long, Long, Long)],
        TTestResult] {
    type Buf = scala.collection.mutable.HashMap[String, (Long, Long, Long)]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (String, Long, Boolean)): Buf = {
      if (e._3) {
        val (n, s, q) = b.getOrElse(e._1, (0L, 0L, 0L))
        b.update(e._1, (n + 1L, s + e._2, q + e._2 * e._2))
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (k, (n, s, q)) =>
        val (n0, s0, q0) = a.getOrElse(k, (0L, 0L, 0L))
        a.update(k, (n0 + n, s0 + s, q0 + q))
      }
      a
    }
    override def finish(b: Buf): TTestResult = {
      if (b.isEmpty)
        return TTestResult(null, 0L, 0L, 0L, null, 0L, 0L, 0L,
          Double.NaN, Double.NaN, Double.NaN, Double.NaN,
          Double.NaN, Double.NaN, Double.NaN)
      val labels = b.keys.toSeq.sorted
      val (la, lb) = (labels.head, labels.last)
      val (n1, s1, q1) = b(la)
      val (n2, s2, q2) = b(lb)
      // the q71 Column tree, token for token (IEEE ⇒ bit-equal)
      val (n1d, s1d, q1d) = (n1.toDouble, s1.toDouble, q1.toDouble)
      val (n2d, s2d, q2d) = (n2.toDouble, s2.toDouble, q2.toDouble)
      val mean1 = s1d / n1d
      val mean2 = s2d / n2d
      val var1 = (q1d - s1d * s1d / n1d) / (n1d - 1.0)
      val var2 = (q2d - s2d * s2d / n2d) / (n2d - 1.0)
      val sp2 = ((n1d - 1.0) * var1 + (n2d - 1.0) * var2) /
        (n1d + n2d - 2.0)
      val studentT = (mean1 - mean2) /
        math.sqrt(sp2 * (1.0 / n1d + 1.0 / n2d))
      val se1 = var1 / n1d
      val se2 = var2 / n2d
      val welchT = (mean1 - mean2) / math.sqrt(se1 + se2)
      val welchDf = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1d - 1.0) + se2 * se2 / (n2d - 1.0))
      TTestResult(la, n1, s1, q1, lb, n2, s2, q2,
        mean1, mean2, var1, var2, studentT, welchT, welchDf)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[TTestResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TTestResult]()
  }

  /** [[meanZTest]]'s evidence struct — the `meanZTest(v, variant,
    * pop_var_x, pop_var_y)` SQL surface (ClickHouse's trailing `conf`
    * parameter drives the CI half-width, libm territory — documented-out
    * with the p-values).
    */
  case class MeanZResult(variant_a: String, n1: Long, s1: Long,
      variant_b: String, n2: Long, s2: Long,
      mean1: Double, mean2: Double, z: Double)

  /** [[TTestAgg]]'s shape with (n, Σv) state and the known-variance z
    * statistic at finish — the q99 Column tree token for token.
    */
  final class MeanZAgg(popVar1: Double, popVar2: Double)
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long, Boolean),
        scala.collection.mutable.HashMap[String, (Long, Long)],
        MeanZResult] {
    require(popVar1 > 0 && popVar2 > 0, "population variances must be positive")
    type Buf = scala.collection.mutable.HashMap[String, (Long, Long)]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (String, Long, Boolean)): Buf = {
      if (e._3) {
        val (n, s) = b.getOrElse(e._1, (0L, 0L))
        b.update(e._1, (n + 1L, s + e._2))
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (k, (n, s)) =>
        val (n0, s0) = a.getOrElse(k, (0L, 0L))
        a.update(k, (n0 + n, s0 + s))
      }
      a
    }
    override def finish(b: Buf): MeanZResult = {
      if (b.isEmpty)
        return MeanZResult(null, 0L, 0L, null, 0L, 0L,
          Double.NaN, Double.NaN, Double.NaN)
      val labels = b.keys.toSeq.sorted
      val (la, lb) = (labels.head, labels.last)
      val (n1, s1) = b(la)
      val (n2, s2) = b(lb)
      val mean1 = s1.toDouble / n1.toDouble
      val mean2 = s2.toDouble / n2.toDouble
      val z = (mean1 - mean2) /
        math.sqrt(popVar1 / n1.toDouble + popVar2 / n2.toDouble)
      MeanZResult(la, n1, s1, lb, n2, s2, mean1, mean2, z)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[MeanZResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MeanZResult]()
  }

  /** [[mannWhitney]]'s output — all exact longs, so SQL ≡ Column needs
    * no FP argument at all.
    */
  case class MannWhitneyResult(n1: Long, n2: Long, u1x2: Long, u2x2: Long)

  /** Distinct-value-collapse aggregator behind `mannWhitneyUTest(v,
    * variant)`: state = value → (pooled count, variant-0 count) — the
    * Column form's perV relation AS the aggregate state, bounded by the
    * group's value DOMAIN (the ExactWeightedAgg memory shape: quantize
    * continuous domains). Finish sorts the domain once and replays the
    * doubled-rank fold. `variant` uses the Column form's convention:
    * 0 = sample 1, anything else = sample 2.
    */
  final class MannWhitneyAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Boolean),
        scala.collection.mutable.HashMap[Long, (Long, Long)],
        MannWhitneyResult] {
    type Buf = scala.collection.mutable.HashMap[Long, (Long, Long)]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (Long, Long, Boolean)): Buf = {
      if (e._3) {
        val (c, m1) = b.getOrElse(e._1, (0L, 0L))
        b.update(e._1, (c + 1L, m1 + (if (e._2 == 0L) 1L else 0L)))
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (k, (c, m1)) =>
        val (c0, m0) = a.getOrElse(k, (0L, 0L))
        a.update(k, (c0 + c, m0 + m1))
      }
      a
    }
    override def finish(b: Buf): MannWhitneyResult = {
      var n1 = 0L
      var n = 0L
      var r1x2 = 0L
      var below = 0L
      b.keys.toArray.sorted.foreach { v =>
        val (c, m1) = b(v)
        r1x2 += m1 * (2L * below + c + 1L)
        n1 += m1
        n += c
        below += c
      }
      val n2 = n - n1
      val u1x2 = r1x2 - n1 * (n1 + 1L)
      MannWhitneyResult(n1, n2, u1x2, 2L * n1 * n2 - u1x2)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[MannWhitneyResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MannWhitneyResult]()
  }
}
