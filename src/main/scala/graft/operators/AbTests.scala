package graft.operators

import org.apache.spark.sql.DataFrame
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
}
