package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY §2.4 scale notes; the brief's
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handling splits oversized sort-merge partitions
  * automatically, so explicit salting is for the two cases AQE doesn't
  * cover: hash AGGREGATES with hot keys, and joins where the hot side
  * must scatter across more tasks than one key's partition.
  */
object Skew {

  /** Deterministic per-row salt in [0, n): hash of the whole row's
    * partition-local position is unnecessary — any uniform value works, and
    * a seeded rand is reproducible per partition layout.
    */
  private def salt(n: Int): Column = (rand(42) * n).cast("int")

  /** Two-phase salted aggregation: groupBy(key, salt) computes partial
    * sums/counts (scattering a hot key over `saltFactor` reducers), then
    * groupBy(key) combines the partials. Results are identical to a direct
    * groupBy for any algebraic aggregate expressed as (partial, combine).
    *
    * `aggs` maps output column name → (partial aggregate over input rows,
    * combine aggregate over partials). E.g. a count is
    * `("n", count(lit(1)), sum(col("n")))`.
    */
  def saltedAggregate(
      df: DataFrame, key: String, saltFactor: Int,
      aggs: Seq[(String, Column, Column)]): DataFrame = {
    val partial = df.withColumn("__salt", salt(saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map(a => a._2.as(a._1)): _*)
    partial.groupBy(col(key))
      .agg(aggs.head._3.as(aggs.head._1), aggs.tail.map(a => a._3.as(a._1)): _*)
  }

  /** Key-skew diagnosis report — the pre-shuffle check an operator runs
    * BEFORE joining or aggregating 100 TB on a key: is the key histogram
    * spiky enough to need [[saltedAggregate]]/[[saltedJoin]] (or AQE
    * skew-join), and how hot is the hottest key? One row out:
    *
    *   - n_rows / n_keys / max_cnt — exact totals
    *   - top1_key (deterministic: max count, ties to the smallest key)
    *   - top1_share_bp / topk_share_bp — hottest-key and top-`topK`
    *     row shares in basis points, floored integer division (engine-
    *     exact, the t13 quantization)
    *   - skew_x1000 — the factor by which the hottest key exceeds the
    *     mean key, ×1000 (1000 = perfectly uniform): computed as
    *     floor(max_cnt·10⁶ / floor(n_rows·1000 / n_keys)) — the two-step
    *     flooring keeps every intermediate under 2⁶³ to max_cnt ≤ ~9·10¹²
    *     and n_rows ≤ ~9·10¹⁵ (a direct max·1000·keys product overflows
    *     Long at the very scales this report targets and would wrap
    *     silently under the repo's non-ANSI sessions). The salt factor
    *     to scatter the hot key is skew/1000 · partitions/n_keys —
    *     left to the caller, whose partition count is config, not data.
    *
    * The key column groups AS-IS (strings, longs — any orderable type;
    * no cast, so string keys keep their identity and the deterministic
    * tie order is the column type's own).
    *
    * Scale shape: ONE map-side-combined count aggregate over the key
    * domain (the exchange carries keys, not rows), then 1-row totals +
    * the heap top-k (`TakeOrderedAndProject`) over the counts table.
    * The EXACT report is the oracle-checkable form; at unbounded key
    * domains compose [[HeavyHitters.topK]] (Misra-Gries, bounded state)
    * for the same decision with sketch guarantees.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
    val top1 = counts.orderBy(col("cnt").desc, col("k")).limit(1)
      .select(col("k").as("top1_key"))
    val topAgg = counts.orderBy(col("cnt").desc, col("k")).limit(topK)
      .agg(sum(col("cnt")).as("topk_cnt"),
        count(lit(1)).as("topk_keys"))
    totals.crossJoin(top1).crossJoin(topAgg)
      .withColumn("top1_share_bp",
        expr("max_cnt * 10000L div n_rows"))
      .withColumn("topk_share_bp",
        expr("topk_cnt * 10000L div n_rows"))
      .withColumn("skew_x1000",
        expr("max_cnt * 1000000L div (n_rows * 1000L div n_keys)"))
  }

  /** Salted inner equi-join: scatter the (big, skewed) left side over
    * `saltFactor` sub-keys and replicate the right side once per sub-key.
    * Right-side replication costs |R|·saltFactor — use when R is modest
    * but above the broadcast threshold and L's key histogram is spiky.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int): DataFrame = {
    val l = left.withColumn("__salt", salt(saltFactor))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
