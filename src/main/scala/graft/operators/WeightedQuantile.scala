package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `quantileExactWeighted` / `quantilesExactWeighted`: the
  * EXACT weighted percentile — for percentile p (integer 0..100) and
  * total weight W, the smallest value v whose cumulative weight
  * (all rows with value ≤ v) satisfies `100·cum ≥ p·W`. With integer
  * values and weights every comparison below is integer-exact — no
  * floating-point rank arithmetic — which is what makes the op
  * oracle-pinnable row-for-row (the KLL sketch in [[Quantiles]] is the
  * approximate, mergeable sibling; this is the exact one you run when
  * the value domain is boundable).
  *
  * Plan shape (all stock, two exchanges of shrinking size):
  *   1. groupBy (group, value) pre-aggregates the weight per DISTINCT
  *      value — the exchange that sees data volume collapses it to the
  *      value domain;
  *   2. one window pass per group over distinct values (cumulative +
  *      total weight), then a single hash aggregate picks every
  *      requested percentile with `min(when(...))` — the percentile list
  *      is a compile-time column list, not a join.
  *
  * At 100 TB: step 1 carries (group, value, partial weight) with
  * map-side combine; step 2's window runs over |distinct values| per
  * group. A group with an unbounded continuous value domain defeats the
  * collapse — quantize first (the catalog entry floors money to whole
  * units) or use the KLL sketch.
  */
object WeightedQuantile {

  /** Per-group exact weighted percentiles of integer `valueCol` weighted
    * by integer `weightCol`. Output: group cols, `total_w`, and one
    * `p<n>` column per requested percentile.
    */
  def exactWeighted(df: DataFrame, groupCols: Seq[String], valueCol: String,
      weightCol: String, percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 0 && p <= 100),
      s"percentiles must be 0..100: $percentiles")
    val g = groupCols.map(col)
    val perV = df.groupBy(g :+ col(valueCol): _*)
      .agg(sum(col(weightCol)).as("__w"))
    val cum = perV
      .withColumn("__cum", sum(col("__w")).over(
        Window.partitionBy(g: _*).orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__w")).over(Window.partitionBy(g: _*)))
    val aggs = max(col("__tot")).as("total_w") +: percentiles.map(p =>
      min(when(col("__cum") * 100 >= col("__tot") * p, col(valueCol)))
        .as(s"p$p"))
    cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
  }
}
