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

  /** [[exactWeighted]] as a typed Aggregator — the
    * `graft_quantile_exact_weighted(v, w, φ)` SQL surface, matching
    * ClickHouse's own execution shape (quantileExactWeighted holds a
    * value→weight hash map per group; so does this buffer, i.e. state
    * is bounded by the group's DISTINCT value count, not its row
    * count — quantize continuous domains first or use the KLL sketch,
    * exactly the [[exactWeighted]] guidance). φ is quantized to basis
    * points (round(φ·10⁴)); the pick rule is the same integer-exact
    * inclusive boundary as the DataFrame form — smallest v with
    * cum·10⁴ ≥ pBp·W — so at matching granularity
    * (φ = p/100 ⇔ percentile p) the two surfaces agree value-for-value
    * (spec-pinned). NULL values and non-positive weights are skipped
    * (standard aggregate semantics, the topKWeighted convention);
    * an all-skipped group yields NULL. Total weight must stay under
    * ~9.2·10¹⁴ (the cum·10⁴ product's Long envelope).
    *
    * NULL values travel as an EXPLICIT validity slot (the 3rd tuple
    * field, the r15 stats-frontend pattern) — no in-band sentinel, so
    * a GENUINE Long.MinValue value participates like any other
    * (spec-pinned) and the SQL ≡ Column claim is unqualified.
    */
  final class ExactWeightedAgg(phiBp: Int)
      extends org.apache.spark.sql.expressions.Aggregator[(Long, Long, Boolean),
        scala.collection.mutable.HashMap[Long, Long], java.lang.Long] {
    require(phiBp >= 0 && phiBp <= 10000, s"φ must be in [0, 1], got bp $phiBp")
    type Buf = scala.collection.mutable.HashMap[Long, Long]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (Long, Long, Boolean)): Buf = {
      if (e._3 && e._2 > 0)
        b.update(e._1, b.getOrElse(e._1, 0L) + e._2)
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (v, w) => a.update(v, a.getOrElse(v, 0L) + w) }
      a
    }
    override def finish(b: Buf): java.lang.Long = {
      if (b.isEmpty) return null
      val tot = b.valuesIterator.sum
      var cum = 0L
      val it = b.keysIterator.toArray.sorted.iterator
      while (it.hasNext) {
        val v = it.next()
        cum += b(v)
        if (cum * 10000L >= phiBp.toLong * tot) return v
      }
      null // unreachable: the last value always satisfies cum = tot
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[java.lang.Long] =
      org.apache.spark.sql.Encoders.LONG
  }
}
