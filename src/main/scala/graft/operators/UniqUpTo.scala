package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded exact distinct count — ClickHouse `uniqUpTo(N)(x)` parity
  * (the "is this column low-cardinality?" probe analysts run before
  * choosing a dictionary encoding or a GROUP BY shape). Returns the
  * EXACT distinct count while it is ≤ N, and the sentinel N+1 as soon
  * as the true count exceeds N.
  *
  * Unlike the estimating legs of the mergeable-summary family (HLL q48,
  * Misra-Gries t19, KLL t20, reservoir t21, theta t22), the answer here
  * is a DETERMINISTIC function of the input's distinct-value set — merge
  * order never shows — so the catalog entry (t23) gets a full DuckDB
  * oracle: `LEAST(count(DISTINCT x), N+1)`.
  *
  * State: a set of witness values capped at N+1 entries. While ≤ N
  * distinct values have been seen the set IS the distinct set; the
  * (N+1)-th distinct value saturates the state (N+1 witnesses prove
  * "more than N", further inserts are no-ops). Merge = set union under
  * the same cap — once either side is saturated the union is, and which
  * N+1 witnesses survive a capped union cannot change the final
  * `min(|set|, N+1)`. Scale shape: ≤ N+1 strings per state regardless
  * of input, map-side combine, one capped set per partition on the
  * exchange — the family's bounded-state contract.
  *
  * NULL semantics match SQL `count(DISTINCT x)`: nulls are skipped, an
  * all-null / empty group counts 0.
  */
object UniqUpTo {

  final class UniqUpToAgg(n: Int)
      extends Aggregator[String, Set[String], Long] {
    require(n > 0, s"uniqUpTo cap must be positive, got $n")

    override def zero: Set[String] = Set.empty

    override def reduce(b: Set[String], x: String): Set[String] =
      if (x == null || b.size > n) b else b + x

    override def merge(a: Set[String], b: Set[String]): Set[String] = {
      if (a.size > n) a
      else if (b.size > n) b
      else {
        val u = a ++ b
        // any n+1 witnesses prove saturation; which ones survive cannot
        // change min(|set|, n+1), so a plain take keeps the cap
        if (u.size > n + 1) u.take(n + 1) else u
      }
    }

    override def finish(b: Set[String]): Long = math.min(b.size, n + 1).toLong

    override def bufferEncoder: Encoder[Set[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Set[String]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** [[UniqUpToAgg]] lifted over the value half of a (key, value) pair —
    * the grouped/streaming form's input adapter (the
    * [[HeavyHitters.MisraGriesValue]] pattern).
    */
  final class UniqUpToValue(n: Int)
      extends Aggregator[(String, String), Set[String], Long] {
    private val inner = new UniqUpToAgg(n)
    override def zero: Set[String] = inner.zero
    override def reduce(b: Set[String], x: (String, String)): Set[String] =
      inner.reduce(b, x._2)
    override def merge(a: Set[String], b: Set[String]): Set[String] =
      inner.merge(a, b)
    override def finish(b: Set[String]): Long = inner.finish(b)
    override def bufferEncoder: Encoder[Set[String]] = inner.bufferEncoder
    override def outputEncoder: Encoder[Long] = inner.outputEncoder
  }

  /** The aggregator as a relational `Column`, usable directly in
    * `df.groupBy(...).agg(...)` — values are stringified first (distinct
    * cardinality is preserved by any injective cast; `cast(string)` is
    * injective for the integral/string/date types this targets).
    */
  def column(value: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.graftbridge.ColumnBridge.scalaAggregator(
        new UniqUpToAgg(n), Encoders.STRING, "uniq_upto",
        Seq(org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          value.cast("string")))))

  /** Whole-frame bounded distinct of `valueCol` → one row `(u)`. */
  def uniqUpTo(df: DataFrame, valueCol: String, n: Int): DataFrame =
    df.agg(column(col(valueCol), n).as("u"))
}
