package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items summary as a MERGEABLE typed aggregate —
  * the `topK`-with-counts surface ClickHouse ships (its `topK` is the
  * SpaceSaving sibling of this sketch), and exactly the store-side
  * analytics the reference lands access logs for ("top user agents",
  * "top request paths"). Spark's own `freqItems` returns items without
  * counts or bounds; this summary carries both.
  *
  * Algorithm: Misra & Gries 1982 ("Finding repeated elements") with the
  * summary-merge rule and error analysis of Agarwal, Cormode, Huang,
  * Phillips, Wei, Yi, "Mergeable Summaries" (PODS 2012, §3.1): two
  * k-entry summaries sum counter-wise, then subtract the (k+1)-th
  * largest counter from every entry and drop the non-positive. The
  * PROVEN guarantee survives ANY merge tree — which is what makes it a
  * Spark aggregate rather than a driver-side stream fold — and is what
  * the t19 catalog entry re-verifies against exact counts from the same
  * scan:
  *
  *   est(x) ≤ true(x) ≤ est(x) + n/(k+1)      for summarized x
  *   true(x) ≤ n/(k+1)                        for absent x
  *
  * (n = total element count). So every TRUE heavy hitter — frequency
  * above n/(k+1) — is guaranteed present.
  *
  * Scale shape: the buffer is ≤ k (item, count) pairs regardless of
  * input size, partial aggregation combines map-side, and the exchange
  * carries one ≤ k-entry map per partition — the same
  * bounded-state-per-partition contract as the HLL/approx sketches
  * (q33/q48). Item ESTIMATES are merge-order-dependent (the summary
  * set and its counters can differ run to run within the bound), so
  * like every sketch here the catalog entry is self-checking, not
  * oracle-hashed.
  */
object HeavyHitters {

  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)

    // subtract the (k+1)-th largest counter from all, drop non-positive
    // (Mergeable Summaries §3.1) — also the overflow step for reduce
    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        val kth = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.collect { case (t, c) if c - kth > 0 => t -> (c - kth) }
      }

    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      // SQL-aggregate null semantics (the graft_topk surface feeds raw
      // column values): NULL items are skipped, never counted — and a
      // null map key would fail buffer encoding anyway
      if (x == null) b
      else b.get(x) match {
        case Some(c) => b.updated(x, c + 1L)
        case None => shrink(b.updated(x, 1L))
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      shrink(b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      })
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
  }

  /** Frequent-items summary of `itemCol` → `(item, est)` rows, one
    * summary over the whole frame. At most k rows out.
    */
  def topK(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(itemCol).cast("string")).na.drop().as[String]
    ds.select(new MisraGries(k).toColumn.name("summary"))
      .select(explode(col("summary")))
      .toDF("item", "est")
  }

  /** [[MisraGries]] lifted over the value half of a (key, value) pair —
    * the grouped form's input adapter.
    */
  final class MisraGriesValue(k: Int)
      extends Aggregator[(String, String), Map[String, Long], Map[String, Long]] {
    private val inner = new MisraGries(k)
    override def zero: Map[String, Long] = inner.zero
    override def reduce(b: Map[String, Long], x: (String, String)): Map[String, Long] =
      inner.reduce(b, x._2)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      inner.merge(a, b)
    override def finish(b: Map[String, Long]): Map[String, Long] = inner.finish(b)
    override def bufferEncoder: Encoder[Map[String, Long]] = inner.bufferEncoder
    override def outputEncoder: Encoder[Map[String, Long]] = inner.outputEncoder
  }

  /** Per-key frequent items — the `topK(10)(user_agent) GROUP BY day`
    * shape ClickHouse analysts run. Output `(key, item, est)`, ≤ k rows
    * per key; state stays ≤ k entries per (partition, key) through the
    * partial aggregate, so the exchange is keys × k, never the data.
    */
  def topKPerKey(df: DataFrame, keyCol: String, itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("string"), col(itemCol).cast("string"))
      .na.drop().as[(String, String)]
    ds.groupByKey(_._1)
      .agg(new MisraGriesValue(k).toColumn.name("summary"))
      .toDF("key", "summary")
      .select(col("key"), explode(col("summary")))
      .toDF("key", "item", "est")
  }
}
