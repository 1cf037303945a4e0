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

  /** Buffer: a MUTABLE map, updated in place. The first (r9/r10)
    * implementation used an immutable `Map` buffer, which rebuilds a
    * persistent-map path on EVERY input row — the t19 10× probe read
    * 4.97× (allocation-bound) against the flat profile the bounded-state
    * design promises. Typed `Aggregator` buffers live as JVM objects
    * between `reduce` calls (Spark's own doc example mutates a `var`
    * case class) and only cross the wire at the partial-aggregate
    * exchange, so the kryo round-trip is paid once per (partition, key),
    * never per row.
    *
    * COMPATIBILITY: this changed the aggregator's serialized buffer
    * schema (map<string,bigint> → binary) in r11 — a STREAMING query
    * checkpointed under the old Map buffer cannot resume on this code
    * (state-store schema validation rejects it); restart such streams
    * from a fresh checkpoint. Batch results are unaffected.
    */
  type MGBuf = java.util.HashMap[String, java.lang.Long]

  // subtract the (k+1)-th largest counter from all, drop non-positive
  // (Mergeable Summaries §3.1) — also the overflow step for reduce.
  // Mutates and returns `m`; size ≤ 2k+1 on entry, so the sort is O(k log k).
  private def shrink(m: MGBuf, k: Int): MGBuf =
    if (m.size <= k) m
    else {
      val vals = new Array[Long](m.size)
      var i = 0
      val vit = m.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      val kth = vals(vals.length - 1 - k) // (k+1)-th largest counter
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue() - kth
        if (c > 0) e.setValue(c) else it.remove()
      }
      m
    }

  // sum counter-wise into the larger side, then one shrink
  private def mergeBufs(a: MGBuf, b: MGBuf, k: Int): MGBuf = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    val it = small.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = big.get(e.getKey)
      big.put(e.getKey,
        if (prev == null) e.getValue
        else prev.longValue() + e.getValue.longValue())
    }
    shrink(big, k)
  }

  private def freeze(b: MGBuf): Map[String, Long] = {
    val mb = Map.newBuilder[String, Long]
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); mb += (e.getKey -> e.getValue.longValue())
    }
    mb.result()
  }

  private def mapEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(k > 0)
    override def zero: MGBuf = new MGBuf()
    override def reduce(b: MGBuf, x: String): MGBuf =
      // SQL-aggregate null semantics (the graft_topk surface feeds raw
      // column values): NULL items are skipped, never counted — and a
      // null map key would fail buffer encoding anyway
      if (x == null) b
      else {
        val c = b.get(x)
        if (c != null) { b.put(x, c.longValue() + 1L); b }
        else { b.put(x, 1L); shrink(b, k) }
      }
    override def merge(a: MGBuf, b: MGBuf): MGBuf = mergeBufs(a, b, k)
    override def finish(b: MGBuf): Map[String, Long] = freeze(b)
    override def bufferEncoder: Encoder[MGBuf] =
      org.apache.spark.sql.Encoders.kryo[MGBuf]
    override def outputEncoder: Encoder[Map[String, Long]] = mapEncoder
  }

  /** WEIGHTED Misra-Gries (the ClickHouse `topKWeighted` surface): each
    * row contributes `weight` instead of 1. The unit-copy reduction
    * carries the analysis over: inserting an unseen item adds its whole
    * weight then shrinks ONCE, and each shrink subtracts the (k+1)-th
    * largest counter m from ≥ k+1 counters each ≥ m, so the cumulative
    * subtracted mass Σm ≤ W/(k+1) (W = total weight). Hence
    *
    *   est(x) ≤ true(x) ≤ est(x) + W/(k+1)
    *
    * and every item with weight above W/(k+1) is present — the same
    * guarantee as the unweighted form with n replaced by W, preserved
    * under any merge tree by the §3.1 merge. NULL items and non-positive
    * weights are skipped (ClickHouse casts weight to UInt; a zero weight
    * adds nothing).
    */
  final class MisraGriesWeighted(k: Int)
      extends Aggregator[(String, Long), MGBuf, Map[String, Long]] {
    require(k > 0)
    override def zero: MGBuf = new MGBuf()
    override def reduce(b: MGBuf, x: (String, Long)): MGBuf =
      if (x._1 == null || x._2 <= 0L) b
      else {
        val c = b.get(x._1)
        if (c != null) { b.put(x._1, c.longValue() + x._2); b }
        else { b.put(x._1, x._2); shrink(b, k) }
      }
    override def merge(a: MGBuf, b: MGBuf): MGBuf = mergeBufs(a, b, k)
    override def finish(b: MGBuf): Map[String, Long] = freeze(b)
    override def bufferEncoder: Encoder[MGBuf] =
      org.apache.spark.sql.Encoders.kryo[MGBuf]
    override def outputEncoder: Encoder[Map[String, Long]] = mapEncoder
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
      extends Aggregator[(String, String), MGBuf, Map[String, Long]] {
    private val inner = new MisraGries(k)
    override def zero: MGBuf = inner.zero
    override def reduce(b: MGBuf, x: (String, String)): MGBuf =
      inner.reduce(b, x._2)
    override def merge(a: MGBuf, b: MGBuf): MGBuf =
      inner.merge(a, b)
    override def finish(b: MGBuf): Map[String, Long] = inner.finish(b)
    override def bufferEncoder: Encoder[MGBuf] = inner.bufferEncoder
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

  /** Weighted frequent items of (`itemCol`, `weightCol`) → `(item, est)`
    * rows, one summary over the whole frame; ≤ k rows out. Same scale
    * shape as [[topK]]: bounded buffer, map-side combine.
    */
  def topKWeighted(df: DataFrame, itemCol: String, weightCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(itemCol).cast("string"),
        col(weightCol).cast("long")).na.drop().as[(String, Long)]
    ds.select(new MisraGriesWeighted(k).toColumn.name("summary"))
      .select(explode(col("summary")))
      .toDF("item", "est")
  }

  /** [[MisraGriesWeighted]] lifted over (key, item, weight) — the
    * grouped form's input adapter.
    */
  final class MisraGriesWeightedValue(k: Int)
      extends Aggregator[(String, String, Long), MGBuf, Map[String, Long]] {
    private val inner = new MisraGriesWeighted(k)
    override def zero: MGBuf = inner.zero
    override def reduce(b: MGBuf, x: (String, String, Long)): MGBuf =
      inner.reduce(b, (x._2, x._3))
    override def merge(a: MGBuf, b: MGBuf): MGBuf = inner.merge(a, b)
    override def finish(b: MGBuf): Map[String, Long] = inner.finish(b)
    override def bufferEncoder: Encoder[MGBuf] = inner.bufferEncoder
    override def outputEncoder: Encoder[Map[String, Long]] = inner.outputEncoder
  }

  /** Per-key weighted frequent items: `(key, item, est)`, ≤ k rows per
    * key; exchange carries keys × k entries, never the data.
    */
  def topKWeightedPerKey(df: DataFrame, keyCol: String, itemCol: String,
      weightCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("string"), col(itemCol).cast("string"),
        col(weightCol).cast("long")).na.drop().as[(String, String, Long)]
    ds.groupByKey(_._1)
      .agg(new MisraGriesWeightedValue(k).toColumn.name("summary"))
      .toDF("key", "summary")
      .select(col("key"), explode(col("summary")))
      .toDF("key", "item", "est")
  }
}
