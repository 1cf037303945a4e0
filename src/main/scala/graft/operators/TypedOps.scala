package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset surface (SURVEY §2.4 "UDF/UDAF" row): a case-class
  * `Dataset[T]` pipeline with a custom `Aggregator[IN, BUF, OUT]` — the
  * type-safe face of the engine for fixed-schema jobs, next to the
  * config-driven DataFrame face (which stays untyped because its schema is
  * YAML-driven, SURVEY §1.3).
  */
object TypedOps {

  final case class Order(o_custkey: Long, o_orderkey: Long, o_totalprice: Double)

  /** Top-k (price, orderkey) pairs per group as a bounded-buffer
    * Aggregator: the buffer never exceeds k elements, so partial
    * aggregation ships at most k values per (partition, key) — the
    * map-side-combine property that makes per-key top-k scale (a
    * window/row_number formulation shuffles every row).
    */
  final class TopK(k: Int) extends Aggregator[Order, List[(Double, Long)], List[(Double, Long)]] {
    private def ord(p: (Double, Long)): (Double, Long) = (-p._1, p._2) // price desc, key asc
    private def trim(b: List[(Double, Long)]): List[(Double, Long)] =
      b.sortBy(ord).take(k)
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], a: Order): List[(Double, Long)] =
      trim((a.o_totalprice, a.o_orderkey) :: b)
    override def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] =
      trim(x ++ y)
    override def finish(b: List[(Double, Long)]): List[(Double, Long)] = b.sortBy(ord)
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    override def outputEncoder: Encoder[List[(Double, Long)]] = bufferEncoder
  }

  /** Top-3 order prices per customer via the typed path:
    * `Dataset[Order].groupByKey.agg(Aggregator)` — output flattened to
    * scalar columns (p1..p3) for oracle comparability.
    */
  def top3PricesPerCustomer(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val ds = orders.select("o_custkey", "o_orderkey", "o_totalprice").as[Order]
    val agg = new TopK(3)
    ds.groupByKey(_.o_custkey)
      .agg(agg.toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"),
        // try_element_at: null (not an ANSI error) when a customer has
        // fewer than k orders
        try_element_at(col("top"), lit(1)).getField("_1").as("p1"),
        try_element_at(col("top"), lit(2)).getField("_1").as("p2"),
        try_element_at(col("top"), lit(3)).getField("_1").as("p3"))
  }
}
