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
