package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for the write path — the 100 TB scan-pruning
  * lever: parquet row-group min/max statistics prune only dimensions the
  * data is clustered by; a Z-order (Morton) curve clusters by two
  * dimensions at once, so filters on EITHER column skip row groups.
  *
  * Mirrors the reference's target-table layout intent
  * (`migrations/sample_test.sql:17-19`: MergeTree PARTITION BY month +
  * ORDER BY (status, insert_date) — one-dimensional clustering); Z-order
  * is the multi-dimensional upgrade.
  */
object Layout {

  /** 62-bit Morton interleave of the low 31 bits of two non-negative
    * longs: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Plain codegen'd arithmetic (62 shift/mask terms, constant-folded
    * shifts). 31 bits per dimension keeps the result clear of the sign
    * bit — bit 31 of `b` would land at position 63 and flip the ordering
    * (and `2 << 62` overflows checked 64-bit arithmetic).
    */
  def zvalue(a: Column, b: Column): Column =
    (0 until 31).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(2L << (2 * i)))
    }.reduce(_ + _)

  /** Cluster a DataFrame for writing: range-partition then sort within
    * partitions by the interleaved key. Files written from the result have
    * tight min/max envelopes on BOTH dimensions; `partitions` sizes output
    * files (`spark.sql.files.maxPartitionBytes` governs read splits).
    */
  def zorderBy(df: DataFrame, a: String, b: String, partitions: Int): DataFrame = {
    val z = zvalue(col(a), col(b))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
