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

  /** Compact a parquet directory's small files into `targetFileBytes`-sized
    * files — the maintenance pass every append-heavy table needs (each
    * micro-batch append writes one file per task; a week of 2-second
    * triggers is ~300k tiny files, and at 100 TB scan time becomes
    * footer-open-bound instead of IO-bound).
    *
    * Sizing derives from the actual on-disk byte count, not a row guess.
    * The rewrite is `coalesce` (no shuffle — merges read splits) unless
    * the file count is below the target parallelism, where it degrades to
    * nothing. Write lands in a sibling temp dir first, then swaps in —
    * readers never observe a half-written directory; crash before the
    * swap leaves the original untouched.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def parquetFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isDirectory).flatMap(parquetFiles) ++
        kids.filter(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    val root = new java.io.File(dir)
    val before = parquetFiles(root)
    val totalBytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (before.size <= nOut) return (before.size, before.size)
    val tmp = dir.stripSuffix("/") + ".compact_tmp"
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp)
    val bak = dir.stripSuffix("/") + ".compact_old"
    val tmpF = new java.io.File(tmp); val bakF = new java.io.File(bak)
    require(root.renameTo(bakF), s"swap failed: $dir -> $bak")
    require(tmpF.renameTo(root), s"swap failed: $tmp -> $dir")
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete()
    }
    rmr(bakF)
    (before.size, parquetFiles(root).size)
  }
}
