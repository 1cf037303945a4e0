package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided analytical tables
  * (`/root/repo/TESTDATA.md`). One parquet file per table; scans are
  * column-pruned and filter-pushed by Catalyst, so helpers never cache or
  * materialize.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) — which Spark's
      // reader rejects outright — and as TIMESTAMP(MICROS) without the
      // isAdjustedToUTC flag, which Spark reads as TIMESTAMP_NTZ (breaking
      // unix_millis & friends). Normalize both to the session-zone
      // TIMESTAMP the queries and the DuckDB oracle agree on: nanos read
      // raw and truncated ns → µs (DuckDB's TIMESTAMP_NS → TIMESTAMP
      // cast), NTZ cast wall-clock in the session zone (UTC everywhere
      // in this engine, so byte-identical to DuckDB's naive reading).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** [[load]] with a SCALE-ADAPTIVE parallelism floor (r19, guide §2/§6).
    *
    * The testdata ships each table as ONE parquet file of 0.3-10 MB, and
    * Spark's split policy floors the split size at
    * `spark.sql.files.openCostInBytes` (4 MB default): events (2 MB)
    * scans as ONE partition, lineitem (10 MB) as ~3 — so every
    * downstream per-row expression, join probe and partial aggregate of
    * a relational entry ran on 1-3 of the session's cores. A real table
    * at production scale arrives as thousands of splits and needs no
    * help.
    *
    * The floor is DERIVED FROM INPUT SIZE, not a constant: the natural
    * split count is computed with the session's own split policy
    * (mirroring `FilePartition.maxSplitBytes`), and only when it falls
    * below the session's default parallelism is a round-robin
    * `repartition(defaultParallelism)` added. At scale the condition is
    * false and the plan is exchange-free — which also retires the
    * UNCONDITIONAL repartition the DataOps entries carried (an
    * always-on full shuffle of the corpus at any scale, the guide §2.4
    * accidental-exchange class). Results are partitioning-independent
    * by the catalog's own discipline (money in DECIMAL, integer-exact
    * scores, rounded doubles — already proven by the oracle gate
    * passing at varying SPARK_GRAFT_CPUS, which changes both split
    * counts and shuffle partitioning).
    */
  def loadParallel(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = load(spark, sfDir, name)
    val par = spark.sparkContext.defaultParallelism
    if (naturalSplits(spark, s"$sfDir/$name.parquet") >= par) df
    else df.repartition(par)
  }

  /** Natural scan split count of a local parquet path under the
    * session's split policy — `FilePartition.maxSplitBytes` re-derived:
    * splitBytes = min(maxPartitionBytes, max(openCostInBytes,
    * (totalBytes + nFiles·openCost) / defaultParallelism)). Unreadable
    * paths report "plenty" (no repartition — the safe default).
    */
  private def naturalSplits(spark: SparkSession, path: String): Long = {
    def filesOf(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty[java.io.File]).toSeq
          .flatMap(filesOf)
      else if (f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_")) Seq(f)
      else Seq.empty
    val files = filesOf(new java.io.File(
      path.stripPrefix("file:").stripPrefix("//")))
    if (files.isEmpty) return Long.MaxValue
    val bytes = files.map(_.length).sum
    val conf = spark.sessionState.conf
    val maxSplit = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    val bytesPerCore = (bytes + files.size * openCost) / par
    val split = math.max(1L, math.min(maxSplit, math.max(openCost, bytesPerCore)))
    // splits are per file (a split never spans files)
    files.map(f => (f.length + split - 1) / split).sum
  }

  /** Register every table as a temp view (for the SQL surface), at the
    * same scale-adaptive parallelism floor as [[loadParallel]].
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => loadParallel(spark, sfDir, n).createOrReplaceTempView(n))
}
