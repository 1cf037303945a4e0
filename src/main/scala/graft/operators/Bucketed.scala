package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed (sort-merge-bucket) co-located joins — the storage-layout
  * answer to the repeated-big-join problem at 100 TB: pay the shuffle
  * ONCE at write time by hash-bucketing both tables on the join key,
  * then every subsequent join of the two reads co-located buckets and
  * plans ZERO exchanges (Spark's scan reports the bucket hash
  * distribution, EnsureRequirements sees both sides already clustered,
  * and the sort-merge join runs bucket-against-bucket). A fact table
  * joined nightly against the same dimension amortizes its exchange
  * across every downstream query; this is the same layout contract as
  * Hive SMB joins and Iceberg/Delta bucket transforms, expressed through
  * Spark's native `bucketBy` metadata.
  *
  * Scale notes: bucket count is a LAYOUT property — pick it for target
  * file sizes at production scale (buckets ≈ table bytes / desired file
  * bytes, a multiple of cluster parallelism), and keep it IDENTICAL on
  * both sides of a recurring join: mismatched counts cost the smaller
  * side its shuffle back (Spark only coalesces when
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled` is on). `sortBy`
  * inside each bucket lets the merge join skip its sort when a bucket is
  * a single file; with many files per bucket Spark re-sorts per task —
  * a sort, never an exchange.
  *
  * The layout pays twice: a `groupBy` ON the bucket key also rides the
  * scan's hash distribution — partial+final aggregate fused per bucket,
  * no exchange (the nightly-rollup shape: bucket the fact table on the
  * rollup key once, every day's aggregate is exchange-free).
  *
  * `BucketedSpec` pins the contract: the co-located join AND the
  * bucket-key aggregation compile to zero `ShuffleExchangeLike` nodes
  * (broadcast disabled) while the same plans over plain parquet pay
  * two/one, and results are identical; catalog q58 hash-matches the
  * joined aggregate against the DuckDB oracle.
  */
object Bucketed {

  /** Write `df` as a bucketed + in-bucket-sorted managed table
    * (overwriting any previous version) and return its catalog-backed
    * DataFrame. Managed-table metadata is what carries the bucket spec —
    * a plain parquet path has nowhere to record it.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty && buckets > 0)
    val spark = df.sparkSession
    // per-JVM table name: two drivers sharing spark-warehouse/ must not
    // race on a fixed name; the suffix carries the pid so the stale
    // sweep below can tell a dead JVM's orphan from a live peer's table
    val name = s"${table}_p${ProcessHandle.current().pid()}"
    sweepDeadJvmTables(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previous JVM's managed-table dir survives the in-memory catalog;
    // CREATE refuses a pre-existing location, so sweep the orphan
    val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(name)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // cluster by the bucket key INTO one partition per bucket before
    // the write (r19): a bucketed write emits one file per (task,
    // bucket) pair, so an N-task input writes N×buckets small files and
    // runs N per-task sorts (measured: the r19 scan-parallelism floor
    // turned q58's 1-split inputs into 32 tasks and the entry went
    // 1.8 → 2.7-3.5 s on file-count alone). Spark assigns both the
    // repartition target and the bucket id with the SAME Murmur3-hash
    // pmod, so with numPartitions == buckets every task holds exactly
    // one bucket's rows → exactly `buckets` right-sized files at any
    // scale (the saveIvfPqIndex partitioned-write precedent). Rows,
    // bucket contents and in-file sort order are unchanged.
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(name)
    spark.table(name)
  }

  /** Delete warehouse dirs `<base>_p<pid>` whose owning JVM is dead —
    * the pid suffix makes stale-vs-live decidable, so repeated runs
    * don't accumulate orphaned bucketed tables.
    */
  private def sweepDeadJvmTables(spark: org.apache.spark.sql.SparkSession,
      base: String): Unit = {
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(base))).getParent
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // SINGLE-HOST assumption: liveness is decided with the LOCAL
    // ProcessHandle table, which says nothing about drivers on other
    // hosts — on a shared (hdfs://, s3a://, …) warehouse a live remote
    // driver's table would always read "dead" and get deleted mid-query.
    // Restrict the sweep to file:// warehouses, where pid = owner holds.
    if (fs.getScheme != "file") return
    if (!fs.exists(warehouse)) return
    val pat = (java.util.regex.Pattern.quote(base) + "_p(\\d+)").r
    fs.listStatus(warehouse).foreach { st =>
      st.getPath.getName match {
        case pat(pid) if ProcessHandle.of(pid.toLong)
            .filter(_.isAlive).isEmpty =>
          fs.delete(st.getPath, true)
        // an UNsuffixed dir is a pre-pid-scheme leftover: no live JVM can
        // own it (every current writer suffixes), so it is always stale
        case n if n == base => fs.delete(st.getPath, true)
        case _ => ()
      }
    }
  }

  /** Equi-join two identically-bucketed tables on their bucket keys.
    * Nothing magic happens here — the point is that NOTHING needs to:
    * the bucket metadata on both scans satisfies the join's clustering
    * requirement, so the planner inserts no exchange. Keys must be the
    * tables' bucket columns, pairwise.
    */
  def colocatedJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size)
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _)
    left.join(right, cond, joinType)
  }
}
