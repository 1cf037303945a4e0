package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DataOps, Q, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog is assembled from:
  *   - [[graft.queries.Relational]] — the declared analytical surface
  *     (SURVEY §2.4): joins, aggs, rollup/cube/grouping sets, windows,
  *     sorts/top-k, set ops, scalar/date/math/string fns, JSON,
  *     event-time windows;
  *   - [[graft.queries.DataOps]] — ingest parity (i01 = the reference's
  *     whole pipeline, SURVEY §2.1-2.3) plus the training-data operators
  *     (dedup, similarity search, text analysis, multimodal plumbing).
  */
object SparkEntry {

  val catalog: Map[String, Q] = Relational.all ++ DataOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (probabilistic signatures, binary plumbing) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    catalog.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
