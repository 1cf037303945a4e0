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

  /** Register every table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
