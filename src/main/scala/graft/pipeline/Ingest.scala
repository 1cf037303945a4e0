package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.GraftConfig
import graft.format.LogTemplate
import graft.functions.Casts

/** Batch/streaming-agnostic ingest transform: one `value: String` column in
  * (as produced by `spark.read.text`, the Kafka source, or the socket
  * source), the typed target schema out.
  *
  * Logical plan shape (all codegen'd built-ins, fused by whole-stage
  * codegen into a single per-partition loop — strictly tighter than the
  * reference's channel-hop pipeline, see SURVEY §4.1):
  *
  *   Filter(value RLIKE '^fmt')            -- T2 drop-on-mismatch
  *   Project(regexp_extract × field)       -- T2 field extraction
  *   Project(cast chain × column)          -- T3 projection/rename + T4/T5
  *   Filter(AND(valid_i))                  -- T6 malformed-row drop
  *
  * Reference trace: `pkg/handler/handler.go:20-39` (parse → project →
  * cast per row), drop-on-error at `internal/services/filelog/impl.go:179-184`.
  */
object Ingest {

  /** Extract each log field as a string column. One `regexp_extract` per
    * field over the shared compiled pattern; mismatch rows are pre-filtered
    * with RLIKE so extraction never sees them.
    */
  def extracted(df: DataFrame, tpl: LogTemplate): DataFrame = {
    val matched = df.filter(col("value").rlike(tpl.regex))
    val fieldCols = tpl.fields.zipWithIndex.map { case (f, i) =>
      regexp_extract(col("value"), tpl.regex, i + 1).as(f)
    }
    matched.select(fieldCols: _*)
  }

  /** Full pipeline: returns only the valid, typed rows in the target
    * column order. Missing scheme field → plan-time error (the reference
    * drops such rows at runtime, `pkg/nginx/entry.go:17-23`; SURVEY §2.2 T3
    * marks the static check as the port's behavior).
    */
  def parse(df: DataFrame, cfg: GraftConfig): DataFrame = {
    val (good, _) = parseWithDeadLetter(df, cfg)
    good
  }

  /** Pipeline with dead-letter split: (valid typed rows, raw rejected
    * lines). Delivers the reference's TODO "saving corrupted files for
    * manual processing" (`/root/reference/README.md:30`).
    */
  def parseWithDeadLetter(df: DataFrame, cfg: GraftConfig): (DataFrame, DataFrame) = {
    val tpl = LogTemplate.compile(cfg.logFormat)
    val targets = cfg.orderedColumns
    targets.foreach { case (colName, field) =>
      require(tpl.groupIndex(field) > 0,
        s"field '$field' (column '$colName') does not exist in log format")
    }

    val matchesFormat = col("value").rlike(tpl.regex)
    val fieldsOf: Map[String, Column] = tpl.fields.zipWithIndex.map {
      case (f, i) => f -> regexp_extract(col("value"), tpl.regex, i + 1)
    }.toMap

    val typed = targets.map { case (colName, field) =>
      colName -> Casts.castFor(field, fieldsOf(field), cfg)
    }
    val allValid = typed.map(_._2.valid).reduce(_ && _)

    val good = df
      .filter(matchesFormat)
      .filter(allValid)
      .select(typed.map { case (name, tc) => tc.col.as(name) }: _*)

    val bad = df.filter(!matchesFormat ||
      !typed.map(_._2.valid).reduce(_ && _))
    (good, bad)
  }

  /** K4 parity: derive the materialized `insert_date` column
    * (`migrations/sample_test.sql:13` — `insert_date Date DEFAULT
    * toDate(time_local)`).
    */
  def withInsertDate(df: DataFrame, timeCol: String = "time_local"): DataFrame =
    df.withColumn("insert_date", to_date(col(timeCol)))
}
