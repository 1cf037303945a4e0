package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular events onto a fixed
  * grid with forward fill — the gap-filling step feature pipelines need
  * before windowed aggregation or model input (sensor feeds, activity
  * metrics, spot prices).
  *
  * Plan shape (all stock operators, one key exchange):
  *   1. per (key, bucket) keep the LAST observation — one aggregate-like
  *      window with a unique (ts, tiebreak) order;
  *   2. per key generate the dense bucket grid with
  *      `explode(sequence(min, max, step))` — the grid never materializes
  *      on the driver and each key's span explodes independently
  *      map-side after a tiny (key, min, max) aggregate;
  *   3. left-join observations onto the grid (same key partitioning) and
  *      forward-fill with `last(value, ignoreNulls)` over the key window.
  *
  * At 100 TB the key cardinality carries the parallelism (each key's
  * grid+fill is independent); a single pathological key with a years-long
  * span × fine step is the thing to guard (cap the span or coarsen the
  * step per key class).
  */
object TimeSeries {

  /** Resample `df` onto a `unit` grid per `keyCol` (span = that key's
    * observed min..max, truncated to the unit) and forward-fill
    * `valueCol` from the last observation at or before each bucket.
    * `tieBreakCol` must make (tsCol, tieBreakCol) unique per key so the
    * "last observation in a bucket" is well-defined.
    */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreakCol: String, unit: String = "hour"): DataFrame = {
    val key = col(keyCol)
    val bucket = date_trunc(unit, col(tsCol))
    val lastInBucket = Window.partitionBy(key, col("h"))
      .orderBy(col(tsCol).desc, col(tieBreakCol).desc)
    val obs = df
      .withColumn("h", bucket)
      .withColumn("__rn", row_number().over(lastInBucket))
      .where(col("__rn") === 1)
      .select(key, col("h"), col(valueCol))
    val span = df.groupBy(key).agg(
      date_trunc(unit, min(col(tsCol))).as("h0"),
      date_trunc(unit, max(col(tsCol))).as("h1"))
      .select(key, explode(sequence(col("h0"), col("h1"),
        expr(s"interval 1 $unit"))).as("h"))
    span.join(obs, Seq(keyCol, "h"), "left")
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true)
        .over(Window.partitionBy(key).orderBy(col("h"))))
  }
}
