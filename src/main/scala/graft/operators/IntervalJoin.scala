package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-interval (band) join: pair left rows with right rows whose
  * timestamp falls in `(l.ts + lowerMs, l.ts + upperMs]`, equi-matched on
  * key columns — "clicks within 2 minutes after an error", sensor
  * correlation, impression→conversion attribution. The reference has no
  * join surface at all (SURVEY §2.4); this is the time-band member of our
  * declared join family (equi q03-q08, as-of q28, point-in-range q29).
  *
  * Scale shape (the reason this exists instead of a raw theta join, which
  * Spark can only plan as a broadcast nested loop or a cartesian product):
  * bucket width = band width W = upperMs − lowerMs. Each RIGHT row gets
  * exactly ONE bucket `floor(ts/W)`; each LEFT row's admissible band
  * `(l+lower, l+upper]` overlaps at most TWO buckets, so the left side
  * explodes ×2 and the join is a plain shuffled equi-join on
  * (keys…, bucket) — candidate volume is linear in the rows per
  * (key, W-window), never |L|·|R|, and each true pair is produced exactly
  * once (the right row's single bucket is hit by one of the left row's two
  * exploded buckets). The exact band predicate filters in the same stage;
  * AQE handles hot (key, bucket) cells like any skewed equi-join
  * (`Skew.saltedJoin` composes if one key dominates).
  */
object IntervalJoin {

  /** @param lowerMs exclusive lower bound of `r.ts − l.ts`, in ms
    * @param upperMs inclusive upper bound of `r.ts − l.ts`, in ms
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      lowerMs: Long, upperMs: Long): DataFrame = {
    require(upperMs > lowerMs, s"empty band ($lowerMs, $upperMs]")
    require(leftTs != rightTs,
      "rename one side's timestamp column before joining (both survive in the output)")
    val w = upperMs - lowerMs
    def ms(c: Column): Column = unix_millis(c)
    // left band start in bucket units; the band covers this bucket + next
    val lb = floor((ms(col(leftTs)) + lit(lowerMs)) / lit(w))
    val l = left.withColumn("__bkt", explode(array(lb, lb + 1)))
    val r = right.withColumn("__bkt", floor(ms(col(rightTs)) / lit(w)))
    l.join(r, keys :+ "__bkt")
      .where(ms(col(rightTs)) > ms(col(leftTs)) + lit(lowerMs) &&
        ms(col(rightTs)) <= ms(col(leftTs)) + lit(upperMs))
      .drop("__bkt")
  }
}
