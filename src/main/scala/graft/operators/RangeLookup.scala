package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-dimension lookup: map a numeric point column (an IPv4 address as
  * UInt32, a price, a timestamp epoch) into a table of non-overlapping
  * `[lo, hi]` ranges — the GeoIP-lookup shape, the one reference TODO with
  * real design need (`/root/reference/README.md:34` "GeoIP identity";
  * SURVEY §2.4 array/map row).
  *
  * Two tiers:
  *   - [[broadcastLookup]]: `point BETWEEN lo AND hi` against a broadcast
  *     dim. Spark plans BroadcastNestedLoopJoin — O(|ranges|) probes per
  *     fact row. Fine for small dims (country-level GeoIP ~few hundred
  *     rows); wrong shape for a full GeoIP city table.
  *   - [[bucketedLookup]]: the scale path. Quantize the point domain into
  *     2^bucketBits-wide buckets; explode each range into the buckets it
  *     spans; equi-join on the bucket id (hash join, broadcast-able) and
  *     re-check the exact bounds. Probes per fact drop to the few ranges
  *     sharing its bucket. Pick bucketBits ≈ log2(median range width) so
  *     ranges explode into O(1) buckets each.
  */
object RangeLookup {

  /** Small-dim variant: left join facts to ranges on containment. */
  def broadcastLookup(
      facts: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String): DataFrame =
    facts.join(broadcast(ranges),
      col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol), "left")

  /** Scale variant: bucket-equi-join + exact containment re-check (INNER
    * semantics — facts outside every range drop; compose with a left-anti
    * join for the unmatched stream). Points and bounds must be
    * non-negative longs; ranges non-overlapping for at-most-one match.
    */
  def bucketedLookup(
      facts: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketBits: Int = 12): DataFrame = {
    val expanded = ranges.withColumn("__bucket",
      explode(sequence(shiftright(col(loCol), bucketBits),
        shiftright(col(hiCol), bucketBits))))
    facts.withColumn("__bucket", shiftright(col(pointCol), bucketBits))
      .join(broadcast(expanded), Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
