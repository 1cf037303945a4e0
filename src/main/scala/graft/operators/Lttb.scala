package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Largest-Triangle-Three-Buckets downsampling — ClickHouse
  * `largestTriangleThreeBuckets(n)(x, y)` (Steinarsson, "Downsampling
  * Time Series for Visual Representation", U. Iceland 2013): reduce a
  * per-key series to `threshold` points that preserve its visual shape.
  * First and last points always survive; the middle splits into
  * `threshold − 2` equal buckets and each bucket keeps the point forming
  * the LARGEST TRIANGLE with the previously selected point and the
  * centroid of the NEXT bucket (the last middle bucket pairs with the
  * final point).
  *
  * Determinism contract (what makes this oracle-pinnable, unlike the
  * float reference implementations): x and y are INTEGERS and the
  * triangle comparison is the cross-product scaled by the next bucket's
  * size — `|(x_P − x_b)(Σy − m·y_P) − (m·x_P − Σx)(y_b − y_P)|` for
  * next-bucket count m and sums Σx/Σy — all-integer, no division, ties
  * broken on smallest x. The DuckDB oracle replays the identical fold
  * as a recursive CTE (one bucket per step, argmax via correlated
  * subquery). Series with ≤ threshold points pass through unchanged.
  *
  * Scale shape: one exchange on the key; each key's fold runs over its
  * own collected series (the q54/q62 per-user envelope — bounded by the
  * per-key event count, the documented compute-bound axis). Overflow
  * headroom: with x in epoch SECONDS and |y| ≤ ~10⁶, terms stay ≤ ~10¹⁴,
  * far inside Long.
  */
object Lttb {

  /** Pure fold over one key's series, sorted ascending by x (x unique —
    * pre-aggregate duplicates upstream). Returns the selected points in
    * x order.
    */
  def select(pts: Array[(Long, Long)], threshold: Int): Seq[(Long, Long)] = {
    require(threshold >= 3, s"threshold must be >= 3: $threshold")
    val n = pts.length
    if (n <= threshold) return pts.toSeq
    val nb = threshold - 2
    // middle idx i ∈ [1, n−2] lands in bucket (i−1)·nb / (n−2); every
    // bucket is non-empty because the interval width (n−2)/nb > 1
    val members = Array.fill(nb)(List.newBuilder[Int])
    var i = 1
    while (i <= n - 2) {
      members(((i - 1).toLong * nb / (n - 2)).toInt) += i
      i += 1
    }
    val mem: Array[List[Int]] = members.map(_.result())
    val out = Seq.newBuilder[(Long, Long)]
    var prev = pts(0)
    out += prev
    var b = 0
    while (b < nb) {
      val (m, sx, sy) =
        if (b < nb - 1) {
          var c = 0L; var x = 0L; var y = 0L
          mem(b + 1).foreach { j =>
            c += 1; x += pts(j)._1; y += pts(j)._2
          }
          (c, x, y)
        } else (1L, pts(n - 1)._1, pts(n - 1)._2)
      var best: (Long, Long) = null
      var bestM = -1L
      mem(b).foreach { j =>
        val p = pts(j)
        val metric = math.abs(
          (prev._1 - p._1) * (sy - m * prev._2) -
            (m * prev._1 - sx) * (p._2 - prev._2))
        if (metric > bestM || (metric == bestM && p._1 < best._1)) {
          bestM = metric; best = p
        }
      }
      out += best
      prev = best
      b += 1
    }
    out += pts(n - 1)
    out.result()
  }

  /** Per-key LTTB over integer (x, y) columns (x unique per key).
    * Output: (key, x, y) — ≤ threshold rows per key.
    */
  def downsample(df: DataFrame, keyCol: String, xCol: String, yCol: String,
      threshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(xCol).cast("long"),
      col(yCol).cast("long")).na.drop()
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val pts = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        select(pts, threshold).iterator.map(p => (k, p._1, p._2))
      }
      .toDF(keyCol, xCol, yCol)
  }

  /** One selected point of [[LttbAgg]]'s array result. */
  case class LttbPoint(x: Long, y: Long)

  /** `largestTriangleThreeBuckets(n, x, y)` as a SQL aggregate (the
    * ClickHouse parametric form flattened — `(n)(x, y)` becomes three
    * arguments): per group, the ≤ n selected points in x order as
    * array<struct<x,y>>. Buffers the group's (x, y) points (the series
    * the fold needs whole — the funnel-family buffered-event envelope:
    * per-key series length is the documented compute axis); finish
    * sorts by x and replays [[select]]'s all-integer fold verbatim, so
    * SQL ≡ Column with no FP argument. Same contracts as [[downsample]]:
    * x unique per group (pre-aggregate duplicates), invalid (NULL x/y)
    * rows skipped like its na.drop.
    */
  final class LttbAgg(threshold: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Boolean),
        scala.collection.mutable.ArrayBuffer[(Long, Long)],
        Seq[LttbPoint]] {
    require(threshold >= 3, s"threshold must be >= 3: $threshold")
    type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]
    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(b: Buf, e: (Long, Long, Boolean)): Buf = {
      if (e._3) b += ((e._1, e._2))
      b
    }
    override def merge(a: Buf, b: Buf): Buf = { a ++= b; a }
    override def finish(b: Buf): Seq[LttbPoint] =
      select(b.toArray.sortBy(_._1), threshold)
        .map(p => LttbPoint(p._1, p._2))
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[LttbPoint]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[LttbPoint]]()
  }
}
