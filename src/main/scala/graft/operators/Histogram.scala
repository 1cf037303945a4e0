package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable adaptive histogram — the ClickHouse `histogram(bins)(x)`
  * aggregate, seventh leg of the mergeable-summary family (HLL q48,
  * Misra-Gries t19/t24, KLL t20, reservoir t21, theta t22, uniqUpTo t23).
  *
  * Algorithm: Ben-Haim & Tom-Toms, "A Streaming Parallel Decision Tree
  * Algorithm" (JMLR 11, 2010), §2.1 — the same centroid-merging scheme
  * ClickHouse's adaptive `histogram` uses. A summary is ≤ B (center,
  * count) centroids sorted by center; adding a point inserts a unit
  * centroid, and whenever the summary exceeds B the two CLOSEST adjacent
  * centroids merge into their weighted mean. Merging two summaries
  * concatenates centroid lists and re-compacts — associative enough for
  * any Spark merge tree (contents are merge-order-dependent like every
  * sketch here, so t25 is self-checking, not oracle-hashed).
  *
  * What stays EXACT regardless of merge order (the self-check contract):
  *   - mass: Σ counts = n (merging adds counts, never drops);
  *   - `lo`/`hi` are the exact min/max (tracked outside the centroids);
  *   - centers are strictly increasing, inside [lo, hi], counts > 0,
  *     and there are ≤ B of them;
  *   - the count-weighted center sum equals the exact data sum up to FP
  *     rounding (a merge replaces c₁n₁+c₂n₂ by ((c₁n₁+c₂n₂)/(n₁+n₂))·
  *     (n₁+n₂)) — asserted to relative tolerance.
  * And when the input has ≤ B distinct values the histogram is the exact
  * value→count table (no merge ever fires between distinct centers that
  * fit the budget — pinned by spec across partitionings).
  *
  * Scale shape: the hot `reduce` path appends to a pending buffer
  * (O(1) amortized) and only re-compacts every ~4B rows, so per-row cost
  * is O(1) vector append + O(B) amortized — the exchange carries one
  * O(B) state per partition with map-side combine, the same
  * bounded-state contract as t19-t24.
  */
object Histogram {

  /** Pending-buffer flush factor: reduce() compacts once per this many
    * buffered raw points (the r11 Misra-Gries lesson: never pay a per-row
    * O(B) rebuild on the hot path).
    */
  private val FlushFactor = 4

  case class HistState(maxBins: Int, n: Long, lo: Double, hi: Double,
      centers: Seq[Double], counts: Seq[Long], pending: Seq[Double])

  case class HistSummary(n: Long, lo: Double, hi: Double,
      centers: Seq[Double], counts: Seq[Long])

  /** Sorted (center, count) pairs with equal centers combined, merged
    * down to ≤ maxBins by repeatedly collapsing the closest adjacent
    * pair (first such pair on gap ties — deterministic given content).
    */
  private def compact(maxBins: Int, points: Seq[(Double, Long)]): (Vector[Double], Vector[Long]) = {
    val sorted = points.sortBy(_._1)
    val cs = new scala.collection.mutable.ArrayBuffer[Double](sorted.length)
    val ns = new scala.collection.mutable.ArrayBuffer[Long](sorted.length)
    sorted.foreach { case (c, w) =>
      if (cs.nonEmpty && cs.last == c) ns(ns.length - 1) += w
      else { cs += c; ns += w }
    }
    while (cs.length > maxBins) {
      var best = 0
      var bestGap = Double.PositiveInfinity
      var i = 0
      while (i < cs.length - 1) {
        val gap = cs(i + 1) - cs(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val nm = ns(best) + ns(best + 1)
      cs(best) = (cs(best) * ns(best) + cs(best + 1) * ns(best + 1)) / nm
      ns(best) = nm
      cs.remove(best + 1)
      ns.remove(best + 1)
    }
    (cs.toVector, ns.toVector)
  }

  private def flush(st: HistState): HistState =
    if (st.pending.isEmpty) st
    else {
      val (cs, ns) = compact(st.maxBins,
        st.centers.zip(st.counts) ++ st.pending.map((_, 1L)))
      st.copy(centers = cs, counts = ns, pending = Vector.empty)
    }

  final class Hist(maxBins: Int)
      extends Aggregator[Double, HistState, HistSummary] {
    require(maxBins >= 2, s"maxBins must be >= 2: $maxBins")

    override def zero: HistState = HistState(maxBins, 0L,
      Double.PositiveInfinity, Double.NegativeInfinity,
      Vector.empty, Vector.empty, Vector.empty)

    override def reduce(b: HistState, x: Double): HistState = {
      val st = b.copy(n = b.n + 1, lo = math.min(b.lo, x),
        hi = math.max(b.hi, x), pending = b.pending :+ x)
      if (st.pending.size >= FlushFactor * maxBins) flush(st) else st
    }

    override def merge(a: HistState, b: HistState): HistState = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      val fa = flush(a); val fb = flush(b)
      val (cs, ns) = compact(a.maxBins,
        fa.centers.zip(fa.counts) ++ fb.centers.zip(fb.counts))
      HistState(a.maxBins, a.n + b.n, math.min(a.lo, b.lo),
        math.max(a.hi, b.hi), cs, ns, Vector.empty)
    }

    override def finish(st: HistState): HistSummary = {
      val f = flush(st)
      HistSummary(f.n, f.lo, f.hi, f.centers, f.counts)
    }

    override def bufferEncoder: Encoder[HistState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[HistState]()
    override def outputEncoder: Encoder[HistSummary] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[HistSummary]()
  }

  /** The ClickHouse result shape: (lower, upper, height) triples —
    * boundaries at midpoints between adjacent centers, outer edges at
    * the exact lo/hi.
    */
  def toBins(s: HistSummary): Seq[(Double, Double, Long)] =
    if (s.centers.isEmpty) Nil
    else {
      val mids = s.centers.sliding(2).collect {
        case Seq(a, b) => (a + b) / 2.0
      }.toVector
      val lowers = s.lo +: mids
      val uppers = mids :+ s.hi
      lowers.lazyZip(uppers).lazyZip(s.counts).map((l, u, c) => (l, u, c))
    }

  /** Whole-frame sketch of `valueCol` → one `(n, lo, hi, centers,
    * counts)` row.
    */
  def sketch(df: DataFrame, valueCol: String, maxBins: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("double")).na.drop().as[Double]
      .select(new Hist(maxBins).toColumn.name("s"))
      .select(col("n"), col("lo"), col("hi"), col("centers"), col("counts"))
  }

  /** Whole-frame summary pulled to the driver — a bounded O(B) pull of
    * the finished sketch (the t20/t21 documented-pull class); the
    * aggregation itself is fully distributed with map-side partials.
    */
  def sketchSummary(df: DataFrame, valueCol: String,
      maxBins: Int): HistSummary = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("double")).na.drop().as[Double]
      .select(new Hist(maxBins).toColumn.name("s")).head()
  }

  /** [[Hist]] lifted over the value half of a (key, value) pair — the
    * grouped form's input adapter.
    */
  final class HistValue(maxBins: Int)
      extends Aggregator[(String, Double), HistState, HistSummary] {
    private val inner = new Hist(maxBins)
    override def zero: HistState = inner.zero
    override def reduce(b: HistState, x: (String, Double)): HistState =
      inner.reduce(b, x._2)
    override def merge(a: HistState, b: HistState): HistState =
      inner.merge(a, b)
    override def finish(st: HistState): HistSummary = inner.finish(st)
    override def bufferEncoder: Encoder[HistState] = inner.bufferEncoder
    override def outputEncoder: Encoder[HistSummary] = inner.outputEncoder
  }

  /** Per-key histograms — `histogram(B)(v) ... GROUP BY key`. One O(B)
    * state per (partition, key) through the partial aggregate.
    */
  def sketchPerKey(df: DataFrame, keyCol: String, valueCol: String,
      maxBins: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .na.drop().as[(String, Double)]
      .groupByKey(_._1)
      .agg(new HistValue(maxBins).toColumn.name("s"))
      .toDF("key", "s")
      .select(col("key"), col("s.n").as("n"), col("s.lo").as("lo"),
        col("s.hi").as("hi"), col("s.centers").as("centers"),
        col("s.counts").as("counts"))
  }

  /** [[Hist]] finishing to the (lower, upper, height) triple array — the
    * SQL surface (`graft_histogram(v, bins)`), null-skipping like every
    * SQL aggregate.
    */
  final class HistBins(maxBins: Int)
      extends Aggregator[java.lang.Double, HistState, Seq[(Double, Double, Long)]] {
    private val inner = new Hist(maxBins)
    override def zero: HistState = inner.zero
    override def reduce(b: HistState, x: java.lang.Double): HistState =
      if (x == null) b else inner.reduce(b, x.doubleValue())
    override def merge(a: HistState, b: HistState): HistState =
      inner.merge(a, b)
    override def finish(st: HistState): Seq[(Double, Double, Long)] =
      toBins(inner.finish(st))
    override def bufferEncoder: Encoder[HistState] = inner.bufferEncoder
    override def outputEncoder: Encoder[Seq[(Double, Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Double, Double, Long)]]()
  }
}
