package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KLL mergeable quantile sketch — the third leg of the mergeable-sketch
  * family next to HLL (q48) and Misra-Gries frequent items (t19), and
  * the Spark-side parity for ClickHouse's `quantileTDigestState` /
  * `-Merge` pair (the store the reference lands rows into ships exactly
  * this merge-at-read aggregate combinator surface).
  *
  * Algorithm: Karnin, Lang, Liberty, "Optimal Quantile Approximation in
  * Streams" (FOCS 2016). A sketch is a stack of buffers ("levels");
  * level i holds items of weight 2^i. When the sketch exceeds its
  * capacity budget the lowest over-full level COMPACTS: sort, keep every
  * other item (a pseudo-random even/odd offset), promote the survivors
  * to level i+1 at doubled weight. Level capacities decay geometrically
  * from the top (`k·(2/3)^depth`, floored at 8), which is what turns the
  * naive O(log²) mergeable-quantile schedule into KLL's O(k) space.
  *
  * Error accounting — the part that makes the t20 self-check airtight
  * rather than hand-wavy: a compaction at level i perturbs the estimated
  * rank of ANY fixed threshold by a zero-mean error of magnitude ≤ 2^i
  * — exactly 0 when the threshold's rank within the compacted buffer is
  * even, ±2^i on the offset coin flip when odd (KLL §2's unbiased-
  * compaction observation). The sketch therefore carries `varSum`, the
  * sum of (2^i)² over every compaction it has ever performed — ADDITIVE
  * under merge, exactly like the data. Hoeffding over those bounded
  * zero-mean terms gives, for failure probability δ:
  *
  *   |estRank(x) − trueRank(x)| ≤ sqrt(2 · varSum · ln(2/δ))
  *
  * which [[rankBound]] evaluates and the t20 catalog entry asserts
  * against exact ranks recomputed from the same scan. Compaction offsets
  * come from a splitmix64 of the sketch's own compaction counter, so
  * runs are deterministic and the self-check is reproducible.
  *
  * Scale shape: the buffer is O(k) values regardless of input size
  * (capacity Σ k·(2/3)^d ≤ 3k, + the 8-item floors on deep levels),
  * partial aggregation combines map-side, and the exchange carries one
  * O(k)-value state per partition — the same bounded-state contract as
  * q48/t19. Summary CONTENTS are merge-order-dependent (like every
  * sketch here), so t20 is self-checking, not oracle-hashed.
  */
object Quantiles {

  private val GrowthC = 2.0 / 3.0
  private val MinCap = 8

  /** Sketch state. `levels(i)` holds weight-2^i items, unsorted between
    * compactions (only a compaction needs order).
    */
  case class KllState(k: Int, n: Long, varSum: Double, nCompactions: Long,
      levels: Seq[Seq[Double]])

  /** Finished summary: the weighted sample sorted by value, plus the
    * error accounting needed to evaluate [[rankBound]] downstream.
    */
  case class KllSummary(n: Long, varSum: Double, values: Seq[Double],
      weights: Seq[Long])

  /** Hoeffding rank-error bound at failure probability `delta` — see the
    * class doc for the derivation. 0 when the sketch never compacted
    * (it is then exact).
    */
  def rankBound(varSum: Double, delta: Double = 1e-6): Double =
    if (varSum <= 0) 0.0 else math.sqrt(2.0 * varSum * math.log(2.0 / delta))

  /** Estimated rank of `x`: total weight of summarized items ≤ x. */
  def estRank(s: KllSummary, x: Double): Long = {
    var r = 0L; var i = 0
    while (i < s.values.length && s.values(i) <= x) { r += s.weights(i); i += 1 }
    r
  }

  /** Estimated φ-quantile: the first summarized value whose cumulative
    * weight reaches φ·n.
    */
  def quantile(s: KllSummary, phi: Double): Double = {
    require(phi >= 0 && phi <= 1 && s.values.nonEmpty)
    val target = math.max(1L, math.ceil(phi * s.n).toLong)
    var cum = 0L; var i = 0
    while (i < s.values.length) {
      cum += s.weights(i)
      if (cum >= target) return s.values(i)
      i += 1
    }
    s.values.last
  }

  private def capOf(level: Int, numLevels: Int, k: Int): Int =
    math.max(MinCap,
      math.ceil(k * math.pow(GrowthC, numLevels - 1 - level)).toInt)

  private def totalCap(numLevels: Int, k: Int): Int =
    (0 until numLevels).map(capOf(_, numLevels, k)).sum

  /** One compaction: lowest over-cap (else lowest non-empty) level is
    * sorted, an even count of its items pair-collapses to level i+1 at
    * doubled weight, any odd head item stays put.
    */
  private def compactOnce(st: KllState): KllState = {
    val h = st.levels.size
    val idx = (0 until h)
      .find(i => st.levels(i).size > capOf(i, h, st.k))
      .orElse((0 until h).find(st.levels(_).nonEmpty))
      .getOrElse(return st)
    val sorted = st.levels(idx).sorted
    val oddHead = sorted.length % 2 // keep one item in place if odd
    val keepLocal = sorted.take(oddHead)
    val body = sorted.drop(oddHead)
    // Even/odd coin: reference KLL uses a real random coin; a coin that
    // is a function of the compaction COUNTER alone is a fixed sequence
    // an adversarial input order could correlate with, accumulating
    // one-sided error past the zero-mean Hoeffding bound. Deriving it
    // from a hash of the buffer CONTENTS too makes the sequence
    // input-dependent (an adversary would need to predict its own
    // hash) while staying reproducible for a given execution.
    val contentHash = body.foldLeft(0xcbf29ce484222325L) { (h, v) =>
      (h ^ java.lang.Double.doubleToLongBits(v)) * 0x100000001b3L
    }
    val offset = (Rng.splitmix64(
      contentHash ^ (st.nCompactions * 0x100000001b3L + idx)) & 1L).toInt
    val promoted = body.indices.collect {
      case j if j % 2 == offset => body(j)
    }
    val withRoom =
      if (idx + 1 < h) st.levels else st.levels :+ Vector.empty[Double]
    val newLevels = withRoom
      .updated(idx, keepLocal.toVector)
      .updated(idx + 1, (withRoom(idx + 1) ++ promoted).toVector)
    // error term: for any threshold x with r body items ≤ x, the
    // promoted count ≤ x is r/2 (r even: error 0) or (r±1)/2 on the
    // coin flip (r odd: error ±w at weight w=2^idx after doubling) —
    // zero-mean, magnitude ≤ 2^idx, variance term (2^idx)² = 4^idx
    st.copy(varSum = st.varSum + math.pow(4.0, idx),
      nCompactions = st.nCompactions + 1, levels = newLevels)
  }

  private def compactToBudget(st0: KllState): KllState = {
    var st = st0
    while (st.levels.map(_.size).sum > totalCap(st.levels.size, st.k)) {
      val before = st.levels.map(_.size).sum
      st = compactOnce(st)
      if (st.levels.map(_.size).sum >= before) return st // defensive: no progress
    }
    st
  }

  final class Kll(k: Int) extends Aggregator[Double, KllState, KllSummary] {
    require(k >= MinCap)

    override def zero: KllState =
      KllState(k, 0L, 0.0, 0L, Vector(Vector.empty[Double]))

    override def reduce(b: KllState, x: Double): KllState =
      compactToBudget(b.copy(n = b.n + 1,
        levels = b.levels.updated(0, b.levels(0) :+ x)))

    override def merge(a: KllState, b: KllState): KllState = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      val h = math.max(a.levels.size, b.levels.size)
      val levels = (0 until h).map { i =>
        val la = if (i < a.levels.size) a.levels(i) else Vector.empty[Double]
        val lb = if (i < b.levels.size) b.levels(i) else Vector.empty[Double]
        (la ++ lb).toVector
      }
      compactToBudget(KllState(a.k, a.n + b.n, a.varSum + b.varSum,
        a.nCompactions + b.nCompactions, levels))
    }

    override def finish(st: KllState): KllSummary = {
      val pairs = st.levels.zipWithIndex.flatMap { case (buf, i) =>
        buf.map(v => (v, 1L << i))
      }.sortBy(_._1)
      KllSummary(st.n, st.varSum, pairs.map(_._1), pairs.map(_._2))
    }

    override def bufferEncoder: Encoder[KllState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllState]()
    override def outputEncoder: Encoder[KllSummary] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllSummary]()
  }

  /** Whole-frame sketch of `valueCol` → a single `KllSummary` row
    * `(n, var_sum, values, weights)`.
    */
  def sketch(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // a typed select of the aggregator column yields Dataset[KllSummary],
    // whose schema is the case-class fields FLATTENED to top level (not a
    // struct named "s") — select them directly
    df.select(col(valueCol).cast("double")).na.drop().as[Double]
      .select(new Kll(k).toColumn.name("s"))
      .select(col("n"), col("varSum").as("var_sum"),
        col("values"), col("weights"))
  }

  /** [[Kll]] finishing straight to one φ-quantile estimate — the shape a
    * SQL aggregate wants (`graft_kll_quantile(v, k, φ)`): scalar out, no
    * summary handling at the call site. NaN on an empty group.
    */
  final class KllQuantile(k: Int, phi: Double)
      extends Aggregator[java.lang.Double, KllState, Double] {
    require(phi >= 0 && phi <= 1)
    private val inner = new Kll(k)
    override def zero: KllState = inner.zero
    // boxed input + null skip: the SQL surface feeds raw column values,
    // and SQL aggregates ignore NULLs (a primitive input encoder would
    // fail the row instead)
    override def reduce(b: KllState, x: java.lang.Double): KllState =
      if (x == null) b else inner.reduce(b, x.doubleValue())
    override def merge(a: KllState, b: KllState): KllState = inner.merge(a, b)
    override def finish(st: KllState): Double = {
      val s = inner.finish(st)
      if (s.values.isEmpty) Double.NaN else quantile(s, phi)
    }
    override def bufferEncoder: Encoder[KllState] = inner.bufferEncoder
    override def outputEncoder: Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }


  /** ClickHouse `-State` for the KLL leg: aggregate to the RAW mergeable
    * state as a persistable struct artifact (k, n, varSum, nCompactions,
    * levels) — the AggregatingMergeTree workflow q84 demonstrates on the
    * exact bitmap, HERE on the approximate family: per-day jobs persist
    * O(k) states, coarser reads [[KllMergeSummary]] them WITHOUT
    * re-touching the fact table. Unlike the bitmap, a merged sketch's
    * CONTENT is merge-order-dependent; what survives any merge tree is
    * the CONTRACT — n and varSum are additive, so the Hoeffding rank
    * bound keeps holding over stored artifacts (re-asserted in t27).
    */
  final class KllStateAgg(k: Int)
      extends Aggregator[java.lang.Double, KllState, KllState] {
    private val inner = new Kll(k)
    override def zero: KllState = inner.zero
    override def reduce(b: KllState, x: java.lang.Double): KllState =
      if (x == null) b else inner.reduce(b, x.doubleValue())
    override def merge(a: KllState, b: KllState): KllState = inner.merge(a, b)
    override def finish(st: KllState): KllState = st
    override def bufferEncoder: Encoder[KllState] = inner.bufferEncoder
    override def outputEncoder: Encoder[KllState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllState]()
  }

  /** ClickHouse `-Merge`: fold STORED [[KllStateAgg]] artifacts back
    * into one summary. The zero state carries the minimum capacity and
    * defers to the first real state's k on merge (the n==0 short-circuit
    * in [[Kll.merge]]), so the artifact's own k governs.
    */
  final class KllMergeSummary
      extends Aggregator[KllState, KllState, KllSummary] {
    private val inner = new Kll(MinCap)
    override def zero: KllState = inner.zero
    override def reduce(b: KllState, x: KllState): KllState =
      if (x == null) b else inner.merge(b, x)
    override def merge(a: KllState, b: KllState): KllState = inner.merge(a, b)
    override def finish(st: KllState): KllSummary = inner.finish(st)
    override def bufferEncoder: Encoder[KllState] = inner.bufferEncoder
    override def outputEncoder: Encoder[KllSummary] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllSummary]()
  }

  /** Whole-frame summary pulled to the driver — a bounded O(k)-value
    * pull (the finished sketch), same class as the Zipf-small pulls
    * elsewhere. The aggregation itself is fully distributed (map-side
    * partials, one O(k) state per partition on the exchange).
    */
  def sketchSummary(df: DataFrame, valueCol: String, k: Int): KllSummary = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("double")).na.drop().as[Double]
      .select(new Kll(k).toColumn.name("s")).head()
  }

  /** φ-quantile estimates of `valueCol` → `(phi, est)` rows. */
  def quantiles(df: DataFrame, valueCol: String, k: Int,
      phis: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val summary = sketchSummary(df, valueCol, k)
    phis.map(p => (p, quantile(summary, p))).toDF("phi", "est")
  }

  /** [[Kll]] lifted over the value half of a (key, value) pair — the
    * grouped form's input adapter (the [[HeavyHitters.MisraGriesValue]]
    * pattern).
    */
  final class KllValue(k: Int)
      extends Aggregator[(String, Double), KllState, KllSummary] {
    private val inner = new Kll(k)
    override def zero: KllState = inner.zero
    override def reduce(b: KllState, x: (String, Double)): KllState =
      inner.reduce(b, x._2)
    override def merge(a: KllState, b: KllState): KllState = inner.merge(a, b)
    override def finish(st: KllState): KllSummary = inner.finish(st)
    override def bufferEncoder: Encoder[KllState] = inner.bufferEncoder
    override def outputEncoder: Encoder[KllSummary] = inner.outputEncoder
  }

  /** Per-key sketches — the `quantileState ... GROUP BY key` shape.
    * State stays O(k) per (partition, key) through the partial
    * aggregate; output one summary row per key.
    */
  def sketchPerKey(df: DataFrame, keyCol: String, valueCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .na.drop().as[(String, Double)]
      .groupByKey(_._1)
      .agg(new KllValue(k).toColumn.name("s"))
      .toDF("key", "s")
      .select(col("key"), col("s.n").as("n"), col("s.varSum").as("var_sum"),
        col("s.values").as("values"), col("s.weights").as("weights"))
  }
}
