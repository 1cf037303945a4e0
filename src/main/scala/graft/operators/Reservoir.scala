package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable uniform reservoir sample — the fourth leg of the
  * mergeable-summary family (HLL q48, Misra-Gries t19, KLL t20), and the
  * parity surface for ClickHouse's `groupArraySample(k)` (and the
  * `SAMPLE` debugging workflow over landed log tables). A k-sample
  * without replacement where every row of the input has EXACTLY k/n
  * inclusion probability — the primitive behind "eyeball 1000 random
  * documents from the corpus" and unbiased held-out carving when a hash
  * split's determinism is the wrong property (hash splits follow
  * duplicated keys; a uniform row sample doesn't).
  *
  * Algorithm: Algorithm R (Vitter 1985) per partition; the merge is the
  * weighted without-replacement draw of Agarwal et al., "Mergeable
  * Summaries" (PODS 2012 §4.1): to merge reservoirs (S_a, n_a) and
  * (S_b, n_b), fill each of k output slots from a shuffled S_a with
  * probability n_a/(n_a+n_b) (decrementing n_a) else from S_b — the
  * result is a uniform k-sample of the union whenever the inputs are
  * uniform samples of their streams, under ANY merge tree. A side whose
  * stream was smaller than k is exhaustive, which the same draw handles
  * (it can be drawn at most n_a times). Randomness is counter-seeded
  * splitmix64 (`salt` + a per-state draw counter), so a given dataset +
  * salt always yields the same sample — reproducible pipelines, and the
  * uniformity spec can measure inclusion frequencies across many salts
  * without flaking.
  *
  * Scale shape: state is ≤ k items regardless of input, map-side
  * combine, one ≤ k-item array per partition on the exchange — the
  * bounded-state contract shared by the whole sketch family. Sample
  * CONTENTS depend on the merge order (like every sketch here), so t21
  * is self-checking (size / distinctness / membership proven in-query
  * against the same scan; uniformity proven statistically in
  * `ReservoirSpec`), not oracle-hashed.
  */
object Reservoir {

  /** `n` = stream length seen; `draws` seeds the deterministic RNG and
    * advances on every random decision (so replays are identical and
    * merges of distinct subtrees decorrelate).
    */
  case class ResState(k: Int, salt: Long, n: Long, draws: Long,
      items: Seq[String])

  final class Sample(k: Int, salt: Long = 0L)
      extends Aggregator[String, ResState, Seq[String]] {
    require(k > 0)

    override def zero: ResState = ResState(k, salt, 0L, 0L, Vector.empty)

    override def reduce(b: ResState, x: String): ResState = {
      if (x == null) return b // SQL aggregate semantics: skip NULLs
      val n = b.n + 1
      if (b.items.size < k)
        b.copy(n = n, items = b.items :+ x)
      else {
        // Algorithm R: replace a uniform slot with probability k/n
        val r = math.floorMod(Rng.splitmix64(b.salt ^ (b.draws * 0x100000001b3L)), n)
        val items =
          if (r < k) b.items.updated(r.toInt, x) else b.items
        b.copy(n = n, draws = b.draws + 1, items = items)
      }
    }

    override def merge(a: ResState, b: ResState): ResState = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      val total = a.n + b.n
      val drawsSeed = a.draws + b.draws + a.n // decorrelate sibling merges
      if (total <= k)
        return ResState(k, a.salt, total, drawsSeed, a.items ++ b.items)
      // seeded shuffles, then the §4.1 weighted without-replacement fill.
      // NOTE: one seed per shuffle (the Fisher-Yates draws below do not
      // advance `draws` per swap) — the UNIFORMITY guarantee rests on
      // the 400-salt inclusion-frequency spec in ReservoirSpec, not on
      // this particular seed schedule; the schedule only needs to be
      // deterministic and decorrelated across sibling merges.
      def shuffled(xs: Seq[String], s: Long): IndexedSeq[String] = {
        val arr = xs.toArray
        var i = arr.length - 1
        while (i > 0) {
          val j = math.floorMod(Rng.splitmix64(s ^ (i * 0x9e3779b9L)), i + 1).toInt
          val t = arr(i); arr(i) = arr(j); arr(j) = t
          i -= 1
        }
        arr.toIndexedSeq
      }
      val va = shuffled(a.items, a.salt ^ drawsSeed)
      val vb = shuffled(b.items, ~a.salt ^ drawsSeed)
      var remA = a.n; var remB = b.n
      var ia = 0; var ib = 0; var d = drawsSeed
      val out = Vector.newBuilder[String]
      var s = 0
      while (s < k) {
        val r = math.floorMod(Rng.splitmix64(a.salt ^ (d * 0xff51afd7ed558ccdL)),
          remA + remB)
        d += 1
        if (r < remA) { out += va(ia); ia += 1; remA -= 1 }
        else { out += vb(ib); ib += 1; remB -= 1 }
        s += 1
      }
      ResState(k, a.salt, total, d, out.result())
    }

    override def finish(st: ResState): Seq[String] = st.items

    override def bufferEncoder: Encoder[ResState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ResState]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** [[Sample]] lifted over the value half of a (key, value) pair — the
    * grouped/streaming form's input adapter (the
    * [[HeavyHitters.MisraGriesValue]] pattern).
    */
  final class SampleValue(k: Int, salt: Long = 0L)
      extends Aggregator[(String, String), ResState, Seq[String]] {
    private val inner = new Sample(k, salt)
    override def zero: ResState = inner.zero
    override def reduce(b: ResState, x: (String, String)): ResState =
      inner.reduce(b, x._2)
    override def merge(a: ResState, b: ResState): ResState = inner.merge(a, b)
    override def finish(st: ResState): Seq[String] = inner.finish(st)
    override def bufferEncoder: Encoder[ResState] = inner.bufferEncoder
    override def outputEncoder: Encoder[Seq[String]] = inner.outputEncoder
  }

  /** Whole-frame uniform k-sample of `valueCol` → one row, array column
    * `items` (≤ k entries, each a distinct input ROW's value — duplicate
    * values in the data can of course repeat).
    */
  def sample(df: DataFrame, valueCol: String, k: Int,
      salt: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("string")).na.drop().as[String]
      .select(new Sample(k, salt).toColumn.name("items"))
      .toDF("items")
  }
}
