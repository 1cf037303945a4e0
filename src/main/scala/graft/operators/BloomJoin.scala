package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-prefiltered join — the explicit, tunable form of the runtime
  * filter AQE sometimes injects: build a Bloom filter (Bloom, CACM 1970)
  * over the dim side's join keys with ONE bounded distributed aggregate,
  * broadcast the finished bit array as a single-row DataFrame, and
  * prefilter the fact side BEFORE its shuffle — the rows that cannot
  * match never enter the exchange.
  *
  * Why this matters at 100 TB: a fact-side shuffle moves the whole fact
  * table; when the dim keys select a small fraction, the Bloom gate cuts
  * shuffle volume to ~selectivity + fpp while costing one broadcast of
  * m/8 bytes. The filter never false-negatives, so the join output is
  * EXACTLY the plain join's (the q69 oracle is the plain join —
  * hash-matched, not approximated); false positives only cost wasted
  * shuffle rows, bounded by fpp at the sized capacity and degrading
  * gracefully (never wrongly) beyond it.
  *
  * Construction (all public algorithms, no UDF in the hot path):
  *   - double hashing (Kirsch & Mitzenmacher, ESA 2006): bit indices
  *     `(h1 + i·h2) & (m−1)` for i < numHashes, with h1/h2 from Spark's
  *     codegen'd `xxhash64` (two seeds) and m a power of two;
  *   - the aggregate state is the raw `Array[Long]` bit words, OR-merged
  *     (associative + commutative → merge-order-independent, so the
  *     filter CONTENT is deterministic, unlike the sketch family);
  *   - the membership test is pure Column arithmetic — `element_at` into
  *     the broadcast words array + a 64-entry literal mask table,
  *     `shiftright`/`bitwiseAND` — whole-stage codegen, no closure.
  */
object BloomJoin {

  /** Second xxhash64 seed column input (h2 = xxhash64(key, salt)). */
  private val H2Salt = 0x5bd1e995L

  case class BloomParams(numWords: Int, numHashes: Int)

  /** Standard sizing: m = −n·ln p / ln²2 rounded UP to a power of two
    * (so `& (m−1)` replaces pmod and double hashing cycles fully),
    * h = round((m/n)·ln 2) clamped to [1, 16].
    */
  def params(expectedItems: Long, fpp: Double): BloomParams = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val mReal = -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))
    val mBits = math.max(64L, java.lang.Long.highestOneBit(
      math.max(64L, mReal.toLong) - 1) << 1)
    val h = math.max(1, math.min(16,
      math.round(mBits.toDouble / expectedItems * math.log(2)).toInt))
    BloomParams((mBits / 64).toInt, h)
  }

  /** Bit-setting aggregate over (h1, h2) hash pairs. The buffer is the
    * word array itself, mutated in place (zero per-row allocation) and
    * OR-merged.
    */
  final class BloomAgg(numWords: Int, numHashes: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    private val mask = numWords.toLong * 64L - 1L

    override def zero: Array[Long] = new Array[Long](numWords)

    override def reduce(b: Array[Long], x: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < numHashes) {
        val idx = (x._1 + i.toLong * x._2) & mask
        b((idx >>> 6).toInt) |= (1L << (idx & 63L))
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One-row DataFrame holding the filter words built from `dim`'s
    * `keyCol` — the broadcastable artifact.
    */
  def build(dim: DataFrame, keyCol: String, p: BloomParams): DataFrame = {
    val spark = dim.sparkSession
    import spark.implicits._
    val hashed = dim.select(xxhash64(col(keyCol)).as("h1"),
      xxhash64(col(keyCol), lit(H2Salt)).as("h2"))
      .as[(Long, Long)]
    // bind the TYPED select explicitly — an expected DataFrame return
    // type otherwise steers overload resolution to the untyped select,
    // which rejects TypedColumns at analysis time
    val words: org.apache.spark.sql.Dataset[Array[Long]] =
      hashed.select(new BloomAgg(p.numWords, p.numHashes).toColumn)
    words.toDF("bloom_words")
  }

  /** Membership test as pure Column arithmetic against `wordsCol`
    * (array<bigint> of length numWords).
    */
  def mightContain(wordsCol: Column, key: Column, p: BloomParams): Column = {
    val m = p.numWords.toLong * 64L
    val masks = lit((0 until 64).map(1L << _).toArray)
    val h1 = xxhash64(key)
    val h2 = xxhash64(key, lit(H2Salt))
    (0 until p.numHashes).map { i =>
      val idx = (h1 + lit(i.toLong) * h2).bitwiseAND(lit(m - 1))
      val word = element_at(wordsCol, shiftright(idx, 6).cast("int") + 1)
      val bit = element_at(masks, idx.bitwiseAND(lit(63L)).cast("int") + 1)
      word.bitwiseAND(bit) =!= 0L
    }.reduce(_ && _)
  }

  /** `fact ⋈ dim` with the fact side Bloom-gated before its exchange.
    * Output ≡ the plain join (no false negatives); `expectedItems`/`fpp`
    * size the filter — an undersized filter degrades selectivity, never
    * correctness.
    */
  def prefilterJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    val p = params(expectedItems, fpp)
    val words = build(dim, dimKey, p)
    val gated = fact
      .crossJoin(broadcast(words))
      .where(mightContain(col("bloom_words"), col(factKey), p))
      .drop("bloom_words")
    gated.join(dim, gated(factKey) === dim(dimKey), joinType)
  }
}
