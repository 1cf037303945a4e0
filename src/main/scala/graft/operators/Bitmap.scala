package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact compressed id-set bitmaps — the ClickHouse `groupBitmap` /
  * `bitmapCardinality` / `bitmapAnd|Or|Xor|AndnotCardinality` family.
  * A group's id set aggregates into a two-level Roaring-style bitmap
  * (Chambi, Lemire et al., "Better bitmap performance with Roaring
  * bitmaps", SPE 2016): ids split into (block = id >>> 16, low 16 bits);
  * each block stores either a SORTED ARRAY of low values (≤ 4096
  * entries) or a DENSE 1024-word bit array — the standard container
  * switch at the point where the array form would exceed the 8 KiB
  * bitmap.
  *
  * Unlike the probabilistic sketch family (HLL/theta), the bitmap is
  * EXACT and its content is merge-order-independent (set union is
  * associative/commutative, the container form is a pure function of the
  * block's value set) — so every derived cardinality is deterministic
  * and the q70 entry hash-matches plain COUNT(DISTINCT) oracles.
  *
  * Scale shape: state is bounded by the ID DOMAIN's density, not the row
  * count — n distinct ids cost ≤ min(2·n, range/8) bytes + 1 entry per
  * touched 65536-block; map-side combine collapses duplicates before the
  * exchange. Set algebra between two groups' bitmaps (AND/OR/XOR/ANDNOT
  * cardinalities) runs block-aligned without re-scanning the fact table —
  * the ClickHouse segment-audience pattern.
  *
  * The hot `reduce` buffers raw ids and folds them into containers every
  * 8192 rows (the r11 Misra-Gries lesson — no per-row container rebuild).
  */
object Bitmap {

  private val SparseMax = 4096
  private val DenseWords = 1024
  private val FlushEvery = 8192

  /** Encodable bitmap: parallel per-block seqs; a block is sparse
    * (`dense=false`, `words` = sorted low values) or dense (`dense=true`,
    * `words` = 1024 bit words). Blocks sorted ascending.
    */
  case class Bm(blocks: Seq[Int], dense: Seq[Boolean], words: Seq[Seq[Long]])

  case class BmState(bm: Bm, pending: Seq[Long])

  private def containerOf(lows: Array[Int]): (Boolean, Seq[Long]) = {
    val distinct = lows.distinct.sorted
    if (distinct.length <= SparseMax) (false, distinct.map(_.toLong).toSeq)
    else {
      val w = new Array[Long](DenseWords)
      distinct.foreach(v => w(v >>> 6) |= (1L << (v & 63)))
      (true, w.toSeq)
    }
  }

  private def containerValues(dense: Boolean, words: Seq[Long]): Iterator[Int] =
    if (!dense) words.iterator.map(_.toInt)
    else words.iterator.zipWithIndex.flatMap { case (w, wi) =>
      if (w == 0L) Iterator.empty
      else (0 until 64).iterator.collect {
        case b if (w & (1L << b)) != 0L => wi * 64 + b
      }
    }

  /** Fold (block, low) pairs into one bitmap. Containers rebuild per
    * touched block — amortized over the pending buffer / merge, never
    * per row.
    */
  private def rebuild(pairs: Iterator[(Int, Int)]): Bm = {
    val acc = new scala.collection.mutable.HashMap[Int, scala.collection.mutable.ArrayBuffer[Int]]
    pairs.foreach { case (blk, low) =>
      acc.getOrElseUpdate(blk,
        new scala.collection.mutable.ArrayBuffer[Int]) += low
    }
    val sorted = acc.toSeq.sortBy(_._1)
      .map { case (blk, vs) => (blk, containerOf(vs.toArray)) }
    Bm(sorted.map(_._1), sorted.map(_._2._1), sorted.map(_._2._2))
  }

  private def entriesOf(bm: Bm): Iterator[(Int, Int)] =
    bm.blocks.indices.iterator.flatMap { i =>
      containerValues(bm.dense(i), bm.words(i)).map((bm.blocks(i), _))
    }

  private def flush(st: BmState): BmState =
    if (st.pending.isEmpty) st
    else BmState(rebuild(entriesOf(st.bm) ++ st.pending.iterator.map(id =>
      ((id >>> 16).toInt, (id & 0xFFFFL).toInt))), Vector.empty)

  /** `groupBitmap`: ids (non-negative, < 2^31·65536) → [[Bm]]. */
  final class BitmapAgg extends Aggregator[Long, BmState, Bm] {
    override def zero: BmState = BmState(Bm(Nil, Nil, Nil), Vector.empty)
    override def reduce(b: BmState, id: Long): BmState = {
      val st = b.copy(pending = b.pending :+ id)
      if (st.pending.size >= FlushEvery) flush(st) else st
    }
    override def merge(a: BmState, b: BmState): BmState = {
      val fa = flush(a); val fb = flush(b)
      BmState(rebuild(entriesOf(fa.bm) ++ entriesOf(fb.bm)), Vector.empty)
    }
    override def finish(st: BmState): Bm = flush(st).bm
    override def bufferEncoder: Encoder[BmState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[BmState]()
    override def outputEncoder: Encoder[Bm] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Bm]()
  }

  def cardinality(bm: Bm): Long =
    bm.blocks.indices.map { i =>
      if (bm.dense(i)) bm.words(i).map(java.lang.Long.bitCount(_).toLong).sum
      else bm.words(i).size.toLong
    }.sum

  private def blockWords(bm: Bm, i: Int): Array[Long] = {
    val w = new Array[Long](DenseWords)
    if (bm.dense(i)) bm.words(i).copyToArray(w)
    else bm.words(i).foreach { v =>
      w(v.toInt >>> 6) |= (1L << (v.toInt & 63))
    }
    w
  }

  /** Pairwise set-op cardinalities, block-aligned. */
  def opCardinalities(a: Bm, b: Bm): (Long, Long, Long, Long) = {
    var andC = 0L; var orC = 0L; var xorC = 0L; var andNotC = 0L
    val blocks = (a.blocks ++ b.blocks).distinct.sorted
    blocks.foreach { blk =>
      val ia = a.blocks.indexOf(blk)
      val ib = b.blocks.indexOf(blk)
      val wa = if (ia >= 0) blockWords(a, ia) else new Array[Long](DenseWords)
      val wb = if (ib >= 0) blockWords(b, ib) else new Array[Long](DenseWords)
      var i = 0
      while (i < DenseWords) {
        andC += java.lang.Long.bitCount(wa(i) & wb(i))
        orC += java.lang.Long.bitCount(wa(i) | wb(i))
        xorC += java.lang.Long.bitCount(wa(i) ^ wb(i))
        andNotC += java.lang.Long.bitCount(wa(i) & ~wb(i))
        i += 1
      }
    }
    (andC, orC, xorC, andNotC)
  }

  /** Per-key bitmaps of `idCol` → (key, bitmap struct) rows. */
  def perKey(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(idCol).cast("long"))
      .na.drop().as[(String, Long)]
      .groupByKey(_._1)
      .agg(new BitmapValue().toColumn.name("bm"))
      .toDF("key", "bm")
  }

  /** Per-key bitmaps pulled to the driver — bounded by the COMPRESSED
    * bitmap sizes (id-density, not row count; the documented-pull class).
    * This is the artifact reuse pattern: the set algebra over the pulled
    * bitmaps never re-scans the fact table.
    */
  def collectPerKey(df: DataFrame, keyCol: String,
      idCol: String): Seq[(String, Bm)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(idCol).cast("long"))
      .na.drop().as[(String, Long)]
      .groupByKey(_._1)
      .agg(new BitmapValue().toColumn.name("bm"))
      .collect().toSeq
  }

  /** The ClickHouse `-State` / `-Merge` combinator pair: re-aggregate
    * FINISHED bitmap artifacts (e.g. per-day states persisted by an
    * earlier job) into coarser groups without touching the fact table —
    * the AggregatingMergeTree workflow. OR-merge keeps content
    * merge-order-independent, so the re-merged artifact is IDENTICAL to
    * direct aggregation over the raw ids (pinned in `BitmapSpec`).
    * `reduce` folds one finished artifact at a time — artifact count per
    * group is small by construction (days per month, shards per table),
    * so this is never the per-row path the pending buffer exists for.
    */
  final class BitmapMerge extends Aggregator[Bm, BmState, Bm] {
    override def zero: BmState = BmState(Bm(Nil, Nil, Nil), Vector.empty)
    override def reduce(st: BmState, bm: Bm): BmState =
      BmState(rebuild(entriesOf(st.bm) ++ entriesOf(bm)), Vector.empty)
    override def merge(a: BmState, b: BmState): BmState = {
      val fa = flush(a); val fb = flush(b)
      BmState(rebuild(entriesOf(fa.bm) ++ entriesOf(fb.bm)), Vector.empty)
    }
    override def finish(st: BmState): Bm = flush(st).bm
    override def bufferEncoder: Encoder[BmState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[BmState]()
    override def outputEncoder: Encoder[Bm] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Bm]()
  }

  /** Exact cardinality of a bitmap STRUCT column as a pure expression
    * (no UDF — dense blocks popcount their words, sparse blocks count
    * their values): the distributed read side of the `-Merge` pattern.
    */
  def cardinalityCol(bm: Column): Column =
    aggregate(
      zip_with(bm.getField("dense"), bm.getField("words"), (d, ws) =>
        when(d, aggregate(ws, lit(0L), (a, w) => a + bit_count(w).cast("long")))
          .otherwise(size(ws).cast("long"))),
      lit(0L), (a, x) => a + x)

  /** [[BitmapAgg]] finishing straight to the exact cardinality — the SQL
    * surface (`graft_bitmap_card`): exact COUNT(DISTINCT id) semantics
    * with bitmap state (bounded by id density, mergeable under any
    * tree). Negative ids are the NULL sentinel from the SQL frontend
    * (the primitive-encoder coalesce, the graft_topk_weighted lesson)
    * and are skipped — matching COUNT(DISTINCT)'s null skip.
    */
  final class BitmapCard extends Aggregator[Long, BmState, Long] {
    private val inner = new BitmapAgg
    override def zero: BmState = inner.zero
    override def reduce(b: BmState, id: Long): BmState =
      if (id < 0L) b else inner.reduce(b, id)
    override def merge(a: BmState, b: BmState): BmState = inner.merge(a, b)
    override def finish(st: BmState): Long = cardinality(inner.finish(st))
    override def bufferEncoder: Encoder[BmState] = inner.bufferEncoder
    override def outputEncoder: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** [[BitmapAgg]] over the id half of (key, id) pairs. */
  final class BitmapValue extends Aggregator[(String, Long), BmState, Bm] {
    private val inner = new BitmapAgg
    override def zero: BmState = inner.zero
    override def reduce(b: BmState, x: (String, Long)): BmState =
      inner.reduce(b, x._2)
    override def merge(a: BmState, b: BmState): BmState = inner.merge(a, b)
    override def finish(st: BmState): Bm = inner.finish(st)
    override def bufferEncoder: Encoder[BmState] = inner.bufferEncoder
    override def outputEncoder: Encoder[Bm] = inner.outputEncoder
  }
}
