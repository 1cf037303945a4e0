package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BitmapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mix(i: Long): Long = {
    var x = i + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def fold(ids: Seq[Long]): Bitmap.Bm = {
    val agg = new Bitmap.BitmapAgg
    agg.finish(ids.foldLeft(agg.zero)(agg.reduce))
  }

  test("cardinality is exact, duplicates collapse, multi-block ids") {
    // ids spread over 3 blocks (0, 1, 40), with duplicates
    val ids = Seq(0L, 1L, 1L, 65535L, 65536L, 65537L, 40L * 65536 + 7,
      40L * 65536 + 7, 99L)
    val bm = fold(ids)
    assert(Bitmap.cardinality(bm) == ids.distinct.size)
    assert(bm.blocks == Seq(0, 1, 40))
  }

  test("container switch: > 4096 distinct lows go dense, same value set") {
    val sparseIds = (0L until 4096L).map(_ * 2) // 4096 distinct → sparse
    val denseIds = (0L until 5000L).map(_ * 13 % 65536L).distinct
    val bmS = fold(sparseIds)
    val bmD = fold(denseIds)
    assert(bmS.dense == Seq(false) && bmS.words.head.size == 4096)
    assert(bmD.dense == Seq(true) && bmD.words.head.size == 1024)
    assert(Bitmap.cardinality(bmS) == sparseIds.size)
    assert(Bitmap.cardinality(bmD) == denseIds.size)
    // dense vs sparse cross-ops agree with Sets
    val (andC, orC, xorC, anC) = Bitmap.opCardinalities(bmS, bmD)
    val sa = sparseIds.toSet; val sb = denseIds.toSet
    assert(andC == (sa & sb).size && orC == (sa | sb).size &&
      xorC == ((sa | sb) -- (sa & sb)).size && anC == (sa -- sb).size)
  }

  test("merge-order independence: chain ≡ balanced, content equality") {
    val agg = new Bitmap.BitmapAgg
    val ids = (0 until 30000).map(i => (mix(i) % 200000L).abs)
    val chunks = ids.grouped(7000).toSeq
      .map(c => c.foldLeft(agg.zero)(agg.reduce))
    val chain = agg.finish(chunks.reduceLeft(agg.merge))
    val balanced = agg.finish(chunks.reduceRight(agg.merge))
    assert(chain == balanced) // content, not just cardinality
    assert(Bitmap.cardinality(chain) == ids.distinct.size)
  }

  test("op cardinalities ≡ Set algebra on random multi-block sets") {
    for (seed <- 0 until 5) {
      val a = (0 until 8000).map(i => (mix(seed * 1000 + i) % 300000L).abs)
      val b = (0 until 8000).map(i => (mix(seed * 7777 + i) % 300000L).abs)
      val (andC, orC, xorC, anC) = Bitmap.opCardinalities(fold(a), fold(b))
      val sa = a.toSet; val sb = b.toSet
      assert(andC == (sa & sb).size.toLong, s"seed $seed and")
      assert(orC == (sa | sb).size.toLong, s"seed $seed or")
      assert(xorC == ((sa | sb) -- (sa & sb)).size.toLong, s"seed $seed xor")
      assert(anC == (sa -- sb).size.toLong, s"seed $seed andnot")
    }
  }

  test("distributed per-key bitmaps match per-key Sets, any partitioning") {
    import spark.implicits._
    val rows = (0 until 20000).map { i =>
      (s"k${i % 3}", (mix(i) % 150000L).abs)
    }
    for (parts <- Seq(1, 16)) {
      val got = Bitmap.collectPerKey(
        rows.toDF("k", "id").repartition(parts), "k", "id").toMap
      for (k <- Seq("k0", "k1", "k2")) {
        val expect = rows.filter(_._1 == k).map(_._2).distinct.size.toLong
        assert(Bitmap.cardinality(got(k)) == expect, s"$k parts=$parts")
      }
      // partitioning must not change CONTENT either
      val again = Bitmap.collectPerKey(
        rows.toDF("k", "id").repartition(31), "k", "id").toMap
      assert(got == again)
    }
  }

  test("-State/-Merge: re-merged fine-grained artifacts ≡ direct aggregation " +
      "by CONTENT; expression cardinality ≡ the scala popcount") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, substring, udaf}
    // 6000 ids across 3 coarse keys × 4 fine shards, values straddling
    // the dense-container switch inside one block
    val rows = (0 until 24000).map { i =>
      (s"m${i % 3}|s${(i / 3) % 4}", (mix(i) % 6000L).abs)
    }
    val fine = Bitmap.perKey(rows.toDF("k", "id"), "k", "id")
    val mergeBm = udaf(new Bitmap.BitmapMerge())
    val merged = fine
      .select(substring(col("key"), 1, 2).as("coarse"), col("bm"))
      .groupBy(col("coarse"))
      .agg(mergeBm(col("bm.blocks"), col("bm.dense"), col("bm.words")).as("bm"),
        Bitmap.cardinalityCol(mergeBm(col("bm.blocks"), col("bm.dense"), col("bm.words"))).as("card"))
      .as[(String, Bitmap.Bm, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val direct = Bitmap.collectPerKey(
      rows.map { case (k, id) => (k.substring(0, 2), id) }.toDF("k", "id"),
      "k", "id").toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (k, (bm, card)) =>
      assert(bm == direct(k), s"content $k")           // artifact identity
      assert(card == Bitmap.cardinality(bm), s"card $k") // expression ≡ scala
      assert(card == rows.filter(_._1.startsWith(k)).map(_._2).distinct.size)
    }
  }

  test("streaming: complete-mode per-key bitmaps across micro-batches ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ids straddle blocks and revisit earlier batches' values — the
    // streamed state must collapse duplicates across batches exactly
    val batches = (0 until 3).map { b =>
      (0 until 4000).map { i =>
        (s"k${i % 2}", (mix(b * 2000 + i / 2) % 150000L).abs)
      }
    }
    val stream = MemoryStream[(String, Long)]
    val agg = stream.toDS()
      .groupByKey(_._1)
      .agg(new Bitmap.BitmapValue().toColumn.name("s"))
    val q = agg.writeStream.format("memory")
      .queryName("bitmap_stream_test").outputMode("complete").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("bitmap_stream_test").toDF("key", "s")
      .as[(String, Bitmap.Bm)].collect().toMap
    val expect = Bitmap.collectPerKey(
      batches.flatten.toDF("k", "id"), "k", "id").toMap
    assert(got.keySet == Set("k0", "k1"))
    // CONTENT equality, not just cardinality — the OR-merge is
    // order-independent so the streamed artifact is the batch artifact
    assert(got == expect)
  }
}
