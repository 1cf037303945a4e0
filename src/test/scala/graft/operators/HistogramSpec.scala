package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Histogram.{Hist, HistSummary}

/** The BHTT histogram contract: mass conservation, exact outer edges,
  * ≤ B strictly-increasing centers, and weighted-sum preservation hold
  * under ANY merge tree; with ≤ B distinct values the histogram IS the
  * exact value→count table regardless of partitioning; and the streaming
  * leg carries state across micro-batches.
  */
class HistogramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val B = 16

  private def mix(i: Long): Long = {
    var x = i + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def uniform(n: Int): IndexedSeq[Double] =
    (0 until n).map(i => (mix(i) >>> 11).toDouble / (1L << 53).toDouble)

  private def invariants(data: Seq[Double], sk: HistSummary,
      label: String): Unit = {
    assert(sk.n == data.size, s"$label: n")
    assert(sk.counts.sum == sk.n, s"$label: mass")
    assert(sk.centers.length <= B, s"$label: size ${sk.centers.length}")
    assert(sk.counts.forall(_ > 0), s"$label: zero-count bin")
    assert(sk.centers.lazyZip(sk.centers.drop(1)).forall(_ < _),
      s"$label: centers not strictly increasing")
    assert(sk.lo == data.min && sk.hi == data.max, s"$label: edges")
    assert(sk.centers.forall(c => c >= sk.lo && c <= sk.hi),
      s"$label: center outside [lo, hi]")
    val histSum = sk.centers.lazyZip(sk.counts).map((c, n) => c * n).sum
    val exactSum = data.sum
    assert(math.abs(histSum - exactSum) <=
      math.abs(exactSum) * 1e-9 + 1e-6, s"$label: weighted sum")
  }

  private def fold(data: Seq[Double]): Histogram.HistState = {
    val agg = new Hist(B)
    data.foldLeft(agg.zero)(agg.reduce)
  }

  test("exact regime: ≤ B distinct values give the exact table, any merge tree") {
    val agg = new Hist(B)
    // 10 distinct values, many repeats, 7 chunk shapes
    val data = (0 until 5000).map(i => (mix(i) % 10).abs.toDouble)
    val expected = data.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    for (nChunks <- Seq(1, 2, 3, 7)) {
      val chunks = data.grouped(math.max(1, data.size / nChunks)).toSeq
      val states = chunks.map(c => fold(c))
      // linear chain AND balanced binary merge
      val chain = states.reduceLeft(agg.merge)
      val balanced = states.reduceRight(agg.merge)
      for ((st, lbl) <- Seq((chain, "chain"), (balanced, "balanced"))) {
        val sk = agg.finish(st)
        assert(sk.centers.lazyZip(sk.counts).map((c, n) => (c, n)).toSeq
          == expected, s"$lbl/$nChunks")
        invariants(data, sk, s"$lbl/$nChunks")
      }
    }
  }

  test("invariants hold on continuous data across merge trees and flush boundaries") {
    val data = uniform(10000).map(_ * 100 - 50)
    for (nChunks <- Seq(1, 4, 16)) {
      val agg = new Hist(B)
      val states = data.grouped(math.max(1, data.size / nChunks)).toSeq
        .map(c => fold(c))
      invariants(data, agg.finish(states.reduceLeft(agg.merge)), s"chain/$nChunks")
      invariants(data, agg.finish(states.reduceRight(agg.merge)), s"bal/$nChunks")
    }
  }

  test("uniform data: bin-estimated CDF at the median lands near n/2") {
    val data = uniform(20000)
    val agg = new Hist(B)
    val sk = agg.finish(fold(data))
    // count mass at centers ≤ 0.5 (trapezoid-free, coarse): within 15%
    val below = sk.centers.lazyZip(sk.counts)
      .collect { case (c, n) if c <= 0.5 => n }.sum
    assert(math.abs(below - data.size / 2.0) <= data.size * 0.15,
      s"below=$below n=${data.size}")
  }

  test("toBins: boundaries chain from lo to hi, heights are the counts") {
    val data = Seq(1.0, 1.0, 2.0, 5.0, 5.0, 5.0, 9.0)
    val agg = new Hist(B)
    val sk = agg.finish(fold(data))
    val bins = Histogram.toBins(sk)
    assert(bins.head._1 == 1.0 && bins.last._2 == 9.0)
    assert(bins.lazyZip(bins.drop(1)).forall((a, b) => a._2 == b._1),
      "boundaries must chain")
    assert(bins.map(_._3) == sk.counts)
    assert(bins.forall(b => b._1 <= b._2))
  }

  test("distributed aggregate (Spark merge order) keeps the invariants") {
    import spark.implicits._
    val data = uniform(8000).map(_ * 10)
    for (parts <- Seq(1, 7, 32)) {
      val df = data.toDF("v").repartition(parts)
      val row = Histogram.sketch(df, "v", B).collect().head
      val sk = HistSummary(row.getLong(0), row.getDouble(1), row.getDouble(2),
        row.getSeq[Double](3).toIndexedSeq, row.getSeq[Long](4).toIndexedSeq)
      invariants(data, sk, s"spark/$parts")
    }
  }

  test("per-key histograms bound per group") {
    import spark.implicits._
    val rows = (0 until 6000).map(i => (s"k${i % 3}", uniform(1)(0) + (i % 3) * 10 + (mix(i) % 1000).abs / 100.0))
    val out = Histogram.sketchPerKey(rows.toDF("k", "v"), "k", "v", B)
      .collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("k0", "k1", "k2"))
    for (r <- out) {
      val sk = HistSummary(r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getSeq[Double](4).toIndexedSeq, r.getSeq[Long](5).toIndexedSeq)
      invariants(rows.filter(_._1 == r.getString(0)).map(_._2), sk,
        s"key-${r.getString(0)}")
    }
  }

  test("streaming: histogram state carries across micro-batches (exact regime)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 batches over 8 distinct values per key — final update must be
    // the exact table over the WHOLE history
    val batches = (0 until 3).map { b =>
      (0 until 2000).map { i =>
        (s"k${i % 2}", (mix(b * 10000 + i) % 8).abs.toDouble)
      }
    }
    val stream = MemoryStream[(String, Double)]
    val agg = stream.toDS()
      .groupByKey(_._1)
      .agg(new Histogram.HistValue(B).toColumn.name("s"))
    val q = agg.writeStream.format("memory")
      .queryName("hist_stream_test").outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val all = batches.flatten
    val rows = spark.table("hist_stream_test").toDF("key", "s")
      .groupBy("key").agg(max_by(col("s"), col("s.n")).as("s"))
      .select(col("key"), col("s.n"), col("s.lo"), col("s.hi"),
        col("s.centers"), col("s.counts"))
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("k0", "k1"))
    for (r <- rows) {
      val key = r.getString(0)
      val data = all.filter(_._1 == key).map(_._2)
      val expected = data.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val got = r.getSeq[Double](4).lazyZip(r.getSeq[Long](5))
        .map((c, n) => (c, n)).toSeq
      assert(got == expected, s"stream-$key")
      assert(r.getLong(1) == data.size)
    }
  }
}
