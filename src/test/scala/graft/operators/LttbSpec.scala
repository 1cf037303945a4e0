package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LttbSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mix(i: Long): Long = {
    var x = i + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Independent reference: exact rational triangle areas via BigInt
    * (true centroid, no size scaling) — must select the same points,
    * since scaling |cross|/2m by the constant m preserves the argmax.
    */
  private def ref(pts: Array[(Long, Long)], t: Int): Seq[(Long, Long)] = {
    val n = pts.length
    if (n <= t) return pts.toSeq
    val nb = t - 2
    val buckets = (0 until nb).map { b =>
      (1 to n - 2).filter(i => (i - 1).toLong * nb / (n - 2) == b)
    }
    var prev = pts(0)
    val out = scala.collection.mutable.ArrayBuffer(pts(0))
    for (b <- 0 until nb) {
      val next = if (b < nb - 1) buckets(b + 1).map(pts) else Seq(pts(n - 1))
      val m = BigInt(next.size)
      val sx = next.map(p => BigInt(p._1)).sum
      val sy = next.map(p => BigInt(p._2)).sum
      // 2·area·m = |(xP−xb)(Σy−m·yP) − (m·xP−Σx)(yb−yP)|
      val sel = buckets(b).map(pts).minBy { p =>
        val a = ((BigInt(prev._1) - p._1) * (sy - m * prev._2) -
          (m * prev._1 - sx) * (BigInt(p._2) - prev._2)).abs
        (-a, p._1) // max area, then smallest x
      }
      out += sel
      prev = sel
    }
    out += pts(n - 1)
    out.toSeq
  }

  test("short series pass through unchanged") {
    val pts = Array((1L, 5L), (2L, 9L), (3L, 1L))
    assert(Lttb.select(pts, 3) == pts.toSeq)
    assert(Lttb.select(pts, 12) == pts.toSeq)
  }

  test("hand case: the spike survives, the flat filler does not") {
    // 10 points, threshold 5 → 3 middle buckets of 2-3 points; a single
    // spike at x=5 must be selected over its flat neighbors
    val pts = (0L until 10L).map(x => (x, if (x == 5) 100L else 0L)).toArray
    val out = Lttb.select(pts, 5)
    assert(out.size == 5)
    assert(out.head == ((0L, 0L)) && out.last == ((9L, 0L)))
    assert(out.contains((5L, 100L)), out.toString)
    assert(out.map(_._1) == out.map(_._1).sorted)
  }

  test("output size, endpoints, and x order on random series") {
    for (seed <- 0 until 5; n <- Seq(13, 40, 257)) {
      val pts = (0 until n)
        .map(i => (i.toLong * 7 + (mix(seed * 1000 + i) % 3).abs,
          mix(seed * 7777 + i) % 1000))
        .distinctBy(_._1).sortBy(_._1).toArray
      val out = Lttb.select(pts, 12)
      assert(out.size == math.min(pts.length, 12))
      assert(out.head == pts.head && out.last == pts.last)
      assert(out.map(_._1) == out.map(_._1).sorted)
    }
  }

  test("≡ exact-rational reference on random series (scaling preserves argmax)") {
    for (seed <- 0 until 10) {
      val n = 20 + (mix(seed) % 200).abs.toInt
      val pts = (0 until n)
        .map(i => (i.toLong * 5 + (mix(seed * 31 + i) % 4).abs,
          mix(seed * 13 + i) % 500))
        .distinctBy(_._1).sortBy(_._1).toArray
      for (t <- Seq(3, 5, 12))
        assert(Lttb.select(pts, t) == ref(pts, t), s"seed=$seed t=$t")
    }
  }

  test("tie-break: equal areas pick the smallest x") {
    // symmetric points around a flat prev/next axis produce equal areas
    val pts = Array((0L, 0L), (1L, 10L), (2L, -10L), (3L, 10L), (4L, -10L),
      (5L, 10L), (6L, -10L), (7L, 0L))
    val out = Lttb.select(pts, 4) // 2 middle buckets: {1,2,3}, {4,5,6}
    assert(out.head == ((0L, 0L)) && out.last == ((7L, 0L)))
    assert(out == ref(pts, 4))
  }

  test("distributed leg is partitioning-invariant and matches the fold") {
    import spark.implicits._
    val rows = (0 until 3).flatMap { k =>
      (0 until 100).map(i =>
        (k.toLong, i.toLong * 3 + k, mix(k * 997 + i) % 800))
    }
    val expected = (0 until 3).map { k =>
      k.toLong -> Lttb.select(
        rows.filter(_._1 == k).map(r => (r._2, r._3)).sortBy(_._1).toArray, 12)
    }.toMap
    for (parts <- Seq(1, 8)) {
      val got = Lttb.downsample(
        rows.toDF("user_id", "x", "y").repartition(parts),
        "user_id", "x", "y", 12)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sortBy(_._1).toSeq)
      for (k <- 0L to 2L)
        assert(got(k) == expected(k).sortBy(_._1), s"key $k parts $parts")
    }
  }
}
