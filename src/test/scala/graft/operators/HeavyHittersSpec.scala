package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Misra-Gries invariants under real distributed aggregation: the
  * Mergeable-Summaries bounds must hold for EVERY partitioning (each one
  * exercises a different merge tree), the ≤-k-distinct regime must be
  * exact, and a dominant item must always survive.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def invariants(items: Seq[String], k: Int, parts: Int): Unit = {
    val df = items.toDF("v").repartition(parts)
    val sketch = HeavyHitters.topK(df, "v", k)
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val n = items.size.toLong
    val bound = n / (k + 1)
    assert(sketch.size <= k && sketch.nonEmpty)
    sketch.foreach { case (item, est) =>
      val t = exact.getOrElse(item, 0L)
      assert(est <= t, s"overcount: $item est=$est true=$t (parts=$parts)")
      assert(t - est <= bound, s"bound: $item est=$est true=$t n=$n (parts=$parts)")
    }
    exact.foreach { case (item, t) =>
      if (t > bound)
        assert(sketch.contains(item), s"heavy $item (true=$t > $bound) missing (parts=$parts)")
    }
  }

  test("≤ k distinct items: the summary is exact for any partitioning") {
    val items = (0 until 10).flatMap(i => Seq.fill(i + 1)(s"v$i"))
    for (parts <- Seq(1, 3, 8)) {
      val sketch = HeavyHitters.topK(items.toDF("v").repartition(parts), "v", 16)
        .as[(String, Long)].collect().toMap
      assert(sketch == (0 until 10).map(i => s"v$i" -> (i + 1).toLong).toMap,
        s"parts=$parts")
    }
  }

  test("mergeable-summaries bounds hold across merge trees (zipf-ish stream)") {
    val rnd = new scala.util.Random(7)
    // zipf-ish: item i with weight ~ 1/(i+1)
    val items = (0 until 5000).map { _ =>
      val r = rnd.nextDouble()
      s"z${(math.pow(200.0, r) - 1).toInt}" // log-uniform over ~[0,200)
    }
    for (parts <- Seq(1, 7, 32)) invariants(items, k = 16, parts = parts)
  }

  test("a dominant item always survives with a tight estimate") {
    val rnd = new scala.util.Random(11)
    val items = rnd.shuffle(
      Seq.fill(500)("hot") ++ (0 until 400).map(i => s"cold$i"))
    val n = items.size
    for (parts <- Seq(1, 8)) {
      val sketch = HeavyHitters.topK(items.toDF("v").repartition(parts), "v", 16)
        .as[(String, Long)].collect().toMap
      assert(sketch.contains("hot"))
      assert(sketch("hot") >= 500L - n / 17, s"est too loose: ${sketch("hot")}")
    }
  }

  test("per-key summaries: invariants hold independently per key") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 3000).map { _ =>
      val key = s"k${rnd.nextInt(3)}"
      val item = s"i${(math.pow(80.0, rnd.nextDouble()) - 1).toInt}"
      (key, item)
    }
    val sketch = HeavyHitters.topKPerKey(
        rows.toDF("key", "v").repartition(8), "key", "v", k = 12)
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (key, xs) =>
        key -> xs.map(t => t._2 -> t._3).toMap }
    val exact = rows.groupBy(_._1).map { case (key, xs) =>
      key -> xs.groupBy(_._2).map { case (v, ys) => v -> ys.size.toLong } }
    exact.foreach { case (key, ex) =>
      val sk = sketch.getOrElse(key, Map.empty)
      val n = ex.values.sum
      val bound = n / 13
      assert(sk.nonEmpty && sk.size <= 12, s"key $key size ${sk.size}")
      sk.foreach { case (item, est) =>
        val t = ex.getOrElse(item, 0L)
        assert(est <= t && t - est <= bound, s"key $key item $item est=$est true=$t")
      }
      ex.foreach { case (item, t) =>
        if (t > bound) assert(sk.contains(item), s"key $key heavy $item missing")
      }
    }
  }

  test("streaming: the summary aggregates incrementally across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(3)
    val batches = (0 until 3).map { _ =>
      (0 until 800).map { _ =>
        (s"k${rnd.nextInt(2)}", s"i${(math.pow(60.0, rnd.nextDouble()) - 1).toInt}")
      }
    }
    val stream = MemoryStream[(String, String)]
    val agg = stream.toDS()
      .groupByKey(_._1)
      .agg(new HeavyHitters.MisraGriesValue(12).toColumn.name("summary"))
    val q = agg.writeStream.format("memory")
      .queryName("hh_stream_test").outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // last update per key carries the whole history's summary — the
    // mergeable-summaries bounds must hold over ALL batches
    val all = batches.flatten
    val exact = all.groupBy(_._1).map { case (k, xs) =>
      k -> xs.groupBy(_._2).map { case (v, ys) => v -> ys.size.toLong } }
    import spark.implicits._
    // max_by on an insertion ordinal, not last(): last() over an
    // unordered groupBy is documented nondeterministic; the memory sink
    // appends each batch as later partitions, so monotonically
    // increasing ids select the final update per key deterministically
    val sketch = spark.table("hh_stream_test")
      .toDF("key", "summary")
      .withColumn("ord", monotonically_increasing_id())
      .groupBy("key").agg(max_by(col("summary"), col("ord")).as("summary"))
      .select(col("key"), explode(col("summary")))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(t => t._2 -> t._3).toMap }
    exact.foreach { case (key, ex) =>
      val sk = sketch.getOrElse(key, Map.empty)
      val n = ex.values.sum
      sk.foreach { case (item, est) =>
        val t = ex.getOrElse(item, 0L)
        assert(est <= t && t - est <= n / 13, s"key $key item $item est=$est true=$t")
      }
      ex.foreach { case (item, t) =>
        if (t > n / 13) assert(sk.contains(item), s"key $key heavy $item missing")
      }
    }
  }

  test("null items are ignored, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("v")
    val sketch = HeavyHitters.topK(df, "v", 4).as[(String, Long)].collect().toMap
    assert(sketch == Map("a" -> 2L, "b" -> 1L))
  }

  // ---- weighted (topKWeighted) ----

  test("weighted with all weights 1: exact ≤-k regime equals the unweighted form") {
    val rows = (0 until 10).flatMap(i => Seq.fill(i + 1)((s"v$i", 1L)))
    for (parts <- Seq(1, 5)) {
      val sketch = HeavyHitters.topKWeighted(
          rows.toDF("v", "w").repartition(parts), "v", "w", 16)
        .as[(String, Long)].collect().toMap
      assert(sketch == (0 until 10).map(i => s"v$i" -> (i + 1).toLong).toMap,
        s"parts=$parts")
    }
  }

  test("weighted mergeable bounds hold across merge trees") {
    val rnd = new scala.util.Random(17)
    // skewed items with heavy-tailed weights — the regime weights exist for
    val rows = (0 until 4000).map { _ =>
      val item = s"z${(math.pow(150.0, rnd.nextDouble()) - 1).toInt}"
      (item, (rnd.nextInt(9) + 1).toLong * (if (rnd.nextInt(20) == 0) 50L else 1L))
    }
    val exact = rows.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
    val w = rows.map(_._2).sum
    val k = 16
    val bound = w / (k + 1)
    for (parts <- Seq(1, 7, 32)) {
      val sketch = HeavyHitters.topKWeighted(
          rows.toDF("v", "w").repartition(parts), "v", "w", k)
        .as[(String, Long)].collect().toMap
      assert(sketch.size <= k && sketch.nonEmpty)
      sketch.foreach { case (item, est) =>
        val t = exact.getOrElse(item, 0L)
        assert(est <= t, s"overcount: $item est=$est true=$t (parts=$parts)")
        assert(t - est <= bound, s"bound: $item est=$est true=$t W=$w (parts=$parts)")
      }
      exact.foreach { case (item, t) =>
        if (t > bound)
          assert(sketch.contains(item), s"heavy $item (true=$t > $bound) missing")
      }
    }
  }

  test("weighted: one massive-weight row dominates however late it arrives") {
    // a single row carrying most of the mass must survive the summary
    // even when inserted after the buffer is full of light items
    val rows = (0 until 400).map(i => (s"light$i", 1L)) :+ ("whale", 10000L)
    val sketch = HeavyHitters.topKWeighted(
        rows.toDF("v", "w").repartition(4), "v", "w", 8)
      .as[(String, Long)].collect().toMap
    assert(sketch.contains("whale"))
    assert(sketch("whale") >= 10000L - (10400L / 9L))
  }

  test("weighted: null items and non-positive weights are skipped") {
    val rows = Seq((Some("a"), 5L), (None, 99L), (Some("a"), 0L),
      (Some("b"), -3L), (Some("b"), 2L))
    val sketch = HeavyHitters.topKWeighted(
        rows.toDF("v", "w"), "v", "w", 4)
      .as[(String, Long)].collect().toMap
    assert(sketch == Map("a" -> 5L, "b" -> 2L))
  }

  test("weighted per-key: bounds hold independently per key") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 2500).map { _ =>
      (s"k${rnd.nextInt(3)}",
        s"i${(math.pow(60.0, rnd.nextDouble()) - 1).toInt}",
        (rnd.nextInt(7) + 1).toLong)
    }
    val sketch = HeavyHitters.topKWeightedPerKey(
        rows.toDF("key", "v", "w").repartition(8), "key", "v", "w", k = 12)
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (key, xs) =>
        key -> xs.map(t => t._2 -> t._3).toMap }
    val exact = rows.groupBy(_._1).map { case (key, xs) =>
      key -> xs.groupBy(_._2).map { case (v, ys) => v -> ys.map(_._3).sum } }
    exact.foreach { case (key, ex) =>
      val sk = sketch.getOrElse(key, Map.empty)
      val w = ex.values.sum
      val bound = w / 13
      assert(sk.nonEmpty && sk.size <= 12, s"key $key size ${sk.size}")
      sk.foreach { case (item, est) =>
        val t = ex.getOrElse(item, 0L)
        assert(est <= t && t - est <= bound, s"key $key item $item est=$est true=$t")
      }
      ex.foreach { case (item, t) =>
        if (t > bound) assert(sk.contains(item), s"key $key heavy $item missing")
      }
    }
  }
}
