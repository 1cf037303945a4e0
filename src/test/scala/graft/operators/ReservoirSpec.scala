package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Reservoir.Sample

/** The reservoir contract: exhaustive below k; exactly-k distinct members
  * above; and UNIFORM — every row's inclusion frequency lands in a tight
  * Chernoff band, measured over hundreds of fixed salts (deterministic:
  * the RNG is counter-seeded, so this is a one-time proof that never
  * flakes) — for a single fold, for chain merges, and for balanced
  * binary merge trees. Plus the Spark distributed form.
  */
class ReservoirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Items: IndexedSeq[String] = (0 until 50).map(i => s"doc$i")
  private val K = 10
  private val Salts = 0 until 400

  private def fold(agg: Sample, xs: Seq[String]): Reservoir.ResState =
    xs.foldLeft(agg.zero)(agg.reduce)

  /** inclusion counts per item over all salts for a given build strategy */
  private def frequencies(build: Sample => Seq[String]): Map[String, Int] =
    Salts.flatMap { salt => build(new Sample(K, salt)).distinct }
      .groupBy(identity).view.mapValues(_.size).toMap

  private def assertUniform(freq: Map[String, Int], label: String): Unit = {
    // p = k/n = 0.2 over 400 salts: mean 80, sd = sqrt(400·0.2·0.8) = 8;
    // ±5σ band [40, 120] — deterministic once salts are fixed
    assert(freq.values.sum == Salts.size * K, s"$label: total draws")
    for (item <- Items) {
      val c = freq.getOrElse(item, 0)
      assert(c >= 40 && c <= 120, s"$label: $item included $c/400 times")
    }
  }

  test("below k the sample is exhaustive and ordered-by-arrival") {
    val agg = new Sample(K, salt = 7)
    assert(agg.finish(fold(agg, Items.take(6))) == Items.take(6))
  }

  test("above k: exactly k distinct members of the input") {
    val agg = new Sample(K, salt = 3)
    val out = agg.finish(fold(agg, Items))
    assert(out.size == K && out.distinct.size == K)
    assert(out.forall(Items.contains))
  }

  test("single fold is uniform (±5σ over 400 salts)") {
    assertUniform(frequencies(a => a.finish(fold(a, Items))), "fold")
  }

  test("chain and binary-tree merges stay uniform") {
    def chunks(a: Sample) = Items.grouped(9).map(c => fold(a, c)).toSeq
    assertUniform(frequencies { a =>
      a.finish(chunks(a).reduceLeft(a.merge))
    }, "chain")
    def tree(a: Sample, ss: Seq[Reservoir.ResState]): Reservoir.ResState =
      if (ss.size == 1) ss.head
      else tree(a, ss.grouped(2).map {
        case Seq(x, y) => a.merge(x, y)
        case Seq(x) => x
      }.toSeq)
    assertUniform(frequencies(a => a.finish(tree(a, chunks(a)))), "tree")
  }

  test("merge of two exhaustive sides below k concatenates") {
    val agg = new Sample(K, salt = 1)
    val m = agg.merge(fold(agg, Items.take(4)), fold(agg, Items.slice(4, 7)))
    assert(agg.finish(m).sorted == Items.take(7).sorted && m.n == 7)
  }

  test("distributed sample: k distinct members under Spark's merge order") {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(
      (0 until 10000).map(i => s"row$i"), 32).toDF("v")
    val out = Reservoir.sample(df, "v", 64, salt = 5)
      .collect().head.getSeq[String](0)
    assert(out.size == 64 && out.distinct.size == 64)
    assert(out.forall(_.startsWith("row")))
    // below-k corpus: exhaustive
    val small = (0 until 20).map(i => s"s$i").toDF("v")
    val outS = Reservoir.sample(small, "v", 64).collect().head.getSeq[String](0)
    assert(outS.sorted == (0 until 20).map(i => s"s$i").sorted)
  }

  test("streaming: the reservoir aggregates incrementally across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, max_by, monotonically_increasing_id}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = (0 until 3).map { b =>
      (0 until 40).map(i => (s"k${i % 2}", s"b${b}r$i"))
    }
    val stream = MemoryStream[(String, String)]
    val q = stream.toDS().groupByKey(_._1)
      .agg(new Reservoir.SampleValue(12, salt = 9).toColumn.name("s"))
      .writeStream.format("memory")
      .queryName("res_stream_test").outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val all = batches.flatten
    val rows = spark.table("res_stream_test").toDF("key", "s")
      .withColumn("ord", monotonically_increasing_id())
      .groupBy("key").agg(max_by(col("s"), col("ord")).as("s"))
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("k0", "k1"))
    for (r <- rows) {
      val key = r.getString(0)
      val s = r.getSeq[String](1)
      val keyRows = all.filter(_._1 == key).map(_._2).toSet
      // the final update samples from the WHOLE stream history: 12
      // distinct members drawn from all 60 of the key's rows, including
      // (with overwhelming probability at these sizes, deterministic
      // under the fixed salt) rows from more than one batch
      assert(s.size == 12 && s.distinct.size == 12 && s.forall(keyRows))
      assert(s.map(_.take(2)).distinct.size > 1, s.toString)
    }
  }

  test("null items are skipped, not sampled") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val out = Reservoir.sample(df, "v", 8).collect().head.getSeq[String](0)
    assert(out.sorted == Seq("a", "b"))
  }
}
