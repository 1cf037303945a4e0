package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Quantiles.{Kll, KllSummary}

/** The KLL contract: the self-tracked Hoeffding rank bound holds for
  * every queried quantile, under ANY merge tree (linear chain, balanced
  * binary, Spark's nondeterministic partial-aggregate order), on
  * adversarial (sorted, duplicate-heavy) inputs — and the bound is
  * USEFUL (a small fraction of n), not vacuously wide. Plus the O(k)
  * size invariant that makes the sketch shuffle-safe at scale.
  */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val K = 128
  private val Phis = Seq(0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)

  // deterministic pseudo-random doubles (no external RNG state)
  private def mix(i: Long): Long = {
    var x = i + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def uniform(n: Int): IndexedSeq[Double] =
    (0 until n).map(i => (mix(i) >>> 11).toDouble / (1L << 53).toDouble)

  private def checkBounds(data: Seq[Double], sk: KllSummary,
      label: String): Double = {
    assert(sk.n == data.size, s"$label: n")
    assert(sk.values.length <= 3 * K + 8 * 64, s"$label: size ${sk.values.length}")
    assert(sk.values == sk.values.sorted, s"$label: summary unsorted")
    val sorted = data.sorted
    val bound = Quantiles.rankBound(sk.varSum)
    var worst = 0.0
    for (phi <- Phis) {
      val q = Quantiles.quantile(sk, phi)
      val est = Quantiles.estRank(sk, q)
      val truth = sorted.count(_ <= q).toLong
      val err = math.abs(est - truth).toDouble
      worst = math.max(worst, err)
      assert(err <= bound,
        s"$label: phi=$phi est=$est true=$truth err=$err bound=$bound")
    }
    bound
  }

  private def foldChunks(chunks: Seq[Seq[Double]]): Seq[Quantiles.KllState] = {
    val agg = new Kll(K)
    chunks.map(_.foldLeft(agg.zero)(agg.reduce))
  }

  test("no compaction → exact ranks, zero bound") {
    val data = uniform(K) // fits the single-level capacity: never compacts
    val agg = new Kll(K)
    val sk = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    assert(sk.varSum == 0.0 && Quantiles.rankBound(sk.varSum) == 0.0)
    val sorted = data.sorted
    for (phi <- Phis) {
      val q = Quantiles.quantile(sk, phi)
      assert(Quantiles.estRank(sk, q) == sorted.count(_ <= q).toLong)
    }
  }

  test("rank bound holds after a single long fold, and is useful") {
    val data = uniform(100000)
    val agg = new Kll(K)
    val sk = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    val bound = checkBounds(data, sk, "fold")
    // usefulness: the bound must beat a trivial always-true n-bound by
    // a wide margin — empirically ~2-4% of n at k=128, n=1e5
    assert(bound < 0.08 * data.size, s"bound $bound vacuous for n=${data.size}")
  }

  test("rank bound holds across merge trees (chain vs balanced binary)") {
    val data = uniform(80000)
    val agg = new Kll(K)
    val chunks = data.grouped(5000).toSeq
    val states = foldChunks(chunks)
    val chain = states.reduceLeft(agg.merge)
    def tree(ss: Seq[Quantiles.KllState]): Quantiles.KllState =
      if (ss.size == 1) ss.head
      else tree(ss.grouped(2).map {
        case Seq(a, b) => agg.merge(a, b)
        case Seq(a) => a
      }.toSeq)
    checkBounds(data, agg.finish(chain), "chain")
    checkBounds(data, agg.finish(tree(states)), "binary-tree")
  }

  test("adversarial inputs: sorted ascending and duplicate-heavy") {
    val agg = new Kll(K)
    val sorted = (0 until 60000).map(_.toDouble)
    checkBounds(sorted,
      agg.finish(sorted.foldLeft(agg.zero)(agg.reduce)), "sorted")
    val dupes = (0 until 60000).map(i => (mix(i) % 100).abs.toDouble)
    val skD = agg.finish(dupes.foldLeft(agg.zero)(agg.reduce))
    checkBounds(dupes, skD, "dupes")
    // on a 100-value domain the quantile answer must be a domain value
    assert(Phis.forall(p => Quantiles.quantile(skD, p) == math.floor(
      Quantiles.quantile(skD, p))))
  }

  test("estimated quantiles are monotone in phi") {
    val data = uniform(50000)
    val agg = new Kll(K)
    val sk = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    val qs = Phis.map(Quantiles.quantile(sk, _))
    assert(qs == qs.sorted, qs.toString)
  }

  test("distributed aggregate (Spark merge order) stays in bound") {
    import spark.implicits._
    val data = uniform(100000)
    for (parts <- Seq(4, 32)) {
      val df = spark.sparkContext.parallelize(data, parts).toDF("v")
      val sk = Quantiles.sketchSummary(df, "v", K)
      checkBounds(data, sk, s"spark-$parts-parts")
      // the DataFrame surface returns the same summary as flat columns
      // (n, var_sum, values, weights) — the r10 bench probe caught this
      // path unresolved, so it gets its own coverage
      val r = Quantiles.sketch(df, "v", K).collect().head
      checkBounds(data, KllSummary(r.getLong(0), r.getDouble(1),
        r.getSeq[Double](2).toIndexedSeq, r.getSeq[Long](3).toIndexedSeq),
        s"sketch-df-$parts-parts")
    }
  }

  test("per-key sketches bound per group") {
    import spark.implicits._
    // two keys with disjoint ranges: a cross-contaminated merge would
    // blow the rank check of one of them immediately
    val a = uniform(30000)
    val b = uniform(30000).map(_ + 10.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("key", "v")
      .repartition(16)
    val rows = Quantiles.sketchPerKey(df, "key", "v", K).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    for (r <- rows) {
      val sk = KllSummary(r.getAs[Long]("n"), r.getAs[Double]("var_sum"),
        r.getSeq[Double](3).toIndexedSeq, r.getSeq[Long](4).toIndexedSeq)
      val data = if (r.getString(0) == "a") a else b
      checkBounds(data, sk, s"key-${r.getString(0)}")
    }
  }

  test("streaming: the sketch aggregates incrementally across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 micro-batches × 2 keys; each batch shifts the distribution so a
    // summary that dropped earlier batches would blow the rank check
    val batches = (0 until 3).map { b =>
      (0 until 4000).map { i =>
        (s"k${i % 2}", (mix(b * 100000 + i) >>> 11).toDouble / (1L << 53).toDouble + b)
      }
    }
    val stream = MemoryStream[(String, Double)]
    val agg = stream.toDS()
      .groupByKey(_._1)
      .agg(new Quantiles.KllValue(K).toColumn.name("s"))
    val q = agg.writeStream.format("memory")
      .queryName("kll_stream_test").outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val all = batches.flatten
    // max_by on n, not last(): last() over an unordered groupBy is
    // documented nondeterministic, while the final update per key is
    // exactly the one with the largest n
    val rows = spark.table("kll_stream_test").toDF("key", "s")
      .groupBy("key").agg(org.apache.spark.sql.functions
        .max_by(col("s"), col("s.n")).as("s"))
      .select(col("key"), col("s.n"), col("s.varSum"),
        col("s.values"), col("s.weights"))
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("k0", "k1"))
    for (r <- rows) {
      val sk = KllSummary(r.getLong(1), r.getDouble(2),
        r.getSeq[Double](3).toIndexedSeq, r.getSeq[Long](4).toIndexedSeq)
      // the last update per key summarizes the WHOLE stream history —
      // the state store carried the sketch between micro-batches
      checkBounds(all.filter(_._1 == r.getString(0)).map(_._2),
        sk, s"stream-${r.getString(0)}")
    }
  }

  test("quantiles() DataFrame surface returns (phi, est) rows") {
    import spark.implicits._
    val df = uniform(20000).toDF("v")
    val out = Quantiles.quantiles(df, "v", K, Seq(0.5, 0.9)).collect()
    assert(out.length == 2)
    val med = out.find(_.getDouble(0) == 0.5).get.getDouble(1)
    assert(med > 0.4 && med < 0.6, s"median of uniform(0,1) was $med")
  }

  test("-State/-Merge: states survive parquet, merged bound holds, n additive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 30000).map(i =>
      (s"g${i % 5}", rnd.nextDouble() * 100 + (i % 5) * 10))
    val df = rows.toDF("g", "v").repartition(9)
    val stateAgg = udaf(new Quantiles.KllStateAgg(K),
      org.apache.spark.sql.Encoders.DOUBLE)
    val tmp = java.nio.file.Files.createTempDirectory("graft_kll_states")
    df.groupBy("g").agg(stateAgg(col("v")).as("st"))
      .write.mode("overwrite").parquet(s"$tmp/st")
    val stored = spark.read.parquet(s"$tmp/st")
    // the stored struct is a faithful state: k/n round-trip
    val ns = stored.select(col("st.k"), col("st.n"))
      .as[(Int, Long)].collect()
    assert(ns.forall(_._1 == K) && ns.map(_._2).sum == 30000L)
    val mergeAgg = udaf(new Quantiles.KllMergeSummary())
    val merged = stored.agg(mergeAgg(col("st.k"), col("st.n"),
      col("st.varSum"), col("st.nCompactions"), col("st.levels")).as("s"))
      .select(col("s.n"), col("s.varSum"), col("s.values"), col("s.weights"))
      .as[(Long, Double, Seq[Double], Seq[Long])].head()
    val summ = Quantiles.KllSummary(merged._1, merged._2, merged._3, merged._4)
    assert(summ.n == 30000L) // additive through the store
    val bound = Quantiles.rankBound(summ.varSum)
    Seq(0.1, 0.5, 0.9).foreach { p =>
      val q = Quantiles.quantile(summ, p)
      val est = Quantiles.estRank(summ, q)
      val exact = rows.count(_._2 <= q).toLong
      assert(math.abs(est - exact) <= bound,
        s"phi=$p: |$est - $exact| > $bound")
    }
    assert(bound < 3000, s"bound should be useful, got $bound")
  }
}
