package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AbTestsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mix(i: Long): Long = {
    var x = i + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  test("tTests: exact moments and reference statistics") {
    import spark.implicits._
    val g0 = Seq(10L, 12L, 14L, 16L, 18L) // mean 14, var 10
    val g1 = Seq(20L, 22L, 24L)           // mean 22, var 4
    val df = (g0.map(("0", _)) ++ g1.map(("1", _))).toDF("variant", "v")
    val r = AbTests.tTests(df, "variant", "v").collect().head
    assert(r.getAs[String]("variant_a") == "0" &&
      r.getAs[String]("variant_b") == "1")
    assert(r.getAs[Long]("n1") == 5 && r.getAs[Long]("n2") == 3)
    assert(r.getAs[Long]("s1") == 70 && r.getAs[Long]("q1") == 1020)
    assert(r.getAs[Double]("mean1") == 14.0 && r.getAs[Double]("mean2") == 22.0)
    assert(math.abs(r.getAs[Double]("var1") - 10.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("var2") - 4.0) < 1e-12)
    // scipy-checked references for these two samples:
    // student: sp2 = (4*10 + 2*4)/6 = 8, t = -8/sqrt(8*(1/5+1/3)) ≈ -3.8730
    assert(math.abs(r.getAs[Double]("student_t") - (-3.872983346207417)) < 1e-12)
    // welch: t = -8/sqrt(10/5 + 4/3) ≈ -4.3818; df = 100/17 exactly
    assert(math.abs(r.getAs[Double]("welch_t") - (-4.381780460041329)) < 1e-12)
    assert(math.abs(r.getAs[Double]("welch_df") - 100.0 / 17.0) < 1e-12)
  }

  /** Scalar reference with explicit average ranks. */
  private def refU(g0: Seq[Long], g1: Seq[Long]): (Long, Long) = {
    val pooled = (g0.map((_, 0)) ++ g1.map((_, 1))).sortBy(_._1)
    // average rank per value, doubled to stay integral
    val rank2 = pooled.zipWithIndex.groupBy(_._1._1).flatMap {
      case (_, xs) =>
        val r2 = xs.map(_._2 + 1).sum * 2 / xs.size // 2·avg rank
        xs.map(x => (x._2, x._1._2, r2))
    }
    val r1x2 = rank2.collect { case (_, 0, r2) => r2.toLong }.sum
    val u1x2 = r1x2 - g0.size.toLong * (g0.size + 1)
    (u1x2, 2L * g0.size * g1.size - u1x2)
  }

  test("meanZTest: hand-checked z with known population variances") {
    import spark.implicits._
    // a: [0, 2] (n=2, mean 1); b: [4] (n=1, mean 4); σa²=4, σb²=9
    // z = (1 − 4) / sqrt(4/2 + 9/1) = −3 / sqrt(11)
    val df = Seq(("a", 0L), ("a", 2L), ("b", 4L)).toDF("variant", "v")
    val r = AbTests.meanZTest(df, "variant", "v", popVar1 = 4.0, popVar2 = 9.0)
      .select("variant_a", "n1", "variant_b", "n2", "mean1", "mean2", "z")
      .collect().head
    assert(r.getAs[String]("variant_a") == "a" && r.getAs[Long]("n1") == 2L)
    assert(r.getAs[String]("variant_b") == "b" && r.getAs[Long]("n2") == 1L)
    assert(r.getAs[Double]("mean1") == 1.0 && r.getAs[Double]("mean2") == 4.0)
    assert(r.getAs[Double]("z") == -3.0 / math.sqrt(4.0 / 2.0 + 9.0 / 1.0))
    val e = intercept[IllegalArgumentException](
      AbTests.meanZTest(df, "variant", "v", popVar1 = 0.0, popVar2 = 1.0))
    assert(e.getMessage.contains("positive"))
  }

  test("mannWhitney: hand case with ties") {
    import spark.implicits._
    val g0 = Seq(1L, 2L, 2L, 5L)
    val g1 = Seq(2L, 3L, 7L)
    val df = (g0.map((0L, _)) ++ g1.map((1L, _))).toDF("variant", "v")
    val r = AbTests.mannWhitney(df, "variant", "v").collect().head
    val (u1, u2) = refU(g0, g1)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getLong(2) == u1 && r.getLong(3) == u2,
      s"got (${r.getLong(2)}, ${r.getLong(3)}) want ($u1, $u2)")
    assert(r.getLong(2) + r.getLong(3) == 2L * 4 * 3)
  }

  test("mannWhitney ≡ scalar reference on random tied data, any partitioning") {
    import spark.implicits._
    for (seed <- 0 until 4) {
      val g0 = (0 until 500).map(i => (mix(seed * 100 + i) % 40).abs)
      val g1 = (0 until 300).map(i => (mix(seed * 999 + i) % 40).abs)
      val df = (g0.map((0L, _)) ++ g1.map((1L, _))).toDF("variant", "v")
        .repartition(9)
      val r = AbTests.mannWhitney(df, "variant", "v").collect().head
      val (u1, u2) = refU(g0, g1)
      assert((r.getLong(2), r.getLong(3)) == ((u1, u2)), s"seed $seed")
      assert(r.getLong(2) + r.getLong(3) == 2L * g0.size * g1.size)
    }
  }

  test("auc: perfect separation = 1, reversed = 0, all-tied = 0.5, " +
      "random ≡ the pair-counting definition") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long)]): Double =
      AbTests.auc(rows.toDF("label", "score"), "label", "score")
        .select("auc").as[Double].head()
    // positives all score above negatives
    val perfect = (1L to 10L).map(s => (1L, 100L + s)) ++
      (1L to 8L).map(s => (0L, s))
    assert(run(perfect) == 1.0)
    assert(run(perfect.map { case (l, s) => (1L - l, s) }) == 0.0)
    assert(run(Seq((1L, 5L), (1L, 5L), (0L, 5L))) == 0.5) // all tied
    // randomized: AUC == (#(pos>neg) + 0.5*#(pos=neg)) / (n_pos*n_neg)
    val rng = new scala.util.Random(90)
    val rows = (1 to 400).map(_ =>
      ((rng.nextInt(2)).toLong, rng.nextInt(30).toLong))
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 == 0L).map(_._2)
    val pairs = for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val want = pairs.sum / (pos.size.toDouble * neg.size.toDouble)
    assert(math.abs(run(rows) - want) < 1e-12)
  }
}
