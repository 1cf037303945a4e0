package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stats (q74/q75/q76) against closed forms and scalar references:
  * contingency statistics vs the 2×2 closed form and the association
  * extremes, OLS vs an exact line and a randomized integer-formula
  * reference, Spearman vs monotone extremes and a sort-based average-rank
  * reference — each re-run across partitionings (the aggregates must be
  * merge-order independent because their distributed state is integers).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- contingency / Cramér's V -----------------------------------------

  private def table2x2(a: Long, b: Long, c: Long, d: Long) = {
    val rows =
      Seq.fill(a.toInt)(("r1", "c1")) ++ Seq.fill(b.toInt)(("r1", "c2")) ++
        Seq.fill(c.toInt)(("r2", "c1")) ++ Seq.fill(d.toInt)(("r2", "c2"))
    rows.toDF("x", "y")
  }

  test("chi2 and V match the 2x2 closed form") {
    // chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)); V = sqrt(chi2/n) for 2x2
    val (a, b, c, d) = (10L, 20L, 30L, 40L)
    val n = a + b + c + d
    val chi2 = n.toDouble * (a * d - b * c) * (a * d - b * c) /
      ((a + b) * (c + d) * (a + c) * (b + d)).toDouble
    val row = Stats.contingencyStats(table2x2(a, b, c, d), "x", "y")
      .select("n", "r", "c", "chi2", "cramers_v", "contingency_coef")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(row._1 == n && row._2 == 2 && row._3 == 2)
    // the 1e-15th quantization moves chi2 by at most r*c*n/1e15
    assert(math.abs(row._4 - chi2) < 1e-6, s"chi2 ${row._4} vs $chi2")
    assert(math.abs(row._5 - math.sqrt(chi2 / n)) < 1e-6)
    assert(math.abs(row._6 - math.sqrt(chi2 / (chi2 + n))) < 1e-6)
  }

  test("perfect association reads V = 1, independence reads V = 0") {
    val perfect = Stats.contingencyStats(table2x2(25, 0, 0, 25), "x", "y")
      .select("cramers_v").as[Double].head()
    assert(math.abs(perfect - 1.0) < 1e-9)
    // exact independence: o = ra*cb/n for every cell
    val indep = Stats.contingencyStats(table2x2(10, 20, 20, 40), "x", "y")
      .select("chi2", "cramers_v").as[(Double, Double)].head()
    assert(indep._1 < 1e-9 && indep._2 < 1e-6)
  }

  test("bias-corrected V is <= V and sane on a skewed 3x2") {
    val rows = Seq.fill(40)(("a", "u")) ++ Seq.fill(10)(("a", "v")) ++
      Seq.fill(5)(("b", "u")) ++ Seq.fill(25)(("b", "v")) ++
      Seq.fill(15)(("c", "u")) ++ Seq.fill(15)(("c", "v"))
    val row = Stats.contingencyStats(rows.toDF("x", "y"), "x", "y")
      .select("r", "c", "cramers_v", "cramers_v_bc")
      .as[(Long, Long, Double, Double)].head()
    assert(row._1 == 3 && row._2 == 2)
    assert(row._4 <= row._3 + 1e-12 && row._3 > 0.1 && row._3 < 1.0)
  }

  test("contingency stats are partitioning-invariant") {
    val df = table2x2(13, 29, 31, 7)
    val one = Stats.contingencyStats(df.repartition(1), "x", "y").collect()
    val many = Stats.contingencyStats(df.repartition(7), "x", "y").collect()
    assert(one.toSeq == many.toSeq)
  }

  // ---- simple linear regression ------------------------------------------

  test("exact line recovers slope, intercept, r = 1") {
    val pts = (1L to 50L).map(x => ("g", x, 3L * x + 2L))
    val row = Stats.simpleLinReg(pts.toDF("g", "x", "y"), "g", "x", "y")
      .select("slope", "intercept", "pearson_r")
      .as[(Double, Double, Double)].head()
    assert(row._1 == 3.0 && row._2 == 2.0 && math.abs(row._3 - 1.0) < 1e-12)
  }

  test("randomized OLS == the integer-moment reference, per group, any partitioning") {
    val rng = new scala.util.Random(75)
    val pts = (1 to 400).map { _ =>
      val g = s"g${rng.nextInt(3)}"
      val x = rng.nextInt(100).toLong
      (g, x, 7L * x - 30L + rng.nextInt(41) - 20L)
    }
    def ref(rows: Seq[(String, Long, Long)]) = {
      val n = rows.size.toLong
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      (num.toDouble / dx.toDouble,
        (sy.toDouble - num.toDouble / dx.toDouble * sx.toDouble) / n.toDouble,
        num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
    }
    Seq(1, 5).foreach { parts =>
      val got = Stats.simpleLinReg(
          pts.toDF("g", "x", "y").repartition(parts), "g", "x", "y")
        .select("grp", "slope", "intercept", "pearson_r")
        .as[(String, Double, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      pts.groupBy(_._1).foreach { case (g, rows) =>
        assert(got(g) == ref(rows), s"group $g parts=$parts")
      }
    }
  }

  // ---- Spearman rank correlation ------------------------------------------

  private def refSpearman(xs: Seq[Long], ys: Seq[Long]): Double = {
    def avgRanks(v: Seq[Long]): Seq[Double] = {
      val sorted = v.sorted
      val first = sorted.zipWithIndex.groupBy(_._1)
        .map { case (k, g) => k -> (g.map(_._2).min + 1) }
      val cnt = v.groupBy(identity).map { case (k, g) => k -> g.size }
      v.map(x => first(x) + (cnt(x) - 1) / 2.0)
    }
    val rx = avgRanks(xs); val ry = avgRanks(ys)
    val n = xs.size
    val mx = rx.sum / n; val my = ry.sum / n
    val num = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val dx = rx.map(a => (a - mx) * (a - mx)).sum
    val dy = ry.map(b => (b - my) * (b - my)).sum
    num / math.sqrt(dx * dy)
  }

  test("monotone (nonlinear) series reads rho = 1, reversed reads -1") {
    val cubes = (1L to 30L).map(x => (x, x * x * x))
    val up = Stats.spearman(cubes.toDF("x", "y"), "x", "y")
      .select("rho").as[Double].head()
    assert(math.abs(up - 1.0) < 1e-12) // sqrt(d)*sqrt(d) is d ± 1 ulp
    val down = Stats.spearman(
        cubes.map { case (x, y) => (x, -y) }.toDF("x", "y"), "x", "y")
      .select("rho").as[Double].head()
    assert(math.abs(down + 1.0) < 1e-12)
  }

  test("tied values match the average-rank scalar reference, any partitioning") {
    val rng = new scala.util.Random(76)
    // small value domains force heavy ties in both coordinates
    val pts = (1 to 200).map(_ => (rng.nextInt(8).toLong, rng.nextInt(6).toLong))
    val want = refSpearman(pts.map(_._1), pts.map(_._2))
    Seq(1, 6).foreach { parts =>
      val got = Stats.spearman(pts.toDF("x", "y").repartition(parts), "x", "y")
        .select("n", "rho").as[(Long, Double)].head()
      assert(got._1 == 200L)
      assert(math.abs(got._2 - want) < 1e-12, s"parts=$parts: ${got._2} vs $want")
    }
  }

  // ---- moment statistics ----------------------------------------------------

  test("momentStats == the exact-sum scalar reference; sane on planted shapes") {
    val rng = new scala.util.Random(83)
    val rows = (1 to 500).map { _ =>
      val g = s"g${rng.nextInt(2)}"
      val x = rng.nextInt(41).toLong - 20L // symmetric-ish
      (g, x, 2L * x + rng.nextInt(7))
    }
    def ref(es: Seq[(String, Long, Long)]) = {
      val n = es.size.toLong
      val sx = es.map(_._2).sum; val sx2 = es.map(e => e._2 * e._2).sum
      val sx3 = es.map(e => e._2 * e._2 * e._2).sum
      val sx4 = es.map(e => e._2 * e._2 * e._2 * e._2).sum
      val sy = es.map(_._3).sum; val sy2 = es.map(e => e._3 * e._3).sum
      val sxy = es.map(e => e._2 * e._3).sum
      val nD = n.toDouble
      val mean = sx.toDouble / nD
      val m2 = sx2.toDouble / nD - mean * mean
      val m3 = sx3.toDouble / nD - 3.0 * mean * (sx2.toDouble / nD) +
        2.0 * mean * mean * mean
      val m4 = sx4.toDouble / nD - 4.0 * mean * (sx3.toDouble / nD) +
        6.0 * mean * mean * (sx2.toDouble / nD) -
        3.0 * mean * mean * mean * mean
      (math.sqrt(m2), m3 / (m2 * math.sqrt(m2)), m4 / (m2 * m2),
        (n * sxy - sx * sy).toDouble /
          (math.sqrt((n * sx2 - sx * sx).toDouble) *
            math.sqrt((n * sy2 - sy * sy).toDouble)))
    }
    val got = Stats.momentStats(rows.toDF("g", "x", "y").repartition(6),
        "g", "x", "y")
      .select("grp", "stddev_pop", "skew_pop", "kurt_pop", "corr")
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    rows.groupBy(_._1).foreach { case (g, es) =>
      assert(got(g) == ref(es), s"group $g")
    }
    // planted structure: near-uniform x → skew ~ 0, kurtosis ~ 1.8,
    // y = 2x + noise → strong positive corr
    got.values.foreach { case (sd, skew, kurt, corr) =>
      assert(sd > 5 && math.abs(skew) < 0.3 && kurt > 1.5 && kurt < 2.2 &&
        corr > 0.95)
    }
  }

  // ---- Kolmogorov-Smirnov ---------------------------------------------------

  private def refKs(g0: Seq[Long], g1: Seq[Long]): (Long, Long, Long) = {
    val dom = (g0 ++ g1).distinct.sorted
    val n1 = g0.size.toLong; val n2 = g1.size.toLong
    val m = dom.map { v =>
      val c1 = g0.count(_ <= v).toLong; val c2 = g1.count(_ <= v).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    (n1, n2, m)
  }

  private def ks(rows: Seq[(Long, Long)]) =
    Stats.ksTest(rows.toDF("g", "v"), "g", "v")
      .select("n1", "n2", "m", "d").as[(Long, Long, Long, Double)].head()

  test("ksTest: identical samples read D = 0, disjoint supports read D = 1") {
    val same = ks(Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 1L), (1L, 2L), (1L, 3L)))
    assert(same == ((3L, 3L, 0L, 0.0)))
    val apart = ks(Seq((0L, 1L), (0L, 2L), (1L, 10L), (1L, 20L), (1L, 30L)))
    assert(apart._3 == 2L * 3L && apart._4 == 1.0)
  }

  test("ksTest == integer scan reference on random data, any partitioning") {
    val rng = new scala.util.Random(81)
    val rows = (1 to 500).map(_ =>
      ((rng.nextInt(2)).toLong,
        (rng.nextInt(40) + (if (rng.nextBoolean()) 5 else 0)).toLong))
    val (n1, n2, m) = refKs(rows.filter(_._1 == 0).map(_._2),
      rows.filter(_._1 == 1).map(_._2))
    Seq(1, 7).foreach { parts =>
      val got = Stats.ksTest(rows.toDF("g", "v").repartition(parts), "g", "v")
        .select("n1", "n2", "m", "d").as[(Long, Long, Long, Double)].head()
      assert(got._1 == n1 && got._2 == n2 && got._3 == m, s"parts=$parts")
      assert(got._4 == m.toDouble / (n1.toDouble * n2.toDouble))
    }
  }

  // ---- correlation matrix ---------------------------------------------------

  test("corrMatrix: pairwise entries equal the single-pair Pearson exactly") {
    val rng = new scala.util.Random(82)
    val rows = (1 to 300).map { _ =>
      val x = rng.nextInt(100).toLong
      (x, 2 * x + rng.nextInt(10), rng.nextInt(50).toLong,
        100L - x + rng.nextInt(5))
    }
    val df = rows.toDF("x0", "x1", "x2", "x3")
    val mat = Stats.corrMatrix(df, Seq("x0", "x1", "x2", "x3"))
      .select("n", "corr_0_1", "corr_0_3", "corr_2_3")
      .as[(Long, Double, Double, Double)].head()
    assert(mat._1 == 300L)
    // identical formula shape as simpleLinReg's pearson_r → bit-equal
    def pair(a: String, b: String): Double =
      Stats.simpleLinReg(df.withColumn("g", lit("g")), "g", a, b)
        .select("pearson_r").as[Double].head()
    assert(mat._2 == pair("x0", "x1"))
    assert(mat._3 == pair("x0", "x3"))
    assert(mat._4 == pair("x2", "x3"))
    assert(mat._2 > 0.9 && mat._3 < -0.9) // the planted structure
  }

  test("doubled-rank evidence is exactly integral and self-consistent") {
    // n rows, no ties: sx = sum of 2*rank = n(n+1), den_x = n*sxx - sx^2
    val pts = (1L to 10L).map(x => (x * 3L, 100L - x))
    val row = Stats.spearman(pts.toDF("x", "y"), "x", "y")
      .select("n", "num", "den_x", "den_y")
      .as[(Long, Long, Long, Long)].head()
    val n = 10L
    // tie-free doubled ranks are 2,4,...,2n: sxx = 4*Σk², den = n*sxx-(n(n+1))²
    val sxx = 4L * n * (n + 1) * (2 * n + 1) / 6
    val den = n * sxx - (n * (n + 1)) * (n * (n + 1))
    assert(row._1 == n && row._3 == den && row._4 == den)
    assert(row._2 == -den) // perfectly anti-monotone
  }

  test("anovaF matches the scalar reference; extremes behave") {
    def refF(groups: Seq[Seq[Long]]): Double = {
      val n = groups.map(_.size).sum.toDouble
      val k = groups.size.toDouble
      val s = groups.map(_.sum).sum.toDouble
      val q = groups.flatMap(_.map(v => v * v)).sum.toDouble
      // the operator's quantization: Σ floor(1e6·Sg²/ng) / 1e6
      val sumTerm = groups.map { g =>
        val sg = g.sum.toDouble
        math.floor(1e6 * (sg * sg) / g.size.toDouble)
      }.sum / 1e6
      ((sumTerm - s * s / n) / (k - 1)) / ((q - sumTerm) / (n - k))
    }
    val rnd = new scala.util.Random(31)
    val groups = Seq.tabulate(4)(g =>
      Seq.fill(20 + rnd.nextInt(30))(
        (g * 7 + rnd.nextInt(25)).toLong))
    val df = groups.zipWithIndex.flatMap { case (vs, g) =>
      vs.map(v => (s"g$g", v))
    }.toDF("grp", "v").repartition(7)
    val row = Stats.anovaF(df, "grp", "v")
      .select("n", "k", "f_stat").as[(Long, Long, Double)].head()
    assert(row._1 == groups.map(_.size).sum && row._2 == 4)
    assert(row._3 == refF(groups), s"got ${row._3} want ${refF(groups)}")
    // shifted group means → large F; identical groups → F ≈ 0
    val flat = Seq.tabulate(3)(g => Seq.fill(25)(10L))
    val flatDf = flat.zipWithIndex.flatMap { case (vs, g) =>
      vs.map(v => (s"g$g", v)) }.toDF("grp", "v")
    // 0/0 under non-ANSI Spark division is NULL (zero within AND between)
    val f0 = Stats.anovaF(flatDf, "grp", "v")
      .select("f_stat").as[Option[Double]].head()
    assert(f0.isEmpty || math.abs(f0.get) < 1e-6)
  }
}
