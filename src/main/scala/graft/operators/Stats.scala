package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical aggregates — ClickHouse `cramersV` /
  * `cramersVBiasCorrected` / `contingency` (categorical association),
  * `simpleLinearRegression` (+ Pearson r), and `rankCorr` (Spearman's
  * rank correlation). All textbook statistics: Cramér 1946, Bergsma 2013
  * (the bias correction), Spearman 1904.
  *
  * Determinism contract (the q71/q72 discipline): the DISTRIBUTED part
  * aggregates only exact integers — contingency cell counts, integer
  * (x, y) moments, tie-aware DOUBLED ranks (`2·avgRank = 2·rank + ties−1`,
  * always integral). The float statistics are then ONE fixed expression
  * tree over those integers using only +,−,×,÷,sqrt — every one of which
  * IEEE 754 correctly rounds — mirrored token-for-token in the DuckDB
  * oracle, so the doubles hash-match bit-for-bit. χ² needs a SUM of
  * per-cell float terms (order-dependent in FP), so each term is floored
  * to integer 1e-15ths first (the t11/BM25 quantization pattern): the
  * pre-floor value is itself bit-reproducible (only exact products ≤ 2^53
  * and one correctly-rounded division), making the floored sum
  * order-independent AND engine-exact. The quantization is part of the
  * operator's contract, not an approximation knob.
  *
  * Scale shape: `contingencyStats` shuffles only the contingency CELLS
  * (≤ |A|×|B| rows — the category domain, never the data);
  * `simpleLinReg` is one hash aggregate of six integer moments per group
  * (map-side combine); `spearman` ranks whatever bounded domain the
  * caller hands it — rank correlation over raw 100 TB rows is a global
  * sort by definition, so the intended shape (and what q76 does) is
  * aggregate-then-rank: collapse to a bounded domain (days, buckets,
  * cohorts) first, then the two rank windows run over thousands of rows
  * regardless of input scale.
  */
object Stats {

  /** Association between two categorical columns from the contingency
    * table: χ² (quantized as documented above), Cramér's V, the
    * Bergsma bias-corrected V, and the contingency coefficient.
    * One output row: exact evidence (n, r, c, sum_contrib) + the four
    * float statistics.
    */
  def contingencyStats(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    // row/col marginals as windows over the CELLS table (≤ r·c rows)
    val w = cells
      .withColumn("ra", sum(col("o")).over(Window.partitionBy(col("a"))))
      .withColumn("cb", sum(col("o")).over(Window.partitionBy(col("b"))))
    // χ² = n·(Σ o²/(ra·cb) − 1); per-cell term ∈ (0,1], floored to
    // integer 1e-15ths. Factors are cast to double BEFORE multiplying so
    // no Long intermediate can wrap at any n: each factor ≤ n is an exact
    // double to 2^53, and the products are IEEE correctly rounded —
    // engine-identical — even past it (exact below n ≈ 2^26). The
    // division and the 1e15 scale are likewise single correctly-rounded
    // ops, so the pre-floor value is bit-reproducible at every scale.
    val c3 = w.withColumn("contrib",
      floor((lit(1e15) * (col("o").cast("double") * col("o").cast("double"))) /
        (col("ra").cast("double") * col("cb").cast("double"))))
    // r and c from the SAME aggregate over the cells relation — one scan
    // of c3 (the former two distinct() legs re-scanned the source twice)
    val main = c3.agg(sum(col("o")).as("n"), sum(col("contrib")).as("sum_contrib"),
      count_distinct(col("a")).as("r"), count_distinct(col("b")).as("c"))
    val nD = col("n").cast("double")
    val joined = main
      // Σfloor ≤ Σterm and χ² ≥ 0, so the floor can only dip a hair
      // below zero on an independent table — clamp (mirrored in SQL)
      .withColumn("chi2", greatest(lit(0.0),
        nD * (col("sum_contrib").cast("double") / lit(1e15) - lit(1.0))))
    joined
      .withColumn("cramers_v", sqrt(col("chi2") /
        (nD * least(col("r") - 1L, col("c") - 1L).cast("double"))))
      .withColumn("cramers_v_bc", {
        val phi2c = greatest(lit(0.0), col("chi2") / nD -
          ((col("r") - 1L) * (col("c") - 1L)).cast("double") / (nD - lit(1.0)))
        val rc = col("r").cast("double") -
          ((col("r") - 1L) * (col("r") - 1L)).cast("double") / (nD - lit(1.0))
        val cc = col("c").cast("double") -
          ((col("c") - 1L) * (col("c") - 1L)).cast("double") / (nD - lit(1.0))
        sqrt(phi2c / least(rc - lit(1.0), cc - lit(1.0)))
      })
      .withColumn("contingency_coef", sqrt(col("chi2") / (col("chi2") + nD)))
  }

  /** Per-group ordinary least squares y = kx + b over exact integer
    * moments, plus Pearson r. `xCol`/`yCol` must already be integral
    * (LongType) — callers floor-quantize floats, which both bounds the
    * moments and makes them engine-exact. Output per group: the exact
    * integer evidence (n, num, den_x, den_y) + slope/intercept/pearson_r.
    *
    * Overflow envelope: den_y = n·Σy² − (Σy)² must stay under 2^63 —
    * with |y| ≤ 2^11 that holds to n ≈ 2^40 rows per group; pre-scale y
    * harder for more. (The doubles the statistics are computed FROM are
    * cast from those exact integers — correctly rounded on both engines
    * even past 2^53.)
    */
  def simpleLinReg(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val m = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den_x", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("den_y", col("n") * col("syy") - col("sy") * col("sy"))
    m.select(col("grp"), col("n"), col("num"), col("den_x"), col("den_y"),
      (col("num").cast("double") / col("den_x").cast("double")).as("slope"),
      ((col("sy").cast("double") -
        col("num").cast("double") / col("den_x").cast("double") *
          col("sx").cast("double")) / col("n").cast("double")).as("intercept"),
      (col("num").cast("double") /
        (sqrt(col("den_x").cast("double")) * sqrt(col("den_y").cast("double"))))
        .as("pearson_r"))
  }

  /** Per-group moment statistics — ClickHouse `stddevPop` / `stddevSamp` /
    * `skewPop` / `kurtPop` / `covarPop` / `covarSamp` / `corr` from ONE
    * hash aggregate of exact integer power sums (n, Σx, Σx², Σx³, Σx⁴,
    * Σy, Σy², Σxy — map-side combine, 8 longs per group per partition).
    * Central moments and the statistics are one mirrored tree over those
    * integers: only +,−,×,÷,sqrt, so the doubles hash-match.
    *
    * Overflow envelope: Σx⁴ caps the input — |x| ≤ 2^10 holds to ~2^23
    * rows per group in an exact long; pre-scale harder for more (the
    * same contract as [[simpleLinReg]]).
    */
  def momentStats(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val m = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sx2"),
        sum(x * x * x).as("sx3"), sum(x * x * x * x).as("sx4"),
        sum(y).as("sy"), sum(y * y).as("sy2"), sum(x * y).as("sxy"))
    val nD = col("n").cast("double")
    val mean = col("sx").cast("double") / nD
    val meanY = col("sy").cast("double") / nD
    val m2 = col("sx2").cast("double") / nD - mean * mean
    val m3 = col("sx3").cast("double") / nD -
      lit(3.0) * mean * (col("sx2").cast("double") / nD) +
      lit(2.0) * mean * mean * mean
    val m4 = col("sx4").cast("double") / nD -
      lit(4.0) * mean * (col("sx3").cast("double") / nD) +
      lit(6.0) * mean * mean * (col("sx2").cast("double") / nD) -
      lit(3.0) * mean * mean * mean * mean
    val varSamp = (col("sx2").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD) /
      (nD - lit(1.0))
    val corrNum = col("n") * col("sxy") - col("sx") * col("sy")
    val corrDx = col("n") * col("sx2") - col("sx") * col("sx")
    val corrDy = col("n") * col("sy2") - col("sy") * col("sy")
    m.select(col("grp"), col("n"), col("sx"), col("sx2"), col("sx3"),
      col("sx4"), col("sy"), col("sy2"), col("sxy"),
      sqrt(m2).as("stddev_pop"),
      sqrt(varSamp).as("stddev_samp"),
      (m3 / (m2 * sqrt(m2))).as("skew_pop"),
      (m4 / (m2 * m2)).as("kurt_pop"),
      (col("sxy").cast("double") / nD - mean * meanY).as("covar_pop"),
      ((col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double") / nD) /
        (nD - lit(1.0))).as("covar_samp"),
      (corrNum.cast("double") /
        (sqrt(corrDx.cast("double")) * sqrt(corrDy.cast("double"))))
        .as("corr"))
  }

  /** Two-sample Kolmogorov-Smirnov D statistic (ClickHouse
    * `kolmogorovSmirnovTest` — the statistic only; the asymptotic p-value
    * needs libm `exp`, outside the oracle-exact surface). D =
    * max over the pooled value domain of |F₁(v) − F₂(v)|, computed as the
    * exact integer `m = max |cum₁·n₂ − cum₂·n₁|` so the distributed part
    * is integral; D = m/(n₁·n₂) is one correctly-rounded division.
    * `variantCol` must be 0/1. One output row:
    * (n1, n2, m, d).
    *
    * Overflow envelope (the [[simpleLinReg]]/[[momentStats]] convention):
    * each product cumᵢ·nⱼ is bounded by n₁·n₂, so the Long arithmetic is
    * exact while n₁·n₂ < 2^63 — balanced samples up to ~3·10⁹ rows each;
    * pre-aggregate (or subsample) beyond that.
    *
    * Scale shape: the Mann-Whitney pattern — distinct-value collapse
    * (map-side combine) shrinks the exchange to the value DOMAIN, one
    * cumulative window over that domain, totals broadcast back as a
    * 1-row cross join.
    */
  def ksTest(df: DataFrame, variantCol: String, valueCol: String): DataFrame = {
    val perV = df.groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(variantCol) === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col(variantCol) === 0, 0L).otherwise(1L)).as("c2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perV
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
    val tot = perV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(tot)
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("m"))
      .withColumn("d", col("m").cast("double") /
        (col("n1").cast("double") * col("n2").cast("double")))
  }

  /** Pairwise Pearson correlation matrix (ClickHouse `corrMatrix`) over
    * integral columns, from ONE hash aggregate of the full exact moment
    * set (n, Σxᵢ, Σxᵢxⱼ for i ≤ j — map-side combine, one row out). The
    * float correlations are the usual sqrt-only tree over those integers.
    * Output: one row — n, then `corr_i_j` for every i < j in column
    * order.
    */
  def corrMatrix(df: DataFrame, xs: Seq[String]): DataFrame = {
    require(xs.size >= 2)
    val sums = xs.zipWithIndex.map { case (c, i) => sum(col(c)).as(s"s$i") }
    val prods = for {
      i <- xs.indices; j <- i until xs.size
    } yield sum(col(xs(i)) * col(xs(j))).as(s"q${i}_$j")
    val m = df.agg(count(lit(1)).as("n"), (sums ++ prods): _*)
    val corrs = for { i <- xs.indices; j <- (i + 1) until xs.size } yield {
      val num = col("n") * col(s"q${i}_$j") - col(s"s$i") * col(s"s$j")
      val di = col("n") * col(s"q${i}_$i") - col(s"s$i") * col(s"s$i")
      val dj = col("n") * col(s"q${j}_$j") - col(s"s$j") * col(s"s$j")
      (num.cast("double") /
        (sqrt(di.cast("double")) * sqrt(dj.cast("double"))))
        .as(s"corr_${i}_$j")
    }
    m.select(col("n") +: corrs: _*)
  }

  /** One-way ANOVA F statistic (ClickHouse `analysisOfVariance` /
    * `anova`): does the mean of `valueCol` differ across the groups of
    * `groupCol`? `valueCol` must be integral (callers floor-quantize).
    *
    * Exactness: per-group sums/counts are exact integers; the per-group
    * between-term S_g²/n_g is NOT integral, so each is floored to
    * integer 1e-6ths after one exact-product double division (the
    * contingencyStats/t11 quantization pattern — the floored sum is
    * order-independent AND engine-exact; quantization is part of the
    * contract). F is then one mirrored tree:
    * SSB = Σterm/1e6 − S²/n, SSW = Q − Σterm/1e6,
    * F = (SSB/(k−1)) / (SSW/(n−k)).
    *
    * Overflow envelope: S_g² ≤ 2^53 needs |Σ per group| ≤ ~9.4·10⁷·√1
    * — i.e. pre-scale so per-group sums stay under ~2^26.5; term·1e6
    * stays far below 2^63 for any such input.
    *
    * Scale shape: ONE hash aggregate over the group domain (map-side
    * combine) + a 1-row rollup — the group table, never the data,
    * crosses the wire twice.
    *
    * Output: one row (n, k, s_all, q_all, sum_term, f_stat).
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val g = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("ng"), sum(v).as("sg"), sum(v * v).as("qg"))
      .withColumn("term", floor((lit(1e6) *
        (col("sg").cast("double") * col("sg").cast("double"))) /
        col("ng").cast("double")))
    val m = g.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
      sum(col("sg")).as("s_all"), sum(col("qg")).as("q_all"),
      sum(col("term")).as("sum_term"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val between = col("sum_term").cast("double") / lit(1e6) -
      (col("s_all").cast("double") * col("s_all").cast("double")) / nD
    val within = col("q_all").cast("double") -
      col("sum_term").cast("double") / lit(1e6)
    m.select(col("n"), col("k"), col("s_all"), col("q_all"), col("sum_term"),
      ((between / (kD - lit(1.0))) / (within / (nD - kD))).as("f_stat"))
  }

  /** Spearman's ρ with the average-rank tie convention, over the rows of
    * `df` (the caller's bounded, already-aggregated domain — see the
    * object scaladoc). Doubled ranks keep ties integral:
    * `2·avgRank(v) = 2·rank(v) + ties(v) − 1` (rank = min rank of the tie
    * group, so first+last = 2·rank + ties − 1). ρ is then Pearson over
    * the doubled ranks — affine-invariant, so the doubling cancels.
    * One output row: n + exact integer evidence + rho.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def rank2(c: String) =
      lit(2L) * rank().over(Window.orderBy(col(c))).cast("long") +
        count(lit(1)).over(Window.partitionBy(col(c))) - lit(1L)
    val ranked = df
      .withColumn("rx2", rank2(xCol))
      .withColumn("ry2", rank2(yCol))
    val m = ranked.agg(count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum(col("rx2") * col("ry2")).as("sxy"),
        sum(col("rx2") * col("rx2")).as("sxx"),
        sum(col("ry2") * col("ry2")).as("syy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den_x", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("den_y", col("n") * col("syy") - col("sy") * col("sy"))
    m.select(col("n"), col("num"), col("den_x"), col("den_y"),
      (col("num").cast("double") /
        (sqrt(col("den_x").cast("double")) * sqrt(col("den_y").cast("double"))))
        .as("rho"))
  }

  // ===== SQL aggregate frontends (ClickHouse names) ========================
  // `SELECT grp, simpleLinearRegression(x, y) FROM t GROUP BY grp` etc. —
  // the AbTests frontend discipline: explicit `valid` input slot (no
  // in-band sentinels), finish replays the Column tree token for token
  // (IEEE ⇒ bit-equal vs the q74/q75/q76 oracles), all-invalid groups
  // degenerate to a zero-count row with NaN statistics.

  /** [[simpleLinReg]]'s per-group output (minus the GROUP BY key the SQL
    * form gets for free).
    */
  case class LinRegResult(n: Long, num: Long, den_x: Long, den_y: Long,
      slope: Double, intercept: Double, pearson_r: Double)

  /** Six exact integer moments as constant-size tuple state — the ideal
    * aggregate shape (map-side combine of 6 longs; the state IS
    * [[simpleLinReg]]'s per-group aggregate row). Same overflow envelope
    * as the Column form: pre-scale so n·Σy² − (Σy)² stays under 2^63.
    */
  final class SimpleLinRegAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Boolean),
        (Long, Long, Long, Long, Long, Long), LinRegResult] {
    type Buf = (Long, Long, Long, Long, Long, Long)
    override def zero: Buf = (0L, 0L, 0L, 0L, 0L, 0L)
    override def reduce(b: Buf, e: (Long, Long, Boolean)): Buf =
      if (!e._3) b
      else {
        val (x, y) = (e._1, e._2)
        (b._1 + 1L, b._2 + x, b._3 + y, b._4 + x * y, b._5 + x * x,
          b._6 + y * y)
      }
    override def merge(a: Buf, b: Buf): Buf =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4, a._5 + b._5,
        a._6 + b._6)
    override def finish(b: Buf): LinRegResult = {
      val (n, sx, sy, sxy, sxx, syy) = b
      val num = n * sxy - sx * sy
      val denX = n * sxx - sx * sx
      val denY = n * syy - sy * sy
      LinRegResult(n, num, denX, denY,
        num.toDouble / denX.toDouble,
        (sy.toDouble - num.toDouble / denX.toDouble * sx.toDouble) /
          n.toDouble,
        num.toDouble /
          (math.sqrt(denX.toDouble) * math.sqrt(denY.toDouble)))
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: org.apache.spark.sql.Encoder[LinRegResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[LinRegResult]()
  }

  /** [[contingencyStats]]' one-row output — the `cramersV(a, b)` /
    * `cramersVBiasCorrected(a, b)` SQL surface (both names return the
    * full struct; CH returns the bare statistic, the evidence superset
    * is the house discipline).
    */
  case class CramersVResult(n: Long, sum_contrib: Long, r: Long, c: Long,
      chi2: Double, cramers_v: Double, cramers_v_bc: Double,
      contingency_coef: Double)

  /** Contingency-CELL state: (a, b) → count — bounded by the category
    * domain |A|×|B|, never the data (the Column form's cells relation as
    * aggregate state). Finish computes marginals over the cell map and
    * replays the quantized-χ² tree: per-cell terms floored to integer
    * 1e-15ths, so the sum is order-independent — finish iterates the
    * hash map unordered and still matches the oracle exactly.
    */
  final class CramersVAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, String, Boolean),
        scala.collection.mutable.HashMap[(String, String), Long],
        CramersVResult] {
    type Buf = scala.collection.mutable.HashMap[(String, String), Long]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (String, String, Boolean)): Buf = {
      if (e._3) {
        val k = (e._1, e._2)
        b.update(k, b.getOrElse(k, 0L) + 1L)
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (k, o) => a.update(k, a.getOrElse(k, 0L) + o) }
      a
    }
    override def finish(cells: Buf): CramersVResult = {
      if (cells.isEmpty)
        return CramersVResult(0L, 0L, 0L, 0L, Double.NaN, Double.NaN,
          Double.NaN, Double.NaN)
      val ra = scala.collection.mutable.HashMap.empty[String, Long]
      val cb = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      cells.foreach { case ((a, b), o) =>
        ra.update(a, ra.getOrElse(a, 0L) + o)
        cb.update(b, cb.getOrElse(b, 0L) + o)
        n += o
      }
      var sumContrib = 0L
      cells.foreach { case ((a, b), o) =>
        sumContrib += math.floor((1e15 * (o.toDouble * o.toDouble)) /
          (ra(a).toDouble * cb(b).toDouble)).toLong
      }
      val (r, c) = (ra.size.toLong, cb.size.toLong)
      val nD = n.toDouble
      val chi2 = math.max(0.0, nD * (sumContrib.toDouble / 1e15 - 1.0))
      val cramersV =
        math.sqrt(chi2 / (nD * math.min(r - 1L, c - 1L).toDouble))
      val phi2c = math.max(0.0,
        chi2 / nD - ((r - 1L) * (c - 1L)).toDouble / (nD - 1.0))
      val rc = r.toDouble - ((r - 1L) * (r - 1L)).toDouble / (nD - 1.0)
      val cc = c.toDouble - ((c - 1L) * (c - 1L)).toDouble / (nD - 1.0)
      val cramersVBc = math.sqrt(phi2c / math.min(rc - 1.0, cc - 1.0))
      CramersVResult(n, sumContrib, r, c, chi2, cramersV, cramersVBc,
        math.sqrt(chi2 / (chi2 + nD)))
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[CramersVResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CramersVResult]()
  }

  /** [[spearman]]'s one-row output — the `rankCorr(x, y)` SQL surface. */
  case class RankCorrResult(n: Long, num: Long, den_x: Long, den_y: Long,
      rho: Double)

  /** Distinct-PAIR state: (x, y) → count. Ranking needs the group's full
    * multiset, so the state is bounded by the distinct-pair domain — the
    * Column form's aggregate-then-rank contract carried into the
    * aggregate (collapse 100 TB to days/buckets/cohorts FIRST; rankCorr
    * over raw rows is a global sort by definition). Finish derives the
    * tie-aware doubled ranks from per-x / per-y marginal counts — for a
    * value with t ties starting at min-rank k, 2·avgRank = 2k + t − 1,
    * exactly the window form — then folds the exact integer moments.
    */
  final class RankCorrAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Boolean),
        scala.collection.mutable.HashMap[(Long, Long), Long],
        RankCorrResult] {
    type Buf = scala.collection.mutable.HashMap[(Long, Long), Long]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (Long, Long, Boolean)): Buf = {
      if (e._3) {
        val k = (e._1, e._2)
        b.update(k, b.getOrElse(k, 0L) + 1L)
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (k, m) => a.update(k, a.getOrElse(k, 0L) + m) }
      a
    }
    override def finish(pairs: Buf): RankCorrResult = {
      if (pairs.isEmpty)
        return RankCorrResult(0L, 0L, 0L, 0L, Double.NaN)
      def doubledRanks(marg: Iterable[(Long, Long)])
          : scala.collection.mutable.HashMap[Long, Long] = {
        val out = scala.collection.mutable.HashMap.empty[Long, Long]
        var before = 0L
        marg.toSeq.sortBy(_._1).foreach { case (v, cnt) =>
          // min-rank = before + 1; 2·avgRank = 2·minRank + ties − 1
          out.update(v, 2L * (before + 1L) + cnt - 1L)
          before += cnt
        }
        out
      }
      val cx = scala.collection.mutable.HashMap.empty[Long, Long]
      val cy = scala.collection.mutable.HashMap.empty[Long, Long]
      pairs.foreach { case ((x, y), m) =>
        cx.update(x, cx.getOrElse(x, 0L) + m)
        cy.update(y, cy.getOrElse(y, 0L) + m)
      }
      val rx2 = doubledRanks(cx)
      val ry2 = doubledRanks(cy)
      var n = 0L
      var sx = 0L; var sy = 0L; var sxy = 0L; var sxx = 0L; var syy = 0L
      pairs.foreach { case ((x, y), m) =>
        val (rx, ry) = (rx2(x), ry2(y))
        n += m
        sx += m * rx; sy += m * ry
        sxy += m * rx * ry; sxx += m * rx * rx; syy += m * ry * ry
      }
      val num = n * sxy - sx * sy
      val denX = n * sxx - sx * sx
      val denY = n * syy - sy * sy
      RankCorrResult(n, num, denX, denY,
        num.toDouble /
          (math.sqrt(denX.toDouble) * math.sqrt(denY.toDouble)))
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[RankCorrResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[RankCorrResult]()
  }

  /** [[ksTest]]'s one-row output — the `kolmogorovSmirnovTest(v,
    * variant)` SQL surface (D statistic + the integer evidence; the
    * p-value needs exp, documented-out with the rest of the libm
    * family).
    */
  case class KsResult(n1: Long, n2: Long, m: Long, d: Double)

  /** Value-DOMAIN state: v → (count in sample 1, count in sample 2) —
    * the Column form's `perV` relation as aggregate state (bounded by
    * the group's distinct values, the Mann-Whitney shape; pre-scale
    * floats). Finish replays the cumulative walk over the ascending
    * value domain: m = max |cum1·n2 − cum2·n1| stays integral, D is the
    * one division — bit-equal to [[ksTest]] by construction. Variant 0
    * is sample 1, anything else sample 2 (the Column form's reading).
    */
  final class KsAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Boolean),
        scala.collection.mutable.HashMap[Long, (Long, Long)], KsResult] {
    type Buf = scala.collection.mutable.HashMap[Long, (Long, Long)]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (Long, Long, Boolean)): Buf = {
      if (e._3) {
        val (c1, c2) = b.getOrElse(e._1, (0L, 0L))
        b.update(e._1,
          if (e._2 == 0L) (c1 + 1L, c2) else (c1, c2 + 1L))
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (v, (c1, c2)) =>
        val (a1, a2) = a.getOrElse(v, (0L, 0L))
        a.update(v, (a1 + c1, a2 + c2))
      }
      a
    }
    override def finish(perV: Buf): KsResult = {
      var n1 = 0L; var n2 = 0L
      perV.foreach { case (_, (c1, c2)) => n1 += c1; n2 += c2 }
      var cum1 = 0L; var cum2 = 0L; var m = 0L
      perV.keys.toSeq.sorted.foreach { v =>
        val (c1, c2) = perV(v)
        cum1 += c1; cum2 += c2
        val t = math.abs(cum1 * n2 - cum2 * n1)
        if (t > m) m = t
      }
      KsResult(n1, n2, m,
        m.toDouble / (n1.toDouble * n2.toDouble))
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[KsResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KsResult]()
  }

  /** [[anovaF]]'s one-row output — the `analysisOfVariance(v, grp)` SQL
    * surface (integer evidence + F; the p-value is libm territory,
    * documented-out).
    */
  case class AnovaResult(n: Long, k: Long, s_all: Long, q_all: Long,
      sum_term: Long, f_stat: Double)

  /** Group-DOMAIN state: label → (nᵍ, Σv, Σv²) — the Column form's
    * per-group moment relation as aggregate state (bounded by the group
    * label domain). Finish replays [[anovaF]]'s quantized between-terms
    * — floor(1e6·(Σv)²/nᵍ) per label, an order-independent integer sum,
    * so the unordered hash-map iteration still matches the oracle — then
    * the identical F tree. Labels render to strings (the SQL surface's
    * group key reading); same overflow envelope as the Column form.
    */
  final class AnovaAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long, Boolean),
        scala.collection.mutable.HashMap[String, (Long, Long, Long)],
        AnovaResult] {
    type Buf = scala.collection.mutable.HashMap[String, (Long, Long, Long)]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, e: (String, Long, Boolean)): Buf = {
      if (e._3) {
        val (ng, sg, qg) = b.getOrElse(e._1, (0L, 0L, 0L))
        b.update(e._1, (ng + 1L, sg + e._2, qg + e._2 * e._2))
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (g, (ng, sg, qg)) =>
        val (an, as, aq) = a.getOrElse(g, (0L, 0L, 0L))
        a.update(g, (an + ng, as + sg, aq + qg))
      }
      a
    }
    override def finish(groups: Buf): AnovaResult = {
      var n = 0L; var sAll = 0L; var qAll = 0L; var sumTerm = 0L
      val k = groups.size.toLong
      groups.foreach { case (_, (ng, sg, qg)) =>
        n += ng; sAll += sg; qAll += qg
        sumTerm += math.floor(
          (1e6 * (sg.toDouble * sg.toDouble)) / ng.toDouble).toLong
      }
      val nD = n.toDouble
      val kD = k.toDouble
      val between = sumTerm.toDouble / 1e6 -
        (sAll.toDouble * sAll.toDouble) / nD
      val within = qAll.toDouble - sumTerm.toDouble / 1e6
      AnovaResult(n, k, sAll, qAll, sumTerm,
        (between / (kD - 1.0)) / (within / (nD - kD)))
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[AnovaResult] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[AnovaResult]()
  }

  /** [[corrMatrix]]'s output reshaped to ClickHouse's own `corrMatrix`
    * return: the full k×k symmetric matrix (diagonal from the same
    * formula — 1.0 for any column with variance, NaN for a constant
    * column, exactly what the pairwise tree yields at i = j).
    */
  case class CorrMatrixResult(n: Long, corr: Seq[Seq[Double]])

  /** Constant-size moment state: n + k sums + k·(k+1)/2 upper-triangle
    * product sums — the ideal aggregate shape (map-side combine of
    * 1 + k + k(k+1)/2 longs; the state IS [[corrMatrix]]'s one
    * aggregate row). Finish replays the identical num/den integer trees
    * and sqrt-only divisions, so every off-diagonal element is bit-equal
    * to the Column form's `corr_i_j`. Same overflow envelope: pre-scale
    * so n·Σxᵢxⱼ and the sums' products stay under 2^63.
    */
  final class CorrMatrixAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Seq[Long], Boolean),
        (Long, Array[Long], Array[Long]), CorrMatrixResult] {
    require(k >= 2, s"corrMatrix needs >= 2 columns, got $k")
    type Buf = (Long, Array[Long], Array[Long])
    private val nq = k * (k + 1) / 2
    // upper-triangle index of (i, j), i <= j
    private def qi(i: Int, j: Int): Int = i * k - i * (i - 1) / 2 + (j - i)
    override def zero: Buf = (0L, new Array[Long](k), new Array[Long](nq))
    override def reduce(b: Buf, e: (Seq[Long], Boolean)): Buf =
      if (!e._2) b
      else {
        val xs = e._1
        val s = b._2; val q = b._3
        var i = 0
        while (i < k) {
          s(i) += xs(i)
          var j = i
          while (j < k) { q(qi(i, j)) += xs(i) * xs(j); j += 1 }
          i += 1
        }
        (b._1 + 1L, s, q)
      }
    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < k) { a._2(i) += b._2(i); i += 1 }
      i = 0
      while (i < nq) { a._3(i) += b._3(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    override def finish(b: Buf): CorrMatrixResult = {
      val (n, s, q) = b
      def corr(i: Int, j: Int): Double = {
        val (lo, hi) = (math.min(i, j), math.max(i, j))
        val num = n * q(qi(lo, hi)) - s(lo) * s(hi)
        val di = n * q(qi(lo, lo)) - s(lo) * s(lo)
        val dj = n * q(qi(hi, hi)) - s(hi) * s(hi)
        num.toDouble / (math.sqrt(di.toDouble) * math.sqrt(dj.toDouble))
      }
      CorrMatrixResult(n,
        (0 until k).map(i => (0 until k).map(j => corr(i, j))))
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder
        : org.apache.spark.sql.Encoder[CorrMatrixResult] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[CorrMatrixResult]()
  }
}
