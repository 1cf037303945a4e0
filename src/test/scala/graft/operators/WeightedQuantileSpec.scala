package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WeightedQuantileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scalar reference: smallest v with 100·cumWeight(v) ≥ p·W. */
  private def ref(rows: Seq[(Long, Long)], p: Int): Long = {
    val byV = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val w = byV.map(_._2).sum
    var cum = 0L
    byV.collectFirst {
      case (v, vw) if { cum += vw; 100L * cum >= p.toLong * w } => v
    }.get
  }

  test("hand case: boundary hits are inclusive") {
    // v=1 w=1, v=2 w=1: W=2; p50 → cum(1)=1, 100·1 ≥ 50·2 exactly → 1
    val df = Seq((0L, 1L, 1L), (0L, 2L, 1L)).toDF("g", "v", "w")
    val out = WeightedQuantile.exactWeighted(df, Seq("g"), "v", "w",
      Seq(0, 50, 51, 100))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((0L, 2L, 1L, 1L, 2L, 2L))) // total_w, p0, p50, p51, p100
  }

  test("weights concentrate the quantile on the heavy value") {
    // one whale value carries 90% of the weight
    val df = Seq((0L, 10L, 90L), (0L, 1L, 5L), (0L, 100L, 5L))
      .toDF("g", "v", "w")
    val out = WeightedQuantile.exactWeighted(df, Seq("g"), "v", "w",
      Seq(25, 50, 75, 95, 96))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // cum: 1→5, 10→95, 100→100 (W=100)
    assert(out == ((0L, 100L, 10L, 10L, 10L, 10L, 100L)))
  }

  test("randomized ≡ scalar reference across groups and duplicate values") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (i % 3).toLong -> ((rnd.nextInt(20).toLong, rnd.nextInt(9).toLong + 1L))
    }
    val df = rows.map { case (g, (v, w)) => (g, v, w) }.toDF("g", "v", "w")
    val ps = Seq(0, 10, 50, 90, 100)
    val got = WeightedQuantile.exactWeighted(df, Seq("g"), "v", "w", ps)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._3, r._4, r._5, r._6, r._7)).toMap
    for (g <- 0L to 2L) {
      val sub = rows.filter(_._1 == g).map(_._2)
      assert(got(g) == ps.map(ref(sub, _)), s"group $g")
    }
  }
}
