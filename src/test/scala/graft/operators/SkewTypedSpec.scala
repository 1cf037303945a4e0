package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewTypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregate == direct groupBy (hot-key scatter is lossless)") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val salted = Skew.saltedAggregate(df, "k", 8, Seq(
      ("n", count(lit(1)), sum(col("n"))),
      ("s", sum(col("v")), sum(col("s"))),
      ("m", max(col("v")), max(col("m")))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(direct == salted)
  }

  test("skewReport: hand-checked histogram, shares, uniformity factor") {
    // keys: 0 ×6, 1 ×2, 2 ×1, 3 ×1 → n_rows=10, n_keys=4, max=6
    val df = (Seq.fill(6)(0L) ++ Seq(1L, 1L, 2L, 3L)).toDF("k")
    val r = Skew.skewReport(df, "k", topK = 2).collect().head
    assert(r.getAs[Long]("n_rows") == 10L && r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("max_cnt") == 6L && r.getAs[Long]("top1_key") == 0L)
    assert(r.getAs[Long]("top1_share_bp") == 6000L)          // 6/10
    assert(r.getAs[Long]("topk_cnt") == 8L && r.getAs[Long]("topk_keys") == 2L)
    assert(r.getAs[Long]("topk_share_bp") == 8000L)          // (6+2)/10
    assert(r.getAs[Long]("skew_x1000") == 2400L)             // 6·4/10 = 2.4×
    // uniform histogram reads exactly 1000
    val u = (0L until 4L).flatMap(k => Seq.fill(5)(k)).toDF("k")
    assert(Skew.skewReport(u, "k").collect().head
      .getAs[Long]("skew_x1000") == 1000L)
    // top1 tie breaks to the smaller key
    val t = Seq(5L, 5L, 3L, 3L, 9L).toDF("k")
    assert(Skew.skewReport(t, "k").collect().head
      .getAs[Long]("top1_key") == 3L)
  }

  test("AQE splits the skewed partition at runtime (skew join engages)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // thresholds scaled to test data: the hot key's partition is >2x the
      // median and above the absolute floor, so AQE must mark + split it
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = Seq.tabulate(60000)(i =>
        (if (i % 3 > 0) 0L else (i % 50).toLong + 1, s"payload_left_$i")).toDF("k", "lv")
      val right = Seq.tabulate(5100)(i => ((i % 51).toLong, s"payload_right_$i")).toDF("rk", "rv")
      val joined = left.join(right, left("k") === right("rk"))
      // execute THIS queryExecution's plan (count()/write would build a new
      // one and the inspected adaptive plan would never finalize)
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      assert(n == 40000L * 100 + 20000L / 50 * 100 * 50) // hot key + uniform keys
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(400))
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"skew join did not engage:\n${finalPlan.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("salted join == plain join") {
    val l = Seq.tabulate(200)(i => (i % 5, i)).toDF("k", "lv")
    val r = Seq.tabulate(5)(i => (i, s"r$i")).toDF("rk", "rv")
    val plain = l.join(r, l("k") === r("rk")).select("lv", "rv")
      .as[(Int, String)].collect().toSet
    val salted = Skew.saltedJoin(l, r, "k", "rk", 4).select("lv", "rv")
      .as[(Int, String)].collect().toSet
    assert(plain == salted)
  }

  test("typed top-k aggregator == window row_number formulation") {
    val orders = Seq(
      (1L, 10L, 100.0), (1L, 11L, 300.0), (1L, 12L, 200.0), (1L, 13L, 300.0),
      (2L, 20L, 50.0),
      (3L, 30L, 1.0), (3L, 31L, 2.0), (3L, 32L, 3.0), (3L, 33L, 4.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val typed = TypedOps.top3PricesPerCustomer(orders)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Any](1), r.getAs[Any](2), r.getAs[Any](3))).toMap
    // ties on price break by orderkey asc: cust 1 → 300(11), 300(13), 200(12)
    assert(typed(1L) == ((300.0, 300.0, 200.0)))
    assert(typed(2L) == ((50.0, null, null)))
    assert(typed(3L) == ((4.0, 3.0, 2.0)))

    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .groupBy("o_custkey").agg(collect_list(col("o_totalprice")).as("l"))
    assert(windowed.count() == 3)
  }
}
