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
