package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The t22 composition on KNOWN overlaps: two integer universes with an
  * exactly-known intersection, sketched with the stock theta functions
  * and checked against the catalog entry's own error bounds — so the
  * bounds are exercised in the estimation regime regardless of the
  * testdata corpus's vocabulary, and under different partitionings
  * (theta union is the mergeable path the partial aggregate takes).
  */
class ThetaSetOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("known 70k/130k overlap: union/intersection/difference in bound") {
    import spark.implicits._
    for (parts <- Seq(4, 32)) {
      // A = [0, 100k), B = [30k, 130k): |A∩B| = 70k, |A∪B| = 130k
      val df = spark.sparkContext.parallelize(0 until 130000, parts)
        .toDF("i")
        .select(col("i"),
          (col("i") < 100000).as("in_a"), (col("i") >= 30000).as("in_b"))
      val r = df.agg(
        expr("theta_sketch_agg(CASE WHEN in_a THEN CAST(i AS STRING) END)").as("sa"),
        expr("theta_sketch_agg(CASE WHEN in_b THEN CAST(i AS STRING) END)").as("sb"))
        .select(
          expr("theta_sketch_estimate(sa)").as("a"),
          expr("theta_sketch_estimate(sb)").as("b"),
          expr("theta_sketch_estimate(theta_union(sa, sb))").as("u"),
          expr("theta_sketch_estimate(theta_intersection(sa, sb))").as("i"),
          expr("theta_sketch_estimate(theta_difference(sa, sb))").as("d"))
        .collect().head
      val (a, b, u, i, d) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // the catalog entry's bounds: ±7.8% (5σ at lgK=12) direct, ±10%
      // of union for the derived set ops
      assert(math.abs(a - 100000) <= 100000 * 0.078, s"parts=$parts a=$a")
      assert(math.abs(b - 100000) <= 100000 * 0.078, s"parts=$parts b=$b")
      assert(math.abs(u - 130000) <= 130000 * 0.078, s"parts=$parts u=$u")
      assert(math.abs(i - 70000) <= 130000 * 0.10, s"parts=$parts i=$i")
      assert(math.abs(d - 30000) <= 130000 * 0.10, s"parts=$parts d=$d")
    }
  }

  test("disjoint sets: intersection near zero, difference near |A|") {
    import spark.implicits._
    val df = (0 until 40000).toDF("i")
      .select(col("i"), (col("i") % 2 === 0).as("in_a"))
    val r = df.agg(
      expr("theta_sketch_agg(CASE WHEN in_a THEN CAST(i AS STRING) END)").as("sa"),
      expr("theta_sketch_agg(CASE WHEN NOT in_a THEN CAST(i AS STRING) END)").as("sb"))
      .selectExpr(
        "theta_sketch_estimate(theta_intersection(sa, sb)) AS i",
        "theta_sketch_estimate(theta_difference(sa, sb)) AS d")
      .collect().head
    assert(r.getLong(0) <= 40000 * 0.10, s"i=${r.getLong(0)}")
    assert(math.abs(r.getLong(1) - 20000) <= 40000 * 0.10, s"d=${r.getLong(1)}")
  }

  test("streaming: theta sketches aggregate incrementally across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 batches of 2000 distinct values each — the final update's
    // estimate must cover the whole history, like every family member
    val stream = MemoryStream[String]
    val q = stream.toDF().toDF("v")
      .selectExpr("theta_sketch_estimate(theta_sketch_agg(v)) AS est")
      .writeStream.format("memory")
      .queryName("theta_stream_test").outputMode("complete").start()
    try {
      (0 until 3).foreach { b =>
        stream.addData((0 until 2000).map(i => s"b${b}v$i"): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val est = spark.table("theta_stream_test").collect().last.getLong(0)
    assert(math.abs(est - 6000) <= 6000 * 0.078, s"est=$est")
  }

  test("t22 catalog entry passes every bound on real testdata") {
    val row = graft.SparkEntry.queries("t22_theta_set_ops")(
      spark, "/root/testdata/sf0.001").collect().head
    for (f <- Seq("a_in_bound", "b_in_bound", "u_in_bound",
      "i_in_bound", "d_in_bound", "pass"))
      assert(row.getAs[Boolean](f), f)
  }
}
