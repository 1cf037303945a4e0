package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q48's mergeable-sketch rollup has no SQL oracle (sketch estimates are
  * engine-specific), so its semantics are pinned here: per-group and
  * merged-global estimates must track the exact distinct counts, and the
  * merged estimate must equal the estimate of a direct whole-table sketch
  * (merge loses nothing).
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("q48: sketch-union global estimate tracks exact distinct") {
    val out = graft.SparkEntry.queries("q48_hll_merge")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val exactAll = orders.select(count_distinct(col("o_custkey"))).as[Long].head()
    val nAll = orders.count()
    assert(out.contains("ALL"))
    assert(out("ALL")._2 == nAll) // exact row counts ride along unharmed
    // lgConfigK=14 → relative standard error ~0.8%; assert within 5%
    val est = out("ALL")._1.toDouble
    assert(math.abs(est - exactAll) / exactAll < 0.05,
      s"merged estimate $est vs exact $exactAll")
    // per-group estimates track exact per-group distincts too
    val exactPer = orders.groupBy(col("o_orderpriority"))
      .agg(count_distinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactPer.foreach { case (p, exact) =>
      val e = out(p)._1.toDouble
      assert(math.abs(e - exact) / math.max(exact, 1L) < 0.05, s"group $p: $e vs $exact")
    }
  }

  test("q48: merged sketch equals a direct whole-table sketch") {
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val merged = orders.groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")).as[Long].head()
    val direct = orders
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))")).as[Long].head()
    assert(merged == direct)
  }
}
