package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Co-located joins via bucketing — the pre-shuffle strategy for repeated
  * big⋈big joins (brief: "co-locate joins via bucketing or
  * pre-partitioning"): both sides bucketed by the join key at write time
  * join WITHOUT a shuffle exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of tables bucketed on the key plans no exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")

    Seq.tabulate(1000)(i => (i.toLong, s"cust${i % 50}"))
      .toDF("o_key", "cust")
      .write.bucketBy(8, "o_key").sortBy("o_key")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Seq.tabulate(4000)(i => ((i % 1000).toLong, i * 1.5))
      .toDF("l_key", "amount")
      .write.bucketBy(8, "l_key").sortBy("l_key")
      .option("path", s"$wh/b_lines").saveAsTable("b_lines")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("b_lines")
        .join(spark.table("b_orders"), col("l_key") === col("o_key"))
        .groupBy("cust").agg(sum("amount").as("s"))
      assert(joined.count() == 50)
      // final (post-AQE) plan: the join consumes the bucketed scans
      // directly — no exchange keyed on either join key; the single
      // remaining exchange is the groupBy on cust
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("hashpartitioning(l_key"), plan)
      assert(!plan.contains("hashpartitioning(o_key"), plan)
      assert(plan.contains("hashpartitioning(cust"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
  }
}
