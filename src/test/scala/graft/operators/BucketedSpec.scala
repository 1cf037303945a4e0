package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The co-located-join contract: identical bucketing on both sides makes
  * the join exchange-free, while the same join over plain parquet pays
  * two shuffles — and the answer is identical either way.
  */
class BucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shuffles(mkDf: => DataFrame): Int = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // broadcast would hide the question being asked (does the LAYOUT
      // carry the clustering?) behind a size heuristic
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = mkDf.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      plan.collect { case s: ShuffleExchangeLike => s }.size
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  // multi-partition sources so SinglePartition can't satisfy the join's
  // clustering requirement and fake a zero-exchange plan
  private lazy val facts = spark.range(0, 1000, 1, 8)
    .select(col("id").as("fact_id"), (col("id") % 37).as("k"),
      (col("id") * 3).as("amount"))
  private lazy val dims = spark.range(0, 37, 1, 4)
    .select(col("id").as("k"), concat(lit("dim"), col("id")).as("name"))

  test("co-located join plans zero exchanges; plain parquet pays two") {
    val bf = Bucketed.writeBucketed(facts, "graft_spec_facts", 4, Seq("k"))
    val bd = Bucketed.writeBucketed(dims, "graft_spec_dims", 4, Seq("k"))
    assert(shuffles(Bucketed.colocatedJoin(bf, bd, Seq("k"), Seq("k"))) == 0)

    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed_plain")
    facts.write.mode("overwrite").parquet(s"$tmp/facts")
    dims.write.mode("overwrite").parquet(s"$tmp/dims")
    val pf = spark.read.parquet(s"$tmp/facts")
    val pd = spark.read.parquet(s"$tmp/dims")
    assert(shuffles(pf.join(pd, pf("k") === pd("k"))) == 2)
  }

  test("aggregation on the bucket key also plans zero exchanges") {
    // the OTHER half of the layout payoff: the scan's bucket hash
    // distribution satisfies the aggregate's clustering requirement too,
    // so a groupBy on the bucket key runs partial+final fused per bucket
    // with no exchange — while the same aggregate over plain parquet
    // pays one
    val bf = Bucketed.writeBucketed(facts, "graft_spec_facts_g", 4, Seq("k"))
    assert(shuffles(bf.groupBy(col("k")).agg(sum(col("amount")))) == 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed_agg")
    facts.write.mode("overwrite").parquet(s"$tmp/facts")
    val pf = spark.read.parquet(s"$tmp/facts")
    assert(shuffles(pf.groupBy(col("k")).agg(sum(col("amount")))) == 1)
    // and the answer is identical either way
    val a = bf.groupBy(col("k")).agg(sum(col("amount")).as("s"))
      .as[(Long, Long)].collect().toMap
    val b = facts.groupBy(col("k")).agg(sum(col("amount")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(a == b && a.size == 37)
  }

  test("mismatched bucket counts cost one side its shuffle back") {
    val bf = Bucketed.writeBucketed(facts, "graft_spec_facts8", 8, Seq("k"))
    val bd = Bucketed.writeBucketed(dims, "graft_spec_dims4", 4, Seq("k"))
    val n = shuffles(Bucketed.colocatedJoin(bf, bd, Seq("k"), Seq("k")))
    assert(n == 1, s"expected exactly the mismatched side to shuffle, got $n")
  }

  test("bucket pruning: an equality filter on the bucket key scans one bucket") {
    val bf = Bucketed.writeBucketed(facts, "graft_spec_facts_p", 4, Seq("k"))
    val plan = bf.where(col("k") === 17L).queryExecution.executedPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the planner proves only ONE of the 4 buckets can hold k=17
    val pruned = scans.head.optionalBucketSet
    assert(pruned.isDefined && pruned.get.cardinality() == 1,
      s"expected 1 surviving bucket, got ${pruned.map(_.cardinality())}")
    assert(bf.where(col("k") === 17L).count() ==
      facts.where(col("k") === 17L).count())
  }

  test("layout changes the plan, never the answer") {
    val bf = Bucketed.writeBucketed(facts, "graft_spec_facts_a", 4, Seq("k"))
    val bd = Bucketed.writeBucketed(dims, "graft_spec_dims_a", 4, Seq("k"))
    val colocated = Bucketed.colocatedJoin(bf, bd, Seq("k"), Seq("k"))
      .select(bf("fact_id"), bf("k"), bf("amount"), bd("name"))
      .as[(Long, Long, Long, String)].collect().toSet
    val plain = facts.join(dims, Seq("k"))
      .select("fact_id", "k", "amount", "name")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(colocated == plain && plain.size == 1000)
  }
}
