package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: prints key physical-plan facts (join strategy, pushed
  * filters, read schemas, top-k) for representative catalog queries —
  * the "explain and iterate" loop in one command.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // JVM (not ICU) case mapping: the ASCII corpus makes them identical,
      // and ICU's CollationAwareUTF8String class-init stalls 20-110 s when
      // the JIT queue is busy (measured; first lower()/upper() pays it)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val default = Seq("q01_pricing_summary", "q02_topk", "q05_region_revenue",
      "q06_revenue_forecast", "q20_having", "q28_asof_join", "i01_ingest_e2e")
    val interesting = if (args.nonEmpty) args.toSeq else default
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      // execute BEFORE reading the plan: under AQE the pre-execution
      // string is the unfinalized adaptive plan with no codegen markers
      // (wholeStage would always read false) and provisional join picks.
      // collect(), not foreach() — foreach executes through a separate
      // rdd-path QueryExecution and never finalizes THIS plan object
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      // an executed AQE plan prints "== Final Plan ==" then "== Initial
      // Plan ==" — audit only the final section or every count doubles
      val plan = {
        val i = full.indexOf("== Initial Plan ==")
        if (i >= 0) full.substring(0, i) else full
      }
      def has(s: String) = plan.contains(s)
      def n(s: String) = s.r.findAllIn(plan).length
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan)
        .filterNot(_.contains("[]")).toList
      println(s"=== $name")
      // codegen'd operators carry a `*(stageId)` prefix in the final
      // adaptive plan (the word "WholeStageCodegen" appears only in
      // formatted mode); count the distinct codegen stage ids
      val codegenStages =
        "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(s"  broadcastHash=${has("BroadcastHashJoin")} smj=${has("SortMergeJoin")} " +
        s"bnlj=${has("BroadcastNestedLoopJoin")} cartesian=${has("CartesianProduct")}")
      println(s"  takeOrdered=${has("TakeOrderedAndProject")} " +
        s"codegenStages=$codegenStages " +
        s"exchanges=${n("Exchange hashpartitioning") + n("Exchange rangepartitioning") + n("Exchange RoundRobin")} " +
        s"broadcastExch=${n("BroadcastExchange")}")
      pushed.take(3).foreach(p => println(s"  $p"))
      val readSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
      readSchemas.take(3).foreach(r => println(s"  ${r.take(140)}"))
    }
    spark.stop()
  }
}
