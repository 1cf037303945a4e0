package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: the Bench `parse_lines_per_sec_per_core` segment in
  * isolation with more reps — for chasing parse-pipeline regressions
  * without a full bench run. Args: [sfDir] [reps] [replicate].
  * `replicate` defaults to 1; pass 10 to reproduce Bench's exact
  * regime (the r10 fix replicates the corpus 10× so the one-core
  * window is seconds, not the jitter-dominated ~0.3 s — an isolated
  * figure is only comparable to the bench's at the same replication).
  */
object ParseRate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val replicate = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-parse-rate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lines1 = graft.queries.DataOps.logLinesFor(spark, sfDir)
    val lines = (1 to replicate).map(_ => lines1).reduce(_ union _)
      .coalesce(1).cache()
    val n = lines.count()
    println(s"[parse-rate] $n lines (${replicate}x), 1 partition")
    val cfg = graft.queries.DataOps.ingestConfig
    val tpl = graft.format.LogTemplate.compile(cfg.logFormat)
    def time(label: String, df: => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[parse-rate] $label rep$i $t%6.2fs  ${n / t}%,.0f lines/s/core")
        t
      }
      println(f"[parse-rate] $label BEST ${n / times.min}%,.0f lines/s/core")
      times.min
    }
    time("extract-only", graft.pipeline.Ingest.extracted(lines, tpl))
    time("full-pipeline", graft.pipeline.Ingest.parse(lines, cfg))
    spark.stop()
  }
}
