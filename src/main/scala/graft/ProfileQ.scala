package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one catalog query N times to separate fixed overhead
  * (planning/codegen/JIT) from steady-state execution.
  *
  * MEASUREMENT CONTRACT (r16 fix): reps are timed over a noop-format
  * WRITE — the same sink Bench times — so every projected column is
  * fully evaluated. The previous `.count()` loop let Catalyst PRUNE
  * the projection: a map-heavy entry whose cost is its projected
  * kernels (q125's 13 interpreted variant accessors) timed 0.45 s here
  * while Bench's full evaluation read 7.8 s — an 17× artifact of
  * column pruning, not a real speedup. Row counts print once, after
  * the timed reps.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // JVM (not ICU) case mapping: the ASCII corpus makes them identical,
      // and ICU's CollationAwareUTF8String class-init stalls 20-110 s when
      // the JIT queue is busy (measured; first lower()/upper() pays it)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // absorb first-action init cost
    spark.read.parquet(s"$sfDir/region.parquet").count()
    println(s"[profile] init done, pid=${ProcessHandle.current().pid()}")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run$i ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      // drop operator-internal persists (scrub's norm cache, minhash's
      // shingle table) so reps don't stack caches — Bench does the same
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    println(s"[profile] rows=" +
      SparkEntry.queries(name)(spark, sfDir).count())
    spark.stop()
  }
}
