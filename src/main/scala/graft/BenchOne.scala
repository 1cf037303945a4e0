package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: measure catalog queries under the EXACT Bench protocol
  * (noop sink, caches cleared blocking between reps, min of N) so local
  * numbers predict `BENCH_r{N}.json` instead of flattering it with warm
  * caches. Args: <names,comma-sep> [sfDir] [reps].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // JVM (not ICU) case mapping: the ASCII corpus makes them identical,
      // and ICU's CollationAwareUTF8String class-init stalls 20-110 s when
      // the JIT queue is busy (measured; first lower()/upper() pays it)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[benchone] warmup $n FAILED: $e") }
      println(f"[benchone] warmup $n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.catalog.clearCache()
    System.gc()

    names.foreach { name =>
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val ok =
          try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[benchone] $name FAILED: $e"); false
          }
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        spark.catalog.clearCache()
        System.gc()
        println(f"[benchone] $name rep$i $t%8.2fs")
        if (ok) t else -1.0
      }
      System.gc()
      println(f"[benchone] $name MIN ${times.filter(_ > 0).min}%8.2fs")
    }
    spark.stop()
  }
}
