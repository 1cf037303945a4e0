package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time every catalog query at a given SF dir, printing one
  * line per query as it completes (slowest stragglers become obvious).
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only: Option[Set[String]] = if (args.length > 1) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // JVM (not ICU) case mapping: the ASCII corpus makes them identical,
      // and ICU's CollationAwareUTF8String class-init stalls 20-110 s when
      // the JIT queue is busy (measured; first lower()/upper() pays it)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.catalog.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .foreach { name =>
        val t0 = System.nanoTime()
        try {
          val n = SparkEntry.queries(name)(spark, sfDir).count()
          println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
        } catch {
          case e: Throwable =>
            println(f"[time] $name%-28s FAILED: ${e.getMessage.linesIterator.next()}")
        }
      }
    spark.stop()
  }
}
