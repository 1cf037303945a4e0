package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev utility: stock WindowGroupLimit+Sort vs the custom two-phase heap
  * operator ([[graft.plans.TopKPerKey]]) on the same top-k-per-key query,
  * same session, interleaved reps. Usage:
  * `sbt "runMain graft.TopKCompare [sfDir] [k] [reps]"`.
  */
object TopKCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(3)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("topk-compare")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      // JVM (not ICU) case mapping: the ASCII corpus makes them identical,
      // and ICU's CollationAwareUTF8String class-init stalls 20-110 s when
      // the JIT queue is busy (measured; first lower()/upper() pays it)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def query() = {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      graft.sources.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= k)
    }

    def time(label: String): Double = {
      val t0 = System.nanoTime()
      query().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[$label] $t%.3fs")
      t
    }

    // warm both paths once, then interleave measured reps
    time("warm-stock")
    graft.plans.TopKPerKey.install(spark)
    time("warm-heap")
    val heapOn = query().queryExecution.executedPlan.toString.contains("TopKPerKey ")
    require(heapOn, "custom operator did not engage")
    var stockT = List.empty[Double]
    var heapT = List.empty[Double]
    (1 to reps).foreach { _ =>
      // no public uninstall for experimental hooks: toggle by swapping the
      // extraOptimizations list out and back
      val saved = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations = Nil
      stockT ::= time("stock")
      spark.experimental.extraOptimizations = saved
      heapT ::= time("heap")
    }
    println(f"stock_min=${stockT.min}%.3f heap_min=${heapT.min}%.3f " +
      f"speedup=${stockT.min / heapT.min}%.2fx k=$k sf=$sfDir")
    spark.stop()
  }
}
