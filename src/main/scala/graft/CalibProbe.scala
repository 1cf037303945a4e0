package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: Bench's two fixed-work calibration probes in isolation —
  * for framing an out-of-bench re-measurement (ProfileQ / ParseRate runs)
  * against the box state the bench numbers were taken under. Probe
  * definitions are [[Calib]]'s — the SAME code Bench stamps into
  * `BENCH_r{N}.json`, so the numbers compare by construction.
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-calib")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1L << 20).count() // absorb first-action init

    val (cpu, sink) = Calib.cpuProbeMs()
    val query = Calib.queryProbeMs(spark)
    println(f"[calib] cpu=$cpu%.0fms query=$query%.0fms (sink=$sink)")
    spark.stop()
  }
}
