package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: Bench's two fixed-work calibration probes in isolation —
  * for framing an out-of-bench re-measurement (ProfileQ / ParseRate runs)
  * against the box state the bench numbers were taken under. Same probe
  * definitions as Bench (single-thread splitmix loop; constant
  * spark.range xxhash64 aggregate), median of 3.
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

    def medianOf3Ms(work: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e6
      }.sorted
      ts(1)
    }
    var sink = 0L
    val cpu = medianOf3Ms {
      var x = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < 300000000) {
        x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
        x ^= x >>> 27; x *= 0x94d049bb133111ebL
        x ^= x >>> 31
        i += 1
      }
      sink ^= x
    }
    val query = medianOf3Ms {
      spark.range(1L << 22).selectExpr("xxhash64(id) AS h")
        .agg(org.apache.spark.sql.functions.sum("h"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[calib] cpu=$cpu%.0fms query=$query%.0fms (sink=$sink)")
    spark.stop()
  }
}
