package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print canonical-plan fingerprints for catalog entries —
  * run twice (fresh JVMs) and diff to prove a hash is stable, or before/
  * after a code edit to see exactly which entries replanned. Args:
  * [sfDir] [comma-separated entry names | "all"].
  *
  * Hashes are CONFIG-SENSITIVE (shuffle partition counts appear inside
  * `hashpartitioning(...)`, deliberately — a changed partitioning IS a
  * plan change): this main runs local[8]/8 like the other dev utilities,
  * so its hashes only compare against other PlanDump runs, not against
  * `PLANS_r{N}.json` (Bench at local[32]/32). Round-over-round PLANS
  * files compare cleanly because the bench config is fixed.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else Bench.headline
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val h = try PlanFingerprint.fingerprint(
        SparkEntry.queries(name)(spark, sfDir))._1
      catch { case e: Throwable => s"ERROR:${e.getClass.getSimpleName}" }
      println(s"[plan] $name $h")
    }
    spark.stop()
  }
}
