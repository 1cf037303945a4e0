package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print canonical-plan fingerprints for catalog entries —
  * run twice (fresh JVMs) and diff to prove a hash is stable, or before/
  * after a code edit to see exactly which entries replanned. Args:
  * [sfDir] [comma-separated entry names | "all"] [--write <plansFile>].
  *
  * Hashes are CONFIG-SENSITIVE (shuffle partition counts appear inside
  * `hashpartitioning(...)`, deliberately — a changed partitioning IS a
  * plan change): this main defaults to local[8]/8 like the other dev
  * utilities, so its hashes only compare against other PlanDump runs at
  * the same `SPARK_GRAFT_CPUS`. To regenerate a round's `PLANS_r{N}
  * .json` without a full bench run, match the bench config:
  * `SPARK_GRAFT_CPUS=32 ... PlanDump /root/testdata/sf0.1 all --write
  * PLANS_r10.json` (same format, incl. node histograms and the
  * DATA_DEPENDENT markers).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else Bench.headline
    val writeTo = args.sliding(2).collectFirst {
      case Array("--write", f) => f }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = names.map { name =>
      val (h, nodes) =
        if (Bench.dataDependentPlans.contains(name))
          (Bench.dataDependentPlans(name), Map.empty[String, Int])
        else try PlanFingerprint.fingerprint(SparkEntry.queries(name)(spark, sfDir))
        catch { case e: Throwable =>
          (s"ERROR:${e.getClass.getSimpleName}", Map.empty[String, Int]) }
      println(s"[plan] $name $h")
      (name, h, nodes)
    }
    writeTo.foreach { f =>
      val entries = rows.map { case (name, h, nodes) =>
        val nodesJson = nodes.toSeq.sorted
          .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
        "\"" + name + "\":{\"plan_md5\":\"" + h + "\",\"nodes\":" + nodesJson + "}"
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (entries.mkString("{", ",\n", "}") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plan] wrote $f")
    }
    spark.stop()
  }
}
