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
    // flags first, then positionals — `--write` in the positional slot
    // (a forgotten "all") must not be parsed as an entry-name list and
    // silently clobber the artifact with one ERROR row
    val writeTo = args.sliding(2).collectFirst {
      case Array("--write", f) => f }
    val positional = {
      val xs = scala.collection.mutable.ArrayBuffer(args.toSeq: _*)
      writeTo.foreach { f => xs --= Seq("--write", f) }
      require(!xs.exists(_.startsWith("--")), s"unknown flag in $args")
      xs.toSeq
    }
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (positional.length > 1 && positional(1) != "all")
        positional(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted // full catalog, like Bench's pass
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // plan fingerprints must be SESSION-STATE-INDEPENDENT: the default
      // 100-char metadata truncation cuts DataFilters/ReadSchema at a
      // RAW-character budget, so longer accumulated expression ids
      // (#12345 vs #12) shift the "..." cut point and change the
      // canonical hash with zero plan change (the r10 three-contexts-
      // three-hashes q05 mystery). A large budget removes truncation;
      // normalization then yields identical strings in any session.
      .config("spark.sql.maxMetadataStringLength", "100000")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Bench's session precondition, reproduced: the top-k-per-key rule +
    // strategy are installed as a SIDE EFFECT of building q39/q43/t09/…
    // during Bench's warmup, so every Bench fingerprint sees them.
    // Without this, entries that PLAN onto the operator (q09, s01, s03)
    // fingerprint the stock Sort/Window plan here — structurally wrong
    // hashes that would read as "replanned" against a benched artifact.
    graft.plans.TopKPerKey.install(spark)
    val rows = names.map { name =>
      val (h, nodes) =
        if (Bench.dataDependentPlans.contains(name))
          (Bench.dataDependentPlans(name), Map.empty[String, Int])
        else try PlanFingerprint.fingerprintNamed(SparkEntry.queries(name)(spark, sfDir), name)
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
