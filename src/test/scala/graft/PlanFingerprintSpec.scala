package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fingerprint contract: stable across rebuilds and across data
  * LOCATION (paths are volatile), changed by plan STRUCTURE (a new
  * filter, a different aggregate) — otherwise the round-over-round
  * "hash unchanged ⇒ no plan mechanism" rule would be vacuous.
  */
class PlanFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeTiny(dir: String): Unit =
    spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")

  private lazy val (dirA, dirB) = {
    val a = java.nio.file.Files.createTempDirectory("graft_fp_a").toString
    val b = java.nio.file.Files.createTempDirectory("graft_fp_b").toString
    writeTiny(a); writeTiny(b)
    (a, b)
  }

  private def agg(dir: String) =
    spark.read.parquet(s"$dir/t.parquet")
      .groupBy("k").agg(sum("id").as("s"))

  test("same query built twice hashes identically (expr ids stripped)") {
    assert(PlanFingerprint.fingerprint(agg(dirA))._1 ==
      PlanFingerprint.fingerprint(agg(dirA))._1)
  }

  test("same query over a different directory hashes identically") {
    assert(PlanFingerprint.fingerprint(agg(dirA))._1 ==
      PlanFingerprint.fingerprint(agg(dirB))._1)
  }

  test("a structural change (added filter) changes the hash") {
    assert(PlanFingerprint.fingerprint(agg(dirA))._1 !=
      PlanFingerprint.fingerprint(agg(dirA).where(col("s") > 10))._1)
  }

  test("node histogram sees scan, aggregate, and exchange") {
    val (_, nodes) = PlanFingerprint.fingerprint(agg(dirA))
    val keys = nodes.keySet.mkString(",")
    assert(nodes.keys.exists(_.startsWith("FileScan")), keys)
    assert(nodes.keys.exists(_.contains("HashAggregate")), keys)
  }

  test("canonical form contains no absolute paths or expression ids") {
    val c = PlanFingerprint.canonical(agg(dirA))
    assert(!c.contains(dirA) && !c.contains("/tmp/"))
    assert(!"#\\d".r.findFirstIn(c).isDefined)
  }
}
