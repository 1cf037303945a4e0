package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** z01_self_checks folds the no-oracle entries' invariant flag
  * columns into (name, pass) rows so the driver's DuckDB compare fails
  * loudly if any self-check regresses. Pin here that (a) every expected
  * entry appears, (b) every verdict is true on real testdata, and (c) the
  * flag-column discovery actually found flags (a renamed column would
  * throw, not silently pass).
  */
class SelfCheckRollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sfDir = "/root/testdata/sf0.001"

  test("z01: every self-checked entry reports pass=true") {
    val rows = graft.SparkEntry.queries("z01_self_checks")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val expected = Set("d15_semantic_dedup_blocked", "q33_approx_sketches",
      "q48_hll_merge", "s02_ann_lsh", "s05_ann_ivf_lloyd", "s06_ann_pq",
      "s07_ann_ivfpq", "s09_pca_project", "s10_ann_pca_rerank",
      "s12_ann_index_serve",
      "t18_bpe_tokenize", "p07_tokenize_pack_pipeline", "t19_heavy_hitters",
      "t20_kll_quantiles", "t21_reservoir_sample", "t22_theta_set_ops",
      "t24_topk_weighted", "t25_histogram", "t27_kll_state_merge")
    assert(rows.keySet == expected, s"entries: ${rows.keySet}")
    rows.foreach { case (name, pass) => assert(pass, s"$name self-check failed") }
  }
}
