package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The minCount-deriving catalog entries compute thresholds as
  * `max(1, docCount/10)` — on a sub-10-doc corpus the unclamped form is 0,
  * which trips the `require(minCount >= 1)` in rarity/bigram/trigram and
  * silently keeps-everything in unkRewrite. Pin that EVERY such entry runs
  * a ≤9-doc corpus end-to-end without tripping a require.
  */
class TinyCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val tinyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tiny_sf").toString
    val docs = spark.range(6).select(
      col("id").as("doc_id"),
      concat(lit("the quick brown fox jumps over the lazy dog line "),
        col("id").cast("string")).as("text"),
      lit("en").as("lang"),
      lit("web").as("source"))
    docs.withColumn("n_chars", length(col("text")).cast("int"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  for (name <- Seq("t12_unk_rewrite", "t13_rarity_score",
    "t15_bigram_surprisal", "t16_trigram_surprisal",
    "p03_quality_curation_pipeline", "p05_perplexity_curation_pipeline"))
    test(s"$name runs a 6-doc corpus without tripping a minCount require") {
      val out = graft.SparkEntry.queries(name)(spark, tinyDir)
      assert(out.count() >= 0) // materialize — the invariant is "no throw"
    }

  lazy val tinyEmbDir: String = {
    val dir = tinyDir // share documents; add a 6-row dim-16 embeddings table
    spark.range(6).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((col("id") * 13 + i * 7) % 11).cast("float") / 10f).as("embedding"),
      (col("id") % 2).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // q58 reads TPC-H orders/customer: 3-row fixtures exercise the
    // degenerate-bucket path (8 buckets, 3 rows → most buckets empty)
    spark.range(3).select(
      col("id").as("o_orderkey"),
      (col("id") % 2).as("o_custkey"),
      (col("id") * 100 + 50).cast("double").as("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.range(2).select(
      col("id").as("c_custkey"),
      concat(lit("SEG"), (col("id") % 2).cast("string")).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // t25 reads events.value: 6 distinct values keep the histogram in
    // its exact regime on the tiny corpus
    spark.range(6).select(
      col("id").as("event_id"),
      timestamp_micros(col("id") * 1000000L).as("ts"),
      (col("id") % 2).as("user_id"),
      lit("view").as("event_type"),
      (col("id") * 7 + 1).cast("double").as("value"),
      lit("{\"k\": 3}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // r8 entries on degenerate inputs: a 6-row dim-16 embeddings table is
  // rank-deficient for s09's 8-component request (exercises the
  // rank-deficient whitening guard), gives s10 a 1-query recall harness,
  // and gives s08/s11 labels with ≤3 members; q53/q56/m04 run the 6-doc
  // documents table (single derived domain / singleton strata / tiny
  // byte grids)
  for (name <- Seq("q53_temperature_mixture", "q56_quality_percentile",
    "m04_phash_dedup", "s08_hard_negatives", "s09_pca_project",
    "s10_ann_pca_rerank", "s11_embedding_outliers",
    // r9 entries: p08 derives minCount = max(1, count/10) (the class this
    // spec exists for) and a single derived domain (uniform degeneracy);
    // t19's self-check must PASS, not just run, on a degenerate corpus
    "p08_doremi_mixture", "q58_bucketed_join",
    // r10: t20's sketch never compacts on 6 docs — varSum 0, bound 0,
    // ranks must be EXACT for the self-check to pass; t21's reservoir is
    // exhaustive below k (sample == corpus, size = n)
    "t20_kll_quantiles", "t21_reservoir_sample",
    // t22 below the sketch's exact threshold: estimates == exact counts
    "t22_theta_set_ops",
    // t23 on one (source, lang) group with 1 distinct n_chars: both
    // caps sit in the exact regime (u = 1)
    "t23_uniq_upto"))
    test(s"$name runs a 6-row corpus end-to-end") {
      val out = graft.SparkEntry.queries(name)(spark, tinyEmbDir)
      assert(out.count() >= 0)
    }

  test("t19_heavy_hitters self-check passes on a 6-doc corpus") {
    val out = graft.SparkEntry.queries("t19_heavy_hitters")(spark, tinyEmbDir)
      .select("pass").collect()
    assert(out.length == 1 && out.head.getBoolean(0))
  }

  test("t24_topk_weighted self-check passes on a 6-doc corpus") {
    // ~11 distinct terms all fit in the k=64 summary: estimates must be
    // the exact weighted totals and the bounds hold with zero slack
    val out = graft.SparkEntry.queries("t24_topk_weighted")(spark, tinyEmbDir)
      .select("pass").collect()
    assert(out.length == 1 && out.head.getBoolean(0))
  }

  // the sketch-family entries must not merely RUN on the degenerate
  // corpus — their self-check verdicts must hold there (t20: zero
  // compactions → exact ranks; t21: exhaustive below k; t22: exact
  // sketch regime → estimates equal the exact counts)
  for (name <- Seq("t20_kll_quantiles", "t21_reservoir_sample",
    "t22_theta_set_ops",
    // t25: 6 distinct values < B bins → the exact-table regime; every
    // invariant must hold with zero slack
    "t25_histogram"))
    test(s"$name self-check PASSES on the 6-row corpus") {
      val rows = graft.SparkEntry.queries(name)(spark, tinyEmbDir).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getAs[Boolean]("pass"), r.toString))
    }

  test("t19_heavy_hitters self-check passes vacuously when no doc tokenizes") {
    // whitespace-only texts: zero terms — nothing to summarize is a PASS
    // (empty sketch), not a null-flag failure
    val dir = java.nio.file.Files.createTempDirectory("graft_tiny_blank").toString
    spark.range(4).select(
        col("id").as("doc_id"), lit("   ").as("text"),
        lit("en").as("lang"), lit("web").as("source"),
        lit(3).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("t19_heavy_hitters")(spark, dir)
      .select("pass").collect()
    assert(out.length == 1 && out.head.getBoolean(0))
  }
}
