package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the persisted IVF-PQ index (build once, serve many): artifacts
  * round-trip exactly, serving reproduces the in-query operator
  * row-for-row, and the codes scan is partition-pruned to the probed
  * cells.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic unit-diverse corpus: dim 16, values a fixed function
  // of (id, coordinate) — no RNG, so build/serve/in-query all see the
  // identical doubles
  private def vec(i: Long): Seq[Double] =
    (0 until 16).map(d => math.sin(i * 0.37 + d * 1.13) + 0.01 * d)

  private lazy val corpus = (0L until 200L).map(i => (i, vec(i)))
    .toDF("vec_id", "embedding").repartition(8)
  private lazy val queries = corpus.where(col("vec_id") % 17 === 3)

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_ann_index").toString
    s"$d/idx"
  }
  private lazy val built = Similarity.saveIvfPqIndex(corpus, dir,
    m = 4, kCodes = 8, trainIters = 2, centroidMod = 23, lloydIters = 2)

  test("index artifacts round-trip exactly (centroids, codebooks, meta)") {
    built // force the lazy build before any read
    val loaded = Similarity.loadIvfPqIndex(spark, dir)
    assert(loaded.centIds.sameElements(built.centIds))
    assert(loaded.cents.length == built.cents.length)
    loaded.cents.zip(built.cents).foreach { case (a, b) =>
      assert(a.sameElements(b)) // binary-exact doubles through parquet
    }
    assert(loaded.model.subDim == built.model.subDim)
    assert(loaded.model.codebooks.size == built.model.codebooks.size)
    assert(loaded.model.codebooks.zip(built.model.codebooks).forall {
      case (la, ba) => la.size == ba.size &&
        la.zip(ba).forall { case (x, y) => x.sameElements(y) }
    })
  }

  test("served top-k ≡ in-query ivfPqTopK, ADC and refined paths") {
    built // force the lazy build before any read
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val servedAdc = rows(Similarity.servedIvfPqTopK(spark, dir, queries,
      k = 5, nProbe = 3))
    val inQueryAdc = rows(Similarity.ivfPqTopK(corpus, queries, built.model,
      k = 5, nProbe = 3, centroidMod = 23, lloydIters = 2))
    assert(servedAdc == inQueryAdc, "ADC path must reproduce in-query exactly")
    assert(servedAdc.nonEmpty && servedAdc.groupBy(_._1).values.forall(_.size == 5))
    val servedRef = rows(Similarity.servedIvfPqTopK(spark, dir, queries,
      k = 5, nProbe = 3, refine = 24, refineCorpus = Some(corpus)))
    val inQueryRef = rows(Similarity.ivfPqTopK(corpus, queries, built.model,
      k = 5, nProbe = 3, centroidMod = 23, lloydIters = 2, refine = 24))
    assert(servedRef == inQueryRef, "refined path must reproduce in-query exactly")
    // refine > 0 without the corpus is a named contract error
    val e = intercept[IllegalArgumentException](
      Similarity.servedIvfPqTopK(spark, dir, queries, k = 5, refine = 8))
    assert(e.getMessage.contains("refineCorpus"))
  }

  test("append extends the index with the stored model; twins surface at rank 1") {
    val d = java.nio.file.Files.createTempDirectory("graft_ann_append")
      .toString + "/idx"
    val half = corpus.where(col("vec_id") < 100)
    Similarity.saveIvfPqIndex(half, d, m = 4, kCodes = 8,
      trainIters = 2, centroidMod = 23, lloydIters = 2)
    val idx = Similarity.appendToIvfPqIndex(
      corpus.where(col("vec_id") >= 100), d)
    // all 200 vectors are in the codes table, every cell a stored centroid
    val codes = spark.read.parquet(s"$d/codes")
      .select(col("neighbor_id"), col("cell").cast("long").as("cell"))
    assert(codes.count() == 200)
    val cells = codes.select("cell").distinct().as[Long].collect().toSet
    assert(cells.subsetOf(idx.centIds.toSet))
    // a query IDENTICAL to an appended vector (different id) must find
    // its twin at rank 1 on the refined path — the appended half is live
    val twins = (0 until 3).map(j => (1000L + j, vec(150L + j)))
      .toDF("vec_id", "embedding")
    // vec() is near-periodic with Δi=17 (17·0.37 ≈ 2π), so each twin has
    // ~9 near-identical siblings whose PQ codes tie; the shortlist must
    // be wide enough that id-ordered tie-breaking can't cut the true
    // twin before the exact re-rank sees it
    val top1 = Similarity.servedIvfPqTopK(spark, d, twins, k = 1,
      nProbe = 3, refine = 64, refineCorpus = Some(corpus))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0 until 3).foreach(j =>
      assert(top1(1000L + j) == 150L + j, s"twin $j not found: $top1"))
  }

  test("annServeSink: streamed query batches ≡ batch serve per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    built // the shared index
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_stream")
    val outDir = s"$tmp/out"
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StatefulOps.annServeSink(
      stream.toDS().toDF("vec_id", "embedding"), dir, outDir, s"$tmp/cp",
      k = 3, nProbe = 2)
    val batches = Seq(Seq(500L, 501L), Seq(502L, 503L, 504L))
      .map(_.map(i => (i, vec(i * 7 + 1))))
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val direct = batches.map { b =>
      Similarity.servedIvfPqTopK(spark, dir,
        b.toDF("vec_id", "embedding"), k = 3, nProbe = 2)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSeq
    }.reduce(_ ++ _).sortBy(r => (r._1, r._2))
    assert(streamed == direct, s"streamed=$streamed direct=$direct")
    assert(streamed.groupBy(_._1).size == 5)
  }

  test("codes scan is partition-pruned to the probed cells") {
    val nCells = built.centIds.length // forces the build too
    val one = queries.limit(1)
    val served = Similarity.servedIvfPqTopK(spark, dir, one, k = 3, nProbe = 2)
    served.collect() // force execution so AQE finalizes the scan
    val finalPlan = served.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // query stages hold their subtree in .plan, not .children — walk both
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("codes")) =>
          Seq(s)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(scansOf)
    }
    val partsRead = scansOf(finalPlan).map(_.selectedPartitions.partitionCount).sum
    assert(partsRead <= 2 && partsRead >= 1,
      s"1-query nProbe=2 serve must read ≤2 of the $nCells cell partitions, read $partsRead")
    assert(nCells > 2, s"fixture must have >2 cells for the pin to mean anything ($nCells)")
  }
}
