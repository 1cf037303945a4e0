package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Shuffle-budget regression gate: operators documented as map-only must
  * plan ZERO exchanges, and the single-exchange operators exactly one —
  * the 100 TB scale contract, pinned so a future refactor can't silently
  * add a shuffle. Counts come from the compiled physical plan (pre-AQE
  * shape — AQE only ever removes exchanges at runtime, never adds).
  */
class ShuffleBudgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exchange count of the compiled plan. AQE is disabled around the
    * compile so the counted plan is the post-EnsureRequirements shape
    * (AQE's inputPlan is pre-exchange-insertion and would undercount; AQE
    * itself only ever removes exchanges at runtime, never adds).
    */
  private def shuffles(mkDf: => DataFrame): Int = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = mkDf.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      plan.collect { case s: ShuffleExchangeLike => s }.size
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  // multi-partition source (spark.range, not a 1-partition local Seq) so a
  // SinglePartition input can't trivially satisfy a clustered distribution
  // and hide a required exchange
  private lazy val docs = spark.range(0, 200, 1, 8)
    .select(col("id").as("doc_id"),
      concat(lit("some words repeat here token"), col("id"),
        lit(" and more words follow")).as("text"))

  test("map-only operators plan zero exchanges") {
    assert(shuffles(TextAnalysis.tokenStats(docs)) == 0)
    assert(shuffles(TextAnalysis.qualityScore(docs)) == 0)
    assert(shuffles(TextAnalysis.c4Filters(docs)) == 0)
    assert(shuffles(TextAnalysis.repetitionSignals(docs)) == 0)
    assert(shuffles(TextAnalysis.langId(docs)) == 0)
    assert(shuffles(TextAnalysis.piiRedact(docs)) == 0)
    assert(shuffles(Sampling.chunkStride(docs, win = 6, stride = 4)) == 0)
    assert(shuffles(Sampling.mixtureSample(
      docs.withColumn("source", (col("doc_id") % 3).cast("string")),
      Map("0" -> 5000, "1" -> 10000, "2" -> 20000))) == 0)
    assert(shuffles(Sampling.hashSplit(docs)) == 0)
    assert(shuffles(Dedup.scrubIntraDocSpans(docs)) == 0)
    // decontamination: eval grams broadcast, train side map-only, and the
    // only exchanges belong to the tiny eval/contaminated-id sides
    val evalSet = docs.where(col("doc_id") % 20 === 3)
    val dec = Dedup.decontaminate(docs, evalSet)
    val total = shuffles(dec)
    assert(total <= 2, s"decontaminate planned $total exchanges")
  }

  test("single-exchange aggregation operators plan exactly one") {
    assert(shuffles(Dedup.exactGroups(docs)) == 1)
    assert(shuffles(TextAnalysis.vocabulary(docs)) <= 2) // partial+final distinct pair
  }

  test("keywordSearch scoring pass is exchange-free (corpus never shuffles)") {
    // the stats pass runs eagerly inside keywordSearch (driver scalar);
    // the RETURNED plan is the scoring pass — one map-only projection
    // into a global TakeOrdered, zero exchanges
    assert(shuffles(TextAnalysis.keywordSearch(docs, Seq("words", "token"))) == 0)
  }

  test("unkRewrite plans only the count-side exchange; rebuild is map-only") {
    // one exchange for the token-count aggregate (partial+final pair at
    // most) + the broadcast of the kept set; the corpus rebuild side must
    // not shuffle
    val n = shuffles(TextAnalysis.unkRewrite(docs, minCount = 2))
    assert(n <= 2, s"unkRewrite planned $n exchanges")
  }

  test("minhash signature build is exchange-free before banding") {
    val sigs = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 3, 32).as("sig"))
    assert(shuffles(sigs) == 0)
  }

  test("rarityScore: corpus text never shuffles, model side bounded") {
    // exchanges allowed: vocab-count partial+final pair, the scalar total,
    // and the per-doc aggregate pair — every one carries aggregated rows
    // (term/doc keys), never raw tokens; the vocab join must broadcast
    val n = shuffles(TextAnalysis.rarityScore(docs, minCount = 2))
    assert(n <= 5, s"rarityScore planned $n exchanges")
    val plan = TextAnalysis.rarityScore(docs, minCount = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "vocab lookup must be a broadcast join, not a shuffle join")
  }

  test("bigramSurprisal: both models broadcast; corpus text never shuffles") {
    // exchanges allowed: unigram + bigram count aggregates (partial+final
    // pairs), the scalar total, the per-doc aggregate, and the restore
    // join's doc-id sides — every one carries counted keys or per-doc
    // rows, never raw tokens; both model lookups must broadcast
    val n = shuffles(TextAnalysis.bigramSurprisal(docs, minCount = 2))
    assert(n <= 10, s"bigramSurprisal planned $n exchanges")
    val plan = TextAnalysis.bigramSurprisal(docs, minCount = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "model lookups must be broadcast joins, not shuffle joins")
  }

  test("paragraphDedup: occurrence side carries only (hash,id,pos); corpus moves once") {
    // exchanges allowed: the keeper aggregate (partial+final pair over
    // hashes), the cut join's occ side, the per-doc cut-set aggregate
    // pair, and the rebuild join's two doc-id sides — the only exchange
    // that can carry document text is the single rebuild join
    val n = shuffles(Dedup.paragraphDedup(docs, block = 4))
    assert(n <= 7, s"paragraphDedup planned $n exchanges")
    // same budget for the removal complement — identical occurrence side,
    // the ubiquity count replaces the keeper aggregate one-for-one
    val b = shuffles(Dedup.boilerplateStrip(docs, block = 4, minDocs = 3))
    assert(b <= 7, s"boilerplateStrip planned $b exchanges")
  }

  test("nbClassify: model/label tables broadcast; corpus-side exchange carries per-doc sums") {
    // exchanges allowed: the model and label-stat aggregates (all
    // vocabulary-bounded partial+final pairs) plus the per-(doc,label)
    // and per-doc aggregates and the restore join's doc-id sides — every
    // corpus-side exchange carries aggregated rows, never tokens; the
    // model probe and label fanout must broadcast
    val labeled = docs.withColumn("label", (col("doc_id") % 3).cast("string"))
    val n = shuffles(TextAnalysis.nbClassify(docs, labeled))
    assert(n <= 10, s"nbClassify planned $n exchanges")
    val plan = TextAnalysis.nbClassify(docs, labeled)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "model probe must be a broadcast join, not a shuffle join")
  }

  test("dsirWeights: ratio model broadcasts; doc exchange carries aggregates") {
    val target = docs.where(col("doc_id") % 5 === 2)
    val n = shuffles(Sampling.dsirWeights(docs, target, n = 2, buckets = 64))
    // model passes collapse onto ≤buckets keys (partial+final pairs) and
    // the scoring aggregate adds its own pair — all tiny or per-doc rows
    assert(n <= 7, s"dsirWeights planned $n exchanges")
    val plan = Sampling.dsirWeights(docs, target, n = 2, buckets = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "ratio lookup must be a broadcast join, not a shuffle join")
  }

  test("lloydRefine: aggregates only — no corpus-side window, bounded exchanges per iteration") {
    import graft.operators.Similarity
    // deterministic multi-partition embedding fixture
    val emb = spark.range(0, 200, 1, 8).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        i => ((col("id") * 31 + i) % 13).cast("double") - 6.0).as("embedding"))
    val queries = emb.where(col("vec_id") < 4)
    def plan(iters: Int) = Similarity.ivfTopK(emb, queries, k = 3,
      centroidMod = 37, lloydIters = iters)
    // corpus-side work must stay aggregate-shaped: the only windows in the
    // whole plan are the query-side probe/rank (partitioned by query_id);
    // a window on id/cent_id would mean Lloyd clustered the corpus
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = plan(2).queryExecution.optimizedPlan
    val badWindow = lp.exists {
      case w: LWindow => w.partitionSpec.exists(_.references.exists(r =>
        r.name == "id" || r.name == "cent_id" || r.name == "nid"))
      case _ => false
    }
    assert(!badWindow, lp.toString)
    // each iteration adds: assignment groupBy(id) + mean groupBy(cent_id,
    // pos) + rebuild groupBy(cent_id) — ≤ 3 exchange pairs' worth; pin the
    // per-iteration budget so a refactor can't sneak in a join/sort shuffle
    val base = shuffles(plan(0))
    val two = shuffles(plan(2))
    assert(two - base <= 12, s"lloyd added ${two - base} exchanges for 2 iterations")
  }

  test("PQ: encode is exchange-free; ADC scoring shuffles only the per-query top-k") {
    import graft.operators.Similarity
    val emb = spark.range(0, 200, 1, 8).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((col("id") * 31 + i) % 13).cast("double") - 6.0).as("embedding"))
    val model = Similarity.pqTrain(emb, m = 4, k = 4, iters = 1)
    // encode: codes against LITERAL codebooks — the corpus never shuffles
    assert(shuffles(Similarity.pqEncode(emb, model)) == 0)
    // scoring: corpus side is map-only lookups; the sole corpus-touching
    // exchange is the per-query rank window (heap top-k under TopKPerKey)
    val n = shuffles(Similarity.pqTopK(Similarity.pqEncode(emb, model),
      emb.where(col("vec_id") < 3), model, k = 3))
    assert(n <= 2, s"pqTopK planned $n exchanges")
  }

  test("BPE encode: merge table in-plan, strictly map-only") {
    import graft.operators.Bpe
    val model = Bpe.BpeModel(Vector(("s", "o"), ("so", "m")))
    assert(shuffles(Bpe.encode(docs, model)) == 0)
  }

  test("CDC chunking: chunk emission map-only; inventory shuffles keys, not text") {
    assert(shuffles(Dedup.cdcChunks(docs)) == 0)
    assert(shuffles(Dedup.cdcChunksNormalized(docs)) == 0)
    val inv = Dedup.cdcChunks(docs).groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_occ"))
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = inv.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      val ex = plan.collect { case s: ShuffleExchangeLike => s }
      assert(ex.size == 1, s"inventory planned ${ex.size} exchanges")
      // the shuffled row is (chunk_md5, partial count) — document text
      // and the per-char gear arrays never leave the scan stage
      val cols = ex.head.output.map(_.name.toLowerCase)
      assert(cols.exists(_.contains("chunk_md5")) &&
        !cols.exists(c => c.contains("text") || c.contains("__s") ||
          c.contains("gear")),
        s"exchange carries $cols")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("IVF-PQ: corpus side map-only (cells+codes), probe join broadcasts") {
    import graft.operators.Similarity
    val emb = spark.range(0, 200, 1, 8).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((col("id") * 31 + i) % 13).cast("double") - 6.0).as("embedding"))
    val model = Similarity.pqTrain(emb, m = 4, k = 4, iters = 1)
    // exchanges allowed: the per-query ADC rank window and the re-rank's
    // top-k window — the corpus-side assignment (broadcast centroid
    // kernel) and code scan add none; the probe and shortlist joins must
    // broadcast into the corpus
    val df = Similarity.ivfPqTopK(emb, emb.where(col("vec_id") < 3),
      model, k = 3, nProbe = 2, centroidMod = 37, refine = 8)
    val n = shuffles(df)
    assert(n <= 3, s"ivfPqTopK planned $n exchanges")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "probe/shortlist joins must broadcast into the corpus side")
  }

  test("CDC latest-wins snapshot: exactly one (map-side combined) exchange") {
    import graft.operators.Cdc
    val changelog = spark.range(0, 400, 1, 8).select(
      (col("id") % 50).as("k"), col("id").as("ver"),
      (col("id") % 7 === 0).as("dead"), concat(lit("p"), col("id")).as("payload"))
    val df = Cdc.latestSnapshot(changelog, Seq("k"), Seq("ver"), col("dead"))
    assert(shuffles(df) == 1)
    // and it must be an aggregate, not a window sort: partial max_by
    // combines map-side, so no Window/Sort operator may appear
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "latestSnapshot must not plan a window")
  }

  test("semi-hard triplets: anchors broadcast; corpus-touching exchanges bounded") {
    import graft.operators.Similarity
    val emb = spark.range(0, 200, 1, 8).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((col("id") * 31 + i) % 13).cast("double") - 6.0).as("embedding"),
      (col("id") % 5).cast("int").as("label"))
    val df = Similarity.semiHardTriplets(emb, emb.where(col("vec_id") < 4), k = 3)
    // allowed: the positive argmax aggregate and the negative rank window
    // (heap top-k) — the anchor and positive joins must broadcast
    val n = shuffles(df)
    assert(n <= 2, s"semiHardTriplets planned $n exchanges")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      "anchor/positive sides must broadcast into the corpus scan")
  }

  test("funnel/retention/percentile aggregates plan exactly one exchange") {
    import graft.operators.{Funnels, Sampling}
    val events = spark.range(0, 400, 1, 8).select(
      (col("id") % 50).as("user_id"), col("id").as("event_id"),
      timestamp_micros(col("id") * 1000).as("ts"),
      element_at(array(lit("A"), lit("B"), lit("C"), lit("X")),
        (col("id") % 4 + 1).cast("int")).as("event_type"))
    val steps = Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")
    assert(shuffles(Funnels.windowFunnel(events, steps, 1000000L)) == 1)
    assert(shuffles(Funnels.retention(events, steps)) == 1)
    // percentileRank: the rank window and the count window share the
    // stratum partitioning — one exchange total
    val scored = spark.range(0, 400, 1, 8).select(col("id").as("doc_id"),
      (col("id") % 5).cast("string").as("src"), (col("id") * 37 % 101).as("score"))
    assert(shuffles(Sampling.percentileRank(scored, "src", "score")) == 1)
  }

  test("PCA projection is strictly map-only (literal basis in-plan)") {
    import graft.operators.Similarity
    val emb = spark.range(0, 200, 1, 8).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((col("id") * 31 + i) % 13).cast("double") - 6.0).as("embedding"))
    val model = Similarity.pcaTrain(emb, nComponents = 3, powerIters = 10)
    assert(shuffles(Similarity.pcaProject(emb, model)) == 0)
    assert(shuffles(Similarity.pcaProject(emb, model, whiten = true)) == 0)
  }
}
