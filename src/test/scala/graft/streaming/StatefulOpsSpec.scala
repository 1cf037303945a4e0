package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StatefulOps.{Click, SessionOut}

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Click]
    val sessions = StatefulOps.sessionize(stream.toDS(), gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_test").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then 2h later a
      // third (second session); a far-future event advances the watermark
      stream.addData(
        Click(1L, ts("2024-01-01 00:00:00")),
        Click(1L, ts("2024-01-01 00:10:00")),
        Click(1L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      stream.addData(Click(99L, ts("2024-01-02 00:00:00"))) // watermark push
      q.processAllAvailable()
      stream.addData(Click(98L, ts("2024-01-03 00:00:00"))) // flush timeouts
      q.processAllAvailable()
      val out = spark.table("sess_test").as[SessionOut].collect()
        .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(out.length == 2)
      assert(out(0).n_events == 2)
      assert(out(0).session_start == ts("2024-01-01 00:00:00"))
      assert(out(0).session_end == ts("2024-01-01 00:40:00")) // last + gap
      assert(out(1).n_events == 1)
    } finally q.stop()
  }

  test("transformWithState sessionization matches the flatMapGroupsWithState shape") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(StatefulOps.rocksdbConf._1)
    spark.conf.set(StatefulOps.rocksdbConf._1, StatefulOps.rocksdbConf._2)
    val stream = MemoryStream[Click]
    val sessions = StatefulOps.sessionizeTws(stream.toDS(), gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_tws_test").outputMode("append").start()
    try {
      stream.addData(
        Click(1L, ts("2024-01-01 00:00:00")),
        Click(1L, ts("2024-01-01 00:10:00")),
        Click(1L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      stream.addData(Click(99L, ts("2024-01-02 00:00:00"))) // watermark push
      q.processAllAvailable()
      stream.addData(Click(98L, ts("2024-01-03 00:00:00"))) // fire timers
      q.processAllAvailable()
      val out = spark.table("sess_tws_test").as[SessionOut].collect()
        .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(out.length == 2)
      assert(out(0).n_events == 2)
      assert(out(0).session_start == ts("2024-01-01 00:00:00"))
      assert(out(0).session_end == ts("2024-01-01 00:40:00")) // last + gap
      assert(out(1).n_events == 1)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(StatefulOps.rocksdbConf._1, v)
        case None => spark.conf.unset(StatefulOps.rocksdbConf._1)
      }
    }
  }

  test("streaming content dedup drops repeats within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val deduped = StatefulOps.dedupContentStream(
      stream.toDF().toDF("ts", "text"), "text", "ts")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_test").outputMode("append").start()
    try {
      stream.addData(
        (ts("2024-01-01 00:00:00"), "hello world"),
        (ts("2024-01-01 00:01:00"), "HELLO   world"), // same after normalize
        (ts("2024-01-01 00:02:00"), "different"))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 2)
    } finally q.stop()
  }

  test("incrementalCorpusSink: each batch near-dedupes against the growing corpus") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_inc_corpus")
    val corpusDir = s"$tmp/corpus"
    val stream = MemoryStream[(Long, String)]
    val q = StatefulOps.incrementalCorpusSink(
      stream.toDS().toDF("doc_id", "text"), corpusDir, s"$tmp/cp",
      shingleSize = 2, numHashes = 64, rowsPerBand = 4, threshold = 0.8)
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"),  // exact dup in batch
        (3L, "completely different content about spark engines here"))
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(corpusDir)
        .select("doc_id").as[Long].collect().sorted
      assert(afterB1.sameElements(Array(1L, 3L)))
      stream.addData(
        (10L, "THE QUICK brown fox jumps over the lazy dog"), // near-dup of kept 1
        (11L, "novel text with entirely fresh vocabulary tokens"))
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(corpusDir)
        .select("doc_id").as[Long].collect().sorted
      assert(afterB2.sameElements(Array(1L, 3L, 11L)))
    } finally q.stop()
  }

  test("curationSink: filter → self-dedup → corpus near-dedup → decontaminate per batch") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_curation")
    val corpusDir = s"$tmp/corpus"
    val eval = Seq((900L, "the benchmark question about spark shuffles and the answer is that"))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val q = StatefulOps.curationSink(
      stream.toDS().toDF("doc_id", "text"), eval, corpusDir, s"$tmp/cp",
      minToks = 8, decontamN = 6,
      shingleSize = 2, numHashes = 64, rowsPerBand = 4, threshold = 0.8)
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog and it is fine"),
        (2L, "the quick brown fox jumps over the lazy dog and it is fine"), // exact dup
        (3L, "too short"),                                                  // C4 short rule
        (4L, "the benchmark question about spark shuffles and the answer is that leaked here"), // contaminated
        (5L, "a completely different and is that it for the original document text here"))
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(corpusDir)
        .select("doc_id").as[Long].collect().sorted
      assert(afterB1.sameElements(Array(1L, 5L)))
      stream.addData(
        (10L, "THE QUICK brown fox jumps over the lazy dog and it is fine"), // near-dup of kept 1
        (11L, "novel tokens carrying the fresh vocabulary and it is that good for this"))
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(corpusDir)
        .select("doc_id").as[Long].collect().sorted
      assert(afterB2.sameElements(Array(1L, 5L, 11L)))
    } finally q.stop()
  }

  test("surprisalGateSink: streamed gate ≡ the batch t15 filter at the same cap") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_surp_gate")
    // reference corpus: ordinary sentences; the model is trained ONCE here
    val reference = Seq.tabulate(40) { i =>
      (i.toLong, s"the quick brown fox number $i jumps over the lazy dog and runs on")
    }.toDF("doc_id", "text")
    val model = graft.operators.TextAnalysis.bigramModel(reference, minCount = 4)
    // cap from the reference distribution, p05's 2×-mean rule
    val cap = 2 * (graft.operators.TextAnalysis
      .scoreBigramSurprisal(reference, model)
      .where(org.apache.spark.sql.functions.col("nb") > 0)
      .agg(org.apache.spark.sql.functions.expr("sum(surp_mean_e4) div count(1)"))
      .head.getLong(0))
    val arriving = Seq(
      (100L, "the quick brown fox number one jumps over the lazy dog and runs on"), // in-dist
      (101L, "zxq vvw qqj mmzk aleph xyzzy plugh grue wumpus farble garble snark"), // OOV gibberish
      (102L, "tiny"),                                                               // no bigrams
      (103L, "the quick brown fox number two jumps over the lazy dog and runs on"))
    val stream = MemoryStream[(Long, String)]
    val q = StatefulOps.surprisalGateSink(
      stream.toDS().toDF("doc_id", "text"), model, cap,
      s"$tmp/out", s"$tmp/cp")
    try {
      stream.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$tmp/out")
        .select("doc_id").as[Long].collect().sorted
      // batch truth: same model, same cap, same filter over the same docs
      val batchKept = graft.operators.TextAnalysis
        .scoreBigramSurprisal(arriving.toDF("doc_id", "text"), model)
        .where(org.apache.spark.sql.functions.col("nb") > 0 &&
          org.apache.spark.sql.functions.col("surp_mean_e4") <= cap)
        .select("doc_id").as[Long].collect().sorted
      assert(streamed.sameElements(batchKept), s"streamed=${streamed.toSeq} batch=${batchKept.toSeq}")
      // and the gate did real work: in-dist kept, gibberish + no-bigram dropped
      assert(streamed.contains(100L) && streamed.contains(103L))
      assert(!streamed.contains(101L) && !streamed.contains(102L))
    } finally q.stop()
  }

  test("classifyGateSink: streamed gate ≡ the batch t17 filter on the same labels") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_cls_gate")
    // labeled reference: two clearly-separated vocabularies
    val labeled = Seq(
      (0L, "spark shuffle executor partition stage codegen", "eng"),
      (1L, "executor stage shuffle spark partition plan", "eng"),
      (2L, "perro gato casa calle ciudad cielo", "spa"),
      (3L, "gato ciudad casa perro calle mar", "spa"))
      .toDF("doc_id", "text", "label")
    val model = graft.operators.TextAnalysis.nbTrain(labeled)
    val arriving = Seq(
      (100L, "spark executor shuffle stage"),   // eng → kept
      (101L, "perro casa gato ciudad"),         // spa → dropped
      (102L, "stage plan codegen partition"),   // eng → kept
      (103L, "cielo mar calle"))                // spa → dropped
    val stream = MemoryStream[(Long, String)]
    val q = StatefulOps.classifyGateSink(
      stream.toDS().toDF("doc_id", "text"), model, Seq("eng"),
      s"$tmp/out", s"$tmp/cp")
    try {
      stream.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$tmp/out")
        .select("doc_id").as[Long].collect().sorted
      val batchKept = graft.operators.TextAnalysis
        .nbScore(arriving.toDF("doc_id", "text"), model)
        .where(org.apache.spark.sql.functions.col("pred_label") === "eng")
        .select("doc_id").as[Long].collect().sorted
      assert(streamed.sameElements(batchKept),
        s"streamed=${streamed.toSeq} batch=${batchKept.toSeq}")
      assert(streamed.toSeq == Seq(100L, 102L))
    } finally q.stop()
  }

  test("enrich: stream-static broadcast join per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("us", "United States"), ("de", "Germany")).toDF("cc", "country")
    val stream = MemoryStream[(Long, String)]
    val enriched = StatefulOps.enrich(
      stream.toDS().toDF("user_id", "cc"), dim, Seq("cc"))
    val q = enriched.writeStream.format("memory")
      .queryName("enrich_test").outputMode("append").start()
    try {
      stream.addData((1L, "us"), (2L, "de"), (3L, "xx"))
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .select("user_id", "country").as[(Long, String)].collect()
        .map { case (u, c) => u -> Option(c) }.toMap
      assert(rows == Map(1L -> Some("United States"), 2L -> Some("Germany"),
        3L -> None)) // left_outer keeps unmatched stream rows
    } finally q.stop()
  }

  test("correlate: stream-stream interval join attributes within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = StatefulOps.correlate(
      clicks.toDS().toDF("user_id", "click_ts"),
      buys.toDS().toDF("user_id", "buy_ts"),
      key = "user_id", leftTs = "click_ts", rightTs = "buy_ts",
      watermark = "10 minutes", windowSeconds = 300)
    val q = joined.writeStream.format("memory")
      .queryName("correlate_test").outputMode("append").start()
    try {
      clicks.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
      buys.addData(
        (1L, ts("2024-01-01 00:03:00")),  // within 5 min of user 1's click → match
        (2L, ts("2024-01-01 00:09:00")))  // 9 min after → outside window
      q.processAllAvailable()
      val matched = spark.table("correlate_test")
        .select("user_id").as[Long].collect().toSeq
      assert(matched == Seq(1L))
    } finally q.stop()
  }

  test("correlate left_outer: unconverted clicks emit with null buys after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = StatefulOps.correlate(
      clicks.toDS().toDF("user_id", "click_ts"),
      buys.toDS().toDF("user_id", "buy_ts"),
      key = "user_id", leftTs = "click_ts", rightTs = "buy_ts",
      watermark = "1 minute", windowSeconds = 300,
      joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("correlate_outer_test").outputMode("append").start()
    try {
      clicks.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
      buys.addData((1L, ts("2024-01-01 00:03:00"))) // user 1 converts, user 2 never
      q.processAllAvailable()
      // push both watermarks past click+window+delay so the unmatched
      // left row's fate is decided; the emission then happens in a
      // subsequent trigger
      clicks.addData((99L, ts("2024-01-01 01:00:00")))
      buys.addData((99L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      clicks.addData((98L, ts("2024-01-01 02:00:00")))
      buys.addData((98L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      val rows = spark.table("correlate_outer_test")
        .selectExpr("user_id", "buy_ts IS NULL AS unmatched")
        .as[(Long, Boolean)].collect().toSet
      assert(rows.contains((1L, false)), s"user 1 should attribute: $rows")
      assert(rows.contains((2L, true)), s"user 2 should emit unmatched: $rows")
    } finally q.stop()
  }

  test("emaStream: in-order micro-batches ≡ batch TimeSeries.ema bit-exactly") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    implicit val sqlCtx = spark.sqlContext
    // per-key event-time-ordered batches, split mid-series so the carry
    // crosses micro-batch boundaries; 0.3/0.7 is deliberately NOT an
    // exact binary pair — the bit-equality claim is doing real work
    val batches = Seq(
      Seq((1L, 100L, 1L, 2.5), (1L, 200L, 2L, 4.25), (2L, 100L, 3L, 10.0)),
      Seq((1L, 300L, 4L, 8.125), (2L, 150L, 5L, 6.5)),
      Seq((1L, 400L, 6L, 1.75), (2L, 500L, 7L, 3.0), (3L, 10L, 8L, 9.9)))
    val stream = MemoryStream[(Long, Long, Long, Double)]
    def df(d: org.apache.spark.sql.DataFrame) = d
      .toDF("user_id", "t_us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
    val out = StatefulOps.emaStream(df(stream.toDF()), alpha = 0.3, beta = 0.7)
    val q = out.writeStream.format("memory")
      .queryName("ema_stream_test").outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // n is monotone per key → the max-n row is the latest update
    val streamed = spark.table("ema_stream_test")
      .groupBy("key").agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(col("n"), col("ema"))).as("s"))
      .select(col("key"), col("s.n"), col("s.ema"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val batch = graft.operators.TimeSeries.ema(
      df(batches.flatten.toDF()), "user_id", "ts", "event_id", "value",
      alpha = 0.3, beta = 0.7)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch(3L) == ((1L, 9.9))) // single-event key: ema = v₁
  }

  test("deltaStatsStream: in-order micro-batches ≡ batch TimeSeries.deltaStats") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    implicit val sqlCtx = spark.sqlContext
    // values chosen so positive deltas straddle the batch split (1: 5→2→9
    // with the 2→9 rise split across batches; 2: monotone down → 0)
    val batches = Seq(
      Seq((1L, 100L, 1L, 5L), (1L, 200L, 2L, 2L), (2L, 100L, 3L, 10L)),
      Seq((1L, 300L, 4L, 9L), (2L, 400L, 5L, 7L)),
      Seq((1L, 400L, 6L, 9L), (2L, 900L, 7L, 1L), (3L, 50L, 8L, 4L)))
    val stream = MemoryStream[(Long, Long, Long, Long)]
    def df(d: org.apache.spark.sql.DataFrame) = d
      .toDF("user_id", "t_us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
    val out = StatefulOps.deltaStatsStream(df(stream.toDF()))
    val q = out.writeStream.format("memory")
      .queryName("delta_stream_test").outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("delta_stream_test")
      .groupBy("key").agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(col("n"), col("delta_sum"),
          col("first_v"), col("last_v"), col("dt_us"),
          col("bounding_ratio"))).as("s"))
      .select(col("key"), col("s"))
      .as[(Long, (Long, Long, Long, Long, Long, Option[Double]))]
      .collect().toMap
    val batch = graft.operators.TimeSeries.deltaStats(
      df(batches.flatten.toDF()), "user_id", "ts", "event_id", "value")
      .select(col("user_id"), org.apache.spark.sql.functions.struct(
        col("n"), col("delta_sum"), col("first_v"),
        col("last_v"), col("dt_us"), col("bounding_ratio")).as("s"))
      .as[(Long, (Long, Long, Long, Long, Long, Option[Double]))]
      .collect().toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // hand-check key 1: deltas +0 (5→2), +7 (2→9), +0 (9→9) = 7
    assert(batch(1L)._2 == 7L)
    // single-instant key 3: dt 0 → NULL ratio
    assert(batch(3L)._5 == 0L && batch(3L)._6.isEmpty)
  }
}
