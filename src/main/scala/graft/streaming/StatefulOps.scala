package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Stateful streaming operators (SURVEY §2.4 "stateful streaming ops"):
  * custom per-key state via `flatMapGroupsWithState`, plus the
  * watermark-scoped streaming dedup.
  *
  * Scale notes: state lives in the state store partitioned by key (one
  * shuffle on the key); event-time timeout + watermark bound state size —
  * without a timeout, per-key state grows forever at 100 TB/day rates.
  */
object StatefulOps {

  case class Click(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Int)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int)

  /** Event-time sessionization with a gap timeout, as custom keyed state:
    * the `flatMapGroupsWithState` analog of `session_window` (which covers
    * the aggregate-only case — this shape is for when per-session custom
    * logic/payload is needed).
    *
    * Emits a session when the event-time timeout fires (watermark passed
    * session end + gap).
    */
  def sessionize(
      clicks: Dataset[Click],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import clicks.sparkSession.implicits._
    clicks
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start), new Timestamp(s.end + gapMs), s.n))
          } else {
            val ts = events.map(_.ts.getTime).toSeq.sorted
            // merge the batch into (possibly) the open session; close any
            // session a later event's gap proves finished
            val (closed, open) = foldSessions(state.getOption, ts, gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator.map(s =>
              SessionOut(user, new Timestamp(s.start), new Timestamp(s.end + gapMs), s.n))
          }
      }
  }

  /** Session fold shared by [[sessionize]] (flatMapGroupsWithState) and
    * [[SessionProcessor]] (transformWithState): merge a sorted batch of
    * event times into the open session, closing any session an event's
    * gap proves finished.
    */
  private[streaming] def foldSessions(
      open0: Option[SessionState], sortedTs: Seq[Long], gapMs: Long):
      (Vector[SessionState], Option[SessionState]) =
    sortedTs.foldLeft((Vector.empty[SessionState], open0)) {
      case ((done, Some(s)), t) if t < s.end + gapMs =>
        (done, Some(s.copy(end = math.max(s.end, t), n = s.n + 1)))
      case ((done, Some(s)), t) => (done :+ s, Some(SessionState(t, t, 1)))
      case ((done, None), t)    => (done, Some(SessionState(t, t, 1)))
    }

  /** Event-time sessionization on the `transformWithState` API (the
    * arbitrary-state successor to flatMapGroupsWithState, Spark 4.x):
    * typed `ValueState` + an explicit per-key event-time TIMER closes the
    * session once the watermark passes `end + gap`. Requires the RocksDB
    * state store provider ([[rocksdbConf]]); state is still keyed and
    * store-partitioned, so the scale envelope matches [[sessionize]] —
    * one shuffle on the key, state bounded by the timer.
    *
    * Timers accumulate per key (registering does not replace), so every
    * batch re-arms a timer for the current session end and the expiry
    * handler only closes when the FIRED timer is the session's real
    * deadline — stale timers from an extended session no-op.
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Click, SessionOut] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Click],
        tv: TimerValues): Iterator[SessionOut] = {
      val ts = rows.map(_.ts.getTime).toSeq.sorted
      val (closed, open) =
        foldSessions(if (session.exists()) Some(session.get()) else None, ts, gapMs)
      open.foreach { s =>
        session.update(s)
        getHandle.registerTimer(s.end + gapMs)
      }
      closed.iterator.map(s =>
        SessionOut(user, new Timestamp(s.start), new Timestamp(s.end + gapMs), s.n))
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      val s = if (session.exists()) session.get() else null
      if (s != null && s.end + gapMs <= info.getExpiryTimeInMs) {
        session.clear()
        Iterator(SessionOut(user, new Timestamp(s.start), new Timestamp(s.end + gapMs), s.n))
      } else Iterator.empty // stale timer: the session was extended past it
    }
  }

  /** Session conf required for transformWithState (RocksDB-only API). */
  val rocksdbConf: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** [[sessionize]] re-expressed on transformWithState. */
  def sessionizeTws(clicks: Dataset[Click], gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import clicks.sparkSession.implicits._
    clicks
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming dedup: first occurrence per key within the watermark
    * horizon (`dropDuplicates` + watermark keeps the seen-keys state
    * bounded — the streaming face of `Dedup.exactDedup`).
    */
  def dedupStream(lines: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    lines.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Streaming exact-dedup on content hash: drop every line whose
    * normalized content was already seen inside the watermark window.
    */
  def dedupContentStream(lines: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    lines.withColumn("__content_hash",
      md5(graft.operators.Dedup.normalize(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicates(Seq("__content_hash"))
      .drop("__content_hash")

  /** Incremental corpus maintenance as a stream: every micro-batch of
    * documents is (a) exact-deduped within itself, (b) near-deduped
    * against everything already KEPT ([[graft.operators.Dedup
    * .crossCorpusSurvivors]] — MinHash bands, exact-Jaccard verify), and
    * the survivors are appended to the corpus — the continuously-growing
    * training-corpus loop (each crawl batch dedupes against the corpus,
    * never the corpus against itself).
    *
    * Delivery: `foreachBatch` + checkpoint replays a failed batch with the
    * same batchId; the append itself is not transactional, so a crash
    * between append and commit can duplicate a batch's survivors — same
    * at-least-once envelope as the reference's retried inserts
    * (`internal/services/filelog/impl.go:64`). At 100 TB the corpus band
    * table is maintained as a bucketed table keyed on (band, bucket)
    * rather than recomputed per batch (see crossCorpusSurvivors scaladoc);
    * this entrypoint recomputes it, which is exact at any scale, just not
    * the cheapest incremental form.
    */
  def incrementalCorpusSink(
      docs: DataFrame, corpusDir: String, checkpointDir: String,
      textCol: String = "text", idCol: String = "doc_id",
      shingleSize: Int = 3, numHashes: Int = 96, rowsPerBand: Int = 4,
      threshold: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val selfDeduped = graft.operators.Dedup.exactDedup(batch.toDF(), textCol, idCol)
        val survivors =
          if (!corpusExists(spark, corpusDir)) selfDeduped
          else graft.operators.Dedup.crossCorpusSurvivors(
            selfDeduped, spark.read.parquet(corpusDir),
            textCol, idCol, shingleSize, numHashes, rowsPerBand, threshold)
        survivors.write.mode("append").parquet(corpusDir)
      }
      .start()

  /** Continuously-curated corpus sink — the streaming form of the p01
    * batch pipeline: every micro-batch of raw documents is (a) filtered
    * by the C4/Gopher heuristics, (b) exact-deduped within itself,
    * (c) near-deduped against everything already KEPT (MinHash bands +
    * exact verify), (d) n-gram-decontaminated against a fixed eval set,
    * and the survivors append to the corpus. Same at-least-once envelope
    * as [[incrementalCorpusSink]] (checkpointed foreachBatch; the append
    * itself is not transactional).
    */
  def curationSink(
      docs: DataFrame, evalSet: DataFrame, corpusDir: String, checkpointDir: String,
      textCol: String = "text", idCol: String = "doc_id",
      minToks: Int = 15, decontamN: Int = 8,
      shingleSize: Int = 3, numHashes: Int = 96, rowsPerBand: Int = 4,
      threshold: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val keepIds = graft.operators.TextAnalysis
          .c4Filters(batch.toDF(), minToks, textCol, idCol)
          .where(col("keep")).select(idCol)
        val kept = batch.toDF().join(keepIds, Seq(idCol), "left_semi")
        val selfDeduped = graft.operators.Dedup.exactDedup(kept, textCol, idCol)
        val nearDeduped =
          if (!corpusExists(spark, corpusDir)) selfDeduped
          else graft.operators.Dedup.crossCorpusSurvivors(
            selfDeduped, spark.read.parquet(corpusDir),
            textCol, idCol, shingleSize, numHashes, rowsPerBand, threshold)
        val clean = graft.operators.Dedup.decontaminate(
          nearDeduped, evalSet, textCol, idCol, decontamN)
        clean.write.mode("append").parquet(corpusDir)
      }
      .start()

  /** Storage-agnostic existence probe for the corpus directory: resolved
    * through Hadoop's FileSystem so the check holds on HDFS/S3/ABFS, not
    * just the local filesystem (a `java.io.File` probe is always false on
    * remote storage, which would silently skip the cross-corpus dedup
    * stage forever).
    */
  private def corpusExists(
      spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Streaming perplexity gate — CCNet's LM filter as a stream stage:
    * score each arriving micro-batch against a BATCH-TRAINED bigram
    * model ([[graft.operators.TextAnalysis.bigramModel]] over a
    * reference corpus; the t15/p05 scoring, unchanged) and keep docs at
    * or under `capE4` (surp_mean_e4 units; compute it from the reference
    * corpus like p05's 2×-mean). Runs in foreachBatch because the
    * scoring pass aggregates per doc — inside a micro-batch that is a
    * plain bounded aggregation, no stream state, and the model tables
    * broadcast per batch exactly like [[enrich]]'s dimension. Docs with
    * no bigrams (nb = 0) are dropped as unscoreable, CCNet's treatment
    * of too-short lines. At-least-once into the parquet sink
    * (checkpointed foreachBatch), same envelope as [[curationSink]].
    */
  def surprisalGateSink(
      docs: DataFrame, model: graft.operators.TextAnalysis.BigramModel,
      capE4: Long, outDir: String, checkpointDir: String,
      textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // pin the model tables for the stream's lifetime: they are lazy
    // aggregations over the reference corpus, and without the persist
    // every micro-batch would re-tokenize and re-count the whole
    // reference — the d17/p03 persist rule applied to streaming
    model.model.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    model.uni.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val kept = graft.operators.TextAnalysis
          .scoreBigramSurprisal(batch.toDF(), model, textCol, idCol)
          .where(col("nb") > 0 && col("surp_mean_e4") <= capE4)
          .select(col("doc_id").as(idCol))
        batch.toDF().join(kept, Seq(idCol), "left_semi")
          .write.mode("append").parquet(outDir)
      }
      .start()
  }

  /** Streaming classifier gate — the fastText-shaped supervised filter
    * as a stream stage (CCNet runs exactly this for language ID before
    * its perplexity gate): score each arriving micro-batch against a
    * BATCH-TRAINED Naive Bayes model
    * ([[graft.operators.TextAnalysis.nbTrain]] over a labeled reference
    * set; the t17 scoring, unchanged) and keep only docs whose predicted
    * label is in `keepLabels`. Same envelope as [[surprisalGateSink]]:
    * foreachBatch (per-batch bounded aggregation, no stream state), the
    * Zipf-small model tables pinned for the stream's lifetime and
    * broadcast into every batch, at-least-once into the parquet sink.
    */
  def classifyGateSink(
      docs: DataFrame, model: graft.operators.TextAnalysis.NbModel,
      keepLabels: Seq[String], outDir: String, checkpointDir: String,
      textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    model.lab.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    model.model.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val kept = graft.operators.TextAnalysis
          .nbScore(batch.toDF(), model, textCol, idCol)
          .where(col("pred_label").isin(keepLabels: _*))
          .select(col("doc_id").as(idCol))
        batch.toDF().join(kept, Seq(idCol), "left_semi")
          .write.mode("append").parquet(outDir)
      }
      .start()
  }

  case class FunnelLevel(user_id: Long, level: Int)

  /** Streaming funnel tracking — [[graft.operators.Funnels.windowFunnel]]
    * as live per-user keyed state: every micro-batch advances each active
    * user's funnel DP state (the per-level maximal chain-start array — a
    * handful of longs per user, NOT the user's event history) and emits
    * the user's current level in Update mode. The real-time "how far down
    * the funnel is this user" board.
    *
    * Ordering contract: the batch operator sorts a user's whole history;
    * a stream cannot. Within a micro-batch the group's events are sorted
    * by (ts, id); ACROSS batches the fold assumes event-time-ordered
    * arrival (the funnel-tracking norm), and a `t ≥ chain-start` guard
    * rejects chains a time-traveling late event would otherwise form —
    * late events can under-count a level (their rightful chain position
    * is behind the state), never over-count. Streamed-in-order ≡ batch
    * (spec-pinned).
    *
    * State eviction (`evictAfter`): pass a watermark delay (e.g.
    * `"10 minutes"`) to bound the state store on a long-running stream —
    * without it per-user state is tiny (n+1 longs) but the KEY SPACE is
    * every user ever seen, growing monotonically. With eviction on, a
    * watermark rides `tsCol` and a user's state is dropped once the
    * watermark passes `last event + windowMicros`: by then every
    * recorded chain start `s ≤ last` has `watermark − s > windowMicros`,
    * so no in-order future event can extend a recorded chain — the
    * frozen state is equivalent to fresh state for all future folding,
    * and eviction is exact to the watermark's millisecond granularity
    * (the timer target rounds the micros horizon UP to the next ms, so
    * it never fires early; the final level is emitted once more as the
    * timer fires). A user who reappears later starts a new
    * funnel journey from level 0 — the live-board reading; the
    * monotone-level view of a user's lifetime is the batch operator's
    * job.
    */
  def funnelStream(events: DataFrame, steps: Seq[org.apache.spark.sql.Column],
      windowMicros: Long, userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id",
      evictAfter: Option[String] = None): Dataset[FunnelLevel] = {
    require(steps.nonEmpty && windowMicros >= 0)
    val n = steps.size
    val spark = events.sparkSession
    import spark.implicits._
    val Unreached = Long.MinValue
    val src = evictAfter.map(d => events.withWatermark(tsCol, d)).getOrElse(events)
    val timeout =
      if (evictAfter.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    def level(best: Array[Long]): Int = best.lastIndexWhere(_ != Unreached) + 1
    // state = n per-level max chain starts + the max event time seen
    // (slot n, drives the eviction timer)
    // the raw tsCol rides along (field 5, unused by the fold) so the
    // watermark TAG survives projection — deriving `t` alone strips the
    // event-time metadata and the event-time timeout is rejected
    src.select(col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol)).as("t"), col(idCol).cast("long").as("id"),
        array(steps.map(s => coalesce(s.cast("boolean"), lit(false))): _*).as("conds"),
        col(tsCol).as("wm_ts"))
      .as[(Long, Long, Long, Seq[Boolean], java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], FunnelLevel](
        OutputMode.Update(), timeout) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            // frozen journey: emit the final level once and drop the state
            val best = state.get.take(n).toArray
            state.remove()
            Iterator(FunnelLevel(user, level(best)))
          } else {
            val stored = state.getOption.getOrElse(Seq.fill(n + 1)(Unreached))
            val best = stored.take(n).toArray
            var lastT = stored(n)
            rows.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, t, _, conds, _) =>
              val prev = best.clone() // pre-event snapshot: no same-event chains
              var k = 0
              while (k < n) {
                if (k == 0) { if (conds(0)) best(0) = math.max(best(0), t) }
                else if (conds(k) && prev(k - 1) != Unreached &&
                  t >= prev(k - 1) && t - prev(k - 1) <= windowMicros)
                  best(k) = math.max(best(k), prev(k - 1))
                k += 1
              }
              lastT = math.max(lastT, t)
            }
            state.update(best.toSeq :+ lastT)
            if (evictAfter.isDefined && lastT != Unreached) {
              // fire once the watermark proves no recorded chain can grow;
              // clamp above the current watermark (a very-late-only user
              // would otherwise set an already-expired timer, which throws)
              // sum in micros BEFORE the ms floor: flooring each term
              // separately can land the timer ~1ms before the true
              // lastT+windowMicros horizon (a non-late event in that
              // sliver would find its state already evicted)
              val target = (lastT + windowMicros) / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(target, state.getCurrentWatermarkMs() + 1L))
            }
            Iterator(FunnelLevel(user, level(best)))
          }
      }
  }

  /** Live STRICT-mode funnel tracking — [[graft.operators.Funnels
    * .windowFunnelStrict]] as per-user keyed state, batch/stream parity
    * by construction:
    *
    *   - dedup/order (± increase): the state IS the scalar strict-scan
    *     array (2·levels+2 longs), advanced by the SAME
    *     `Funnels.strictScalarEvent` the batch fold mirrors. Once the
    *     scan terminates the level is frozen (late events cannot change
    *     a terminated result); until then the cross-batch in-order
    *     contract applies — a late event is folded at arrival position,
    *     which can miss a termination an in-order replay would have hit.
    *
    *   - pure strict_increase: the exact timestamp-group DP with a
    *     commit/pending pair per level — `best` holds chains whose last
    *     event is strictly before the current group time, `pend` folds
    *     the current group against that snapshot, and a later timestamp
    *     commits pend into best. Same-ts events SPLIT ACROSS
    *     MICRO-BATCHES still read the pre-group snapshot (curT tracks
    *     the open group), so in-order streams reproduce the batch DP
    *     exactly, ties included; events older than the open group are
    *     dropped (under-count, never over-count). State = 2·levels+2
    *     longs.
    *
    * Update-mode output `(user, level)` per batch. UNLIKE the default
    * funnel, the strict level is NOT monotone: a dedup termination
    * reports the repeated level, which can be LOWER than the deepest
    * already emitted — consumers must read the LATEST update per user,
    * not the max. `evictAfter` arms the same watermark eviction as
    * [[funnelStream]], but for the sequential modes it is a POLICY
    * cutoff, not an exactness horizon: a duplicate or no-step event is
    * not window-bounded, so an event arriving after eviction would still
    * have terminated a batch scan — evicted journeys freeze at their
    * level as of eviction.
    */
  def funnelStrictStream(events: DataFrame,
      steps: Seq[org.apache.spark.sql.Column], windowMicros: Long,
      strictDedup: Boolean = false, strictOrder: Boolean = false,
      strictIncrease: Boolean = false,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id",
      evictAfter: Option[String] = None): Dataset[FunnelLevel] = {
    require(steps.nonEmpty && windowMicros >= 0)
    require(strictDedup || strictOrder || strictIncrease,
      "no strict flag set — use funnelStream for the default mode")
    val n = steps.size
    val spark = events.sparkSession
    import spark.implicits._
    val Unreached = Long.MinValue
    val sequential = strictDedup || strictOrder
    val src = evictAfter.map(d => events.withWatermark(tsCol, d)).getOrElse(events)
    val timeout =
      if (evictAfter.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // state = mode-specific slots ++ (max event time seen) for eviction;
    // wm_ts rides along so the watermark tag survives projection (see
    // funnelStream)
    val stateLen = 2 * n + 3 // sequential: first|last|fe|res|lastT
    val dpLen = 2 * n + 2 //   increase DP: best|pend|curT|lastT
    def seqLevel(st: Array[Long]): Int =
      graft.operators.Funnels.strictScalarLevel(st, n)
    def dpLevel(st: Array[Long]): Int = {
      var c = 0
      while (c < n && st(n + c) != Unreached) c += 1 // pend incl. open group
      c
    }
    src.select(col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol)).as("t"), col(idCol).cast("long").as("id"),
        array(steps.map(s => coalesce(s.cast("boolean"), lit(false))): _*).as("conds"),
        col(tsCol).as("wm_ts"))
      .as[(Long, Long, Long, Seq[Boolean], java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], FunnelLevel](
        OutputMode.Update(), timeout) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            val st = state.get.toArray
            state.remove()
            Iterator(FunnelLevel(user,
              if (sequential) seqLevel(st) else dpLevel(st)))
          } else {
            val init =
              if (sequential)
                Array.fill(stateLen)(Unreached)
                  .updated(2 * n, 0L).updated(2 * n + 1, -1L)
              else Array.fill(dpLen)(Unreached)
            val st = state.getOption.map(_.toArray).getOrElse(init)
            val lastSlot = st.length - 1
            rows.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, t, _, conds, _) =>
              if (sequential)
                graft.operators.Funnels.strictScalarEvent(st, n, t, conds,
                  windowMicros, strictDedup, strictOrder, strictIncrease)
              else {
                // exact ts-group DP: commit the open group on a strictly
                // later timestamp, fold equal-ts events against the
                // committed snapshot, drop older-than-open-group events
                val curT = st(2 * n)
                if (curT == Unreached || t > curT) {
                  var j = 0
                  while (j < n) { st(j) = st(n + j); j += 1 } // commit pend
                  st(2 * n) = t
                }
                if (st(2 * n) == t) {
                  if (conds(0)) st(n) = math.max(st(n), t)
                  var k = 1
                  while (k < n) {
                    if (conds(k) && st(k - 1) != Unreached &&
                      t - st(k - 1) <= windowMicros)
                      st(n + k) = math.max(st(n + k), st(k - 1))
                    k += 1
                  }
                }
              }
              st(lastSlot) =
                if (st(lastSlot) == Unreached) t else math.max(st(lastSlot), t)
            }
            state.update(st.toSeq)
            val lastT = st(lastSlot)
            if (evictAfter.isDefined && lastT != Unreached) {
              val target = (lastT + windowMicros) / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(target, state.getCurrentWatermarkMs() + 1L))
            }
            Iterator(FunnelLevel(user,
              if (sequential) seqLevel(st) else dpLevel(st)))
          }
      }
  }

  case class EmaOut(key: Long, n: Long, ema: Double)
  case class DeltaStatsOut(key: Long, n: Long, delta_sum: Long,
      first_v: Long, last_v: Long, dt_us: Long,
      bounding_ratio: Option[Double])

  /** Live EMA per key — [[graft.operators.TimeSeries.ema]] as keyed
    * state, the r11 time-series family's streaming leg (the funnelStream
    * pattern). State = (n, ema): each micro-batch's rows fold in (ts,
    * tiebreak) order onto the carried smoothed value with the IDENTICAL
    * recurrence `s ← α·v + β·s` — JVM doubles are strict IEEE (JEP 306)
    * and Spark's codegen'd Multiply/Add are the same ops, so in-order
    * streams reproduce the batch fold BIT-EXACTLY across any micro-batch
    * split (proved in StatefulOpsSpec).
    *
    * Ordering contract (the funnelStrictStream convention): rows sort
    * within a micro-batch, but a LATE row (older than the folded
    * horizon) folds at arrival position — EMA is order-defined, so
    * out-of-order delivery diverges from batch; bound lateness upstream
    * with a watermark + dropped-late policy if the input can be late.
    * Update-mode output (key, n, ema) per batch; read the LATEST row per
    * key.
    */
  def emaStream(events: DataFrame, alpha: Double, beta: Double,
      keyCol: String = "user_id", tsCol: String = "ts",
      tieBreakCol: String = "event_id", valueCol: String = "value")
      : Dataset[EmaOut] = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta < 1,
      s"alpha=$alpha beta=$beta")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("t"),
        col(tieBreakCol).cast("long").as("i"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), EmaOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          var (n, ema) = state.getOption.getOrElse((0L, 0.0))
          rows.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, _, _, v) =>
            ema = if (n == 0L) v else alpha * v + beta * ema
            n += 1L
          }
          state.update((n, ema))
          Iterator(EmaOut(key, n, ema))
      }
  }

  /** Live deltaSum/boundingRatio per key —
    * [[graft.operators.TimeSeries.deltaStats]] as keyed state. State =
    * (n, lastV, firstV, lastStruct-equivalent, minT, maxT, deltaSum) —
    * seven longs; every field is integer-exact, so in-order streams
    * equal the batch aggregate EXACTLY across any micro-batch split
    * (consecutive-pair deltas that straddle a batch boundary fold
    * against the carried lastV). Same ordering contract as [[emaStream]].
    * Update-mode output mirrors the batch schema; read the latest row
    * per key.
    */
  def deltaStatsStream(events: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      tieBreakCol: String = "event_id", valueCol: String = "value")
      : Dataset[DeltaStatsOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    // state: (n, lastV in fold order, firstV at min (t,i), lastV at max
    // (t,i), minT, maxT, deltaSum); fold order == (t, i) order under the
    // in-order contract, so slots 2 and 3 track the ORDER extremes the
    // batch min_by/max_by read
    events.select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("t"),
        col(tieBreakCol).cast("long").as("i"),
        col(valueCol).cast("long").as("v"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], DeltaStatsOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          val st = state.getOption.map(_.toArray).getOrElse(null)
          var n = if (st == null) 0L else st(0)
          var lastFold = if (st == null) 0L else st(1)
          var firstV = if (st == null) 0L else st(2)
          var lastV = if (st == null) 0L else st(3)
          var minT = if (st == null) Long.MaxValue else st(4)
          var maxT = if (st == null) Long.MinValue else st(5)
          var deltaSum = if (st == null) 0L else st(6)
          var firstOrd = if (st == null) (Long.MaxValue, Long.MaxValue)
            else (st(7), st(8))
          var lastOrd = if (st == null) (Long.MinValue, Long.MinValue)
            else (st(9), st(10))
          def ordLt(a: (Long, Long), b: (Long, Long)): Boolean =
            a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
          rows.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, t, i, v) =>
            if (n > 0L) { val dv = v - lastFold; if (dv > 0L) deltaSum += dv }
            lastFold = v
            if (ordLt((t, i), firstOrd)) { firstOrd = (t, i); firstV = v }
            if (ordLt(lastOrd, (t, i))) { lastOrd = (t, i); lastV = v }
            minT = math.min(minT, t)
            maxT = math.max(maxT, t)
            n += 1L
          }
          state.update(Seq(n, lastFold, firstV, lastV, minT, maxT, deltaSum,
            firstOrd._1, firstOrd._2, lastOrd._1, lastOrd._2))
          val dt = maxT - minT
          Iterator(DeltaStatsOut(key, n, deltaSum, firstV, lastV, dt,
            if (dt > 0L) Some((lastV - firstV).toDouble / dt.toDouble)
            else None))
      }
  }

  /** Streaming CDC materializer — [[graft.operators.Cdc]]'s latest-wins
    * compaction as a stream stage: each micro-batch changelog is
    * pre-compacted to one record per key (tombstones KEPT — they must
    * shadow older log entries at read time) and appended as a
    * merge-on-read log segment. Readers get the snapshot via
    * [[graft.operators.Cdc.readSnapshot]]; a maintenance pass folds the
    * log with [[graft.operators.Cdc.compactLog]] — the streaming half of
    * the ReplacingMergeTree contract the reference's generated DDL
    * delegates to ClickHouse.
    *
    * Delivery: checkpointed foreachBatch appends are at-least-once, but
    * UNLIKE the corpus sinks a replayed batch is harmless — latest-wins
    * merge is idempotent (a duplicated (key, version) record collapses
    * in the next read's max_by), so the MATERIALIZED SNAPSHOT has
    * effective exactly-once semantics over an at-least-once log.
    */
  def cdcLogSink(changes: DataFrame, logDir: String, checkpointDir: String,
      keyCols: Seq[String], versionCols: Seq[String],
      tombstone: org.apache.spark.sql.Column)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Cdc
          .compactChangelog(batch.toDF(), keyCols, versionCols, tombstone)
          .write.mode("append").parquet(logDir)
      }
      .start()

  /** Online ANN serving: each micro-batch of query vectors is served
    * from a SAVED IVF-PQ index
    * ([[graft.operators.Similarity.saveIvfPqIndex]]) — the streaming
    * half of the build-once/serve-many pattern. Per batch the codes
    * scan partition-prunes to the batch's probed cells, so a trickle of
    * queries reads a trickle of the index; results append to `outDir`.
    * Checkpointed foreachBatch is at-least-once — replays duplicate
    * whole result batches, deduped downstream by (query_id, rank) if
    * exactly-once reads matter. The index may be [[graft.operators
    * .Similarity.appendToIvfPqIndex]]-extended between batches; each
    * batch serves against the index state at its own read time.
    */
  def annServeSink(queryStream: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, k: Int, nProbe: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id")
      : org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Similarity.servedIvfPqTopK(batch.sparkSession,
            indexDir, batch.toDF(), k, nProbe, vecCol = vecCol, idCol = idCol)
            .write.mode("append").parquet(outDir)
      }
      .start()

  /** Stream-static enrichment: join each micro-batch against a small
    * static dimension, broadcast — the GeoIP/user-agent-lookup shape. The
    * static side is planned per micro-batch (a broadcast hash join inside
    * every batch; no stream state), so dim updates are picked up on
    * re-read and nothing accumulates in the state store.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  /** Stream-stream interval join: match records of two streams on a key
    * when the right event lands within `[left.ts, left.ts + window]` —
    * click-to-conversion attribution. Both sides carry watermarks and the
    * join condition time-bounds the buffered state on BOTH sides (Spark
    * derives the state-eviction horizon from watermark + range), so state
    * is O(key-rate × window), never unbounded.
    *
    * `joinType = "left_outer"` is the NEGATIVE-attribution shape — "which
    * clicks never converted": a left row with no in-window match is
    * emitted with null right columns once the watermark proves no
    * qualifying right event can still arrive (state eviction and
    * unmatched-emission share the same horizon, so the outer result is
    * exactly the batch outer join over the same data, just incremental).
    * `"left_semi"` gives the matched-only projection without right
    * columns; any Spark-supported time-bounded stream-stream join type
    * passes through.
    */
  def correlate(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      watermark: String, windowSeconds: Long,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $windowSeconds SECONDS"),
      joinType)
      .drop(r(key)) // single unambiguous key column out
  }
}
