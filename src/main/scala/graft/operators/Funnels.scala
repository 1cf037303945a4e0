package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral-analytics aggregates in the shape ClickHouse ships as
  * `windowFunnel` and `retention` — the reference's pipeline lands
  * access-log events in ClickHouse precisely so analysts can run these
  * (`/root/reference/README.md:21` positions the store for "analytics,
  * monitoring"); Spark-side they are explicit operators.
  *
  * Both are single-aggregation operators: one hash exchange on the user
  * key with map-side combine, no windows, no self-joins — at 100 TB the
  * funnel's per-user fold state is `levels` longs regardless of event
  * volume, and retention's is `conds` booleans.
  */
object Funnels {

  private val Unreached = Long.MinValue

  /** Funnel level per user — `windowFunnel`-shaped sequential matching
    * with DETERMINISTIC semantics (ClickHouse leaves same-timestamp
    * order unspecified; here the event order is strictly `(ts,
    * event_id)`): the level is the longest k such that events
    * e₁ ≺ e₂ ≺ … ≺ e_k exist (strict order-precedence — one event never
    * satisfies two chain positions) matching `steps(0..k-1)` in order,
    * with every chain event within `windowMicros` of the CHAIN'S FIRST
    * event. Users with no step-1 event report level 0.
    *
    * Single linear pass per user over the (ts, id)-sorted event list:
    * the fold keeps, per level, the maximal chain-start timestamp among
    * chains reaching that level so far — maximal start dominates (most
    * window slack), so reachability is exact, and the state is `levels`
    * longs however many events a user has. The sorted list itself is
    * per-user memory (the same envelope as ClickHouse's own
    * windowFunnel, which buffers and sorts per user); a pathological
    * single user (bot) is the caller's pre-filter, not a shuffle
    * problem.
    */
  def windowFunnel(events: DataFrame, steps: Seq[Column], windowMicros: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty && windowMicros >= 0)
    val n = steps.size
    val ev = struct(
      (unix_micros(col(tsCol)).as("t") +: col(idCol).as("i") +:
        steps.zipWithIndex.map { case (c, k) => c.cast("boolean").as(s"c$k") }): _*)
    val init = array((0 until n).map(_ => lit(Unreached)): _*)
    val folded = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(ev)).as("evs"))
      .withColumn("lv", aggregate(col("evs"), init, (acc, e) => array(
        (0 until n).map { k =>
          // all levels read the PRE-event acc: an event can extend a
          // chain ending strictly before it, never one through itself
          if (k == 0)
            greatest(element_at(acc, 1),
              when(e.getField("c0"), e.getField("t")).otherwise(lit(Unreached)))
          else
            greatest(element_at(acc, k + 1),
              when(e.getField(s"c$k") &&
                element_at(acc, k) =!= lit(Unreached) &&
                e.getField("t") - element_at(acc, k) <= lit(windowMicros),
                element_at(acc, k)).otherwise(lit(Unreached)))
        }: _*)))
    // build inside-out so the OUTERMOST when tests the deepest level
    val level = (1 to n).foldLeft(lit(0)) { (els, k) =>
      when(element_at(col("lv"), k) =!= lit(Unreached), lit(k)).otherwise(els)
    }
    folded.select(col(userCol), level.cast("int").as("level"))
  }

  /** Non-overlapping complete-chain count per user (`sequenceCount`-
    * shaped): how many DISJOINT step₁→…→stepₙ chains (each within
    * `windowMicros` of its own first event) the user's history contains —
    * "how many times did this user complete the funnel". Greedy
    * earliest-completion: the same per-level fold as [[windowFunnel]],
    * and the moment a chain completes the level state resets (events are
    * not reused across chains) and the counter increments. Deterministic
    * for the same reasons as the funnel ((ts, id) order, pre-event
    * snapshots); state is `levels + 1` longs per user.
    */
  def sequenceCount(events: DataFrame, steps: Seq[Column], windowMicros: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty && windowMicros >= 0)
    val n = steps.size
    val ev = struct(
      (unix_micros(col(tsCol)).as("t") +: col(idCol).as("i") +:
        steps.zipWithIndex.map { case (c, k) => c.cast("boolean").as(s"c$k") }): _*)
    // slots 1..n = per-level max chain start; slot n+1 = completed count
    val init = array((0 until n).map(_ => lit(Unreached)) :+ lit(0L): _*)
    val folded = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(ev)).as("evs"))
      .withColumn("st", aggregate(col("evs"), init, (acc, e) => {
        val upd = (0 until n).map { k =>
          if (k == 0)
            greatest(element_at(acc, 1),
              when(e.getField("c0"), e.getField("t")).otherwise(lit(Unreached)))
          else
            greatest(element_at(acc, k + 1),
              when(e.getField(s"c$k") &&
                element_at(acc, k) =!= lit(Unreached) &&
                e.getField("t") - element_at(acc, k) <= lit(windowMicros),
                element_at(acc, k)).otherwise(lit(Unreached)))
        }
        val completed = upd(n - 1) =!= lit(Unreached)
        array(upd.map(u => when(completed, lit(Unreached)).otherwise(u)) :+
          (element_at(acc, n + 1) +
            when(completed, lit(1L)).otherwise(lit(0L))): _*)
      }))
      .select(col(userCol),
        element_at(col("st"), n + 1).cast("int").as("n_chains"))
    folded
  }

  /** Retention cohort flags per user (`retention`-shaped): flag 1 is
    * "condition 1 ever held"; flag k>1 is "condition 1 AND condition k
    * both held" — the came-back-to-do-X cohort shape. Columns out are
    * `r1..rN` booleans; one max-combine aggregate, no ordering
    * involved.
    */
  def retention(events: DataFrame, conds: Seq[Column],
      userCol: String = "user_id"): DataFrame = {
    require(conds.nonEmpty)
    val aggs = conds.zipWithIndex.map { case (c, k) =>
      max(c.cast("boolean")).as(s"__m$k")
    }
    events.groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(userCol) +: conds.indices.map { k =>
        val m = coalesce(col(s"__m$k"), lit(false))
        val base = coalesce(col("__m0"), lit(false))
        (if (k == 0) m else m && base).as(s"r${k + 1}")
      }: _*)
  }
}
