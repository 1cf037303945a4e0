package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse Map combinators — `sumMap` / `minMap` / `maxMap` (plus the
  * countMap everyone derives with `sumMap(m, 1)`): aggregate a Map-typed
  * column per group by merging maps KEY-wise, e.g. per-cohort
  * `{status_code → bytes}` rollups from per-request maps
  * (reference domain: access-log analytics keyed by dynamic small maps).
  *
  * Spark-first shape — no UDFs, no per-row map objects in the aggregate
  * state:
  *   1. `explode(map_entries(m))` map-side — fan-out bounded by the map
  *      SIZE (small, schema-bounded), never by row width;
  *   2. ONE hash aggregate on (group, key) with partial map-side combine
  *      (sum/min/max/count are all codegen'd);
  *   3. reassemble per group with
  *      `map_from_entries(array_sort(collect_list(struct(k, v))))` —
  *      deterministic key order, map size = distinct keys in the group.
  *
  * At 100 TB: the only exchange carries (group, key, partial aggregates) —
  * the map DOMAIN (distinct keys), not the row count; the reassembled map
  * per group is bounded by that same domain. A group whose key domain is
  * unbounded (user-generated keys) should stay in the exploded
  * (group, key) relation instead of reassembling — both surfaces are
  * returned (`aggMapEntries` vs `aggMaps`).
  */
object MapCombinators {

  /** Exploded surface: one row per (group, key) with sum/min/max/count of
    * the map values — the scale-safe relation form.
    */
  def aggMapEntries(df: DataFrame, groupCols: Seq[String],
      mapCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ explode(map_entries(col(mapCol))).as("kv"): _*)
      .select(g :+ col("kv.key").as("k") :+ col("kv.value").as("v"): _*)
      .groupBy(g :+ col("k"): _*)
      .agg(sum(col("v")).as("sum_v"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"), count(lit(1)).as("cnt"))
  }

  /** Map-typed surface (the ClickHouse result shape): per group, the four
    * combinator maps with keys in sorted order. Use only when the key
    * domain is schema-bounded (status codes, event types) — the maps
    * materialize one entry per distinct key in the group.
    */
  def aggMaps(df: DataFrame, groupCols: Seq[String],
      mapCol: String): DataFrame = {
    val g = groupCols.map(col)
    def reassemble(valueCol: String): Column =
      map_from_entries(array_sort(
        collect_list(struct(col("k"), col(valueCol)))))
    aggMapEntries(df, groupCols, mapCol)
      .groupBy(g: _*)
      .agg(reassemble("sum_v").as("sum_map"),
        reassemble("min_v").as("min_map"),
        reassemble("max_v").as("max_map"),
        reassemble("cnt").as("count_map"))
  }

  /** The `sumMap(m)` / `minMap(m)` / `maxMap(m)` SQL aggregates — a
    * ClickHouse migrant's per-group key-wise map merge behind GROUP BY
    * under the reference names (countMap is CH's own idiom
    * `sumMap(transform_values(m, (k, v) -> 1))`). State: key →
    * combined value — bounded by the group's key DOMAIN, the
    * [[aggMaps]] contract (schema-bounded keys; unbounded domains
    * should stay in the exploded [[aggMapEntries]] relation). Output
    * map keys ascending (the array_sort reassembly order), so SQL ≡
    * Column row-for-row. NULL maps skip; map VALUES must be non-null
    * (the map<string,bigint> cast contract — CH maps carry no null
    * values either).
    */
  final class MapAgg(mode: String)
      extends org.apache.spark.sql.expressions.Aggregator[
        Map[String, Long],
        scala.collection.mutable.HashMap[String, Long],
        Map[String, Long]] {
    private val combineFn: (Long, Long) => Long = mode match {
      case "sum" => _ + _
      case "min" => math.min
      case "max" => math.max
      case other => throw new IllegalArgumentException(
        s"MapAgg mode must be sum/min/max: $other")
    }
    type Buf = scala.collection.mutable.HashMap[String, Long]
    override def zero: Buf = scala.collection.mutable.HashMap.empty
    override def reduce(b: Buf, m: Map[String, Long]): Buf = {
      if (m != null) m.foreach { case (k, v) =>
        b.update(k, b.get(k).map(combineFn(_, v)).getOrElse(v))
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (k, v) =>
        a.update(k, a.get(k).map(combineFn(_, v)).getOrElse(v))
      }
      a
    }
    override def finish(b: Buf): Map[String, Long] =
      scala.collection.immutable.ListMap(b.toSeq.sortBy(_._1): _*)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
