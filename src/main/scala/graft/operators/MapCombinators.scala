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
}
