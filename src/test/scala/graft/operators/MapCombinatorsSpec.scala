package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MapCombinatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, Map("a" -> 10L, "b" -> 1L)),
    (1L, Map("a" -> 5L)), // b absent from this row: min_b stays 1
    (1L, Map("b" -> 7L, "c" -> -2L)),
    (2L, Map("a" -> 100L)))
    .toDF("grp", "m")

  test("aggMapEntries: key-wise sum/min/max/count, absent keys don't count") {
    val out = MapCombinators.aggMapEntries(df, Seq("grp"), "m")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, "a", 15L, 5L, 10L, 2L),
      (1L, "b", 8L, 1L, 7L, 2L),
      (1L, "c", -2L, -2L, -2L, 1L),
      (2L, "a", 100L, 100L, 100L, 1L)))
  }

  test("aggMaps: ClickHouse result shape — maps with sorted keys") {
    val out = MapCombinators.aggMaps(df, Seq("grp"), "m")
      .as[(Long, Map[String, Long], Map[String, Long], Map[String, Long], Map[String, Long])]
      .collect().sortBy(_._1)
    val (_, sumM, minM, maxM, cntM) = out(0)
    assert(sumM == Map("a" -> 15L, "b" -> 8L, "c" -> -2L))
    assert(minM == Map("a" -> 5L, "b" -> 1L, "c" -> -2L))
    assert(maxM == Map("a" -> 10L, "b" -> 7L, "c" -> -2L))
    assert(cntM == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    assert(out(1)._2 == Map("a" -> 100L))
    // deterministic reassembly order (array_sort before map_from_entries)
    val keys = MapCombinators.aggMaps(df, Seq("grp"), "m")
      .where(col("grp") === 1L)
      .select(map_keys(col("sum_map"))).as[Seq[String]].head()
    assert(keys == Seq("a", "b", "c"))
  }
}
