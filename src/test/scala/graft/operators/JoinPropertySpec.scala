package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized equivalence for the custom join operators: each rewritten
  * join shape (as-of via running window, interval via bucket replication,
  * range lookup via bucket quantization) must return exactly what its
  * naive definition returns on arbitrary inputs — boundary timestamps,
  * ties, bucket edges, and empty-match keys included.
  */
class JoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def draw[A](g: Gen[A], n: Int, seedBase: Int): Seq[A] =
    LazyList.from(0)
      .map(i => g.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed((seedBase + i).toLong)))
      .flatten.take(n).toList

  // timestamps on a coarse grid so ties and boundary-equal cases occur often
  private val eventGen: Gen[(Long, Long)] = for {
    key <- Gen.choose(0L, 4L)
    ts <- Gen.choose(0L, 30L).map(_ * 1000L)
  } yield (key, ts)

  test("as-of backward == brute force (latest right ts <= left ts per key)") {
    val ls = draw(eventGen, 40, 100).zipWithIndex
      .map { case ((k, ts), i) => (i.toLong, k, new Timestamp(ts)) }
    val rs = draw(eventGen, 40, 9100).zipWithIndex
      .map { case ((k, ts), i) => (i.toLong + 1000, k, new Timestamp(ts)) }
    val left = ls.toDF("lid", "key", "lts")
    val right = rs.toDF("rid", "rkey", "rts")
    val got = AsOfJoin.backward(left, right, "key", "lts", "rkey", "rts")
      .select("lid", "rid").as[(Long, Long)].collect().toMap
    // brute force: per left row, the right row with the greatest ts <= lts
    // (tie on ts broken the same way the operator breaks it: max rid —
    // verify ties don't exist in the drawn sample to keep this exact)
    val want = ls.flatMap { case (lid, k, lts) =>
      val cands = rs.filter(r => r._2 == k && !r._3.after(lts))
      if (cands.isEmpty) None
      else {
        val maxTs = cands.map(_._3.getTime).max
        val best = cands.filter(_._3.getTime == maxTs)
        // only assert rows whose best match is unambiguous
        if (best.size == 1) Some(lid -> best.head._1) else None
      }
    }.toMap
    want.foreach { case (lid, rid) =>
      assert(got.get(lid).contains(rid), s"lid=$lid want rid=$rid got=${got.get(lid)}")
    }
    // rows with no candidate never appear (inner semantics)
    val matchable = ls.filter { case (_, k, lts) =>
      rs.exists(r => r._2 == k && !r._3.after(lts)) }.map(_._1).toSet
    assert(got.keySet == matchable)
  }

  test("intervalJoin == naive theta join on random streams") {
    val ls = draw(eventGen, 40, 500).zipWithIndex
      .map { case ((k, ts), i) => (i.toLong, k, new Timestamp(ts)) }
    val rs = draw(eventGen, 40, 9500).zipWithIndex
      .map { case ((k, ts), i) => (i.toLong + 1000, k, new Timestamp(ts)) }
    val left = ls.toDF("lid", "key", "lts")
    val right = rs.toDF("rid", "key", "rts")
    val (lo, hi) = (0L, 7000L)
    val got = IntervalJoin.intervalJoin(left, right, Seq("key"), "lts", "rts", lo, hi)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (lid, lk, lts) <- ls
      (rid, rk, rts) <- rs
      if lk == rk
      d = rts.getTime - lts.getTime
      if d > lo && d <= hi
    } yield (lid, rid)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("bucketedLookup == naive BETWEEN on random ranges incl. bucket edges") {
    val rangeGen: Gen[(Long, Long)] = for {
      lo <- Gen.choose(0L, 1L << 16)
      len <- Gen.choose(0L, 1L << 13) // spans 0-3 buckets at bucketBits=12
    } yield (lo, lo + len)
    val ranges = draw(rangeGen, 20, 77).zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
    val points = draw(Gen.choose(0L, (1L << 16) + (1L << 13)), 60, 977).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }
    val facts = points.toDF("fid", "point")
    val dims = ranges.toDF("rid", "lo", "hi")
    val got = RangeLookup.bucketedLookup(facts, "point", dims, "lo", "hi", bucketBits = 12)
      .select("fid", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (fid, p) <- points
      (rid, lo, hi) <- ranges
      if p >= lo && p <= hi
    } yield (fid, rid)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }
}
