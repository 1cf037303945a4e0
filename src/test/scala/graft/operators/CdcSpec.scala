package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, version, op, payload): op "D" = tombstone
  private def snap(rows: Seq[(Long, Long, String, String)]) =
    Cdc.latestSnapshot(rows.toDF("k", "ver", "op", "payload"),
      keyCols = Seq("k"), versionCols = Seq("ver"),
      tombstone = col("op") === "D")
      .select("k", "ver", "op", "payload")
      .as[(Long, Long, String, String)].collect().toSet

  test("latest-wins: updates, tombstone-latest drops, resurrect keeps") {
    val out = snap(Seq(
      (1L, 1L, "U", "a"), (1L, 2L, "U", "b"),          // update chain -> b
      (2L, 1L, "U", "x"), (2L, 9L, "D", ""),            // delete-latest -> gone
      (3L, 1L, "D", ""), (3L, 5L, "U", "back"),         // resurrected -> back
      (4L, 7L, "D", "")))                               // lone tombstone -> gone
    assert(out == Set((1L, 2L, "U", "b"), (3L, 5L, "U", "back")))
  }

  test("equals the window row_number reference on random changelogs") {
    val rnd = new scala.util.Random(23)
    // unique versions per key (CDC offsets are totally ordered); ~1/5 deletes
    val rows = rnd.shuffle(for {
      k <- (0L until 40L); ver <- 1L to (1 + rnd.nextInt(12)).toLong
    } yield (k, ver, if (rnd.nextInt(5) == 0) "D" else "U", s"p$k-$ver"))
    val df = rows.toDF("k", "ver", "op", "payload").repartition(7)
    val got = Cdc.latestSnapshot(df, Seq("k"), Seq("ver"), col("op") === "D")
      .select("k", "ver", "op", "payload")
      .as[(Long, Long, String, String)].collect().toSet
    val expected = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("ver").desc)))
      .where(col("rn") === 1 && col("op") =!= "D")
      .select("k", "ver", "op", "payload")
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("streaming log sink: snapshot ≡ batch compaction; compactLog preserves it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_log")
    val logDir = s"$tmp/log"
    val stream = MemoryStream[(Long, Long, String, String)]
    val q = graft.streaming.StatefulOps.cdcLogSink(
      stream.toDS().toDF("k", "ver", "op", "payload"), logDir, s"$tmp/cp",
      keyCols = Seq("k"), versionCols = Seq("ver"),
      tombstone = col("op") === "D")
    val allChanges = Seq(
      Seq((1L, 1L, "U", "a"), (2L, 1L, "U", "x"), (3L, 1L, "U", "s")),
      Seq((1L, 2L, "U", "b"), (2L, 2L, "D", ""), (4L, 1L, "U", "q")),
      Seq((2L, 3L, "U", "resurrected"), (3L, 2L, "D", "")))
    try {
      allChanges.foreach { batch => stream.addData(batch: _*); q.processAllAvailable() }
    } finally q.stop()
    def snapshot() = Cdc.readSnapshot(spark, logDir,
        Seq("k"), Seq("ver"), col("op") === "D")
      .select("k", "ver", "op", "payload")
      .as[(Long, Long, String, String)].collect().toSet
    val expected = Cdc.latestSnapshot(
        allChanges.flatten.toDF("k", "ver", "op", "payload"),
        Seq("k"), Seq("ver"), col("op") === "D")
      .select("k", "ver", "op", "payload")
      .as[(Long, Long, String, String)].collect().toSet
    assert(snapshot() == expected)
    assert(expected == Set((1L, 2L, "U", "b"), (2L, 3L, "U", "resurrected"),
      (4L, 1L, "U", "q")))
    // replayed segment (at-least-once append) must not change the snapshot
    Cdc.compactChangelog(allChanges(1).toDF("k", "ver", "op", "payload"),
        Seq("k"), Seq("ver"), col("op") === "D")
      .write.mode("append").parquet(logDir)
    assert(snapshot() == expected, "latest-wins merge must be replay-idempotent")
    // compaction folds segments, keeps tombstones, preserves the snapshot
    val before = spark.read.parquet(logDir).count()
    Cdc.compactLog(spark, logDir, Seq("k"), Seq("ver"), col("op") === "D")
    val log = spark.read.parquet(logDir)
    assert(log.count() == 4 && log.count() < before) // 3 live keys + 1 tombstone (k=3)
    assert(log.where(col("op") === "D").count() == 1)
    assert(snapshot() == expected)
    // a late-arriving OLDER upsert of the deleted key stays shadowed
    Seq((3L, 1L, "U", "stale")).toDF("k", "ver", "op", "payload")
      .write.mode("append").parquet(logDir)
    assert(snapshot() == expected, "kept tombstone must shadow late older upserts")
    // rename-aside swing leaves no siblings behind, and a leftover .old
    // from a crashed run (simulated) is swept, not tripped over
    val fs = new org.apache.hadoop.fs.Path(logDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(logDir + ".compacting")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(logDir + ".old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(logDir + ".old"))
    Cdc.compactLog(spark, logDir, Seq("k"), Seq("ver"), col("op") === "D")
    assert(snapshot() == expected)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(logDir + ".old")))
  }

  test("multi-column keys and version tie-breaks") {
    val df = Seq(
      ("a", 1L, 10L, 1L, "U", "v1"),
      ("a", 1L, 10L, 2L, "U", "v2"),  // same ts, later seq wins
      ("a", 2L, 11L, 1L, "U", "other-key")
    ).toDF("t", "id", "ts", "seq", "op", "p")
    val out = Cdc.latestSnapshot(df, Seq("t", "id"), Seq("ts", "seq"),
      col("op") === "D")
      .select("t", "id", "p").as[(String, Long, String)].collect().toSet
    assert(out == Set(("a", 1L, "v2"), ("a", 2L, "other-key")))
  }
}
