package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zvalue interleaves bits (Morton order)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (0L, 2L),
      (3L, 3L), (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL))
      .toDF("a", "b")
    val z = df.select(Layout.zvalue(col("a"), col("b")).as("z")).as[Long].collect()
    // a bits at even positions, b bits at odd
    assert(z(0) == 0L && z(1) == 1L && z(2) == 2L && z(3) == 3L)
    assert(z(4) == 4L && z(5) == 8L)
    assert(z(6) == 15L)
    assert(z(7) == 0x1555555555555555L) // low 31 bits of a → even positions
    assert(z(8) == 0x2AAAAAAAAAAAAAAAL) // low 31 bits of b → odd positions
  }

  test("zorderBy clusters both dimensions into tight per-partition envelopes") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val clustered = Layout.zorderBy(grid, "x", "y", partitions = 16)
    // per output partition, measure the bounding box of (x, y); z-order
    // keeps both side lengths ~sqrt(cells) instead of one dimension
    // spanning the full domain (what a 1-D sort on x would do to y)
    val spans = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .as[(Int, Long, Long)].collect()
    assert(spans.length == 16)
    // 4096 cells / 16 partitions = 256 cells each; a z-curve tile has
    // bounding sides ≤ 32 (vs 63 for a full-width slab)
    assert(spans.forall { case (_, dx, dy) => dx <= 32 && dy <= 32 },
      spans.mkString(", "))
  }

  test("month-partitioned table prunes partitions at scan (K4 parity)") {
    // the reference's MergeTree PARTITION BY toYYYYMM(insert_date)
    // (migrations/sample_test.sql:13,18) maps to partitionBy(insert_month);
    // a month predicate must reach the scan as a PartitionFilter so
    // non-matching months are never read
    val tmp = java.nio.file.Files.createTempDirectory("graft_partprune").toString + "/t"
    val rows = Seq(
      (1L, "202401", 10), (2L, "202401", 20),
      (3L, "202402", 30), (4L, "202403", 40))
      .toDF("id", "insert_month", "v")
    rows.write.partitionBy("insert_month").parquet(tmp)
    val q = spark.read.parquet(tmp).where(col("insert_month") === "202402")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert("PartitionFilters: \\[[^\\]]*202402[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"month predicate did not become a partition filter:\n$plan")
    assert(q.select("id").as[Long].collect().sorted.sameElements(Array(3L)))
    // and the pruned scan selects exactly ONE of the three month partitions
    val partsRead = q.queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount }.sum
    assert(partsRead == 1, s"expected 1 partition scanned, got $partsRead")
  }

  test("dropExpiredPartitions unlinks only sub-cutoff months, metadata-only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ttl").toString + "/t"
    val rows = Seq(
      (1L, "202311", 10), (2L, "202312", 20),
      (3L, "202401", 30), (4L, "202402", 40))
      .toDF("id", "insert_month", "v")
    rows.write.partitionBy("insert_month").parquet(tmp)
    val dropped = Layout.dropExpiredPartitions(spark, tmp, "insert_month", "202401")
    assert(dropped == Seq("202311", "202312"))
    val left = spark.read.parquet(tmp)
      .select("id").as[Long].collect().sorted
    assert(left.sameElements(Array(3L, 4L)))
    // idempotent + boundary: the cutoff month itself survives
    assert(Layout.dropExpiredPartitions(spark, tmp, "insert_month", "202401").isEmpty)
    // missing dir is a no-op, not a crash
    assert(Layout.dropExpiredPartitions(spark, s"$tmp/__nope", "m", "1").isEmpty)
  }

  test("compact merges small files without losing rows; no-op when already compact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact")
    val dir = s"$tmp/table"
    // 40 tiny files
    (1 to 4).foreach { b =>
      (0L until 1000L).map(i => (b * 10000L + i, s"row $i of batch $b"))
        .toDF("id", "payload").repartition(10)
        .write.mode("append").parquet(dir)
    }
    val rowsBefore = spark.read.parquet(dir).count()
    val (nBefore, nAfter) = Layout.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(nBefore == 40 && nAfter == 1)
    assert(spark.read.parquet(dir).count() == rowsBefore)
    val ids = spark.read.parquet(dir).select("id").as[Long].collect().sorted
    assert(ids.length == 4000 && ids.distinct.length == 4000)
    // second pass: already at target → untouched
    assert(Layout.compact(spark, dir, targetFileBytes = 1L << 30) == ((1, 1)))
  }

  test("versioned publish: pinned reads survive later publishes; manifest gates visibility") {
    val table = s"${java.nio.file.Files.createTempDirectory("graft_ver")}/corpus"
    assert(Layout.latestVersion(spark, table).isEmpty)
    intercept[IllegalArgumentException](Layout.readVersion(spark, table))

    val v1 = Layout.publishVersion(Seq((1L, "a"), (2L, "b")).toDF("id", "txt"), table)
    val v2 = Layout.publishVersion(Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("id", "txt"), table)
    assert(v1 == 1 && v2 == 2 && Layout.latestVersion(spark, table).contains(2))
    // latest follows the manifest; the pinned v1 read is unchanged by v2
    assert(Layout.readVersion(spark, table).count() == 3)
    assert(Layout.readVersion(spark, table, Some(1)).count() == 2)

    // an uncommitted (orphaned) version dir — a crashed publish — is
    // invisible to readers, and the next publish numbers PAST it instead
    // of colliding with it
    val orphan = new java.io.File(s"$table/v=9")
    orphan.mkdirs()
    assert(Layout.latestVersion(spark, table).contains(2))
    assert(Layout.readVersion(spark, table).count() == 3)
    // a pinned read of a never-committed version fails loudly
    intercept[IllegalArgumentException](Layout.readVersion(spark, table, Some(9)))

    val v3 = Layout.publishVersion(Seq((9L, "z")).toDF("id", "txt"), table)
    assert(v3 == 10 && Layout.latestVersion(spark, table).contains(10))
    assert(Layout.readVersion(spark, table).count() == 1)

    // retention: keep 2 newest committed versions (the orphan, older than
    // the window, goes too)
    val pruned = Layout.pruneVersions(spark, table, keep = 2)
    assert(pruned == Seq(1, 9))
    assert(Layout.readVersion(spark, table, Some(2)).count() == 3) // still readable
    intercept[IllegalArgumentException](Layout.readVersion(spark, table, Some(1)))
    assert(!new java.io.File(s"$table/v=1").exists())
    assert(!orphan.exists())
  }

  test("diffVersions: added/removed/changed keys between committed snapshots") {
    val table = s"${java.nio.file.Files.createTempDirectory("graft_diff")}/corpus"
    Layout.publishVersion(
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "txt", "score"), table)
    Layout.publishVersion(
      Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40)).toDF("id", "txt", "score"), table)
    val diff = Layout.diffVersions(spark, table, 1, 2, Seq("id"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // id 1 identical → absent; id 2 content changed; id 3 removed; id 4 added
    assert(diff == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
    // identical snapshots diff to nothing
    Layout.publishVersion(
      Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40)).toDF("id", "txt", "score"), table)
    assert(Layout.diffVersions(spark, table, 2, 3, Seq("id")).count() == 0)
    // a never-committed version fails loudly (readVersion's contract)
    intercept[IllegalArgumentException](
      Layout.diffVersions(spark, table, 1, 9, Seq("id")))
  }

  test("publish succeeds on a scheme with no AbstractFileSystem binding (delete+rename fallback)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.noafs.impl", classOf[NoAfsFileSystem].getName)
    conf.setBoolean("fs.noafs.impl.disable.cache", true)
    // sanity: FileContext must actually reject the scheme, or this test
    // exercises the atomic path instead of the fallback
    intercept[org.apache.hadoop.fs.UnsupportedFileSystemException] {
      org.apache.hadoop.fs.FileContext.getFileContext(
        java.net.URI.create("noafs:///"), conf)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_noafs")
    val table = s"noafs://$dir/corpus"
    val v1 = Layout.publishVersion(Seq((1L, "a")).toDF("id", "txt"), table)
    val v2 = Layout.publishVersion(Seq((1L, "a"), (2L, "b")).toDF("id", "txt"), table)
    assert(v1 == 1 && v2 == 2 && Layout.latestVersion(spark, table).contains(2))
    assert(Layout.readVersion(spark, table).count() == 2)
    assert(Layout.readVersion(spark, table, Some(1)).count() == 1)
  }

  test("manifest swing clears a stale checksum sidecar; checksummed local reader stays clean") {
    val table = s"${java.nio.file.Files.createTempDirectory("graft_crc")}/corpus"
    Layout.publishVersion(Seq((1L, "a")).toDF("id", "txt"), table)
    // simulate the pre-raw-IO world: a sidecar left by a checksummed
    // manifest write, describing bytes the next swing will replace
    val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(s"$table/_VERSIONS")
    val crc = lfs.getChecksumFile(m)
    val out = lfs.getRawFileSystem.create(crc, true)
    out.write(Array[Byte](1, 2, 3, 4)); out.close()
    Layout.publishVersion(Seq((2L, "b")).toDF("id", "txt"), table)
    assert(!lfs.getRawFileSystem.exists(crc), "stale .crc sidecar must be dropped")
    // a reader going through the DEFAULT checksummed LocalFileSystem —
    // external tooling, not our raw-IO path — must not ChecksumException
    val in = lfs.open(m)
    val txt = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    assert(txt.split("\n").map(_.trim).filter(_.nonEmpty).toSeq == Seq("1", "2"))
  }
}

/** A local-disk FileSystem under a scheme with NO AbstractFileSystem
  * binding — the object-store-connector shape Layout's manifest swing must
  * degrade gracefully on (FileContext.getFileContext throws
  * UnsupportedFileSystemException for it).
  */
class NoAfsFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "noafs"
  override def getUri: java.net.URI = java.net.URI.create("noafs:///")
}
