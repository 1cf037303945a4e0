package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for the write path — the 100 TB scan-pruning
  * lever: parquet row-group min/max statistics prune only dimensions the
  * data is clustered by; a Z-order (Morton) curve clusters by two
  * dimensions at once, so filters on EITHER column skip row groups.
  *
  * Mirrors the reference's target-table layout intent
  * (`migrations/sample_test.sql:17-19`: MergeTree PARTITION BY month +
  * ORDER BY (status, insert_date) — one-dimensional clustering); Z-order
  * is the multi-dimensional upgrade.
  */
object Layout {

  /** 62-bit Morton interleave of the low 31 bits of two non-negative
    * longs: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Plain codegen'd arithmetic (62 shift/mask terms, constant-folded
    * shifts). 31 bits per dimension keeps the result clear of the sign
    * bit — bit 31 of `b` would land at position 63 and flip the ordering
    * (and `2 << 62` overflows checked 64-bit arithmetic).
    */
  def zvalue(a: Column, b: Column): Column =
    (0 until 31).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(2L << (2 * i)))
    }.reduce(_ + _)

  /** Cluster a DataFrame for writing: range-partition then sort within
    * partitions by the interleaved key. Files written from the result have
    * tight min/max envelopes on BOTH dimensions; `partitions` sizes output
    * files (`spark.sql.files.maxPartitionBytes` governs read splits).
    */
  def zorderBy(df: DataFrame, a: String, b: String, partitions: Int): DataFrame = {
    val z = zvalue(col(a), col(b))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Compact a parquet directory's small files into `targetFileBytes`-sized
    * files — the maintenance pass every append-heavy table needs (each
    * micro-batch append writes one file per task; a week of 2-second
    * triggers is ~300k tiny files, and at 100 TB scan time becomes
    * footer-open-bound instead of IO-bound).
    *
    * Sizing derives from the actual on-disk byte count, not a row guess.
    * The rewrite is `coalesce` (no shuffle — merges read splits) unless
    * the file count is below the target parallelism, where it degrades to
    * nothing. Write lands in a sibling temp dir first, then swaps in —
    * readers never observe a half-written directory; crash before the
    * swap leaves the original untouched.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def parquetFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isDirectory).flatMap(parquetFiles) ++
        kids.filter(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    val root = new java.io.File(dir)
    val before = parquetFiles(root)
    val totalBytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (before.size <= nOut) return (before.size, before.size)
    val tmp = dir.stripSuffix("/") + ".compact_tmp"
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp)
    val bak = dir.stripSuffix("/") + ".compact_old"
    val tmpF = new java.io.File(tmp); val bakF = new java.io.File(bak)
    require(root.renameTo(bakF), s"swap failed: $dir -> $bak")
    require(tmpF.renameTo(root), s"swap failed: $tmp -> $dir")
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete()
    }
    rmr(bakF)
    (before.size, parquetFiles(root).size)
  }

  /** Partition-expiry retention — the `ALTER TABLE … DROP PARTITION`
    * companion of the reference's `PARTITION BY toYYYYMM(insert_date)`
    * layout (K4) and the lake-side analogue of ClickHouse table TTL:
    * drop every partition directory of `partCol` whose value sorts
    * STRICTLY BELOW `cutoff` (string comparison — correct for the
    * zero-padded `yyyyMM`/`yyyy-MM-dd` partition value shapes this
    * engine writes, where lexicographic = chronological). METADATA-ONLY:
    * directories unlink without reading a row, so expiring a month of a
    * 100 TB table costs file-system calls, not a scan — the whole point
    * of date-partitioned layout. The same age-based policy as the
    * reference's archive retention (`pkg/fileio/io.go` prune, S2),
    * applied to the analytical store.
    *
    * Returns the dropped partition values (empty when nothing expired).
    */
  def dropExpiredPartitions(spark: org.apache.spark.sql.SparkSession,
      dir: String, partCol: String, cutoff: String): Seq[String] = {
    val (filesystem, root) = fs(spark, dir)
    if (!filesystem.exists(root)) return Seq.empty
    val prefix = s"$partCol="
    val expired = filesystem.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => (st.getPath, st.getPath.getName.stripPrefix(prefix)))
      .filter { case (_, v) => v < cutoff }
      .sortBy(_._2)
    expired.foreach { case (p, _) => filesystem.delete(p, true) }
    expired.map(_._2)
  }

  // ---- versioned publish (dataset snapshots) -----------------------------
  //
  // Training-data pipelines need REPRODUCIBLE corpus versions: "model X
  // trained on corpus v3" must stay readable after v4 lands, and readers
  // must never observe a half-written snapshot. This is the poor-man's
  // table format: immutable version directories (v=N) plus a tiny
  // atomically-renamed manifest naming the latest committed version —
  // the same commit discipline Delta/Iceberg build on (write data files,
  // then one atomic metadata swing), sized to a filesystem. Works on any
  // store with atomic single-file rename (HDFS, local; on S3 the rename
  // becomes a PUT, whose last-writer-wins still yields a consistent
  // manifest because versions are immutable).

  private val Manifest = "_VERSIONS"

  // All version-store IO goes through the Hadoop FileSystem API — the
  // table can live on HDFS, local file://, or any connector-backed store;
  // `rename` is atomic on HDFS and local posix (on S3 it degrades to
  // copy+delete — front the manifest with a consistent store there).
  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Committed versions of `table` in commit order (the manifest, one
    * version per line; last = latest). Empty before the first publish.
    * NOT a directory listing — that would see uncommitted (mid-write or
    * orphaned) version dirs.
    */
  /** Manifest IO bypasses the local ChecksumFileSystem wrapper: the
    * atomic JDK move in [[writeManifest]] relocates only the data file,
    * so a checksummed read through `LocalFileSystem` would consult a
    * stale `.crc` sidecar and throw. Raw local IO has no sidecars; HDFS
    * and connector stores pass through unchanged (their checksums are
    * block-level, not sidecar files).
    */
  private def manifestFs(f: org.apache.hadoop.fs.FileSystem) = f match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  def committedVersions(spark: org.apache.spark.sql.SparkSession,
      table: String): Seq[Int] = {
    val (f0, root) = fs(spark, table)
    val f = manifestFs(f0)
    val m = new org.apache.hadoop.fs.Path(root, Manifest)
    if (!f.exists(m)) Seq.empty
    else {
      val in = f.open(m)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
      finally in.close()
    }
  }

  /** Latest committed version of `table`, None before the first publish. */
  def latestVersion(spark: org.apache.spark.sql.SparkSession,
      table: String): Option[Int] = committedVersions(spark, table).lastOption

  private def writeManifest(f0: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, versions: Seq[Int]): Unit = {
    val f = manifestFs(f0)
    val tmp = new org.apache.hadoop.fs.Path(root, s"$Manifest.tmp")
    val out = f.create(tmp, true)
    try out.write(versions.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(root, Manifest)
    // One ATOMIC overwrite-rename. The earlier delete-then-rename left a
    // window — crash or concurrent reader between the two saw a table
    // with NO manifest (every committed version invisible), breaking the
    // "one atomic metadata swing" commit discipline this store is built
    // on. Scheme matters: FileContext's Rename.OVERWRITE is only truly
    // atomic where the AbstractFileSystem overrides the overwrite variant
    // (Hdfs does; the LOCAL fs falls back to delete+rename internally —
    // verified against hadoop-client 3.4.2), so for file:// the swing
    // uses the JDK's rename(2), which replaces the destination in one
    // syscall. Raw (non-checksummed) IO throughout — see [[manifestFs]].
    if ("file".equalsIgnoreCase(f.getUri.getScheme)) {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(f.makeQualified(dst).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          f.getUri, f.getConf) // f.getUri, not root.toUri: root may be scheme-less
        fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        // Schemes with a FileSystem but no AbstractFileSystem binding
        // (most object-store connectors) can't go through FileContext at
        // all. Degrade to the documented-non-atomic delete+rename rather
        // than failing the commit — the pre-r6 behavior for such stores.
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          f.delete(dst, false)
          f.rename(tmp, dst)
      }
    }
    // Raw-fs writes bypass ChecksumFileSystem, so a sidecar written by a
    // pre-raw-IO version of this code would describe stale bytes — any
    // reader going through the default LocalFileSystem would then
    // ChecksumException. Drop it (no-op when absent).
    f0 match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem =>
        f.delete(c.getChecksumFile(dst), false)
      case _ => ()
    }
  }

  private def versionDirs(f: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Int] =
    (if (f.exists(root)) f.listStatus(root).toSeq else Seq.empty)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt)

  /** Publish `df` as the next version of `table` (a directory). The data
    * lands in `table/v=N` first; the manifest flips only after the write
    * completes, so a crash mid-write leaves an orphan directory but the
    * previous version stays live. Returns the published version number.
    */
  def publishVersion(df: DataFrame, table: String): Int = {
    val spark = df.sparkSession
    val (f, root) = fs(spark, table)
    f.mkdirs(root)
    // number past any EXISTING dir, not just the committed latest: a crash
    // mid-publish leaves an orphan v=N, and re-using N would collide with
    // it (errorifexists) on every subsequent publish — orphans are skipped
    // and stay invisible (the manifest never named them)
    val committed = committedVersions(spark, table)
    val next = math.max(committed.lastOption.getOrElse(0),
      versionDirs(f, root).maxOption.getOrElse(0)) + 1
    df.write.mode("errorifexists").parquet(s"$table/v=$next")
    writeManifest(f, root, committed :+ next)
    next
  }

  /** Read a pinned `version` of `table`, or the latest committed one.
    * Pinned reads stay valid after later publishes (versions are
    * immutable) — the reproducibility contract. A pinned read of a
    * version the manifest never committed (or that retention dropped)
    * fails loudly rather than reading a half-written directory.
    */
  def readVersion(spark: org.apache.spark.sql.SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val committed = committedVersions(spark, table)
    val v = version.orElse(committed.lastOption).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $table"))
    require(committed.contains(v), s"version $v of $table was never committed " +
      s"(or was pruned); committed: ${committed.mkString(",")}")
    spark.read.parquet(s"$table/v=$v")
  }

  /** Retention: drop all but the `keep` newest committed versions, plus
    * orphaned never-committed dirs numbered below the latest (a dir above
    * the latest may be a publish in flight and is left alone). The
    * manifest shrinks FIRST — readers never see a committed version whose
    * data is gone — then the dirs are deleted. Returns the deleted
    * version numbers. Don't run concurrently with a publish.
    */
  def pruneVersions(spark: org.apache.spark.sql.SparkSession,
      table: String, keep: Int = 2): Seq[Int] = {
    require(keep >= 1, "must keep at least the latest version")
    val committed = committedVersions(spark, table)
    if (committed.isEmpty) return Seq.empty
    val latest = committed.last
    val retained = committed.takeRight(keep)
    val (f, root) = fs(spark, table)
    val doomed = versionDirs(f, root)
      .filter(v => !retained.contains(v) && v < latest).sorted
    writeManifest(f, root, retained)
    doomed.foreach(v =>
      f.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true))
    doomed
  }

  /** Snapshot diff between two committed versions of a published table —
    * the audit step between dataset releases ("what changed in v7 vs
    * v5?"): each row of the result is a key present in only one side
    * (`change` = 'added' when only in `to`, 'removed' when only in
    * `from`) or present in both with different content ('changed').
    * Identity = `keyCols`; content equality = every OTHER shared column
    * byte-equal (compared via a canonical struct). Two hash anti/outer
    * joins on the key — shuffles carry the two snapshots once each, no
    * window, no collect; at 100 TB the keyed shuffle is the floor for any
    * exact diff and both sides prune to key+content columns at the scan.
    */
  def diffVersions(spark: org.apache.spark.sql.SparkSession, table: String,
      fromVersion: Int, toVersion: Int,
      keyCols: Seq[String]): DataFrame =
    diffSnapshots(readVersion(spark, table, Some(fromVersion)),
      readVersion(spark, table, Some(toVersion)), keyCols)

  /** [[diffVersions]]' join construction over two already-loaded
    * snapshots — factored out so the catalog can oracle-check the
    * SHARED code path on derived frames (q111) while the publish
    * machinery stays spec-tested (`LayoutSpec`).
    */
  def diffSnapshots(from: DataFrame, to: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "diffSnapshots needs at least one key column")
    val contentCols = from.columns.toSeq.intersect(to.columns.toSeq)
      .filterNot(keyCols.contains)
    def keyed(df: DataFrame, side: String) =
      df.select(
        struct(keyCols.map(col): _*).as("key"),
        struct(contentCols.map(col): _*).as(s"content_$side"))
    val l = keyed(from, "from")
    val r = keyed(to, "to")
    l.join(r, Seq("key"), "full_outer")
      .withColumn("change",
        when(col("content_from").isNull, lit("added"))
          .when(col("content_to").isNull, lit("removed"))
          .when(col("content_from") =!= col("content_to"), lit("changed")))
      .where(col("change").isNotNull)
      .select((keyCols.map(k => col("key").getField(k).as(k)) :+
        col("change")): _*)
  }
}
