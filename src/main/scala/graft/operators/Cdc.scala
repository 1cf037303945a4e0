package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog compaction — the lakehouse "merge a CDC stream into a
  * snapshot" primitive (the semantics of Kafka log compaction and of a
  * Delta/Iceberg `MERGE ... WHEN MATCHED UPDATE / DELETE` fed by a
  * change stream): given a changelog of keyed upserts and tombstones,
  * produce the latest-wins table snapshot.
  *
  * The reference's pipeline lands append-only log rows into ClickHouse
  * and leans on the engine's ReplacingMergeTree semantics for this
  * (`/root/reference/README.md:303` — the `insert_date` + ORDER BY key
  * DDL it generates is exactly a latest-wins compaction contract);
  * Spark-side the equivalent is an explicit operator.
  *
  * Scale design (the 100 TB story): latest-wins is computed as a single
  * `max_by(payload, version)` AGGREGATE, not a `row_number()` window —
  * both shuffle on the key, but the aggregate combines map-side (the
  * exchange carries one pre-combined candidate row per key per input
  * partition, not every change record) and never sorts whole partitions.
  * For a changelog with many updates per key — the normal CDC shape —
  * that is the difference between shuffling the snapshot and shuffling
  * the changelog. Tombstones ride the same aggregate: they must WIN the
  * max_by (so a key whose newest record is a delete is dropped) and are
  * filtered AFTER it, which keeps delete handling inside the one
  * exchange.
  */
object Cdc {

  /** Compact a changelog to its latest-wins snapshot.
    *
    * @param changelog    change records, one row per upsert/tombstone
    * @param keyCols      primary-key columns
    * @param versionCols  total order within a key, later wins; ties
    *                     broken by the later column list entry
    * @param tombstone    predicate marking delete records; a key whose
    *                     latest record is a tombstone leaves the snapshot
    * @return one row per live key, carrying the full latest record
    */
  def latestSnapshot(changelog: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String], tombstone: Column): DataFrame = {
    val payloadCols = changelog.columns.filterNot(keyCols.contains).toSeq
    compacted(changelog, keyCols, versionCols, tombstone)
      .where(!col("__latest").getField("__dead"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col("__latest").getField(c).as(c)): _*)
  }

  /** Compact a changelog to one record per key, KEEPING tombstones — the
    * merge-on-read log form ([[graft.streaming.StreamingIngest]]'s CDC
    * sink appends these): a kept tombstone still shadows any older
    * record of its key that a later compaction or late-arriving segment
    * may carry, which `latestSnapshot`'s dropped tombstones could not.
    * Same single map-side-combined exchange as [[latestSnapshot]].
    */
  def compactChangelog(changelog: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String], tombstone: Column): DataFrame = {
    val payloadCols = changelog.columns.filterNot(keyCols.contains).toSeq
    compacted(changelog, keyCols, versionCols, tombstone)
      .select(keyCols.map(col) ++
        payloadCols.map(c => col("__latest").getField(c).as(c)): _*)
  }

  private def compacted(changelog: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String], tombstone: Column): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty)
    // the payload struct carries an injected __dead field and surfaces as
    // __latest; an input column with either name would alias into the
    // injected ones (getField resolves by name) and corrupt tombstone
    // resolution — refuse loudly instead
    require(!changelog.columns.exists(c => c == "__latest" || c == "__dead"),
      "changelog columns __latest/__dead collide with Cdc internals")
    val payloadCols = changelog.columns.filterNot(keyCols.contains).toSeq
    changelog
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((payloadCols.map(col) :+ tombstone.as("__dead")): _*),
        struct(versionCols.map(col): _*)).as("__latest"))
  }

  /** Read the current snapshot of a merge-on-read CDC log directory
    * (written by [[graft.streaming.StatefulOps.cdcLogSink]] or any
    * appender of [[compactChangelog]] segments): latest-wins across all
    * segments, tombstoned keys absent. Merge-on-read is what the
    * reference's ReplacingMergeTree gives its readers with `FINAL` —
    * appends stay O(batch) and the merge cost moves to read time, paid
    * down by [[compactLog]].
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, logDir: String,
      keyCols: Seq[String], versionCols: Seq[String],
      tombstone: Column): DataFrame =
    latestSnapshot(spark.read.parquet(logDir), keyCols, versionCols, tombstone)

  /** Fold a merge-on-read CDC log to one record per key in place —
    * the background-merge half of the ReplacingMergeTree contract.
    * Tombstones are KEPT (they must shadow any late-arriving older
    * version of their key; dropping them here would let a replayed or
    * out-of-order upsert resurrect a deleted key).
    *
    * The rewrite goes through a sibling temp dir and a rename-aside
    * swing: write `.compacting`, rename live → `.old`, rename
    * `.compacting` → live, delete `.old`. The two renames are still not
    * one atomic step on a plain FileSystem — same envelope as
    * [[Layout]]'s documented non-manifest fallback — but EVERY crash
    * point now leaves a complete log recoverable by name (live, or
    * `.old` when the crash lands between the renames): the r8 ordering
    * (delete live, then rename) had a window where the only copy sat in
    * the undiscoverable `.compacting` sibling and readers saw a missing
    * table. Run it from the maintenance process that owns the log (e.g.
    * between micro-batches), not concurrently with readers; a leftover
    * `.old` from a crash is swept on the next call.
    */
  def compactLog(spark: org.apache.spark.sql.SparkSession, logDir: String,
      keyCols: Seq[String], versionCols: Seq[String],
      tombstone: Column): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(logDir)
    val tmp = new org.apache.hadoop.fs.Path(logDir + ".compacting")
    val old = new org.apache.hadoop.fs.Path(logDir + ".old")
    val fs = dir.getFileSystem(conf)
    compactChangelog(spark.read.parquet(logDir), keyCols, versionCols, tombstone)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true) // sweep a previous crash's leftover
    require(fs.rename(dir, old), s"compactLog: rename $dir -> $old failed")
    require(fs.rename(tmp, dir), s"compactLog: rename $tmp -> $dir failed")
    fs.delete(old, true)
  }
}
