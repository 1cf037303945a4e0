package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines: deterministic
  * train/val/test splitting and sequential context-window packing.
  *
  * Both are engine-agnostic by construction (hash = md5-derived, packing =
  * integer running sums), so results reproduce bit-identically on any SQL
  * engine — the property that makes a split auditable long after the run.
  */
object Sampling {

  /** 0..99 bucket from a cross-engine content-independent hash of the id:
    * first 15 hex digits of md5 (fits a signed long; same trick as
    * [[Dedup.SimhashBits]]). Salt lets one id land differently per use
    * (e.g. independent splits for two experiments).
    */
  def hashBucket(id: Column, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long"), lit(100))

  /** Deterministic train/val/test assignment by id hash: reproducible,
    * join-free, and stable under corpus growth (adding documents never
    * reassigns existing ones — the property random row-number splits
    * lack). Map-only; zero shuffle.
    */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10, salt: String = ""): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = hashBucket(col(idCol), salt)
    df.withColumn("split",
      when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test"))
  }

  /** Sequential pack: concatenate documents in a deterministic order per
    * group (e.g. per language) into a token stream, then chunk the stream
    * into fixed `budget`-token context windows — the GPT-style
    * concat-then-chunk batching. Each document gets the window (`bin`) its
    * first token lands in and its offset inside that window; a document may
    * straddle a boundary (that is the semantics of chunked packing).
    *
    * One shuffle on the group key; the running sum is a window frame
    * (`rows unbounded preceding → -1`), partial per group — at 100 TB the
    * group key (language/source shard) bounds each partition's stream.
    */
  def sequentialPack(docs: DataFrame, groupCol: String, orderCol: String,
      tokenCountCol: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tok", tokenCountCol)
      .withColumn("offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("offset") / budget))
      .withColumn("bin_offset", pmod(col("offset"), lit(budget.toLong)))
  }
}
