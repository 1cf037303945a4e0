package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding — the subword
  * vocabulary step of every modern LM data pipeline (Sennrich, Haddow,
  * Birch, "Neural machine translation of rare words with subword units",
  * ACL 2016; the GPT-2 tokenizer is the byte-level variant of the same
  * loop).
  *
  * Training loop (greedy): start from character symbols, and for each of
  * `numMerges` rounds merge the globally most frequent adjacent symbol
  * pair (ties to the lexicographically smaller pair, so training is fully
  * deterministic).
  *
  * Scale design (the 100 TB story): the corpus is touched EXACTLY ONCE —
  * the initial word-count aggregation, whose exchange carries (word,
  * partial-count) pairs with map-side combine. Every merge round then
  * runs on the WORD-VOCABULARY table (Zipf-bounded: millions of rows at
  * any corpus size, weighted by count — never the corpus), as one
  * pair-count aggregation + a 1-row driver pull (the bounded pattern of
  * the centroid pulls) + one map-only fold rewriting the symbol arrays.
  * Each round's state is materialized with an EAGER localCheckpoint and
  * the previous round dropped — checkpoint, not persist, deliberately: a
  * persist shortcuts execution but keeps the ANALYZED plan growing (round
  * N's tree nests all N−1 earlier folds), and re-normalizing that tree in
  * the cache manager measured superlinear — minutes stuck in the
  * optimizer by round ~20. Truncating lineage keeps every round O(1) plan
  * work. (On a cluster, localCheckpoint trades executor-loss recovery for
  * speed — the right trade for a bounded training loop; a lost executor
  * just reruns the training job.) Encoding is the
  * [[graft.functions.BpeEncode]] kernel: merge table broadcast in-plan,
  * map-only, zero shuffle at any corpus size.
  */
object Bpe {

  /** An ordered merge list; ranks are implicit in the order. */
  final case class BpeModel(merges: Vector[(String, String)]) {
    def encoder: graft.functions.BpeEncoder =
      new graft.functions.BpeEncoder(
        merges.map(_._1).toArray, merges.map(_._2).toArray)
  }

  /** Learn up to `numMerges` merges; stops early when no adjacent pair
    * reaches `minPairCount` (weighted by word frequency).
    *
    * Adaptive execution (the duplicateClusters cutoff pattern): the
    * corpus-side word-count aggregate always runs distributed; the merge
    * ROUNDS then run driver-local whenever the weighted vocabulary fits
    * under `localVocabThreshold` rows (a bounded pull — the vocab table,
    * not the corpus; 1M (word, count) rows is tens of MB). Real-corpus
    * vocabularies follow Heaps' law, so even 100 TB keeps the table in
    * the 10⁸–10⁹ range — past the cutoff the per-round distributed loop
    * below takes over unchanged. The local loop replays the IDENTICAL
    * greedy algorithm (same max-count/lexicographic-tie rule, same
    * left-to-right non-overlapping fold), proven equal in BpeSpec, so
    * the cutoff is an execution choice, not a semantic one. (Before
    * this, 24 rounds × 3 tiny Spark jobs over a 310-row vocab dominated
    * t18's bench probe with fixed per-job overhead — the r11 "14.97×"
    * flag; the isolated fresh-JVM ratio was 0.7×.)
    */
  def train(docs: DataFrame, numMerges: Int, minPairCount: Long = 2,
      textCol: String = "text", localVocabThreshold: Int = 1 << 20): BpeModel = {
    require(numMerges >= 0 && minPairCount >= 1)
    val words = docs
      .select(explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    if (localVocabThreshold > 0) {
      // limit(k+1) pulls AT MOST the threshold + 1 rows — if fewer came
      // back, that IS the whole vocab and the local loop runs; otherwise
      // nothing is kept and the distributed loop pays the rounds
      val head = words.limit(localVocabThreshold + 1).collect()
      if (head.length <= localVocabThreshold)
        return trainLocal(
          head.map(r => (r.getString(0).split(""), r.getLong(1))),
          numMerges, minPairCount)
    }
    var syms = words.select(col("n"), split(col("w"), "").as("syms"))
      .localCheckpoint(true)
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairs = syms.select(col("n"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("p1"), b.as("p2")))).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("n")).as("cnt"))
      // 1-row pull per round — bounded driver state by construction
      val best = pairs.orderBy(col("cnt").desc, col("p1"), col("p2"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getAs[Long]("cnt") < minPairCount) done = true
      else {
        val p1 = best.head.getAs[String]("p1")
        val p2 = best.head.getAs[String]("p2")
        merges += ((p1, p2))
        // left-to-right non-overlapping merge — the exact fold BpeEncoder
        // replays at encode time; CASE evaluates lazily so the slice with
        // length -1 under an empty accumulator never runs
        val next = syms.select(col("n"), aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, s) => when(
              size(acc) > 0 && element_at(acc, lit(-1)) === lit(p1) && s === lit(p2),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(p1 + p2))))
              .otherwise(concat(acc, array(s)))).as("syms"))
          .localCheckpoint(true) // eager: materialized THEN predecessor dropped
        syms.unpersist(false)
        syms = next
      }
      round += 1
    }
    syms.unpersist(false)
    BpeModel(merges.result())
  }

  /** The driver-local merge loop — token-for-token the distributed one:
    * pair counts weighted by word frequency, best = (max count, then
    * lexicographically smallest (p1, p2)), merge applied as the same
    * left-to-right non-overlapping fold [[graft.functions.BpeEncoder]]
    * replays. ASCII-only corpora make Scala's UTF-16 string order and
    * Spark's UTF-8 binary order identical (the catalog corpus is ASCII;
    * non-BMP text could order ties differently across the cutoff).
    */
  private def trainLocal(vocab0: Array[(Array[String], Long)],
      numMerges: Int, minPairCount: Long): BpeModel = {
    var vocab = vocab0
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, e @ ((p1, p2), c)) => acc match {
          case Some(((b1, b2), bc)) =>
            val wins = c > bc || (c == bc &&
              (p1 < b1 || (p1 == b1 && p2 < b2)))
            if (wins) Some(e) else acc
          case None => Some(e)
        }
      }
      best match {
        case Some(((p1, p2), c)) if c >= minPairCount =>
          merges += ((p1, p2))
          vocab = vocab.map { case (syms, n) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { s =>
              if (out.nonEmpty && out.last == p1 && s == p2)
                out(out.length - 1) = p1 + p2
              else out += s
            }
            (out.toArray, n)
          }
        case _ => done = true
      }
      round += 1
    }
    BpeModel(merges.result())
  }

  /** Tokenize every document with a trained model: (doc_id, tokens,
    * n_tokens). Map-only — see [[graft.functions.BpeEncode]].
    */
  def encode(docs: DataFrame, model: BpeModel,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.BpeEncode(
        Dedup.normalize(col(textCol)), model.encoder).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
}
