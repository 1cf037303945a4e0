package graft.sources

/** Producer partition balancers — parity with the reference's balancer
  * switch (`internal/services/kafkalog/opt.go:47-61`), which selects
  * among the four segmentio/kafka-go balancers by config string:
  * `round_robin`, `least_bytes`, `hash`, `reference_hash`, with any other
  * name falling back to least_bytes. Semantics are re-derived from the
  * PUBLISHED kafka-go balancer contracts (github.com/segmentio/kafka-go
  * `balancer.go`) and the published FNV-1a parameters (Fowler/Noll/Vo;
  * offset basis 0x811c9dc5, prime 0x01000193):
  *
  *   - `round_robin` — partitions in cyclic order per producer instance.
  *   - `least_bytes` — the partition this producer has routed the fewest
  *     cumulative record bytes (key+value) to so far; ties break to the
  *     lowest index. Producer-local counters, not broker state — same as
  *     kafka-go's, whose `LeastBytes` tracks only its own writer.
  *   - `hash` — FNV-1a/32 of the record key, mapped Sarama-style:
  *     `int32(h) % n`, sign folded positive. The int32 cast matters —
  *     an unsigned mod gives a DIFFERENT partition for hashes ≥ 2³¹.
  *   - `reference_hash` — FNV-1a/32 with the Java-client mapping
  *     `(h & 0x7fffffff) % n`.
  *
  * A missing key hashes as the empty byte string (FNV offset basis) so
  * keyless records route deterministically; kafka-go writes `msg.Key`
  * unconditionally into the hasher the same way.
  *
  * Balancers are per-task MUTABLE state (a kafka-go `Writer`'s balancer
  * is owned by one writer the same way) — construct one per producing
  * task, never share across threads.
  */
sealed trait KafkaBalancer {
  /** Partition index in `[0, n)` for a record with key `key` (nullable)
    * and `recordBytes` = encoded key+value byte count (the least_bytes
    * accounting unit). Stateful balancers update their state.
    */
  def pick(key: Array[Byte], recordBytes: Int, n: Int): Int
}

object KafkaBalancer {

  /** The reference's `Balancer.Match`: unknown names fall back to
    * least_bytes (mirrored deliberately — it is reference behavior, not
    * an accident of ours). `spark_partition` is NOT handled here: that
    * mode (this sink's original one-kafka-partition-per-task mapping)
    * bypasses per-record balancing entirely.
    */
  def apply(name: String): KafkaBalancer = name match {
    case "round_robin"    => new RoundRobin
    case "hash"           => new Hash
    case "reference_hash" => new ReferenceHash
    case _                => new LeastBytes
  }

  /** FNV-1a 32-bit over `bytes` (null = empty). Published test vectors
    * pinned in `KafkaLiteSpec`: fnv1a32("") = 0x811c9dc5,
    * fnv1a32("a") = 0xe40c292c, fnv1a32("foobar") = 0xbf9cf968.
    */
  def fnv1a32(bytes: Array[Byte]): Int = {
    var h = 0x811c9dc5
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        h ^= bytes(i) & 0xff
        h *= 0x01000193
        i += 1
      }
    }
    h
  }

  final class RoundRobin extends KafkaBalancer {
    private var counter = -1L
    def pick(key: Array[Byte], recordBytes: Int, n: Int): Int = {
      counter += 1
      (counter % n).toInt
    }
  }

  final class LeastBytes extends KafkaBalancer {
    private var counters: Array[Long] = Array.emptyLongArray
    def pick(key: Array[Byte], recordBytes: Int, n: Int): Int = {
      if (counters.length != n) counters = new Array[Long](n)
      var min = 0
      var i = 1
      while (i < n) {
        if (counters(i) < counters(min)) min = i
        i += 1
      }
      counters(min) += recordBytes
      min
    }
  }

  final class Hash extends KafkaBalancer {
    def pick(key: Array[Byte], recordBytes: Int, n: Int): Int = {
      val p = fnv1a32(key) % n // int32 semantics: Scala % keeps sign like Go
      if (p < 0) -p else p
    }
  }

  final class ReferenceHash extends KafkaBalancer {
    def pick(key: Array[Byte], recordBytes: Int, n: Int): Int =
      ((fnv1a32(key) & 0x7fffffff) % n)
  }
}
