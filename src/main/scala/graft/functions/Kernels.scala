package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel helpers shared by the interpreted and generated code
  * paths of the custom expressions (a top-level object gets Java static
  * forwarders, so generated Java calls `Kernels.<m>` directly).
  */
object Kernels {

  /** Distinct xxhash64 values of the word n-gram shingles of an
    * already-normalized string (single spaces, trimmed). Hashes each
    * shingle's byte span in place — "tok1 tok2 tok3" is a contiguous span
    * of the normalized text, so no shingle strings are ever materialized.
    * Bit-identical to `array_distinct(transform(shingles(text, n),
    * xxhash64))` (same bytes, same seed 42).
    *
    * Fewer than n tokens → one whole-text shingle (matching
    * `Dedup.shingles`' fallback).
    */
  def shingleHashes(s: UTF8String, n: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // token start offsets: 0 and every byte after a ' ' (0x20 never occurs
    // inside a UTF-8 multibyte sequence)
    var tokCount = 1
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') tokCount += 1
      i += 1
    }
    if (tokCount < n) {
      return new GenericArrayData(Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    }
    val starts = new Array[Int](tokCount)
    var t = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nShingles = tokCount - n + 1
    val seen = new java.util.HashSet[java.lang.Long](nShingles * 2)
    val out = new Array[Long](nShingles)
    var m = 0
    i = 0
    while (i < nShingles) {
      val start = starts(i)
      val end = if (i + n < tokCount) starts(i + n) - 1 else len
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == nShingles) out else java.util.Arrays.copyOf(out, m))
  }
}
