package graft.functions

import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Precomputed needle profile for [[Kernels.ngramIntersect]]: the
  * needle's DISTINCT n-gram byte strings in an open-addressed hash table
  * (xxhash64-routed, byte-verified — routing never decides equality, so
  * hash collisions cannot change the count) plus each gram's needle
  * multiplicity. Top-level class so generated Java can name the type;
  * built once per expression instance and shipped as a codegen reference
  * object; read-only at eval time, so one table is safely shared across
  * tasks.
  */
final class NgramTable(val n: Int, val gramBytes: Array[Array[Byte]],
    val gramCounts: Array[Int]) extends Serializable {
  require(gramBytes.length == gramCounts.length && gramBytes.nonEmpty)
  val mask: Int = {
    var cap = 4
    while (cap < gramBytes.length * 2) cap <<= 1
    cap - 1
  }
  val hashes: Array[Long] = gramBytes.map(g =>
    XXH64.hashUnsafeBytes(g, Platform.BYTE_ARRAY_OFFSET, g.length, 42L))
  val slots: Array[Int] = {
    val s = Array.fill(mask + 1)(-1)
    var i = 0
    while (i < gramBytes.length) {
      var j = (hashes(i) & mask).toInt
      while (s(j) >= 0) j = (j + 1) & mask
      s(j) = i
      i += 1
    }
    s
  }
}

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
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
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
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
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
    UnsafeArrayData.fromPrimitiveArray(
      if (m == nShingles) out else java.util.Arrays.copyOf(out, m))
  }

  /** IN-ORDER span hashes: one xxhash64 per overlapping k-token span of
    * the already-normalized string, occurrences KEPT and positions implied
    * by array index (index i ⇒ 1-based token start i+1) — the positional
    * face of [[shingleHashes]] for the ExactSubstr scrub/inventory paths.
    * Spans are contiguous byte ranges of the normalized text, so no span
    * strings are ever materialized. Fewer than k tokens → one whole-text
    * span at position 1.
    */
  def spanHashes(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var tokCount = 1
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') tokCount += 1
      i += 1
    }
    if (tokCount < k) {
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    }
    val starts = new Array[Int](tokCount)
    var t = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nSpans = tokCount - k + 1
    val out = new Array[Long](nSpans)
    i = 0
    while (i < nSpans) {
      val start = starts(i)
      val end = if (i + k < tokCount) starts(i + k) - 1 else len
      out(i) = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** [[shingleHashes]] sorted ascending — the set-similarity-join form
    * (prefix filtering needs one global total order over all hashes; value
    * order is as good as any). Distinctness falls out of sort + adjacent
    * dedupe, so this path allocates no hash set and no boxed longs.
    */
  def sortedShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var tokCount = 1
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') tokCount += 1
      i += 1
    }
    if (tokCount < n) {
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    }
    val starts = new Array[Int](tokCount)
    var t = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nShingles = tokCount - n + 1
    val out = new Array[Long](nShingles)
    i = 0
    while (i < nShingles) {
      val start = starts(i)
      val end = if (i + n < tokCount) starts(i + n) - 1 else len
      out(i) = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    i = 0
    while (i < nShingles) { // dedupe sorted run in place
      if (m == 0 || out(i) != out(m - 1)) { out(m) = out(i); m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == nShingles) out else java.util.Arrays.copyOf(out, m))
  }

  /** One-pass text-quality counters — the eval of
    * [[TextExprs.TextQualityStats]]; see its scaladoc for the exact
    * semantics mirrored (`length`/`[A-Za-z]`/`[0-9]`/`\s`/`split(trim(…))`
    * and ASCII stopword hits). Single walk over the UTF-8 bytes, zero
    * intermediate allocation.
    */
  def textQualityStats(
      s: UTF8String,
      stopwords: Array[Array[Byte]]): org.apache.spark.sql.catalyst.InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var nChars = 0
    var nAlpha = 0
    var nDigit = 0
    var nSpace = 0
    var i = 0
    while (i < len) {
      val b = Platform.getByte(base, off + i)
      if ((b & 0xC0) != 0x80) nChars += 1 // not a UTF-8 continuation byte
      if (isJavaRegexWs(b)) nSpace += 1
      else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) nAlpha += 1
      else if (b >= '0' && b <= '9') nDigit += 1
      i += 1
    }
    // tokens of split(trim(text), "\s+"): trim strips ONLY ' ' (Spark
    // trim); Spark's split is Pattern.split(s, -1), which keeps BOTH
    // leading and trailing empty fields, so the field count is simply
    // (maximal \s+ runs in the trimmed text) + 1 — empty input included
    // ("" has 0 runs → one empty token). Empty fields never match a
    // stopword, so only real (non-ws) token spans are compared.
    var start = 0
    while (start < len && Platform.getByte(base, off + start) == ' ') start += 1
    var end = len - 1
    while (end >= start && Platform.getByte(base, off + end) == ' ') end -= 1
    var nToks = 1
    var stopHits = 0
    var inWs = false
    var tokStart = -1
    i = start
    while (i <= end) {
      val ws = isJavaRegexWs(Platform.getByte(base, off + i))
      if (ws) {
        if (!inWs) nToks += 1
        if (tokStart >= 0) {
          if (isStopToken(base, off, tokStart, i - tokStart, stopwords)) stopHits += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      inWs = ws
      i += 1
    }
    if (tokStart >= 0 &&
        isStopToken(base, off, tokStart, end + 1 - tokStart, stopwords)) stopHits += 1
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(6)
    row.setInt(0, nChars)
    row.setInt(1, nAlpha)
    row.setInt(2, nDigit)
    row.setInt(3, nSpace)
    row.setInt(4, nToks)
    row.setInt(5, stopHits)
    row
  }

  /** 60-bit SimHash fingerprint of NORMALIZED text (single spaces,
    * trimmed), one row-local pass — the eval of
    * [[VectorExprs.Simhash60]]. Token hash = the first 15 hex digits of
    * the token's MD5 (byte-identical to
    * `conv(substring(md5(t), 1, 15), 16, 10)` and to any engine's md5,
    * DuckDB included); bit i of the fingerprint is set iff more than half
    * the token occurrences have bit i set (sum of ±1 strictly positive,
    * ties → 0). Replaces the explode + 60-conditional-sum-aggregate
    * table form: same fingerprints, zero shuffle.
    */
  def simhash60(s: UTF8String): Long = {
    val bytes = s.getBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](60)
    var nToks = 0
    var start = 0
    val len = bytes.length
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 15 hex digits = bytes 0..6 + high nibble of byte 7 → 60 bits
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = (h << 4) | ((d(7) & 0xffL) >>> 4)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
        nToks += 1
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) > nToks) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** One-pass repetition counters over NORMALIZED text (single spaces,
    * trimmed) — the eval of [[TextExprs.RepetitionStats]]: token count,
    * distinct-token count, and the max occurrence count of any word
    * 1-/2-/3-gram, all from ONE walk plus three sort-and-count-runs passes
    * over gram span hashes. Gram identity is the xxhash64 of its byte span
    * (grams are contiguous in normalized text), so "equal" means
    * equal-64-bit-hash — a per-document collision probability of
    * ~|toks|²/2⁶⁵, far below any oracle's row count. Fewer than n tokens →
    * one whole-text gram (matching `Dedup.shinglesFromToks`' fallback).
    */
  def repetitionStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var nToks = 1
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') nToks += 1
      i += 1
    }
    val starts = new Array[Int](nToks)
    var t = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val buf = new Array[Long](nToks)
    // gram hashes for window n → sorted → (maxRun, distinctRuns)
    def gramStats(n: Int): (Int, Int) = {
      val m = if (nToks < n) 1 else nToks - n + 1
      if (nToks < n) buf(0) = XXH64.hashUnsafeBytes(base, off, len, 42L)
      else {
        var j = 0
        while (j < m) {
          val s0 = starts(j)
          val e0 = if (j + n < nToks) starts(j + n) - 1 else len
          buf(j) = XXH64.hashUnsafeBytes(base, off + s0, e0 - s0, 42L)
          j += 1
        }
      }
      java.util.Arrays.sort(buf, 0, m)
      var maxRun = 1
      var run = 1
      var distinct = 1
      var j = 1
      while (j < m) {
        if (buf(j) == buf(j - 1)) { run += 1; if (run > maxRun) maxRun = run }
        else { run = 1; distinct += 1 }
        j += 1
      }
      (maxRun, distinct)
    }
    val (top1, nDistinct) = gramStats(1)
    val (top2, _) = gramStats(2)
    val (top3, _) = gramStats(3)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
    row.setInt(0, nToks)
    row.setInt(1, nDistinct)
    row.setInt(2, top1)
    row.setInt(3, top2)
    row.setInt(4, top3)
    row
  }

  /** java.util.regex `\s` = `[ \t\n\x0B\f\r]` (ASCII-only by default). */
  @inline private def isJavaRegexWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** ASCII-lowercased byte-equality of a token span against the stopword
    * list (list is lowercase ASCII by construction).
    */
  private def isStopToken(base: AnyRef, off: Long, tokStart: Int, tokLen: Int,
      stopwords: Array[Array[Byte]]): Boolean = {
    var w = 0
    while (w < stopwords.length) {
      val sw = stopwords(w)
      if (sw.length == tokLen) {
        var j = 0
        var ok = true
        while (ok && j < tokLen) {
          var b = Platform.getByte(base, off + tokStart + j)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          if (b != sw(j)) ok = false
          j += 1
        }
        if (ok) return true
      }
      w += 1
    }
    false
  }

  /** |A ∩ B| for two ascending-sorted distinct long arrays: one linear
    * two-pointer merge, zero allocation. The verify step of every
    * set-similarity join (candidate Jaccard = inter / (|A|+|B|-inter)).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** PQ code assignment for one (unit-normalized) vector: per subspace s,
    * the index of the nearest codebook centroid by squared L2, strict `<`
    * so ties keep the lowest code. Codebooks arrive FLAT (`flat` holds
    * every centroid's `subDim` doubles back to back; `starts(s)` /
    * `counts(s)` index them in centroid units) so the inner loops touch
    * two primitive arrays — no per-element lambda dispatch. Summation is
    * sequential per centroid, bit-identical to the
    * `aggregate(zip_with((x-y)*(x-y)), 0.0, _+_)` HOF composition
    * (`SimilaritySpec` pins kernel ≡ HOF on random vectors).
    */
  def pqCodes(v: ArrayData, flat: Array[Double], starts: Array[Int],
      counts: Array[Int], subDim: Int): ArrayData = {
    val m = starts.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var bestD = Double.MaxValue
      var best = 0
      var j = 0
      while (j < counts(s)) {
        var off = (starts(s) + j) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = v.getDouble(base + i) - flat(off)
          d += diff * diff
          i += 1; off += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** TRY-mode string→int64 cast without the exception machinery: ANSI's
    * accept-set is exactly the lenient `UTF8String.toLong` set MINUS any
    * string containing a '.' byte (`toLongExact` delegates to
    * `toLong(wrapper, allowDecimal = false)`, and the decimal-point scan
    * is the ONLY grammar difference — without a '.', the two parses are
    * the same code path), so `contains('.') → null, else lenient parse`
    * is result-identical to `Cast(s, LongType, EvalMode.TRY)` with no
    * throw on the reject path. TRY rejection otherwise constructs a
    * SparkNumberFormatException per row (~10 µs measured — q125's one
    * JSONExtractInt column cost ~1.0 s/100k rows through it). Boxed
    * return: null ⇔ SQL NULL. `GraftExtensionsSpec` pins kernel ≡
    * try_cast cell-for-cell on an adversarial battery.
    */
  def tryToLongExact(s: UTF8String): java.lang.Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if (Platform.getByte(base, off + i) == '.') return null
      i += 1
    }
    val w = new UTF8String.LongWrapper
    if (s.toLong(w)) java.lang.Long.valueOf(w.value) else null
  }

  /** ADC (asymmetric-distance) sum for one corpus row: Σ_s tbl(s)(codes(s)),
    * summed left-to-right — bit-identical to the HOF composition
    * `aggregate(zip_with(codes, tbl, (c, t) => element_at(t, c + 1)), 0.0, _+_)`
    * including its null algebra: `zip_with` pads the shorter side with
    * null, `element_at` of a null/padded input or an out-of-range index is
    * null (non-ANSI TRY semantics; a negative `c + 1` indexes from the
    * end, exactly element_at's rule), and `+` propagates the first null
    * through the rest of the fold — so any null lookup makes the whole sum
    * null, which the loop returns early. `c = -1` (index 0) is
    * element_at's always-throw case and is unreachable from [[pqCodes]]
    * output; the kernel mirrors the throw. Boxed return: null ⇔ SQL NULL.
    * `SimilaritySpec` pins kernel ≡ HOF on randomized codes/tables
    * including mismatched lengths and out-of-range codes.
    */
  def adcSum(codes: ArrayData, tbl: ArrayData): java.lang.Double = {
    val nc = codes.numElements()
    val nt = tbl.numElements()
    val n = if (nc > nt) nc else nt
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (i >= nc || codes.isNullAt(i) || i >= nt || tbl.isNullAt(i)) return null
      val idx = codes.getInt(i) + 1
      if (idx == 0) throw new UnsupportedOperationException(
        "SQL array indices start at 1 (adc_sum mirrors element_at)")
      val t = tbl.getArray(i)
      val len = t.numElements()
      val pos = if (idx > 0) idx - 1 else len + idx
      if (pos < 0 || pos >= len || t.isNullAt(pos)) return null
      acc += t.getDouble(pos)
      i += 1
    }
    acc
  }

  /** Multiset n-gram intersection |A ∩ B| of a text's overlapping
    * length-`n` CODEPOINT grams (the [[graft.functions.FuzzyMatch]]
    * profile: positions 1..numChars−n+1, occurrences kept) against a
    * precomputed needle profile: Σ_g min(count_text(g), count_needle(g)).
    * One pass over the UTF-8 bytes, zero gram strings materialized — each
    * gram is a contiguous byte span of the text (grams are consecutive
    * code points), hashed in place and byte-verified against the table.
    * Bit-identical to the HOF composition
    * `Σ_g least(size(filter(charGrams(text,n), _ === g)), c_g)`
    * (`FuzzyMatchSpec` pins both on randomized corpora).
    */
  def ngramIntersect(s: UTF8String, t: NgramTable): Long = {
    val n = t.n
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // code-point starts: UTF-8 lead bytes (not 10xxxxxx) — matches
    // length()/substr()'s numChars arithmetic
    var nChars = 0
    var i = 0
    while (i < len) {
      if ((Platform.getByte(base, off + i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < n) return 0L
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((Platform.getByte(base, off + i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = len
    val cnt = new Array[Int](t.gramBytes.length)
    var inter = 0L
    var g = 0
    val nGrams = nChars - n + 1
    while (g < nGrams) {
      val b0 = starts(g)
      val glen = starts(g + n) - b0
      val h = XXH64.hashUnsafeBytes(base, off + b0, glen, 42L)
      var slot = (h & t.mask).toInt
      var idx = t.slots(slot)
      while (idx >= 0) {
        val gb = t.gramBytes(idx)
        if (t.hashes(idx) == h && gb.length == glen &&
          org.apache.spark.unsafe.array.ByteArrayMethods.arrayEquals(
            base, off + b0, gb, Platform.BYTE_ARRAY_OFFSET, glen)) {
          if (cnt(idx) < t.gramCounts(idx)) { cnt(idx) += 1; inter += 1L }
          idx = -2 // found — saturated or counted either way
        } else {
          slot = (slot + 1) & t.mask
          idx = t.slots(slot)
        }
      }
      g += 1
    }
    inter
  }

  /** Gear-hash content-defined cut positions (the [[graft.operators
    * .Dedup.cdcChunks]] kernel): the TRUE rolling recurrence
    * `h = (h << 1) + code·mult`, cutting after 1-based position p
    * (never the last) when the low `maskBits` bits of h are all ones.
    * Equivalent by construction to the fixed-width windowed form the
    * operator documents (bit k of h sees only the last k+1 characters),
    * but O(1) per character instead of a maskBits-term expression tree.
    * Positions are CODEPOINT indices — identical to the DuckDB oracle's
    * character positions, and to the byte offsets on the ASCII corpus
    * contract the dedup family states; the ASCII fast path walks the
    * UTF-8 bytes zero-alloc.
    */
  def gearCuts(s: UTF8String, maskBits: Int, mult: Long): ArrayData =
    gearCutsBounded(s, maskBits, mult, 1, Int.MaxValue)

  /** [[gearCuts]] with FastCDC min/max-length acceptance: a candidate
    * only cuts >= minLen past the previous cut; a cut is forced at
    * maxLen. minLen = 1, maxLen = MaxValue degenerates to the pure form.
    */
  def gearCutsBounded(s: UTF8String, maskBits: Int, mult: Long,
      minLen: Int, maxLen: Int): ArrayData = {
    val mask = (1L << maskBits) - 1
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var ascii = true
    var i = 0
    while (i < len && ascii) {
      if (Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) {
      val out = new Array[Int](len)
      var n = 0
      var h = 0L
      var anchor = 0
      var p = 0
      while (p < len) {
        h = (h << 1) + (Platform.getByte(base, off + p).toLong & 0xFFL) * mult
        val pos = p + 1
        val gap = pos - anchor
        if (pos < len &&
          (gap >= maxLen || (gap >= minLen && (h & mask) == mask))) {
          out(n) = pos; n += 1; anchor = pos
        }
        p += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
    } else {
      val cps = s.toString.codePoints().toArray
      val total = cps.length
      val out = new Array[Int](total)
      var n = 0
      var h = 0L
      var anchor = 0
      var p = 0
      while (p < total) {
        h = (h << 1) + cps(p).toLong * mult
        val pos = p + 1
        val gap = pos - anchor
        if (pos < total &&
          (gap >= maxLen || (gap >= minLen && (h & mask) == mask))) {
          out(n) = pos; n += 1; anchor = pos
        }
        p += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
    }
  }
}
