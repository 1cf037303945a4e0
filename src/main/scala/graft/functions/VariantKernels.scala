package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** One-call navigation + probe kernels over VARIANT BINARY for the
  * structural JSON accessors (`JSONHas` / `JSONLength` / `JSONType`) —
  * the r16 verdict's q125 performance item.
  *
  * The r16 trees were stock-variant compositions: `try_variant_get`
  * navigation + `schema_of_variant` + a when-chain of string compares
  * + let-binding lambda layers — ALL interpreted (variant expressions
  * have no codegen), ~0.6 s per accessor-column over sf0.1 events.
  * Each kernel here replaces that tree with ONE static call reachable
  * from `StaticInvoke` (which DOES codegen — a direct static call
  * inside whole-stage codegen): walk the path on the variant's byte
  * encoding (`getFieldByKey` is a dictionary binary search,
  * `getElementAtIndex` an offset read — no re-parse, no schema
  * construction, no per-row lambda allocation) and read the header.
  *
  * Path encoding: the registry validates key/index literals at PLAN
  * time (`[A-Za-z0-9_]+` keys, 1-based indices) and passes steps as an
  * array<string> literal — `"k:<key>"` / `"i:<zero-based-index>"`.
  *
  * Semantics are IDENTICAL to the r16 trees (q125's oracle pins them):
  * absent path vs explicit JSON null stay distinguishable (absent
  * navigates to Java null; an explicit null is a Variant of type
  * NULL), `JSONType` maps the variant types onto CH's names with the
  * documented deviations (every integral reads Int64, DECIMAL/DOUBLE
  * read Double), and a SQL-NULL input (malformed document after
  * `try_parse_json`) propagates NULL for the callers' Coalesce
  * defaults.
  */
object VariantKernels {

  /** Walk the encoded steps; null = absent path / type mismatch
    * (exactly `try_variant_get`'s NULL read).
    */
  private def nav(v: VariantVal, steps: ArrayData): Variant = {
    var cur = new Variant(v.getValue, v.getMetadata)
    var i = 0
    val n = steps.numElements()
    while (i < n) {
      if (cur == null) return null
      val s = steps.getUTF8String(i).toString
      if (s.charAt(0) == 'k') {
        if (cur.getType != VariantUtil.Type.OBJECT) return null
        cur = cur.getFieldByKey(s.substring(2))
      } else {
        if (cur.getType != VariantUtil.Type.ARRAY) return null
        val idx = s.substring(2).toInt
        if (idx >= cur.arraySize) return null
        cur = cur.getElementAtIndex(idx)
      }
      i += 1
    }
    cur
  }

  private val T_NULL = UTF8String.fromString("Null")
  private val T_STRING = UTF8String.fromString("String")
  private val T_INT64 = UTF8String.fromString("Int64")
  private val T_BOOL = UTF8String.fromString("Bool")
  private val T_DOUBLE = UTF8String.fromString("Double")
  private val T_ARRAY = UTF8String.fromString("Array")
  private val T_OBJECT = UTF8String.fromString("Object")

  /** JSONHas: TRUE iff the path exists — INCLUDING an explicit JSON
    * null (a Variant of type NULL is a non-null walk result).
    */
  def jsonHas(v: VariantVal, steps: ArrayData): Boolean =
    nav(v, steps) != null

  /** JSONLength: element/key count of the array/object at the path;
    * 0 for scalars and absent paths (CH's default).
    */
  def jsonLength(v: VariantVal, steps: ArrayData): Long = {
    val n = nav(v, steps)
    if (n == null) 0L
    else n.getType match {
      case VariantUtil.Type.OBJECT => n.objectSize().toLong
      case VariantUtil.Type.ARRAY => n.arraySize().toLong
      case _ => 0L
    }
  }

  /** JSONType under CH's names; 'Null' for explicit null AND absent
    * (CH's missing-value read). Deviations as documented on the
    * registry entry: integral numbers read Int64, DECIMAL (non-integral
    * or past-int64 literals from parse_json) and DOUBLE read Double.
    */
  def chTypeName(v: VariantVal, steps: ArrayData): UTF8String = {
    val n = nav(v, steps)
    if (n == null) T_NULL
    else n.getType match {
      case VariantUtil.Type.NULL => T_NULL
      case VariantUtil.Type.STRING => T_STRING
      case VariantUtil.Type.LONG => T_INT64
      case VariantUtil.Type.BOOLEAN => T_BOOL
      case VariantUtil.Type.DOUBLE | VariantUtil.Type.DECIMAL |
           VariantUtil.Type.FLOAT => T_DOUBLE
      case VariantUtil.Type.ARRAY => T_ARRAY
      case VariantUtil.Type.OBJECT => T_OBJECT
      case _ => T_NULL
    }
  }

  // JSON text rendering: Variant.toJson IS Spark's canonical
  // variant-to-JSON renderer (the same one the to_json expression
  // reaches) — the documented "canonicalized, not the original byte
  // slice" deviation is identical on both paths. The ZoneId only
  // affects timestamp-typed variants, which parse_json can never
  // produce; UTC matches the engine sessions.
  private val UTC = java.time.ZoneId.of("UTC")

  /** JSONExtractArrayRaw: each element of the array at the path as its
    * (canonicalized) JSON text; null when absent / not an array (the
    * caller coalesces to CH's [] default).
    */
  def jsonArrayRaw(v: VariantVal, steps: ArrayData): ArrayData = {
    val n = nav(v, steps)
    if (n == null || n.getType != VariantUtil.Type.ARRAY) null
    else {
      val size = n.arraySize()
      val out = new Array[Any](size)
      var i = 0
      while (i < size) {
        out(i) = UTF8String.fromString(n.getElementAtIndex(i).toJson(UTC))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** JSONExtractKeys: the object's keys, ascending (the variant
    * encoding sorts object fields by key for binary search — the same
    * canonical order the r16 map-cast surface read); null when absent /
    * not an object.
    */
  def jsonKeys(v: VariantVal, steps: ArrayData): ArrayData = {
    val n = nav(v, steps)
    if (n == null || n.getType != VariantUtil.Type.OBJECT) null
    else {
      val size = n.objectSize()
      val out = new Array[Any](size)
      var i = 0
      while (i < size) {
        out(i) = UTF8String.fromString(n.getFieldAtIndex(i).key)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** JSONExtractKeysAndValuesRaw: array<struct<key,value>> with values
    * as (canonicalized) JSON text, entries in ascending-key order; null
    * when absent / not an object.
    */
  def jsonKeysValuesRaw(v: VariantVal, steps: ArrayData): ArrayData = {
    val n = nav(v, steps)
    if (n == null || n.getType != VariantUtil.Type.OBJECT) null
    else {
      val size = n.objectSize()
      val out = new Array[Any](size)
      var i = 0
      while (i < size) {
        val f = n.getFieldAtIndex(i)
        out(i) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](
            UTF8String.fromString(f.key),
            UTF8String.fromString(f.value.toJson(UTC))))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}
