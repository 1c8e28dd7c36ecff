package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared loop for [[TransformInterpret]] — named object so generated
  * code calls the static forwarder.
  */
object TransformKernel {

  private def lookup(m: MapData, k: UTF8String): Int = {
    val keys = m.keyArray()
    val n = m.numElements()
    var i = 0
    while (i < n) {
      if (keys.getUTF8String(i).equals(k)) return i
      i += 1
    }
    -1
  }

  /** Any pairwise-equal keys among the first `w` entries? O(w²) over a
    * payload-sized array, and reached only when a rename applied (see
    * the call site) — the hot path never pays it.
    */
  private def hasDuplicate(ks: Array[UTF8String], w: Int): Boolean = {
    var i = 0
    while (i < w) {
      var j = i + 1
      while (j < w) {
        if (ks(i).equals(ks(j))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  private def arrContains(a: ArrayData, k: UTF8String): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && a.getUTF8String(i).equals(k)) return true
      i += 1
    }
    false
  }

  /** One value rule on one stringified value — the exact composed
    * semantics (Transform.applyRule): parse with Spark's string→double
    * cast behavior (Java parse after trim — every special literal
    * Spark additionally accepts is non-finite, and non-finite is
    * passthrough in BOTH forms, so outcomes agree on all inputs);
    * unknown op, divide-by-zero, null op/value, and non-numeric all
    * leave the value unchanged; results format with Spark's
    * double→string cast (== java.lang.Double.toString, probed).
    */
  private def applyRule(rule: InternalRow, v: UTF8String): UTF8String = {
    if (rule == null || v == null) return v
    if (rule.isNullAt(0) || rule.isNullAt(1)) return v
    val d =
      try {
        val p = java.lang.Double.parseDouble(v.toString.trim)
        if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p))
          return v
        p
      } catch { case _: NumberFormatException => return v }
    val op = rule.getUTF8String(0).toString
    val rv = rule.getDouble(1)
    val computed = op match {
      case "add"      => d + rv
      case "subtract" => d - rv
      case "multiply" => d * rv
      case "divide"   => if (rv == 0.0) return v else d / rv
      case _          => return v
    }
    UTF8String.fromString(java.lang.Double.toString(computed))
  }

  /** The whole P2→P5 chain (value rules → rename → remove → override)
    * over one payload map, each null config an identity stage —
    * bit-for-bit the composed interpreter's semantics (rules address
    * ORIGINAL names; removes/overrides address post-rename names;
    * rename onto an existing key overwrites it unless that key is
    * itself renamed away; meta/override entries append after the
    * filtered payload in config order). Overrides arrive RESOLVED
    * (the timestamp="current" magic stays outside, preserving the
    * composed form's query-constant wall clock).
    */
  def interpret(payload: MapData, rules: MapData, renames: MapData,
      removes: ArrayData, overrides: MapData): MapData = {
    var n = payload.numElements()
    val pk = payload.keyArray()
    val pv = payload.valueArray()
    var keys = new Array[UTF8String](n)
    var vals = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      keys(i) = pk.getUTF8String(i)
      val v = if (pv.isNullAt(i)) null else pv.getUTF8String(i)
      // P2 — value rules on original names
      vals(i) =
        if (rules == null || v == null) v
        else {
          val ri = lookup(rules, keys(i))
          if (ri < 0) v
          else {
            val rv = rules.valueArray()
            if (rv.isNullAt(ri)) v
            else applyRule(rv.getStruct(ri, 2), v)
          }
        }
      i += 1
    }
    // P3 — renames: drop entries a rename target overwrites (unless
    // themselves renamed), then map keys; all reads against the
    // ORIGINAL key set. Three-valued-logic parity with the composed
    // form's `!array_contains(targets, k) || map_contains_key(…)`
    // under map_filter: when the targets array carries a NULL (an
    // invalid config — a rename without a target), array_contains of
    // a non-match is NULL, the OR stays NULL for non-renamed keys,
    // and map_filter DROPS them — so a null target keeps only the
    // renamed key itself (under its original name). Weird but pinned:
    // the kernel must agree with the reference implementation on
    // every input, including invalid configs.
    if (renames != null) {
      val targets = renames.valueArray()
      var targetsHaveNull = false
      i = 0
      while (i < targets.numElements()) {
        if (targets.isNullAt(i)) targetsHaveNull = true
        i += 1
      }
      val outK = new Array[UTF8String](n)
      val outV = new Array[UTF8String](n)
      var w = 0
      var renamedAny = false
      i = 0
      while (i < n) {
        val k = keys(i)
        val ri = lookup(renames, k)
        val kept =
          if (ri >= 0) true // map_contains_key short-circuits the OR
          else !arrContains(targets, k) && !targetsHaveNull
        if (kept) {
          // null rename target keeps the original key — the composed
          // form's coalesce(element_at(renames, k), k)
          outK(w) =
            if (ri >= 0 && !targets.isNullAt(ri)) targets.getUTF8String(ri)
            else k
          outV(w) = vals(i)
          if (ri >= 0) renamedAny = true
          w += 1
        }
        i += 1
      }
      // Duplicate post-rename keys (an invalid config: two payload keys
      // renamed to one target, or a null-target rename colliding with
      // another rename's target) — the composed form's
      // map_from_entries defers to the engine's map-key dedup policy
      // (EXCEPTION throws, LAST_WIN keeps first position / last value).
      // The kernel's agree-on-every-input contract includes invalid
      // configs, so on collision defer to the SAME machinery. Original
      // payload keys are unique and the kept-filter drops keys equal to
      // a live rename target, so a collision REQUIRES a renamed entry:
      // the rebuild runs only when one exists and a linear duplicate
      // scan confirms (cold path — never on valid configs).
      if (renamedAny && hasDuplicate(outK, w)) {
        val b = new org.apache.spark.sql.catalyst.util.ArrayBasedMapBuilder(
          StringType, StringType)
        i = 0
        while (i < w) { b.put(outK(i), outV(i)); i += 1 }
        val m = b.build()
        val mk = m.keyArray
        val mv = m.valueArray
        w = m.numElements()
        i = 0
        while (i < w) {
          outK(i) = mk.getUTF8String(i)
          outV(i) = if (mv.isNullAt(i)) null else mv.getUTF8String(i)
          i += 1
        }
      }
      keys = outK; vals = outV; n = w
    }
    // P4 — removes (post-rename names)
    if (removes != null) {
      var w = 0
      i = 0
      while (i < n) {
        if (!arrContains(removes, keys(i))) {
          keys(w) = keys(i); vals(w) = vals(i); w += 1
        }
        i += 1
      }
      n = w
    }
    // P5 — overrides: drop overridden payload keys, append override
    // entries in config order
    val on = if (overrides == null) 0 else overrides.numElements()
    val fk = new Array[AnyRef](n + on)
    val fv = new Array[AnyRef](n + on)
    var w = 0
    i = 0
    while (i < n) {
      if (overrides == null || lookup(overrides, keys(i)) < 0) {
        fk(w) = keys(i); fv(w) = vals(i); w += 1
      }
      i += 1
    }
    i = 0
    while (i < on) {
      fk(w) = overrides.keyArray().getUTF8String(i)
      fv(w) = if (overrides.valueArray().isNullAt(i)) null
              else overrides.valueArray().getUTF8String(i)
      w += 1
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(java.util.Arrays.copyOf(fk, w)
        .asInstanceOf[Array[Any]]),
      new GenericArrayData(java.util.Arrays.copyOf(fv, w)
        .asInstanceOf[Array[Any]]))
  }
}

/** Fused per-client transform interpreter (the reference's "query
  * language", SURVEY §2.4 P2–P5) — one expression for the whole
  * rules→rename→remove→override chain that the composed form spells
  * as five interpreted map HOFs, each materializing a full map copy
  * per row (48–87 µs/row measured; the config-as-columns broadcast
  * join feeds a fresh config per row, so nothing is plan-constant).
  * Children: (payload, rules, renames, removes, resolvedOverrides) —
  * a NULL config child is that stage's identity, so only the payload
  * propagates null. Bit-identical to Transform.interpretComposed
  * (TransformSpec pins it over the full events corpus and the edge
  * configs) and to the q_value_rules / q_transform_pipeline /
  * q_serve_snapshot oracles.
  */
case class TransformInterpret(payload: Expression, rules: Expression,
    renames: Expression, removes: Expression, overrides: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(payload, rules, renames, removes, overrides)

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)

  override def nullable: Boolean = payload.nullable

  override def prettyName: String = "graft_transform"

  override def eval(input: InternalRow): Any = {
    val p = payload.eval(input)
    if (p == null) return null
    TransformKernel.interpret(
      p.asInstanceOf[MapData],
      rules.eval(input).asInstanceOf[MapData],
      renames.eval(input).asInstanceOf[MapData],
      removes.eval(input).asInstanceOf[ArrayData],
      overrides.eval(input).asInstanceOf[MapData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    super[CodegenFallback].doGenCode(ctx, ev)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TransformInterpret =
    copy(payload = newChildren(0), rules = newChildren(1),
      renames = newChildren(2), removes = newChildren(3),
      overrides = newChildren(4))
}
