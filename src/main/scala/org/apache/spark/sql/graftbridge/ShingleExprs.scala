package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared loop for [[ShingleSet]] — a named object so whole-stage
  * codegen calls the static forwarder instead of inlining the loop.
  */
object ShingleKernel {
  /** Distinct k-token shingles of a space-tokenized string, first
    * occurrence order — byte-for-byte the composed built-in pipeline
    * `array_distinct(shingles(tokens(text), k))`:
    * trim SPACES (0x20 only, like StringTrim's default), split on the
    * single space character (other whitespace stays inside tokens),
    * drop empty tokens, join k consecutive tokens with one space,
    * dedupe keeping first occurrence (array_distinct's order).
    * Fewer than k tokens ⇒ empty array.
    */
  def compute(s: UTF8String, k: Int): ArrayData = compute(s, k, true)

  /** As [[compute]]; `distinct = false` keeps every positional shingle
    * in order — the `shingles(tokens(text), k)` composition (winnow
    * fingerprints, positional coverage, repetition ratios).
    */
  def compute(s: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val str = s.toString
    var st = 0
    var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    // token boundaries over [st, en)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = st
    var tokStart = st
    while (i <= en) {
      if (i == en || str.charAt(i) == ' ') {
        if (i > tokStart) { starts.add(tokStart); ends.add(i) }
        tokStart = i + 1
      }
      i += 1
    }
    val n = starts.size()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val all = if (distinct) null else new java.util.ArrayList[Any](n - k + 1)
    var p = 0
    while (p <= n - k) {
      // shingle = tokens p..p+k-1 joined by ' ' — a substring of str
      // except where runs of spaces separated tokens, so rebuild
      val sb = new java.lang.StringBuilder(
        ends.get(p + k - 1) - starts.get(p))
      var t = 0
      while (t < k) {
        if (t > 0) sb.append(' ')
        sb.append(str, starts.get(p + t), ends.get(p + t))
        t += 1
      }
      if (distinct) seen.add(sb.toString)
      else all.add(UTF8String.fromString(sb.toString))
      p += 1
    }
    if (!distinct) return new GenericArrayData(all.toArray)
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

/** Fused distinct-shingle kernel: the whole tokenize → k-gram →
  * distinct pipeline in one pass per document. The composed built-in
  * form pays four CodegenFallback higher-order functions (filter,
  * two zip_with lambdas, filter again) plus array_distinct, each with
  * an interpreted lambda dispatch per TOKEN and a materialized
  * intermediate array; this expression is one JVM loop, no
  * intermediates. Output is bit-identical (ShingleSpec pins fused ==
  * composed on random text, including multi-space/edge cases), so no
  * oracle changes.
  *
  * Null input ⇒ null; fewer than k tokens ⇒ empty array (the
  * composed pipeline's convention).
  */
case class ShingleSet(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && k <= 16, s"shingle size must be in [1, 16], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String =
    if (distinct) "graft_shingle_set" else "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  org.apache.spark.sql.graftbridge.ShingleKernel.compute($c, $k, $distinct);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}
