package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared loop for [[BpeApplyMerges]] — a named object so whole-stage
  * codegen calls the static forwarder instead of inlining the loop.
  */
object BpeKernel {

  /** Apply the merge list to one token, in merge order, each merge a
    * single greedy left-to-right pass — EXACTLY the fold semantics of
    * the composed formulation (TextOps.bpeEncodeComposed): a pair
    * merges when the last ACCEPTED symbol equals `a` and the incoming
    * symbol equals `b`, and the freshly merged symbol is immediately
    * eligible as the next step's `last`. In-place compaction: the
    * write cursor never passes the read cursor, so one symbol array
    * serves all merge rounds — O(merges · len) with zero per-step
    * allocation, vs the composed ArrayAggregate's accumulator copy
    * per element (O(merges · len²) allocations — measured 2.4 ms/doc
    * interpreted, the q_stream_tokenize 12 s/trigger cause).
    *
    * Initial alphabet: one symbol per Unicode CODE POINT — the same
    * units Spark's `length`/`substr` (and the DuckDB oracle) index
    * strings by.
    */
  def encode(tok: UTF8String, as: Array[String], bs: Array[String])
      : ArrayData = {
    val s = tok.toString
    var syms = new Array[String](s.codePointCount(0, s.length))
    var i = 0
    var idx = 0
    while (i < s.length) {
      val l = Character.charCount(s.codePointAt(i))
      syms(idx) = s.substring(i, i + l)
      idx += 1
      i += l
    }
    var len = syms.length
    var k = 0
    while (k < as.length) {
      val a = as(k)
      val b = bs(k)
      var w = 0
      var r = 0
      while (r < len) {
        val x = syms(r)
        if (w > 0 && syms(w - 1) == a && x == b) syms(w - 1) = a + b
        else { syms(w) = x; w += 1 }
        r += 1
      }
      len = w
      k += 1
    }
    val out = new Array[Any](len)
    var j = 0
    while (j < len) { out(j) = UTF8String.fromString(syms(j)); j += 1 }
    new GenericArrayData(out)
  }
}

/** Fused BPE merge application: the whole per-token encode loop —
  * char-split then one greedy pass per learned merge — as ONE
  * expression, replacing the composed form's `merges.length` nested
  * ArrayAggregate folds (each of which copies its accumulator array
  * per element when evaluated, and is CodegenFallback so it is ALWAYS
  * evaluated that way). Bit-identical to the composed form
  * (ExtensionsSpec pins corpus-wide equality) and to the DuckDB
  * oracle's run-parity window formulation, so swapping it in moves no
  * result hash. Null ⇒ null; the merge list is a plan literal — the
  * trained model artifact compiled into the expression, exactly like
  * the composed form.
  */
case class BpeApplyMerges(child: Expression, mergesA: Seq[String],
    mergesB: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(mergesA.length == mergesB.length,
    "merge halves must align pairwise")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_apply"

  override def nullSafeEval(input: Any): Any =
    BpeKernel.encode(input.asInstanceOf[UTF8String],
      mergesA.toArray, mergesB.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refA = ctx.addReferenceObj("graftBpeA", mergesA.toArray,
      "java.lang.String[]")
    val refB = ctx.addReferenceObj("graftBpeB", mergesB.toArray,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftbridge.BpeKernel.encode(
         |  $c, $refA, $refB);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)
}
