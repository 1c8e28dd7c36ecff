package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared loop for [[ParaJoin]] — named object so whole-stage codegen
  * calls the static forwarder.
  */
object ParaKernel {

  /** Regroup space-separated tokens into k-word paragraphs joined by
    * newline — one byte pass. Exactly the composed chain
    * `array_join(transform(sequence(0, ceil(n/k)-1),
    *   i => array_join(slice(tokens, i*k+1, k), " ")), "\n")`
    * over `tokens = filter(split(trim(text), " "), _ != "")`:
    * leading/trailing spaces vanish (trim + empty-token filter), runs
    * of spaces collapse (empty tokens filtered), the separator before
    * token t (0-based) is '\n' when t % k == 0 and ' ' otherwise, and
    * zero tokens yield "" (the composed form's greatest(nP, 1) arm —
    * one paragraph over the empty slice). Byte-level scan is UTF-8
    * safe: 0x20 never occurs inside a multibyte sequence. Output
    * never exceeds input length (separators map 1:1, space runs
    * shrink), so one exact-size working buffer suffices.
    */
  def paraJoin(text: UTF8String, k: Int): UTF8String = {
    val b = text.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var w = 0
    var words = 0
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      if (i < n) {
        if (words > 0) {
          out(w) = if (words % k == 0) '\n' else ' '
          w += 1
        }
        while (i < n && b(i) != ' ') { out(w) = b(i); w += 1; i += 1 }
        words += 1
      }
    }
    UTF8String.fromBytes(out, 0, w)
  }
}

/** Fused k-word paragraph derivation (the q_para_dedup /
  * q_stream_para_dedup / q_curate_e2e prep stage — composed reference
  * implementation: graft.queries.PipelineQ.paraCorpusComposed): group
  * a document's space-separated tokens into k-word runs joined by
  * newlines, in ONE byte pass. Why fused: the composed form is an
  * interpreted-HOF chain (`transform` over a `sequence`, each lambda
  * materializing a `slice` copy and an `array_join`) — CodegenFallback
  * per element, O(words) allocations per document — the same class of
  * cost every other graftbridge kernel removed (BPE apply, winnowing,
  * transform interpret). Bit-identical to the composed chain
  * (ExtensionsSpec pins it corpus-wide + degenerate arms) so the
  * q_para_dedup-family oracle hashes cannot move — INCLUDING on a
  * NULL document: the composed chain's outer array_join skips the
  * null paragraph array and returns "", never null, so this
  * expression is non-nullable and maps null ⇒ "".
  */
case class ParaJoin(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"words-per-paragraph must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_para_join"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else ParaKernel.paraJoin(v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        UTF8String ${ev.value} = ${childGen.isNull}
          ? UTF8String.EMPTY_UTF8
          : org.apache.spark.sql.graftbridge.ParaKernel.paraJoin(${childGen.value}, $k);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ParaJoin =
    copy(child = newChild)
}
