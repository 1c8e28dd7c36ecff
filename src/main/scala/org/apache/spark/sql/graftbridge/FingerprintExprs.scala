package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared loop for [[WinnowFingerprint]] — named object so whole-stage
  * codegen calls the static forwarder.
  */
object WinnowKernel {

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest,
      bytes: Array[Byte]): String = {
    val dg = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((dg(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(dg(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Winnowing fingerprint of a shingle array: md5-hex each shingle,
    * sliding-window minimum of width `w` via a monotone deque (O(n)
    * total, vs the composed form's per-window `slice` copy + interior
    * `array_min` scan = O(n·w) interpreted work), distinct+sort the
    * kept minima, md5 the '|'-joined result. Hex strings are ASCII so
    * `String.compareTo` == Spark's UTF8String binary ordering == the
    * DuckDB VARCHAR ordering the oracle sorts by — every comparison
    * agrees with the composed form bit-for-bit.
    *
    * Degenerate arms mirror the composed form exactly: n == 0 ⇒ the
    * single window min is NULL and concat_ws skips it (fingerprint of
    * the empty string); 0 < n < w ⇒ one window over the whole array.
    */
  def fingerprint(shingles: ArrayData, w: Int,
      md: java.security.MessageDigest): UTF8String = {
    val n = shingles.numElements()
    val kept = new java.util.TreeSet[String]()
    if (n > 0) {
      val hs = new Array[String](n)
      var i = 0
      while (i < n) {
        hs(i) = md5Hex(md, shingles.getUTF8String(i).getBytes)
        i += 1
      }
      if (n < w) {
        var min = hs(0)
        i = 1
        while (i < n) { if (hs(i).compareTo(min) < 0) min = hs(i); i += 1 }
        kept.add(min)
      } else {
        // monotone deque of indices; front = current window minimum
        val dq = new Array[Int](n)
        var head = 0
        var tail = 0 // exclusive
        i = 0
        while (i < n) {
          while (tail > head && hs(dq(tail - 1)).compareTo(hs(i)) >= 0)
            tail -= 1
          dq(tail) = i
          tail += 1
          if (dq(head) <= i - w) head += 1
          if (i >= w - 1) kept.add(hs(dq(head)))
          i += 1
        }
      }
    }
    val sb = new java.lang.StringBuilder(33 * kept.size())
    val it = kept.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append('|')
      sb.append(it.next())
      first = false
    }
    UTF8String.fromString(
      md5Hex(md, sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }
}

/** Fused winnowing document fingerprint (Schleimer et al., SIGMOD'03
  * scheme, simplified — reference line of the composed form:
  * TextOps.winnowFingerprintComposed): ONE expression for the whole
  * md5 → sliding-min → distinct/sort → md5 chain. Why fused: the
  * composed form materializes a `slice` copy per window position and
  * scans it with `array_min`, all under CodegenFallback HOFs —
  * measured 3.8 ms/doc (q_fingerprint was 19.2 s at sf0.1 under the
  * round-14 materializing bench). The kernel's monotone deque is
  * O(n) per document with one allocation per kept hash.
  * Bit-identical to the composed form (ExtensionsSpec pins it
  * corpus-wide) and to the q_fingerprint DuckDB oracle. Null ⇒ null.
  */
case class WinnowFingerprint(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"window width must be >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.fingerprint(input.asInstanceOf[ArrayData], w,
      java.security.MessageDigest.getInstance("MD5"))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftWinnowMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftbridge.WinnowKernel.fingerprint(
         |  $c, $w, $md);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}
