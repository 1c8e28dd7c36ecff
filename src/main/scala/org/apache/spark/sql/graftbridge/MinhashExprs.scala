package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Shared loop for [[MinhashSignature]] — a named object so whole-stage
  * codegen can call it through the static forwarder instead of inlining
  * a giant per-row loop into generated Java.
  */
object MinhashKernel {
  /** 2^56 — the two-hash family's modulus (Dedup.MinhashMod). */
  final val Mod = 72057594037927936L

  /** min_j over the array of (h1 + j·h2) mod 2^56, where h1/h2 are the
    * md5 digest's bytes [0,7) and [8,15) as big-endian 56-bit values —
    * exactly the values the hex formulation derives via
    * substring(md5hex, 1, 14) / substring(md5hex, 17, 14) + conv(16,10),
    * without materializing the hex string. Overflow-proof for
    * numHashes ≤ 128: h2 < 2^56 and j ≤ 127 keep j·h2 + h1 < 2^63.
    */
  def compute(arr: ArrayData, numHashes: Int,
      md: java.security.MessageDigest): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val dg = md.digest(arr.getUTF8String(i).getBytes)
      var h1 = 0L
      var h2 = 0L
      var b = 0
      while (b < 7) {
        h1 = (h1 << 8) | (dg(b) & 0xFFL)
        h2 = (h2 << 8) | (dg(b + 8) & 0xFFL)
        b += 1
      }
      var j = 0
      while (j < numHashes) {
        val v = (h1 + j.toLong * h2) % Mod
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }
}

/** Fused MinHash signature kernel: one pass over a document's shingle
  * array producing all `numHashes` minima at once — the whole per-doc
  * pipeline the column formulation spells as explode → md5-hex →
  * substring×2 → conv(16,10)×2 → n×((h1 + j·h2) % 2^56) → n min
  * aggregates (a shuffle!) collapses into a single map-side expression:
  * no explode, no hex string, no radix parse, no aggregation exchange.
  * Bit-identical to the unfused form and the DuckDB oracle generator
  * (same md5 byte ranges, same modulus), so swapping it in cannot move
  * any result hash.
  *
  * Empty shingle array ⇒ NULL (mirrors explode's docs-with-no-shingles
  * -produce-no-row convention; callers filter on isNotNull). Null
  * input ⇒ null.
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes >= 1 && numHashes <= 128,
    s"two-hash family bounded to numHashes <= 128 (overflow proof), got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else UnsafeArrayData.fromPrimitiveArray(MinhashKernel.compute(arr, numHashes,
      java.security.MessageDigest.getInstance("MD5")))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMinhashMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |    org.apache.spark.sql.graftbridge.MinhashKernel.compute($c, $numHashes, $md));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
