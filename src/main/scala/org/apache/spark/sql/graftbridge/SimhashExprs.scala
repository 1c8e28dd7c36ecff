package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-feature simhash vote kernel: md5 the feature string and
  * emit its `bits` sign votes PACKED into ⌈bits/3⌉ longs (21-bit lanes,
  * 3 per long), so the whole per-row pipeline the column formulation
  * spells as md5-hex → substring×chunks → conv(16,10)×chunks →
  * (shiftright + and + arithmetic)×bits collapses into one digest and
  * `bits` branch-free bit reads — no hex string, no string→long radix
  * parse, one expression eval per feature row.
  *
  * Vote semantics are bit-identical to the unfused form (and the DuckDB
  * oracle): vote k is 1 iff the top bit of md5-nibble k is set, i.e.
  * hex digit k+1 ∈ [8, f]. Lane k holds the 0/1 vote at bit (k%3)·21 of
  * long k/3; summing the packed longs per doc accumulates each lane's
  * count of 1-votes (the ±1 vote sum is recovered as 2·ones − n, which
  * is positive iff the bit majority is 1). Lanes are 21 bits wide, so
  * the per-doc sums stay carry-free for up to 2^21−1 ≈ 2M features per
  * document — far beyond any real document's distinct shingle count
  * (and ~1000× the longest test doc); the modulus guard in
  * [[graft.ops.Dedup.simhashSignature]] documents the bound.
  *
  * Null input ⇒ null. `bits` ≤ 32 (an md5 has 32 nibbles).
  */
case class SimhashPackedVotes(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 32, s"bits must be in [1, 32], got $bits")

  private val nPacked = (bits + 2) / 3

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_simhash_votes"

  override def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dg = md.digest(input.asInstanceOf[UTF8String].getBytes)
    val packed = new Array[Long](nPacked)
    var k = 0
    while (k < bits) {
      val bit = (dg(k >> 1) >> (if ((k & 1) == 0) 7 else 3)) & 1
      packed(k / 3) += bit.toLong << ((k % 3) * 21)
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val dg = ctx.freshName("dg")
      val packed = ctx.freshName("packed")
      val k = ctx.freshName("k")
      val bit = ctx.freshName("bit")
      s"""
         |byte[] $dg = $md.digest($c.getBytes());
         |long[] $packed = new long[$nPacked];
         |for (int $k = 0; $k < $bits; $k++) {
         |  int $bit = ($dg[$k >> 1] >> ((($k & 1) == 0) ? 7 : 3)) & 1;
         |  $packed[$k / 3] += ((long) $bit) << (($k % 3) * 21);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($packed);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashPackedVotes =
    copy(child = newChild)
}
