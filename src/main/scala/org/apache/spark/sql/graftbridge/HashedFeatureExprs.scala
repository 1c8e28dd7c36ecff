package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared loop for [[HashedBucketCounts]]. */
object HashedFeatureKernel {

  /** Bucket of one feature — bit-for-bit the column formulation
    * `conv(substring(md5(concat('seed|', f) as binary), 1, 8), 16, 10)
    * % buckets` (Classify.bucketOf): the first 8 hex chars are the
    * digest's first 4 bytes as an unsigned 32-bit value; non-negative,
    * so Spark's `%` and Java's agree.
    */
  private def bucket(md: java.security.MessageDigest, prefix: Array[Byte],
      f: UTF8String, buckets: Int): Long = {
    md.update(prefix)
    val dg = md.digest(f.getBytes)
    val v = ((dg(0) & 0xFFL) << 24) | ((dg(1) & 0xFFL) << 16) |
      ((dg(2) & 0xFFL) << 8) | (dg(3) & 0xFFL)
    v % buckets
  }

  /** Per-document hashed bag-of-features, counted map-side: unigrams
    * (and, when `bigrams`, space-joined adjacent bigrams — exactly
    * TextOps.shingles(ts, 2)'s join) hashed into `buckets`, returning
    * the (b, c) pairs SORTED BY BUCKET. Replaces the
    * explode → md5-hex → conv → groupBy(doc, b) formulation: the
    * per-feature row blowup and its corpus-sized count shuffle
    * disappear — featurization becomes one map-side expression, the
    * design matrix is explode(pairs) with ≤ min(features, buckets)
    * rows per doc, and every downstream count/weight/score is an
    * identical exact integer.
    */
  def bucketCounts(toks: ArrayData, buckets: Int, seedPrefix: Array[Byte],
      bigrams: Boolean, md: java.security.MessageDigest): ArrayData = {
    val n = toks.numElements()
    val counts = new java.util.TreeMap[java.lang.Long, Array[Long]]()
    def add(f: UTF8String): Unit = {
      val b = java.lang.Long.valueOf(bucket(md, seedPrefix, f, buckets))
      val c = counts.get(b)
      if (c == null) counts.put(b, Array(1L)) else c(0) += 1L
    }
    var i = 0
    while (i < n) {
      add(toks.getUTF8String(i))
      i += 1
    }
    if (bigrams) {
      i = 0
      while (i < n - 1) {
        add(UTF8String.concat(toks.getUTF8String(i),
          UTF8String.fromString(" "), toks.getUTF8String(i + 1)))
        i += 1
      }
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey.longValue(), e.getValue()(0))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused hashed-featurization kernel for the classifier/DSIR family:
  * token (+ bigram) array → per-bucket exact counts in one map-side
  * pass, `(b, c)` pairs sorted by bucket. The multiset of (doc, b, c)
  * rows it yields under explode is IDENTICAL to the composed
  * explode+groupBy design matrix (ExtensionsSpec pins it corpus-wide),
  * so every downstream integer sum — classifier gradients, DSIR
  * weights and scores, ensemble margins — and every oracle hash is
  * unchanged; what changes is the plan: no per-feature row explosion,
  * no featurization shuffle. Null ⇒ null.
  */
case class HashedBucketCounts(child: Expression, buckets: Int,
    seed: String, bigrams: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_hashed_counts"

  private lazy val seedPrefix =
    s"$seed|".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    HashedFeatureKernel.bucketCounts(input.asInstanceOf[ArrayData],
      buckets, seedPrefix, bigrams,
      java.security.MessageDigest.getInstance("MD5"))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftHfMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    val pfx = ctx.addReferenceObj("graftHfSeed", seedPrefix, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftbridge.HashedFeatureKernel
         |  .bucketCounts($c, $buckets, $pfx, $bigrams, $md);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBucketCounts =
    copy(child = newChild)
}
