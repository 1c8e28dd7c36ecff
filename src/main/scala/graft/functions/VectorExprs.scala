package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, DotProduct, MinhashSignature}

/** Column API over graft's native Catalyst expressions (defined in the
  * graftbridge package because Catalyst's type-check interfaces are
  * private[sql]).
  */
object VectorExprs {
  /** Native codegen dot product over two array<double> columns. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused MinHash signature over an array<string> shingle column:
    * all numHashes minima in one pass, NULL for an empty array.
    */
  def minhashNative(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinhashSignature(
      ColumnBridge.expression(shingles), numHashes))
}
