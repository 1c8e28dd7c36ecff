package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, DotProduct}

/** Column API over graft's native Catalyst expressions (defined in the
  * graftbridge package because Catalyst's type-check interfaces are
  * private[sql]).
  */
object VectorExprs {
  /** Native codegen dot product over two array<double> columns. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
