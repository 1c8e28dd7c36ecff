package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, SimhashPackedVotes}

/** Column API over graft's native text-hashing Catalyst expressions
  * (defined in the graftbridge package because Catalyst's type-check
  * interfaces are private[sql]).
  */
object TextExprs {
  /** Packed simhash votes of a feature string: md5 + `bits` sign votes
    * in 21-bit lanes, 3 per long — see
    * [[org.apache.spark.sql.graftbridge.SimhashPackedVotes]].
    */
  def simhashPackedVotes(c: Column, bits: Int): Column =
    ColumnBridge.column(SimhashPackedVotes(ColumnBridge.expression(c), bits))

  /** Fused tokenize → k-gram → distinct shingle set — see
    * [[org.apache.spark.sql.graftbridge.ShingleSet]].
    */
  def shingleSetNative(text: Column, k: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.ShingleSet(
        ColumnBridge.expression(text), k))

  /** Fused tokenize → positional k-grams (duplicates kept, in order) —
    * the `shingles(tokens(text), k)` composition.
    */
  def shingleListNative(text: Column, k: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.ShingleSet(
        ColumnBridge.expression(text), k, distinct = false))

  /** Unicode NFC normalization (native codegen, already-normalized
    * fast path) — see
    * [[org.apache.spark.sql.graftbridge.NfcNormalize]].
    */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.NfcNormalize(
        ColumnBridge.expression(text)))
}
